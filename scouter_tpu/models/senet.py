"""Legacy SENet / SE-ResNet / SE-ResNeXt family — capability of
``timm/models/senet.py`` (the 'seresnet' branch of the reference's head-strip
switch, ``sloter/slot_model.py:35-37``: avg_pool + last_linear neutralized).

Architecture facts (cited): SEModule = GAP -> fc1 1x1 (with bias) -> relu ->
fc2 1x1 -> sigmoid scale (senet.py:67-86); SEResNetBlock/Bottleneck apply SE to
the block output before the residual add (:89-201; the Caffe-style bottleneck
puts the stride on conv1, :141-163); layer0 stem is 7x7/2 (or triple 3x3 for
senet154) followed by 3x3/2 max pool with ceil_mode (:278-300).

Param names mirror torch (layer0.conv1, layer1_0.se_module.fc1, last_linear).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .act import residual_add as _residual_add
from .layers import batch_norm, conv2d, global_avg_pool, head_dropout
from .registry import register_model

__all__ = ["SENet"]


def max_pool_3x3_s2_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(3, 2, ceil_mode=True): implicit -inf pad bottom/right."""
    b, h, w, c = x.shape
    out_h = -(-(h - 3) // 2) + 1
    out_w = -(-(w - 3) // 2) + 1
    pad_h = max((out_h - 1) * 2 + 3 - h, 0)
    pad_w = max((out_w - 1) * 2 + 3 - w, 0)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, pad_h), (0, pad_w)])


class _SEModule(nn.Module):
    channels: int
    reduction: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels // self.reduction, (1, 1), use_bias=True,
                    dtype=self.dtype, name="fc1")(s)
        s = relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class _SEBlock(nn.Module):
    """All three legacy block kinds, switched by `kind`."""

    kind: str  # 'basic' | 'bottleneck' (caffe) | 'next' | 'senet154'
    planes: int
    groups: int
    reduction: int
    stride: int = 1
    base_width: int = 4
    has_downsample: bool = False
    down_kernel: int = 1
    down_padding: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        residual = x
        if self.kind == "basic":
            out_chs = self.planes
            out = conv2d(self.planes, 3, stride=self.stride, padding=1, dtype=d,
                         name="conv1")(x)
            out = relu(batch_norm(train, dtype=d, name="bn1")(out))
            out = conv2d(self.planes, 3, padding=1, groups=self.groups, dtype=d,
                         name="conv2")(out)
            # the legacy basic block activates after bn2 too (senet.py:213-215)
            out = relu(batch_norm(train, dtype=d, name="bn2")(out))
        elif self.kind == "bottleneck":  # SEResNetBottleneck: stride on conv1
            out_chs = self.planes * 4
            out = conv2d(self.planes, 1, stride=self.stride, padding=0, dtype=d,
                         name="conv1")(x)
            out = relu(batch_norm(train, dtype=d, name="bn1")(out))
            out = conv2d(self.planes, 3, padding=1, groups=self.groups, dtype=d,
                         name="conv2")(out)
            out = relu(batch_norm(train, dtype=d, name="bn2")(out))
            out = conv2d(out_chs, 1, padding=0, dtype=d, name="conv3")(out)
            out = batch_norm(train, dtype=d, name="bn3")(out)
        elif self.kind == "next":  # SEResNeXtBottleneck
            out_chs = self.planes * 4
            width = math.floor(self.planes * (self.base_width / 64)) * self.groups
            out = conv2d(width, 1, padding=0, dtype=d, name="conv1")(x)
            out = relu(batch_norm(train, dtype=d, name="bn1")(out))
            out = conv2d(width, 3, stride=self.stride, padding=1, groups=self.groups,
                         dtype=d, name="conv2")(out)
            out = relu(batch_norm(train, dtype=d, name="bn2")(out))
            out = conv2d(out_chs, 1, padding=0, dtype=d, name="conv3")(out)
            out = batch_norm(train, dtype=d, name="bn3")(out)
        else:  # senet154 SEBottleneck
            out_chs = self.planes * 4
            out = conv2d(self.planes * 2, 1, padding=0, dtype=d, name="conv1")(x)
            out = relu(batch_norm(train, dtype=d, name="bn1")(out))
            out = conv2d(self.planes * 4, 3, stride=self.stride, padding=1,
                         groups=self.groups, dtype=d, name="conv2")(out)
            out = relu(batch_norm(train, dtype=d, name="bn2")(out))
            out = conv2d(out_chs, 1, padding=0, dtype=d, name="conv3")(out)
            out = batch_norm(train, dtype=d, name="bn3")(out)

        out = _SEModule(out_chs, self.reduction, dtype=d, name="se_module")(out)
        if self.has_downsample:
            residual = _SEDownsample(out_chs, self.stride, self.down_kernel,
                                     self.down_padding, dtype=d, name="downsample")(x, train)
        return relu(_residual_add(out, residual))


class _SEDownsample(nn.Module):
    out_chs: int
    stride: int
    kernel: int
    padding: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.out_chs, self.kernel, stride=self.stride, padding=self.padding,
                   dtype=self.dtype, name="downsample_0")(x)
        return batch_norm(train, dtype=self.dtype, name="downsample_1")(x)


class _Layer0(nn.Module):
    inplanes: int
    input_3x3: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        if self.input_3x3:
            x = conv2d(64, 3, stride=2, padding=1, dtype=d, name="conv1")(x)
            x = relu(batch_norm(train, dtype=d, name="bn1")(x))
            x = conv2d(64, 3, padding=1, dtype=d, name="conv2")(x)
            x = relu(batch_norm(train, dtype=d, name="bn2")(x))
            x = conv2d(self.inplanes, 3, padding=1, dtype=d, name="conv3")(x)
            x = relu(batch_norm(train, dtype=d, name="bn3")(x))
        else:
            x = conv2d(self.inplanes, 7, stride=2, padding=3, dtype=d, name="conv1")(x)
            x = relu(batch_norm(train, dtype=d, name="bn1")(x))
        return max_pool_3x3_s2_ceil(x)


class SENet(nn.Module):
    block_kind: str = "basic"
    layers: Sequence[int] = (2, 2, 2, 2)
    groups: int = 1
    reduction: int = 16
    inplanes: int = 64
    input_3x3: bool = False
    down_kernel: int = 1
    down_padding: int = 0
    base_width: int = 4
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        expansion = 1 if self.block_kind == "basic" else 4
        x = _Layer0(self.inplanes, self.input_3x3, dtype=self.dtype, name="layer0")(x, train)
        current = self.inplanes
        for stage_idx, blocks in enumerate(self.layers, start=1):
            planes = 64 * (2 ** (stage_idx - 1))
            stride = 1 if stage_idx == 1 else 2
            # layer1 uses 1x1/0 downsample regardless (senet.py:301-309)
            dk = 1 if stage_idx == 1 else self.down_kernel
            dp = 0 if stage_idx == 1 else self.down_padding
            for block_idx in range(blocks):
                s = stride if block_idx == 0 else 1
                needs_ds = block_idx == 0 and (s != 1 or current != planes * expansion)
                x = _SEBlock(
                    kind=self.block_kind, planes=planes, groups=self.groups,
                    reduction=self.reduction, stride=s, base_width=self.base_width,
                    has_downsample=needs_ds, down_kernel=dk, down_padding=dp,
                    dtype=self.dtype, name=f"layer{stage_idx}_{block_idx}",
                )(x, train)
                current = planes * expansion
        if features_only:
            # 'seresnet' head-strip neutralizes avg_pool + last_linear (:35-37)
            return x
        x = global_avg_pool(x)
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="last_linear")(x)


@register_model
def seresnet18(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return SENet(block_kind="basic", layers=(2, 2, 2, 2), groups=1, reduction=16,
                 num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def seresnet34(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return SENet(block_kind="basic", layers=(3, 4, 6, 3), groups=1, reduction=16,
                 num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def seresnet50(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return SENet(block_kind="bottleneck", layers=(3, 4, 6, 3), groups=1, reduction=16,
                 num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def seresnet101(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return SENet(block_kind="bottleneck", layers=(3, 4, 23, 3), groups=1, reduction=16,
                 num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def seresnext26_32x4d(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return SENet(block_kind="next", layers=(2, 2, 2, 2), groups=32, reduction=16,
                 base_width=4, num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def seresnext50_32x4d(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return SENet(block_kind="next", layers=(3, 4, 6, 3), groups=32, reduction=16,
                 base_width=4, num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def senet154(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return SENet(block_kind="senet154", layers=(3, 8, 36, 3), groups=64, reduction=16,
                 inplanes=128, input_3x3=True, down_kernel=3, down_padding=1,
                 num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def seresnet152(num_classes=1000, in_chans=3, **kw):
    """SE-ResNet-152 (timm/models/senet.py:452-461)."""
    kw.pop("mnist_stem", None)
    return SENet(block_kind="bottleneck", layers=(3, 8, 36, 3), groups=1, reduction=16,
                 num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def seresnext101_32x4d(num_classes=1000, in_chans=3, **kw):
    """SE-ResNeXt-101 32x4d (timm/models/senet.py:502-511)."""
    kw.pop("mnist_stem", None)
    return SENet(block_kind="next", layers=(3, 4, 23, 3), groups=32, reduction=16,
                 base_width=4, num_classes=num_classes, in_chans=in_chans, **kw)
