"""TResNet family — capability of ``timm/models/tresnet.py``.

Architecture facts (cited): SpaceToDepth(4) stem feeding a 3x3 conv on 16x
channels (tresnet.py:272-276, space_to_depth.py:5-16); conv+InplaceABN units
(BN then leaky-relu, slope 1e-3 in blocks) (:95-100, inplace_abn.py:19-60);
anti-aliased stride-2 via a fixed [1,2,1] blur filter with reflect padding
(anti_aliasing.py:20-60); BasicBlock stages 1-2 and Bottleneck stages 3-4 with
Fast-SE (SE on bottleneck mid channels, reduce max(c/8, 64)) (:103-188);
avg-pool(+1x1 iabn-identity) downsample (:252-260).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import avg_pool_ceil_exclude_pad, conv2d, global_avg_pool, head_dropout
from .registry import register_model

__all__ = ["TResNet"]


def space_to_depth(x: jnp.ndarray, bs: int = 4) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/4, W/4, 16C) with torch's channel order
    (bs, bs, C) flattened channel-first style (space_to_depth.py:11-16)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // bs, bs, w // bs, bs, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (N, H/bs, W/bs, bs, bs, C)
    return x.reshape(n, h // bs, w // bs, bs * bs * c)


def aa_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """Anti-alias stride-2: reflect pad 1 + depthwise [1,2,1]^2/16 blur, s2."""
    c = x.shape[-1]
    f1 = jnp.asarray([1.0, 2.0, 1.0])
    filt = (f1[:, None] * f1[None, :]) / 16.0
    kernel = filt[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def _iabn(parent, x, name: str, train: bool, act: str = "leaky_relu",
          slope: float = 1e-2, dtype=None):
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     dtype=dtype, name=name)(x)
    if act == "leaky_relu":
        return jnp.where(x >= 0, x, slope * x)
    return x  # identity


class _FastSE(nn.Module):
    channels: int
    reduction_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduction_channels, (1, 1), use_bias=True, dtype=self.dtype,
                    name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class _Downsample(nn.Module):
    out_chs: int
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 2:
            x = avg_pool_ceil_exclude_pad(x, 2, 2)
        x = conv2d(self.out_chs, 1, padding=0, dtype=self.dtype,
                   name="downsample_1_0")(x)
        return _iabn(self, x, "downsample_1_1", train, act="identity", dtype=self.dtype)


class _TBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_se: bool = True
    has_downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        residual = (_Downsample(self.planes, self.stride, dtype=d, name="downsample")(x, train)
                    if self.has_downsample else x)
        if self.stride == 1:
            out = conv2d(self.planes, 3, padding=1, dtype=d, name="conv1_0")(x)
            out = _iabn(self, out, "conv1_1", train, slope=1e-3, dtype=d)
        else:
            out = conv2d(self.planes, 3, padding=1, dtype=d, name="conv1_0_0")(x)
            out = _iabn(self, out, "conv1_0_1", train, slope=1e-3, dtype=d)
            out = aa_downsample(out)
        out = conv2d(self.planes, 3, padding=1, dtype=d, name="conv2_0")(out)
        out = _iabn(self, out, "conv2_1", train, act="identity", dtype=d)
        if self.use_se:
            reduce = max(self.planes // 4, 64)
            out = _FastSE(self.planes, reduce, dtype=d, name="se")(out)
        return jax.nn.relu(out + residual)


class _TBottleneck(nn.Module):
    planes: int
    stride: int = 1
    use_se: bool = True
    has_downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        outplanes = self.planes * 4
        residual = (_Downsample(outplanes, self.stride, dtype=d, name="downsample")(x, train)
                    if self.has_downsample else x)
        out = conv2d(self.planes, 1, padding=0, dtype=d, name="conv1_0")(x)
        out = _iabn(self, out, "conv1_1", train, slope=1e-3, dtype=d)
        if self.stride == 1:
            out = conv2d(self.planes, 3, padding=1, dtype=d, name="conv2_0")(out)
            out = _iabn(self, out, "conv2_1", train, slope=1e-3, dtype=d)
        else:
            out = conv2d(self.planes, 3, padding=1, dtype=d, name="conv2_0_0")(out)
            out = _iabn(self, out, "conv2_0_1", train, slope=1e-3, dtype=d)
            out = aa_downsample(out)
        if self.use_se:
            reduce = max(outplanes // 8, 64)
            out = _FastSE(self.planes, reduce, dtype=d, name="se")(out)
        out = conv2d(outplanes, 1, padding=0, dtype=d, name="conv3_0")(out)
        out = _iabn(self, out, "conv3_1", train, act="identity", dtype=d)
        return jax.nn.relu(out + residual)


class _Body(nn.Module):
    layers: Sequence[int]
    planes: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = space_to_depth(x)
        x = conv2d(self.planes, 3, padding=1, dtype=d, name="conv1_0")(x)
        x = _iabn(self, x, "conv1_1", train, dtype=d)

        specs = [
            ("layer1", _TBasicBlock, self.planes, 1, True, 1),
            ("layer2", _TBasicBlock, self.planes * 2, 2, True, 1),
            ("layer3", _TBottleneck, self.planes * 4, 2, True, 4),
            ("layer4", _TBottleneck, self.planes * 8, 2, False, 4),
        ]
        current = self.planes
        for (lname, cls, planes, stride, use_se, expansion), depth in zip(specs, self.layers):
            for i in range(depth):
                s = stride if i == 0 else 1
                needs = i == 0 and (s != 1 or current != planes * expansion)
                x = cls(planes, s, use_se, needs, dtype=d,
                        name=f"{lname}_{i}")(x, train)
                current = planes * expansion
        return x


class TResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 11, 3)
    width_factor: float = 1.0
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        planes = int(64 * self.width_factor)
        feats = _Body(self.layers, planes, dtype=self.dtype, name="body")(x, train)
        if features_only:
            return feats

        outer_drop = self.drop_rate

        class _Head(nn.Module):
            num_classes: int

            @nn.compact
            def __call__(self, v):
                v = head_dropout(v, outer_drop, train)
                return nn.Dense(self.num_classes, name="fc")(v)

        return _Head(self.num_classes, name="head")(global_avg_pool(feats))


@register_model
def tresnet_m(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return TResNet(layers=(3, 4, 11, 3), num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def tresnet_l(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return TResNet(layers=(4, 5, 18, 3), width_factor=1.2, num_classes=num_classes,
                   in_chans=in_chans, **kw)


@register_model
def tresnet_xl(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return TResNet(layers=(4, 5, 24, 3), width_factor=1.3, num_classes=num_classes,
                   in_chans=in_chans, **kw)


@register_model
def tresnet_m_448(num_classes=1000, in_chans=3, **kw):
    """448px-eval weights twin of tresnet_m (timm tresnet.py:323-329)."""
    kw.pop("mnist_stem", None)
    return TResNet(layers=(3, 4, 11, 3), num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def tresnet_l_448(num_classes=1000, in_chans=3, **kw):
    """448px-eval weights twin of tresnet_l (tresnet.py:333-339)."""
    kw.pop("mnist_stem", None)
    return TResNet(layers=(4, 5, 18, 3), width_factor=1.2, num_classes=num_classes,
                   in_chans=in_chans, **kw)


@register_model
def tresnet_xl_448(num_classes=1000, in_chans=3, **kw):
    """448px-eval weights twin of tresnet_xl (tresnet.py:343-349)."""
    kw.pop("mnist_stem", None)
    return TResNet(layers=(4, 5, 24, 3), width_factor=1.3, num_classes=num_classes,
                   in_chans=in_chans, **kw)
