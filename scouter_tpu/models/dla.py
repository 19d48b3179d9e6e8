"""DLA (Deep Layer Aggregation) — capability of ``timm/models/dla.py:51-470``.

Recursive aggregation trees (DlaTree :206-254) over basic / bottleneck /
bottle2neck blocks (:51-184), 1x1 DlaRoot fusion nodes (:186-203), conv-level
stems (:292-301), and a 1x1-conv classifier (:282). Entrypoints cover dla34,
dla46_c, dla60, dla102, and the res2net/res2next variants.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .act import residual_add as _residual_add
from .layers import avg_pool_include_pad, batch_norm, conv2d, head_dropout
from .registry import register_model

__all__ = ["DLA"]


class _DlaBasic(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    cardinality: int = 1
    base_width: int = 64
    scale: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = conv2d(self.planes, 3, stride=self.stride, padding=self.dilation,
                     dilation=self.dilation, dtype=self.dtype, name="conv1")(x)
        out = relu(batch_norm(train, dtype=self.dtype, name="bn1")(out))
        out = conv2d(self.planes, 3, padding=self.dilation, dilation=self.dilation,
                     dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn2")(out)
        return relu(_residual_add(out, residual))


class _DlaBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    cardinality: int = 1
    base_width: int = 64
    scale: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        mid = int(math.floor(self.planes * (self.base_width / 64)) * self.cardinality) // 2
        out = conv2d(mid, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        out = relu(batch_norm(train, dtype=self.dtype, name="bn1")(out))
        out = conv2d(mid, 3, stride=self.stride, padding=self.dilation,
                     dilation=self.dilation, groups=self.cardinality,
                     dtype=self.dtype, name="conv2")(out)
        out = relu(batch_norm(train, dtype=self.dtype, name="bn2")(out))
        out = conv2d(self.planes, 1, padding=0, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn3")(out)
        return relu(_residual_add(out, residual))


class _DlaBottle2neck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    cardinality: int = 8
    base_width: int = 4
    scale: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        is_first = self.stride > 1
        mid = int(math.floor(self.planes * (self.base_width / 64)) * self.cardinality) // 2
        num_scales = max(1, self.scale - 1)
        out = conv2d(mid * self.scale, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        out = relu(batch_norm(train, dtype=self.dtype, name="bn1")(out))
        splits = [out[..., i * mid:(i + 1) * mid] for i in range(self.scale)]
        outs = []
        sp = None
        for i in range(num_scales):
            sp = splits[i] if (i == 0 or is_first) else sp + splits[i]
            sp = conv2d(mid, 3, stride=self.stride, padding=self.dilation,
                        dilation=self.dilation, groups=self.cardinality,
                        dtype=self.dtype, name=f"convs_{i}")(sp)
            sp = relu(batch_norm(train, dtype=self.dtype, name=f"bns_{i}")(sp))
            outs.append(sp)
        if self.scale > 1:
            last = splits[-1]
            if is_first:
                last = avg_pool_include_pad(last, 3, self.stride, 1)
            outs.append(last)
        out = jnp.concatenate(outs, axis=-1)
        out = conv2d(self.planes, 1, padding=0, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn3")(out)
        return relu(_residual_add(out, residual))


_DLA_BLOCKS = {"basic": _DlaBasic, "bottleneck": _DlaBottleneck,
               "bottle2neck": _DlaBottle2neck}


class _DlaRoot(nn.Module):
    out_channels: int
    residual: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = conv2d(self.out_channels, 1, padding=0, dtype=self.dtype, name="conv")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn")(x)
        if self.residual:
            x = x + children[0]
        return relu(x)


class _DlaTree(nn.Module):
    levels: int
    block: str
    in_channels: int
    out_channels: int
    stride: int = 1
    cardinality: int = 1
    base_width: int = 64
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        d = self.dtype
        children = [] if children is None else children
        root_dim = 2 * self.out_channels if self.root_dim == 0 else self.root_dim
        if self.level_root:
            root_dim += self.in_channels

        bottom = (nn.max_pool(x, (self.stride, self.stride),
                              strides=(self.stride, self.stride))
                  if self.stride > 1 else x)
        if self.in_channels != self.out_channels:
            res = conv2d(self.out_channels, 1, padding=0, dtype=d, name="project_0")(bottom)
            res = batch_norm(train, dtype=d, name="project_1")(res)
        else:
            res = bottom
        if self.level_root:
            children.append(bottom)

        block_cls = _DLA_BLOCKS[self.block]
        bargs = dict(cardinality=self.cardinality, base_width=self.base_width, dtype=d)
        if self.levels == 1:
            x1 = block_cls(self.out_channels, self.stride, **bargs, name="tree1")(
                x, res, train)
            x2 = block_cls(self.out_channels, 1, **bargs, name="tree2")(x1, None, train)
            return _DlaRoot(self.out_channels, self.root_residual, dtype=d,
                            name="root")([x2, x1] + children, train)
        x1 = _DlaTree(
            self.levels - 1, self.block, self.in_channels, self.out_channels,
            self.stride, self.cardinality, self.base_width, root_dim=0,
            root_residual=self.root_residual, dtype=d, name="tree1",
        )(x, res, None, train)
        children.append(x1)
        return _DlaTree(
            self.levels - 1, self.block, self.out_channels, self.out_channels, 1,
            self.cardinality, self.base_width,
            root_dim=root_dim + self.out_channels,
            root_residual=self.root_residual, dtype=d, name="tree2",
        )(x1, None, children, train)


class DLA(nn.Module):
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    block: str = "basic"
    cardinality: int = 1
    base_width: int = 64
    residual_root: bool = False
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        ch = self.channels
        x = conv2d(ch[0], 7, padding=3, dtype=d, name="base_layer_0")(x)
        x = relu(batch_norm(train, dtype=d, name="base_layer_1")(x))

        # conv levels (dla.py:292-301): Sequential indices 0,1 / 3,4 / ...
        def conv_level(x, planes, convs, stride, base):
            for i in range(convs):
                x = conv2d(planes, 3, stride=stride if i == 0 else 1, padding=1,
                           dtype=d, name=f"{base}_{i * 3}")(x)
                x = relu(batch_norm(train, dtype=d, name=f"{base}_{i * 3 + 1}")(x))
            return x

        x = conv_level(x, ch[0], self.levels[0], 1, "level0")
        x = conv_level(x, ch[1], self.levels[1], 2, "level1")

        targs = dict(block=self.block, cardinality=self.cardinality,
                     base_width=self.base_width, root_residual=self.residual_root,
                     dtype=d)
        x = _DlaTree(self.levels[2], in_channels=ch[1], out_channels=ch[2], stride=2,
                     level_root=False, **targs, name="level2")(x, train=train)
        x = _DlaTree(self.levels[3], in_channels=ch[2], out_channels=ch[3], stride=2,
                     level_root=True, **targs, name="level3")(x, train=train)
        x = _DlaTree(self.levels[4], in_channels=ch[3], out_channels=ch[4], stride=2,
                     level_root=True, **targs, name="level4")(x, train=train)
        x = _DlaTree(self.levels[5], in_channels=ch[4], out_channels=ch[5], stride=2,
                     level_root=True, **targs, name="level5")(x, train=train)
        if features_only:
            return x
        pooled = x.mean(axis=(1, 2), keepdims=True)
        pooled = head_dropout(pooled, self.drop_rate, train)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=True, dtype=d, name="fc")(pooled)
        return out.reshape(out.shape[0], -1)


def _dla(num_classes, in_chans, **kw):
    kw.pop("mnist_stem", None)
    return DLA(num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def dla34(num_classes=1000, in_chans=3, **kw):
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 2, 2, 1),
                channels=(16, 32, 64, 128, 256, 512), block="basic", **kw)


@register_model
def dla46_c(num_classes=1000, in_chans=3, **kw):
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 2, 2, 1),
                channels=(16, 32, 64, 64, 128, 256), block="bottleneck", **kw)


@register_model
def dla60(num_classes=1000, in_chans=3, **kw):
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 2, 3, 1),
                channels=(16, 32, 128, 256, 512, 1024), block="bottleneck", **kw)


@register_model
def dla102(num_classes=1000, in_chans=3, **kw):
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 3, 4, 1),
                channels=(16, 32, 128, 256, 512, 1024), block="bottleneck",
                residual_root=True, **kw)


@register_model
def dla60_res2net(num_classes=1000, in_chans=3, **kw):
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 2, 3, 1),
                channels=(16, 32, 128, 256, 512, 1024), block="bottle2neck",
                cardinality=1, base_width=28, **kw)


@register_model
def dla60_res2next(num_classes=1000, in_chans=3, **kw):
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 2, 3, 1),
                channels=(16, 32, 128, 256, 512, 1024), block="bottle2neck",
                cardinality=8, base_width=4, **kw)


@register_model
def dla46x_c(num_classes=1000, in_chans=3, **kw):
    """DLA-X-46-C (timm/models/dla.py:381-389)."""
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 2, 2, 1),
                channels=(16, 32, 64, 64, 128, 256), block="bottleneck",
                cardinality=32, base_width=4, **kw)


@register_model
def dla60x_c(num_classes=1000, in_chans=3, **kw):
    """DLA-X-60-C (dla.py:393-401)."""
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 2, 3, 1),
                channels=(16, 32, 64, 64, 128, 256), block="bottleneck",
                cardinality=32, base_width=4, **kw)


@register_model
def dla60x(num_classes=1000, in_chans=3, **kw):
    """DLA-X-60 (dla.py:416-424)."""
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 2, 3, 1),
                channels=(16, 32, 128, 256, 512, 1024), block="bottleneck",
                cardinality=32, base_width=4, **kw)


@register_model
def dla102x(num_classes=1000, in_chans=3, **kw):
    """DLA-X-102 (dla.py:440-448)."""
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 3, 4, 1),
                channels=(16, 32, 128, 256, 512, 1024), block="bottleneck",
                cardinality=32, base_width=4, residual_root=True, **kw)


@register_model
def dla102x2(num_classes=1000, in_chans=3, **kw):
    """DLA-X-102 64 (dla.py:452-460)."""
    return _dla(num_classes, in_chans, levels=(1, 1, 1, 3, 4, 1),
                channels=(16, 32, 128, 256, 512, 1024), block="bottleneck",
                cardinality=64, base_width=4, residual_root=True, **kw)


@register_model
def dla169(num_classes=1000, in_chans=3, **kw):
    """DLA-169 (dla.py:464-472)."""
    return _dla(num_classes, in_chans, levels=(1, 1, 2, 3, 5, 1),
                channels=(16, 32, 128, 256, 512, 1024), block="bottleneck",
                residual_root=True, **kw)
