"""Gluon (Aligned) Xception-65 — capability of
``timm/models/gluon_xception.py:83-306``.

SeparableConv2d = depthwise conv -> BN -> pointwise (:83-113); Blocks build an
ordered act/conv/bn rep list with conv-bn skip projections (:115-175); entry
flow (blocks 1-3), 16 middle-flow blocks, exit block20 + three separable convs
(1536/1536/2048) (:178-296). Param paths mirror torch
(block1/rep/conv1/{conv_dw,bn,conv_pw}, mid/block4/..., conv5, fc).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .act import residual_add as _residual_add
from .layers import batch_norm, conv2d, global_avg_pool, head_dropout
from .registry import register_model

__all__ = ["Xception65"]


class _SepConv(nn.Module):
    """depthwise(conv_dw) -> bn -> pointwise(conv_pw) (:83-113)."""

    planes: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        pad = ((self.stride - 1) + self.dilation * (self.kernel_size - 1)) // 2
        x = conv2d(in_chs, self.kernel_size, stride=self.stride, padding=pad,
                   dilation=self.dilation, groups=in_chs, dtype=self.dtype,
                   name="conv_dw")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn")(x)
        return conv2d(self.planes, 1, padding=0, dtype=self.dtype, name="conv_pw")(x)


class _Skip(nn.Module):
    planes: int
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.planes, 1, stride=self.stride, padding=0, dtype=self.dtype,
                   name="conv1")(x)
        return batch_norm(train, dtype=self.dtype, name="bn1")(x)


class _Rep(nn.Module):
    """The ordered rep list with torch's actN/convN/bnN numbering (:126-165)."""

    inplanes: int
    planes: int
    num_reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        ops = []  # (kind, index, planes, stride, dilation)
        l = 1
        filters = self.inplanes
        if self.grow_first:
            if self.start_with_relu:
                ops.append(("act", l, None, 1, 1))
            ops.append(("conv", l, self.planes, 1, self.dilation))
            ops.append(("bn", l, self.planes, 1, 1))
            filters = self.planes
            l += 1
        for _ in range(self.num_reps - 1):
            if self.grow_first or self.start_with_relu:
                ops.append(("act", l, None, 1, 1))
            ops.append(("conv", l, filters, 1, self.dilation))
            ops.append(("bn", l, filters, 1, 1))
            l += 1
        if not self.grow_first:
            ops.append(("act", l, None, 1, 1))
            ops.append(("conv", l, self.planes, 1, self.dilation))
            ops.append(("bn", l, self.planes, 1, 1))
            l += 1
        if self.stride != 1:
            ops.append(("act", l, None, 1, 1))
            ops.append(("conv", l, self.planes, self.stride, 1))
            ops.append(("bn", l, self.planes, 1, 1))
            l += 1
        elif self.is_last:
            ops.append(("act", l, None, 1, 1))
            ops.append(("conv", l, self.planes, 1, self.dilation))
            ops.append(("bn", l, self.planes, 1, 1))
            l += 1

        for kind, idx, planes, stride, dil in ops:
            if kind == "act":
                x = relu(x)
            elif kind == "conv":
                x = _SepConv(planes, 3, stride, dil, dtype=d, name=f"conv{idx}")(x, train)
            else:
                x = batch_norm(train, dtype=d, name=f"bn{idx}")(x)
        return x


class _Block(nn.Module):
    inplanes: int
    planes: int
    num_reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x
        if self.planes != self.inplanes or self.stride != 1:
            skip = _Skip(self.planes, self.stride, dtype=self.dtype, name="skip")(x, train)
        out = _Rep(self.inplanes, self.planes, self.num_reps, self.stride,
                   self.dilation, self.start_with_relu, self.grow_first,
                   self.is_last, dtype=self.dtype, name="rep")(x, train)
        return _residual_add(out, skip)


class Xception65(nn.Module):
    """Modified Aligned Xception-65; ``deep_entry`` switches the entry flow to
    the Xception-71 three-block Sequential (gluon_xception.py:308-360)."""

    num_classes: int = 1000
    in_chans: int = 3
    deep_entry: bool = False
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        x = conv2d(32, 3, stride=2, padding=1, dtype=d, name="conv1")(x)
        x = relu(batch_norm(train, dtype=d, name="bn1")(x))
        x = conv2d(64, 3, padding=1, dtype=d, name="conv2")(x)
        x = relu(batch_norm(train, dtype=d, name="bn2")(x))

        x = _Block(64, 128, 2, 2, start_with_relu=False, dtype=d, name="block1")(x, train)
        x = relu(x)
        if self.deep_entry:
            x = _Block(128, 256, 2, 1, start_with_relu=False, dtype=d,
                       name="block2_0")(x, train)
            x = _Block(256, 256, 2, 2, start_with_relu=False, dtype=d,
                       name="block2_1")(x, train)
            x = _Block(256, 728, 2, 2, start_with_relu=False, dtype=d,
                       name="block2_2")(x, train)
        else:
            x = _Block(128, 256, 2, 2, start_with_relu=False, dtype=d, name="block2")(x, train)
        x = _Block(256, 728, 2, 2, is_last=True, dtype=d, name="block3")(x, train)

        class _Mid(nn.Module):
            @nn.compact
            def __call__(self2, v, train=False):
                for i in range(4, 20):
                    v = _Block(728, 728, 3, 1, dtype=d, name=f"block{i}")(v, train)
                return v

        x = _Mid(name="mid")(x, train)
        x = _Block(728, 1024, 2, 2, grow_first=False, is_last=True, dtype=d,
                   name="block20")(x, train)
        x = relu(x)
        x = _SepConv(1536, 3, dtype=d, name="conv3")(x, train)
        x = relu(batch_norm(train, dtype=d, name="bn3")(x))
        x = _SepConv(1536, 3, dtype=d, name="conv4")(x, train)
        x = relu(batch_norm(train, dtype=d, name="bn4")(x))
        x = _SepConv(2048, 3, dtype=d, name="conv5")(x, train)
        x = relu(batch_norm(train, dtype=d, name="bn5")(x))
        if features_only:
            return x
        x = global_avg_pool(x)
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="fc")(x)


@register_model
def gluon_xception65(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return Xception65(num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def gluon_xception71(num_classes=1000, in_chans=3, **kw):
    """Modified Aligned Xception-71 (gluon_xception.py:462-470)."""
    kw.pop("mnist_stem", None)
    return Xception65(num_classes=num_classes, in_chans=in_chans,
                      deep_entry=True, **kw)
