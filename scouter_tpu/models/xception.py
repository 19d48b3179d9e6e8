"""Xception — capability of ``timm/models/xception.py:51-236``.

Structure: 3x3/2 (pad 0) + 3x3 (pad 0) stem, 12 blocks of depthwise-separable
convs with conv-bn skip projections and optional entry ReLU, 1x1-skip maxpool
downsampling in the entry/exit blocks, then two separable convs (1536, 2048)
before the classifier. Param names mirror torch (block1.rep.1.conv1 ->
block1/rep_1/conv1).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .act import residual_add as _residual_add
from .layers import batch_norm, conv2d, global_avg_pool, head_dropout, max_pool_3x3_s2_p1
from .registry import register_model

__all__ = ["Xception"]


class _SepConv(nn.Module):
    """SeparableConv2d: depthwise (named conv1) + pointwise (xception.py:51-62)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_chs = x.shape[-1]
        x = conv2d(in_chs, self.kernel_size, stride=self.stride, padding=self.padding,
                   groups=in_chs, dtype=self.dtype, name="conv1")(x)
        return conv2d(self.out_channels, 1, padding=0, dtype=self.dtype,
                      name="pointwise")(x)


class _Block(nn.Module):
    """Xception Block (xception.py:65-114). The rep op list is constructed
    exactly like the reference so Sequential param indices line up."""

    in_filters: int
    out_filters: int
    reps: int
    strides: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ops = []  # (kind, out_chs)
        filters = self.in_filters
        if self.grow_first:
            ops += [("relu", None), ("sep", self.out_filters), ("bn", self.out_filters)]
            filters = self.out_filters
        for _ in range(self.reps - 1):
            ops += [("relu", None), ("sep", filters), ("bn", filters)]
        if not self.grow_first:
            ops += [("relu", None), ("sep", self.out_filters), ("bn", self.out_filters)]
        if not self.start_with_relu:
            ops = ops[1:]

        inp = x
        for idx, (kind, out_chs) in enumerate(ops):
            if kind == "relu":
                x = relu(x)
            elif kind == "sep":
                x = _SepConv(out_chs, 3, padding=1, dtype=self.dtype,
                             name=f"rep_{idx}")(x)
            else:
                x = batch_norm(train, dtype=self.dtype, name=f"rep_{idx}")(x)
        if self.strides != 1:
            x = max_pool_3x3_s2_p1(x)

        if self.out_filters != self.in_filters or self.strides != 1:
            skip = conv2d(self.out_filters, 1, stride=self.strides, padding=0,
                          dtype=self.dtype, name="skip")(inp)
            skip = batch_norm(train, dtype=self.dtype, name="skipbn")(skip)
        else:
            skip = inp
        return _residual_add(x, skip)


class Xception(nn.Module):
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        x = conv2d(32, 3, stride=2, padding=0, dtype=d, name="conv1")(x)
        x = relu(batch_norm(train, dtype=d, name="bn1")(x))
        x = conv2d(64, 3, padding=0, dtype=d, name="conv2")(x)
        x = relu(batch_norm(train, dtype=d, name="bn2")(x))

        x = _Block(64, 128, 2, 2, start_with_relu=False, dtype=d, name="block1")(x, train)
        x = _Block(128, 256, 2, 2, dtype=d, name="block2")(x, train)
        x = _Block(256, 728, 2, 2, dtype=d, name="block3")(x, train)
        for i in range(4, 12):
            x = _Block(728, 728, 3, 1, dtype=d, name=f"block{i}")(x, train)
        x = _Block(728, 1024, 2, 2, grow_first=False, dtype=d, name="block12")(x, train)

        x = _SepConv(1536, 3, padding=1, dtype=d, name="conv3")(x)
        x = relu(batch_norm(train, dtype=d, name="bn3")(x))
        x = _SepConv(2048, 3, padding=1, dtype=d, name="conv4")(x)
        x = relu(batch_norm(train, dtype=d, name="bn4")(x))
        if features_only:
            return x
        x = global_avg_pool(x)
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="fc")(x)


@register_model
def xception(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return Xception(num_classes=num_classes, in_chans=in_chans, **kw)
