"""PNASNet-5 Large — capability of ``timm/models/pnasnet.py:38-400``.

Progressive-NAS cells: 5 comb-iters of paired {separable-conv stack, max pool,
relu-conv-bn} branches whose sums are concatenated (:156-184); stem cell plus
12 cells with reduction/zero-pad/factorized-reduction variants wired in the
exact searched topology (:296-345). All BNs use eps 1e-3; the shifted zero-pad
pooling trick (:40-52, :92-97) and the two-path FactorizedReduction (:124-153)
are reproduced exactly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .layers import conv2d, head_dropout
from .registry import register_model

__all__ = ["PNASNet5Large"]


def _bn(train, name, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3,
                        dtype=dtype, name=name)


def _maxpool(x, stride: int, zero_pad: bool):
    """MaxPool(3, stride, padding=1) with the optional shifted zero-pad (:38-52)."""
    if zero_pad:
        x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)])
        return x[:, 1:, 1:, :]
    return nn.max_pool(x, (3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)])


class _SepConv(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_chs = x.shape[-1]
        pad = self.kernel_size // 2
        x = conv2d(in_chs, self.kernel_size, stride=self.stride, padding=pad,
                   groups=in_chs, dtype=self.dtype, name="depthwise_conv2d")(x)
        return conv2d(self.out_channels, 1, padding=0, dtype=self.dtype,
                      name="pointwise_conv2d")(x)


class _BranchSeparables(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int = 1
    stem_cell: bool = False
    zero_pad: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        middle = self.out_channels if self.stem_cell else x.shape[-1]
        x = relu(x)
        if self.zero_pad:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
            x = _SepConv(middle, self.kernel_size, self.stride, dtype=d,
                         name="separable_1")(x)
            x = x[:, 1:, 1:, :]
        else:
            x = _SepConv(middle, self.kernel_size, self.stride, dtype=d,
                         name="separable_1")(x)
        x = _bn(train, "bn_sep_1", d)(x)
        x = relu(x)
        x = _SepConv(self.out_channels, self.kernel_size, 1, dtype=d,
                     name="separable_2")(x)
        return _bn(train, "bn_sep_2", d)(x)


class _ReluConvBn(nn.Module):
    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = relu(x)
        x = conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                   padding=0, dtype=self.dtype, name="conv")(x)
        return _bn(train, "bn", self.dtype)(x)


class _ReductionPath(nn.Module):
    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return conv2d(self.out_channels, 1, padding=0, dtype=self.dtype,
                      name="conv")(x[:, ::2, ::2, :])


class _FactorizedReduction(nn.Module):
    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = relu(x)
        p1 = _ReductionPath(self.out_channels // 2, dtype=d, name="path_1")(x)
        shifted = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
        p2 = _ReductionPath(self.out_channels // 2, dtype=d, name="path_2")(shifted)
        return _bn(train, "final_path_bn", d)(jnp.concatenate([p1, p2], -1))


class _MaxPoolConvBn(nn.Module):
    """comb_iter_0_right of the stem cell: max_pool -> 1x1 conv -> bn (:197-202)."""

    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _maxpool(x, 2, False)
        x = conv2d(self.out_channels, 1, padding=0, dtype=self.dtype, name="conv")(x)
        return _bn(train, "bn", self.dtype)(x)


class _CellStem0(nn.Module):
    out_left: int
    out_right: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_left, train: bool = False):
        d = self.dtype
        x_right = _ReluConvBn(self.out_right, 1, dtype=d, name="conv_1x1")(x_left, train)
        c0 = (_BranchSeparables(self.out_left, 5, 2, stem_cell=True, dtype=d,
                                name="comb_iter_0_left")(x_left, train)
              + _MaxPoolConvBn(self.out_left, dtype=d,
                               name="comb_iter_0_right")(x_left, train))
        c1 = (_BranchSeparables(self.out_right, 7, 2, dtype=d,
                                name="comb_iter_1_left")(x_right, train)
              + _maxpool(x_right, 2, False))
        c2 = (_BranchSeparables(self.out_right, 5, 2, dtype=d,
                                name="comb_iter_2_left")(x_right, train)
              + _BranchSeparables(self.out_right, 3, 2, dtype=d,
                                  name="comb_iter_2_right")(x_right, train))
        c3 = (_BranchSeparables(self.out_right, 3, 1, dtype=d,
                                name="comb_iter_3_left")(c2, train)
              + _maxpool(x_right, 2, False))
        c4 = (_BranchSeparables(self.out_right, 3, 2, stem_cell=True, dtype=d,
                                name="comb_iter_4_left")(x_left, train)
              + _ReluConvBn(self.out_right, 1, 2, dtype=d,
                            name="comb_iter_4_right")(x_right, train))
        return jnp.concatenate([c0, c1, c2, c3, c4], -1)


class _PCell(nn.Module):
    out_left: int
    out_right: int
    is_reduction: bool = False
    zero_pad: bool = False
    match_prev: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_left, x_right, train: bool = False):
        d = self.dtype
        stride = 2 if self.is_reduction else 1
        zp = self.zero_pad
        if self.match_prev:
            x_left = _FactorizedReduction(self.out_left, dtype=d,
                                          name="conv_prev_1x1")(x_left, train)
        else:
            x_left = _ReluConvBn(self.out_left, 1, dtype=d,
                                 name="conv_prev_1x1")(x_left, train)
        x_right = _ReluConvBn(self.out_right, 1, dtype=d, name="conv_1x1")(x_right, train)

        c0 = (_BranchSeparables(self.out_left, 5, stride, zero_pad=zp, dtype=d,
                                name="comb_iter_0_left")(x_left, train)
              + _maxpool(x_left, stride, zp))
        c1 = (_BranchSeparables(self.out_right, 7, stride, zero_pad=zp, dtype=d,
                                name="comb_iter_1_left")(x_right, train)
              + _maxpool(x_right, stride, zp))
        c2 = (_BranchSeparables(self.out_right, 5, stride, zero_pad=zp, dtype=d,
                                name="comb_iter_2_left")(x_right, train)
              + _BranchSeparables(self.out_right, 3, stride, zero_pad=zp, dtype=d,
                                  name="comb_iter_2_right")(x_right, train))
        c3 = (_BranchSeparables(self.out_right, 3, 1, dtype=d,
                                name="comb_iter_3_left")(c2, train)
              + _maxpool(x_right, stride, zp))
        c4_left = _BranchSeparables(self.out_left, 3, stride, zero_pad=zp, dtype=d,
                                    name="comb_iter_4_left")(x_left, train)
        if self.is_reduction:
            c4_right = _ReluConvBn(self.out_right, 1, stride, dtype=d,
                                   name="comb_iter_4_right")(x_right, train)
        else:
            c4_right = x_right
        c4 = c4_left + c4_right
        return jnp.concatenate([c0, c1, c2, c3, c4], -1)


class PNASNet5Large(nn.Module):
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.5
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype

        class _Conv0(nn.Module):
            @nn.compact
            def __call__(self2, v, train=False):
                v = conv2d(96, 3, stride=2, padding=0, dtype=d, name="conv")(v)
                return _bn(train, "bn", d)(v)

        x_conv_0 = _Conv0(name="conv_0")(x, train)
        x_stem_0 = _CellStem0(54, 54, dtype=d, name="cell_stem_0")(x_conv_0, train)
        x_stem_1 = _PCell(108, 108, is_reduction=True, match_prev=True, dtype=d,
                          name="cell_stem_1")(x_conv_0, x_stem_0, train)
        prev, cur = x_stem_0, x_stem_1
        specs = [
            dict(out=216, match_prev=True), dict(out=216), dict(out=216), dict(out=216),
            dict(out=432, is_reduction=True, zero_pad=True),
            dict(out=432, match_prev=True), dict(out=432), dict(out=432),
            dict(out=864, is_reduction=True),
            dict(out=864, match_prev=True), dict(out=864), dict(out=864),
        ]
        for i, spec in enumerate(specs):
            out = spec.pop("out")
            nxt = _PCell(out, out, dtype=d, name=f"cell_{i}", **spec)(prev, cur, train)
            prev, cur = cur, nxt
        x = relu(cur)
        if features_only:
            return x
        x = x.mean(axis=(1, 2))
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="last_linear")(x)


@register_model
def pnasnet5large(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return PNASNet5Large(num_classes=num_classes, in_chans=in_chans, **kw)
