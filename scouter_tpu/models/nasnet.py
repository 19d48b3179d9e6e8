"""NASNet-A Large — capability of ``timm/models/nasnet.py:27-621``.

The searched NASNet-A cell set: stem cells with asymmetric comb-iters
(:131-252), First/Normal cells with two-path factorized left input (:254-375),
two reduction cell variants with shifted zero-pad pooling (:27-52, :376-484),
wired 6-at-4032 (:486-556). All BNs eps 1e-3; avg pools exclude padding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .layers import conv2d, head_dropout
from .registry import register_model

__all__ = ["NASNetALarge"]


def _bn(train, name, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3,
                        dtype=dtype, name=name)


def _avgpool_nopad(x, stride: int, window: int = 3, pad: int = 1):
    """AvgPool2d(3, stride, 1, count_include_pad=False)."""
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = jax.lax.reduce_window(x, jnp.array(0.0, x.dtype), jax.lax.add,
                                   dims, strides, padding)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(ones, jnp.array(0.0, x.dtype), jax.lax.add,
                                   dims, strides, padding)
    return summed / counts


def _maxpool(x, stride: int = 2):
    return nn.max_pool(x, (3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)])


def _maxpool_pad(x):
    """MaxPoolPad (:27-38): shift-pad, pool, crop."""
    x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    x = _maxpool(x, 2)
    return x[:, 1:, 1:, :]


def _avgpool_pad(x):
    """AvgPoolPad (:41-52)."""
    x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    x = _avgpool_nopad(x, 2)
    return x[:, 1:, 1:, :]


class _SepConv(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_chs = x.shape[-1]
        x = conv2d(in_chs, self.kernel_size, stride=self.stride, padding=self.padding,
                   groups=in_chs, dtype=self.dtype, name="depthwise_conv2d")(x)
        return conv2d(self.out_channels, 1, padding=0, dtype=self.dtype,
                      name="pointwise_conv2d")(x)


class _BranchSeparables(nn.Module):
    """relu-sep-bn-relu-sep-bn; `stem` keeps input chans in sep1's depthwise and
    projects to out; `reduction` applies the shifted zero-pad trick (:71-129)."""

    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    stem: bool = False
    reduction: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        mid = self.out_channels if self.stem else x.shape[-1]
        x = relu(x)
        if self.reduction:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
            x = _SepConv(mid, self.kernel_size, self.stride, self.padding, dtype=d,
                         name="separable_1")(x)
            x = x[:, 1:, 1:, :]
        else:
            x = _SepConv(mid, self.kernel_size, self.stride, self.padding, dtype=d,
                         name="separable_1")(x)
        x = _bn(train, "bn_sep_1", d)(x)
        x = relu(x)
        x = _SepConv(self.out_channels, self.kernel_size, 1, self.padding, dtype=d,
                     name="separable_2")(x)
        return _bn(train, "bn_sep_2", d)(x)


class _ReluConvBn(nn.Module):
    """conv_1x1 Sequential(relu, conv, bn)."""

    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = relu(x)
        x = conv2d(self.out_channels, 1, padding=0, dtype=self.dtype, name="conv")(x)
        return _bn(train, "bn", self.dtype)(x)


class _Path(nn.Module):
    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return conv2d(self.out_channels, 1, padding=0, dtype=self.dtype,
                      name="conv")(x[:, ::2, ::2, :])


def _two_path_left(parent, x_prev, out_channels, train, dtype):
    """relu -> {subsample conv, shifted subsample conv} -> concat -> bn
    (CellStem1/FirstCell left path, :197-230, :263-297)."""
    x_relu = relu(x_prev)
    p1 = _Path(out_channels, dtype=dtype, name="path_1")(x_relu)
    shifted = jnp.pad(x_relu, ((0, 0), (0, 1), (0, 1), (0, 0)))[:, 1:, 1:, :]
    p2 = _Path(out_channels, dtype=dtype, name="path_2")(shifted)
    return _bn(train, "final_path_bn", dtype)(jnp.concatenate([p1, p2], -1))


class _CellStem0(nn.Module):
    num_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, c = self.dtype, self.num_channels
        x1 = _ReluConvBn(c, dtype=d, name="conv_1x1")(x, train)
        c0 = (_BranchSeparables(c, 5, 2, 2, dtype=d, name="comb_iter_0_left")(x1, train)
              + _BranchSeparables(c, 7, 2, 3, stem=True, dtype=d,
                                  name="comb_iter_0_right")(x, train))
        c1 = (_maxpool(x1, 2)
              + _BranchSeparables(c, 7, 2, 3, stem=True, dtype=d,
                                  name="comb_iter_1_right")(x, train))
        c2 = (_avgpool_nopad(x1, 2)
              + _BranchSeparables(c, 5, 2, 2, stem=True, dtype=d,
                                  name="comb_iter_2_right")(x, train))
        c3 = _avgpool_nopad(c0, 1) + c1
        c4 = (_BranchSeparables(c, 3, 1, 1, dtype=d, name="comb_iter_4_left")(c0, train)
              + _maxpool(x1, 2))
        return jnp.concatenate([c1, c2, c3, c4], -1)


class _CellStem1(nn.Module):
    num_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_conv0, x_stem_0, train: bool = False):
        d, c = self.dtype, self.num_channels
        x_left = _ReluConvBn(c, dtype=d, name="conv_1x1")(x_stem_0, train)
        x_right = _two_path_left(self, x_conv0, c // 2, train, d)

        c0 = (_BranchSeparables(c, 5, 2, 2, dtype=d, name="comb_iter_0_left")(x_left, train)
              + _BranchSeparables(c, 7, 2, 3, dtype=d, name="comb_iter_0_right")(x_right, train))
        c1 = (_maxpool(x_left, 2)
              + _BranchSeparables(c, 7, 2, 3, dtype=d, name="comb_iter_1_right")(x_right, train))
        c2 = (_avgpool_nopad(x_left, 2)
              + _BranchSeparables(c, 5, 2, 2, dtype=d, name="comb_iter_2_right")(x_right, train))
        c3 = _avgpool_nopad(c0, 1) + c1
        c4 = (_BranchSeparables(c, 3, 1, 1, dtype=d, name="comb_iter_4_left")(c0, train)
              + _maxpool(x_left, 2))
        return jnp.concatenate([c1, c2, c3, c4], -1)


class _FirstCell(nn.Module):
    out_left: int
    out_right: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_prev, train: bool = False):
        d = self.dtype
        x_left = _two_path_left(self, x_prev, self.out_left, train, d)
        x_right = _ReluConvBn(self.out_right, dtype=d, name="conv_1x1")(x, train)
        r = self.out_right
        c0 = (_BranchSeparables(r, 5, 1, 2, dtype=d, name="comb_iter_0_left")(x_right, train)
              + _BranchSeparables(r, 3, 1, 1, dtype=d, name="comb_iter_0_right")(x_left, train))
        c1 = (_BranchSeparables(r, 5, 1, 2, dtype=d, name="comb_iter_1_left")(x_left, train)
              + _BranchSeparables(r, 3, 1, 1, dtype=d, name="comb_iter_1_right")(x_left, train))
        c2 = _avgpool_nopad(x_right, 1) + x_left
        c3 = _avgpool_nopad(x_left, 1) + _avgpool_nopad(x_left, 1)
        c4 = (_BranchSeparables(r, 3, 1, 1, dtype=d, name="comb_iter_4_left")(x_right, train)
              + x_right)
        return jnp.concatenate([x_left, c0, c1, c2, c3, c4], -1)


class _NormalCell(nn.Module):
    out_left: int
    out_right: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_prev, train: bool = False):
        d = self.dtype
        x_left = _ReluConvBn(self.out_left, dtype=d, name="conv_prev_1x1")(x_prev, train)
        x_right = _ReluConvBn(self.out_right, dtype=d, name="conv_1x1")(x, train)
        l, r = self.out_left, self.out_right
        c0 = (_BranchSeparables(r, 5, 1, 2, dtype=d, name="comb_iter_0_left")(x_right, train)
              + _BranchSeparables(l, 3, 1, 1, dtype=d, name="comb_iter_0_right")(x_left, train))
        c1 = (_BranchSeparables(l, 5, 1, 2, dtype=d, name="comb_iter_1_left")(x_left, train)
              + _BranchSeparables(l, 3, 1, 1, dtype=d, name="comb_iter_1_right")(x_left, train))
        c2 = _avgpool_nopad(x_right, 1) + x_left
        c3 = _avgpool_nopad(x_left, 1) + _avgpool_nopad(x_left, 1)
        c4 = (_BranchSeparables(r, 3, 1, 1, dtype=d, name="comb_iter_4_left")(x_right, train)
              + x_right)
        return jnp.concatenate([x_left, c0, c1, c2, c3, c4], -1)


class _ReductionCell(nn.Module):
    out_left: int
    out_right: int
    pad_variant: bool  # ReductionCell0 uses the shifted-pad branches (:376-429)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_prev, train: bool = False):
        d = self.dtype
        x_left = _ReluConvBn(self.out_left, dtype=d, name="conv_prev_1x1")(x_prev, train)
        x_right = _ReluConvBn(self.out_right, dtype=d, name="conv_1x1")(x, train)
        r = self.out_right
        red = self.pad_variant

        def branch(name, k, s, p, inp):
            return _BranchSeparables(r, k, s, p, reduction=red, dtype=d,
                                     name=name)(inp, train)

        mp = _maxpool_pad if red else (lambda v: _maxpool(v, 2))
        ap = _avgpool_pad if red else (lambda v: _avgpool_nopad(v, 2))

        c0 = branch("comb_iter_0_left", 5, 2, 2, x_right) + branch(
            "comb_iter_0_right", 7, 2, 3, x_left)
        c1 = mp(x_right) + branch("comb_iter_1_right", 7, 2, 3, x_left)
        c2 = ap(x_right) + branch("comb_iter_2_right", 5, 2, 2, x_left)
        c3 = _avgpool_nopad(c0, 1) + c1
        c4 = (_BranchSeparables(r, 3, 1, 1, reduction=red, dtype=d,
                                name="comb_iter_4_left")(c0, train)
              + mp(x_right))
        return jnp.concatenate([c1, c2, c3, c4], -1)


class NASNetALarge(nn.Module):
    num_classes: int = 1000
    in_chans: int = 3
    stem_size: int = 96
    num_features: int = 4032
    channel_multiplier: int = 2
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        ch = self.num_features // 24

        class _Conv0(nn.Module):
            @nn.compact
            def __call__(self2, v, train=False):
                v = conv2d(96, 3, stride=2, padding=0, dtype=d, name="conv")(v)
                return _bn(train, "bn", d)(v)

        x_conv0 = _Conv0(name="conv0")(x, train)
        x_stem_0 = _CellStem0(ch // (self.channel_multiplier**2), dtype=d,
                              name="cell_stem_0")(x_conv0, train)
        x_stem_1 = _CellStem1(ch // self.channel_multiplier, dtype=d,
                              name="cell_stem_1")(x_conv0, x_stem_0, train)

        x_cell = _FirstCell(ch // 2, ch, dtype=d, name="cell_0")(x_stem_1, x_stem_0, train)
        prev = x_stem_1
        for i in range(1, 6):
            nxt = _NormalCell(ch, ch, dtype=d, name=f"cell_{i}")(x_cell, prev, train)
            prev, x_cell = x_cell, nxt

        x_red0 = _ReductionCell(2 * ch, 2 * ch, pad_variant=True, dtype=d,
                                name="reduction_cell_0")(x_cell, prev, train)
        x6 = _FirstCell(ch, 2 * ch, dtype=d, name="cell_6")(x_red0, prev, train)
        prev, x_cell = x_red0, x6
        for i in range(7, 12):
            nxt = _NormalCell(2 * ch, 2 * ch, dtype=d, name=f"cell_{i}")(x_cell, prev, train)
            prev, x_cell = x_cell, nxt

        x_red1 = _ReductionCell(4 * ch, 4 * ch, pad_variant=False, dtype=d,
                                name="reduction_cell_1")(x_cell, prev, train)
        x12 = _FirstCell(2 * ch, 4 * ch, dtype=d, name="cell_12")(x_red1, prev, train)
        prev, x_cell = x_red1, x12
        for i in range(13, 18):
            nxt = _NormalCell(4 * ch, 4 * ch, dtype=d, name=f"cell_{i}")(x_cell, prev, train)
            prev, x_cell = x_cell, nxt

        x = relu(x_cell)
        if features_only:
            return x
        x = x.mean(axis=(1, 2))
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="last_linear")(x)


@register_model
def nasnetalarge(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return NASNetALarge(num_classes=num_classes, in_chans=in_chans, **kw)
