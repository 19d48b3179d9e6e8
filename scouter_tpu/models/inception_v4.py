"""Inception-V4 — capability of ``timm/models/inception_v4.py:27-310``.

22-entry feature Sequential (3-conv stem, Mixed_3a/4a/5a, 4x Inception-A,
Reduction-A, 7x Inception-B, Reduction-B, 3x Inception-C) of BasicConv2d units
(conv + BN eps 1e-3 + relu), exclude-pad average pool branches, classifier
named last_linear. Param paths mirror torch (features_0/conv,
features_4/branch1_2/conv, ...).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .layers import global_avg_pool, head_dropout
from .registry import register_model

__all__ = ["InceptionV4"]

KSize = Union[int, Tuple[int, int]]


class _Conv(nn.Module):
    """BasicConv2d: conv -> BN(eps 1e-3) -> relu, torch child names conv/bn."""

    features: int
    kernel_size: KSize = 3
    stride: int = 1
    padding: KSize = 0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size if isinstance(self.kernel_size, tuple) else (
            self.kernel_size, self.kernel_size)
        p = self.padding if isinstance(self.padding, tuple) else (
            self.padding, self.padding)
        x = nn.Conv(self.features, k, strides=(self.stride, self.stride),
                    padding=[(p[0], p[0]), (p[1], p[1])], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return relu(x)


def _maxpool3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avgpool3_s1_p1_nopad(x):
    """AvgPool2d(3, 1, 1, count_include_pad=False)."""
    dims, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    padding = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = jax.lax.reduce_window(x, jnp.array(0.0, x.dtype), jax.lax.add,
                                   dims, strides, padding)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(ones, jnp.array(0.0, x.dtype), jax.lax.add,
                                   dims, strides, padding)
    return summed / counts


def _seq(parent_scope, specs, x, train, dtype, base):
    """Run a Sequential of _Conv with names base_{i}."""
    for i, (feat, k, s, p) in enumerate(specs):
        x = _Conv(feat, k, s, p, dtype=dtype, name=f"{base}_{i}")(x, train)
    return x


class _Mixed3a(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        return jnp.concatenate([
            _maxpool3_s2(x),
            _Conv(96, 3, 2, dtype=self.dtype, name="conv")(x, train),
        ], -1)


class _Mixed4a(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        b0 = _seq(self, [(64, 1, 1, 0), (96, 3, 1, 0)], x, train, self.dtype, "branch0")
        b1 = _seq(self, [(64, 1, 1, 0), (64, (1, 7), 1, (0, 3)),
                         (64, (7, 1), 1, (3, 0)), (96, 3, 1, 0)],
                  x, train, self.dtype, "branch1")
        return jnp.concatenate([b0, b1], -1)


class _Mixed5a(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        return jnp.concatenate([
            _Conv(192, 3, 2, dtype=self.dtype, name="conv")(x, train),
            _maxpool3_s2(x),
        ], -1)


class _InceptionA(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(96, 1, 1, dtype=d, name="branch0")(x, train)
        b1 = _seq(self, [(64, 1, 1, 0), (96, 3, 1, 1)], x, train, d, "branch1")
        b2 = _seq(self, [(64, 1, 1, 0), (96, 3, 1, 1), (96, 3, 1, 1)], x, train, d, "branch2")
        b3 = _Conv(96, 1, 1, dtype=d, name="branch3_1")(_avgpool3_s1_p1_nopad(x), train)
        return jnp.concatenate([b0, b1, b2, b3], -1)


class _ReductionA(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(384, 3, 2, dtype=d, name="branch0")(x, train)
        b1 = _seq(self, [(192, 1, 1, 0), (224, 3, 1, 1), (256, 3, 2, 0)], x, train, d, "branch1")
        return jnp.concatenate([b0, b1, _maxpool3_s2(x)], -1)


class _InceptionB(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(384, 1, 1, dtype=d, name="branch0")(x, train)
        b1 = _seq(self, [(192, 1, 1, 0), (224, (1, 7), 1, (0, 3)),
                         (256, (7, 1), 1, (3, 0))], x, train, d, "branch1")
        b2 = _seq(self, [(192, 1, 1, 0), (192, (7, 1), 1, (3, 0)),
                         (224, (1, 7), 1, (0, 3)), (224, (7, 1), 1, (3, 0)),
                         (256, (1, 7), 1, (0, 3))], x, train, d, "branch2")
        b3 = _Conv(128, 1, 1, dtype=d, name="branch3_1")(_avgpool3_s1_p1_nopad(x), train)
        return jnp.concatenate([b0, b1, b2, b3], -1)


class _ReductionB(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _seq(self, [(192, 1, 1, 0), (192, 3, 2, 0)], x, train, d, "branch0")
        b1 = _seq(self, [(256, 1, 1, 0), (256, (1, 7), 1, (0, 3)),
                         (320, (7, 1), 1, (3, 0)), (320, 3, 2, 0)], x, train, d, "branch1")
        return jnp.concatenate([b0, b1, _maxpool3_s2(x)], -1)


class _InceptionC(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(256, 1, 1, dtype=d, name="branch0")(x, train)
        b1_0 = _Conv(384, 1, 1, dtype=d, name="branch1_0")(x, train)
        b1 = jnp.concatenate([
            _Conv(256, (1, 3), 1, (0, 1), dtype=d, name="branch1_1a")(b1_0, train),
            _Conv(256, (3, 1), 1, (1, 0), dtype=d, name="branch1_1b")(b1_0, train),
        ], -1)
        b2 = _Conv(384, 1, 1, dtype=d, name="branch2_0")(x, train)
        b2 = _Conv(448, (3, 1), 1, (1, 0), dtype=d, name="branch2_1")(b2, train)
        b2 = _Conv(512, (1, 3), 1, (0, 1), dtype=d, name="branch2_2")(b2, train)
        b2 = jnp.concatenate([
            _Conv(256, (1, 3), 1, (0, 1), dtype=d, name="branch2_3a")(b2, train),
            _Conv(256, (3, 1), 1, (1, 0), dtype=d, name="branch2_3b")(b2, train),
        ], -1)
        b3 = _Conv(256, 1, 1, dtype=d, name="branch3_1")(_avgpool3_s1_p1_nopad(x), train)
        return jnp.concatenate([b0, b1, b2, b3], -1)


class InceptionV4(nn.Module):
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        blocks = (
            [lambda n: _Conv(32, 3, 2, dtype=d, name=n),
             lambda n: _Conv(32, 3, 1, dtype=d, name=n),
             lambda n: _Conv(64, 3, 1, 1, dtype=d, name=n),
             lambda n: _Mixed3a(dtype=d, name=n),
             lambda n: _Mixed4a(dtype=d, name=n),
             lambda n: _Mixed5a(dtype=d, name=n)]
            + [lambda n: _InceptionA(dtype=d, name=n)] * 4
            + [lambda n: _ReductionA(dtype=d, name=n)]
            + [lambda n: _InceptionB(dtype=d, name=n)] * 7
            + [lambda n: _ReductionB(dtype=d, name=n)]
            + [lambda n: _InceptionC(dtype=d, name=n)] * 3
        )
        for i, make in enumerate(blocks):
            x = make(f"features_{i}")(x, train)
        if features_only:
            return x
        x = global_avg_pool(x)
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="last_linear")(x)


@register_model
def inception_v4(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return InceptionV4(num_classes=num_classes, in_chans=in_chans, **kw)
