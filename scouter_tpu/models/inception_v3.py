"""Inception-V3 — capability of ``timm/models/inception_v3.py:162-505``.

All block topologies (InceptionA/B/C/D/E), the 5-conv stem, asymmetric 1x7/7x1
kernels, and the BasicConv2d conv-bn(eps 1e-3)-relu unit, with torch param
names (Conv2d_1a_3x3.conv, Mixed_5b.branch5x5_1, ...). Aux head available as a
separate module for checkpoints that carry it.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .layers import avg_pool_include_pad, global_avg_pool, head_dropout
from .registry import register_model

__all__ = ["InceptionV3"]

KSize = Union[int, Tuple[int, int]]


class _BasicConv(nn.Module):
    """conv (no bias) + BN(eps=1e-3) + relu (inception_v3.py:494-503)."""

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


def _max_pool3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avg_pool3_s1_p1(x):
    return avg_pool_include_pad(x, 3, 1, 1)


class _InceptionA(nn.Module):
    pool_features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b1 = _BasicConv(64, 1, dtype=d, name="branch1x1")(x, train)
        b5 = _BasicConv(48, 1, dtype=d, name="branch5x5_1")(x, train)
        b5 = _BasicConv(64, 5, padding=2, dtype=d, name="branch5x5_2")(b5, train)
        b3 = _BasicConv(64, 1, dtype=d, name="branch3x3dbl_1")(x, train)
        b3 = _BasicConv(96, 3, padding=1, dtype=d, name="branch3x3dbl_2")(b3, train)
        b3 = _BasicConv(96, 3, padding=1, dtype=d, name="branch3x3dbl_3")(b3, train)
        bp = _BasicConv(self.pool_features, 1, dtype=d, name="branch_pool")(
            _avg_pool3_s1_p1(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b3 = _BasicConv(384, 3, stride=2, dtype=d, name="branch3x3")(x, train)
        bd = _BasicConv(64, 1, dtype=d, name="branch3x3dbl_1")(x, train)
        bd = _BasicConv(96, 3, padding=1, dtype=d, name="branch3x3dbl_2")(bd, train)
        bd = _BasicConv(96, 3, stride=2, dtype=d, name="branch3x3dbl_3")(bd, train)
        return jnp.concatenate([b3, bd, _max_pool3_s2(x)], axis=-1)


class _InceptionC(nn.Module):
    channels_7x7: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d, c7 = self.dtype, self.channels_7x7
        b1 = _BasicConv(192, 1, dtype=d, name="branch1x1")(x, train)
        b7 = _BasicConv(c7, 1, dtype=d, name="branch7x7_1")(x, train)
        b7 = _BasicConv(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7, train)
        b7 = _BasicConv(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7, train)
        bd = _BasicConv(c7, 1, dtype=d, name="branch7x7dbl_1")(x, train)
        bd = _BasicConv(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd, train)
        bd = _BasicConv(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd, train)
        bd = _BasicConv(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd, train)
        bd = _BasicConv(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd, train)
        bp = _BasicConv(192, 1, dtype=d, name="branch_pool")(_avg_pool3_s1_p1(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b3 = _BasicConv(192, 1, dtype=d, name="branch3x3_1")(x, train)
        b3 = _BasicConv(320, 3, stride=2, dtype=d, name="branch3x3_2")(b3, train)
        b7 = _BasicConv(192, 1, dtype=d, name="branch7x7x3_1")(x, train)
        b7 = _BasicConv(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7, train)
        b7 = _BasicConv(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7, train)
        b7 = _BasicConv(192, 3, stride=2, dtype=d, name="branch7x7x3_4")(b7, train)
        return jnp.concatenate([b3, b7, _max_pool3_s2(x)], axis=-1)


class _InceptionE(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b1 = _BasicConv(320, 1, dtype=d, name="branch1x1")(x, train)
        b3 = _BasicConv(384, 1, dtype=d, name="branch3x3_1")(x, train)
        b3 = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3, train),
            _BasicConv(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3, train),
        ], axis=-1)
        bd = _BasicConv(448, 1, dtype=d, name="branch3x3dbl_1")(x, train)
        bd = _BasicConv(384, 3, padding=1, dtype=d, name="branch3x3dbl_2")(bd, train)
        bd = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd, train),
            _BasicConv(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd, train),
        ], axis=-1)
        bp = _BasicConv(192, 1, dtype=d, name="branch_pool")(_avg_pool3_s1_p1(x), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        x = _BasicConv(32, 3, stride=2, dtype=d, name="Conv2d_1a_3x3")(x, train)
        x = _BasicConv(32, 3, dtype=d, name="Conv2d_2a_3x3")(x, train)
        x = _BasicConv(64, 3, padding=1, dtype=d, name="Conv2d_2b_3x3")(x, train)
        x = _max_pool3_s2(x)
        x = _BasicConv(80, 1, dtype=d, name="Conv2d_3b_1x1")(x, train)
        x = _BasicConv(192, 3, dtype=d, name="Conv2d_4a_3x3")(x, train)
        x = _max_pool3_s2(x)
        x = _InceptionA(32, dtype=d, name="Mixed_5b")(x, train)
        x = _InceptionA(64, dtype=d, name="Mixed_5c")(x, train)
        x = _InceptionA(64, dtype=d, name="Mixed_5d")(x, train)
        x = _InceptionB(dtype=d, name="Mixed_6a")(x, train)
        x = _InceptionC(128, dtype=d, name="Mixed_6b")(x, train)
        x = _InceptionC(160, dtype=d, name="Mixed_6c")(x, train)
        x = _InceptionC(160, dtype=d, name="Mixed_6d")(x, train)
        x = _InceptionC(192, dtype=d, name="Mixed_6e")(x, train)
        x = _InceptionD(dtype=d, name="Mixed_7a")(x, train)
        x = _InceptionE(dtype=d, name="Mixed_7b")(x, train)
        x = _InceptionE(dtype=d, name="Mixed_7c")(x, train)
        if features_only:
            return x
        x = global_avg_pool(x)
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="fc")(x)


@register_model
def inception_v3(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return InceptionV3(num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def tf_inception_v3(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return InceptionV3(num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def adv_inception_v3(num_classes=1000, in_chans=3, **kw):
    """Adversarially-trained weights alias (timm inception_v3.py:549-553)."""
    kw.pop("mnist_stem", None)
    return InceptionV3(num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def gluon_inception_v3(num_classes=1000, in_chans=3, **kw):
    """Gluon weights alias (timm inception_v3.py:556-561)."""
    kw.pop("mnist_stem", None)
    return InceptionV3(num_classes=num_classes, in_chans=in_chans, **kw)
