"""Inception-ResNet-V2 — capability of ``timm/models/inception_resnet_v2.py:36-357``.

Residual inception blocks (Block35 x10 scale .17, Block17 x20 scale .10,
Block8 x9 scale .20 + final no-relu Block8) between Mixed_5b/6a/7a reductions,
BasicConv2d units (conv + BN eps 1e-3 + relu), classifier named ``classif``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .inception_v4 import _Conv, _avgpool3_s1_p1_nopad, _maxpool3_s2, _seq
from .layers import conv2d, global_avg_pool, head_dropout
from .registry import register_model

__all__ = ["InceptionResnetV2"]


class _Mixed5b(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(96, 1, 1, dtype=d, name="branch0")(x, train)
        b1 = _seq(self, [(48, 1, 1, 0), (64, 5, 1, 2)], x, train, d, "branch1")
        b2 = _seq(self, [(64, 1, 1, 0), (96, 3, 1, 1), (96, 3, 1, 1)], x, train, d, "branch2")
        b3 = _Conv(64, 1, 1, dtype=d, name="branch3_1")(_avgpool3_s1_p1_nopad(x), train)
        return jnp.concatenate([b0, b1, b2, b3], -1)


class _Block35(nn.Module):
    scale: float = 0.17
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(32, 1, 1, dtype=d, name="branch0")(x, train)
        b1 = _seq(self, [(32, 1, 1, 0), (32, 3, 1, 1)], x, train, d, "branch1")
        b2 = _seq(self, [(32, 1, 1, 0), (48, 3, 1, 1), (64, 3, 1, 1)], x, train, d, "branch2")
        out = jnp.concatenate([b0, b1, b2], -1)
        out = nn.Conv(320, (1, 1), use_bias=True, dtype=d, name="conv2d")(out)
        return relu(out * self.scale + x)


class _Mixed6a(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(384, 3, 2, dtype=d, name="branch0")(x, train)
        b1 = _seq(self, [(256, 1, 1, 0), (256, 3, 1, 1), (384, 3, 2, 0)], x, train, d, "branch1")
        return jnp.concatenate([b0, b1, _maxpool3_s2(x)], -1)


class _Block17(nn.Module):
    scale: float = 0.10
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(192, 1, 1, dtype=d, name="branch0")(x, train)
        b1 = _seq(self, [(128, 1, 1, 0), (160, (1, 7), 1, (0, 3)),
                         (192, (7, 1), 1, (3, 0))], x, train, d, "branch1")
        out = jnp.concatenate([b0, b1], -1)
        out = nn.Conv(1088, (1, 1), use_bias=True, dtype=d, name="conv2d")(out)
        return relu(out * self.scale + x)


class _Mixed7a(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _seq(self, [(256, 1, 1, 0), (384, 3, 2, 0)], x, train, d, "branch0")
        b1 = _seq(self, [(256, 1, 1, 0), (288, 3, 2, 0)], x, train, d, "branch1")
        b2 = _seq(self, [(256, 1, 1, 0), (288, 3, 1, 1), (320, 3, 2, 0)], x, train, d, "branch2")
        return jnp.concatenate([b0, b1, b2, _maxpool3_s2(x)], -1)


class _Block8(nn.Module):
    scale: float = 0.20
    no_relu: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        b0 = _Conv(192, 1, 1, dtype=d, name="branch0")(x, train)
        b1 = _seq(self, [(192, 1, 1, 0), (224, (1, 3), 1, (0, 1)),
                         (256, (3, 1), 1, (1, 0))], x, train, d, "branch1")
        out = jnp.concatenate([b0, b1], -1)
        out = nn.Conv(2080, (1, 1), use_bias=True, dtype=d, name="conv2d")(out)
        out = out * self.scale + x
        return out if self.no_relu else relu(out)


class InceptionResnetV2(nn.Module):
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        x = _Conv(32, 3, 2, dtype=d, name="conv2d_1a")(x, train)
        x = _Conv(32, 3, 1, dtype=d, name="conv2d_2a")(x, train)
        x = _Conv(64, 3, 1, 1, dtype=d, name="conv2d_2b")(x, train)
        x = _maxpool3_s2(x)
        x = _Conv(80, 1, 1, dtype=d, name="conv2d_3b")(x, train)
        x = _Conv(192, 3, 1, dtype=d, name="conv2d_4a")(x, train)
        x = _maxpool3_s2(x)
        x = _Mixed5b(dtype=d, name="mixed_5b")(x, train)
        for i in range(10):
            x = _Block35(0.17, dtype=d, name=f"repeat_{i}")(x, train)
        x = _Mixed6a(dtype=d, name="mixed_6a")(x, train)
        for i in range(20):
            x = _Block17(0.10, dtype=d, name=f"repeat_1_{i}")(x, train)
        x = _Mixed7a(dtype=d, name="mixed_7a")(x, train)
        for i in range(9):
            x = _Block8(0.20, dtype=d, name=f"repeat_2_{i}")(x, train)
        x = _Block8(1.0, no_relu=True, dtype=d, name="block8")(x, train)
        x = _Conv(1536, 1, 1, dtype=d, name="conv2d_7b")(x, train)
        if features_only:
            return x
        x = global_avg_pool(x)
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="classif")(x)


@register_model
def inception_resnet_v2(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return InceptionResnetV2(num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def ens_adv_inception_resnet_v2(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return InceptionResnetV2(num_classes=num_classes, in_chans=in_chans, **kw)
