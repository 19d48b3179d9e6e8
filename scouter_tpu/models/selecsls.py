"""SelecSLS family — capability of ``timm/models/selecsls.py``.

Architecture (cited): conv-bn-relu stem at stride 2 (:137), SelecSLS blocks
with 6 conv-bn-relu units, an internal 3-way concat and a cross-block skip
lane (:87-113), then a 4-conv head (:139) and classifier. Configs for
selecsls42b/60/60b/84 (:179-268).

Param names mirror torch Sequential indices (stem.0 -> stem_0,
features.0.conv1.0 -> features_0/conv1_0, head.0.0 -> head_0_0).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .layers import batch_norm, conv2d, global_avg_pool, head_dropout
from .registry import register_model

__all__ = ["SelecSLS"]


def _conv_bn(parent, x, base: str, out_chs: int, k: int = 3, stride: int = 1,
             train: bool = False, dtype=None):
    pad = ((stride - 1) + (k - 1)) // 2
    x = conv2d(out_chs, k, stride=stride, padding=pad, dtype=dtype,
               name=f"{base}_0")(x)
    x = batch_norm(train, dtype=dtype, name=f"{base}_1")(x)
    return relu(x)


class _Block(nn.Module):
    skip_chs: int
    mid_chs: int
    out_chs: int
    is_first: bool
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        d = self.dtype
        m = self.mid_chs
        d1 = _conv_bn(self, x, "conv1", m, 3, self.stride, train, d)
        d2 = _conv_bn(self, _conv_bn(self, d1, "conv2", m, 1, 1, train, d),
                      "conv3", m // 2, 3, 1, train, d)
        d3 = _conv_bn(self, _conv_bn(self, d2, "conv4", m, 1, 1, train, d),
                      "conv5", m // 2, 3, 1, train, d)
        if self.is_first:
            out = _conv_bn(self, jnp.concatenate([d1, d2, d3], -1),
                           "conv6", self.out_chs, 1, 1, train, d)
            return out, out
        out = _conv_bn(self, jnp.concatenate([d1, d2, d3, skip], -1),
                       "conv6", self.out_chs, 1, 1, train, d)
        return out, skip


# (skip_chs, mid_chs, out_chs, is_first, stride) per block; head: (out, k, stride)
_CONFIGS = {
    "selecsls42": (
        [(0, 64, 64, True, 2), (64, 64, 128, False, 1),
         (0, 144, 144, True, 2), (144, 144, 288, False, 1),
         (0, 304, 304, True, 2), (304, 304, 480, False, 1)],
        [(960, 3, 2), (1024, 3, 1), (1024, 3, 2), (1280, 1, 1)],
    ),
    "selecsls42b": (
        [(0, 64, 64, True, 2), (64, 64, 128, False, 1),
         (0, 144, 144, True, 2), (144, 144, 288, False, 1),
         (0, 304, 304, True, 2), (304, 304, 480, False, 1)],
        [(960, 3, 2), (1024, 3, 1), (1280, 3, 2), (1024, 1, 1)],
    ),
    "selecsls60": (
        [(0, 64, 64, True, 2), (64, 64, 128, False, 1),
         (0, 128, 128, True, 2), (128, 128, 128, False, 1), (128, 128, 288, False, 1),
         (0, 288, 288, True, 2), (288, 288, 288, False, 1), (288, 288, 288, False, 1),
         (288, 288, 416, False, 1)],
        [(756, 3, 2), (1024, 3, 1), (1024, 3, 2), (1280, 1, 1)],
    ),
    "selecsls60b": (
        [(0, 64, 64, True, 2), (64, 64, 128, False, 1),
         (0, 128, 128, True, 2), (128, 128, 128, False, 1), (128, 128, 288, False, 1),
         (0, 288, 288, True, 2), (288, 288, 288, False, 1), (288, 288, 288, False, 1),
         (288, 288, 416, False, 1)],
        [(756, 3, 2), (1024, 3, 1), (1280, 3, 2), (1024, 1, 1)],
    ),
    "selecsls84": (
        [(0, 64, 64, True, 2), (64, 64, 144, False, 1),
         (0, 144, 144, True, 2), (144, 144, 144, False, 1), (144, 144, 144, False, 1),
         (144, 144, 144, False, 1), (144, 144, 304, False, 1),
         (0, 304, 304, True, 2), (304, 304, 304, False, 1), (304, 304, 304, False, 1),
         (304, 304, 304, False, 1), (304, 304, 304, False, 1), (304, 304, 512, False, 1)],
        [(960, 3, 2), (1024, 3, 1), (1024, 3, 2), (1280, 3, 1)],
    ),
}


class SelecSLS(nn.Module):
    variant: str = "selecsls60"
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        d = self.dtype
        features, head = _CONFIGS[self.variant]
        x = _conv_bn(self, x, "stem", 32, 3, 2, train, d)
        skip = x
        for i, (skip_chs, mid, out, is_first, stride) in enumerate(features):
            x, skip = _Block(skip_chs, mid, out, is_first, stride, dtype=d,
                             name=f"features_{i}")(x, skip, train)
        for j, (out, k, stride) in enumerate(head):
            x = _conv_bn(self, x, f"head_{j}", out, k, stride, train, d)
        if features_only:
            return x
        x = global_avg_pool(x)
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="fc")(x)


def _selecsls(variant, num_classes, in_chans, **kw):
    kw.pop("mnist_stem", None)
    return SelecSLS(variant=variant, num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def selecsls42(num_classes=1000, in_chans=3, **kw):
    """SelecSLS42 (timm/models/selecsls.py:181-209 'else' head)."""
    return _selecsls("selecsls42", num_classes, in_chans, **kw)


@register_model
def selecsls42b(num_classes=1000, in_chans=3, **kw):
    return _selecsls("selecsls42b", num_classes, in_chans, **kw)


@register_model
def selecsls60(num_classes=1000, in_chans=3, **kw):
    return _selecsls("selecsls60", num_classes, in_chans, **kw)


@register_model
def selecsls60b(num_classes=1000, in_chans=3, **kw):
    return _selecsls("selecsls60b", num_classes, in_chans, **kw)


@register_model
def selecsls84(num_classes=1000, in_chans=3, **kw):
    return _selecsls("selecsls84", num_classes, in_chans, **kw)
