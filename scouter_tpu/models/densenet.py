"""DenseNet family in Flax (NHWC) — capability of ``timm/models/densenet.py``.

Architecture facts (cited): DenseLayer = norm+relu -> 1x1 conv (bn_size*growth)
-> norm+relu -> 3x3 conv (growth), concatenated densely (densenet.py:47-135);
DenseTransition = norm+relu -> 1x1 conv (half) -> 2x2 avg pool (:138-147);
stem = 7x7/2 conv + norm + 3x3/2 maxpool (or deep 3x3 stem variant)
(:175-201); final norm5 + relu ends forward_features (:226-258) — which is why
densenet backbones give an 8x8 (not 9x9) map at 260px (slot_model.py:61-64).

Param paths mirror the torch names (features.denseblock1.denselayer1.norm1 ->
features/denseblock1/denselayer1/norm1) for checkpoint conversion.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .act import relu
from .layers import batch_norm, blur_pool, conv2d, global_avg_pool, head_dropout, max_pool_3x3_s2_p1
from .registry import register_model

__all__ = ["DenseNet"]


def _norm_act(kind: str, x, train: bool, name: str, dtype=None):
    """BatchNormAct2d (relu) or InplaceAbn (bn + leaky_relu 0.01) — the two
    norm_layer choices the densenet entrypoints use (densenet.py:376-384,
    layers/inplace_abn.py:40-41)."""
    x = batch_norm(train, dtype=dtype, name=name)(x)
    if kind == "iabn":
        return jnp.where(x >= 0, x, 0.01 * x)
    return relu(x)


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    norm: str = "bn"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = _norm_act(self.norm, x, train, "norm1", self.dtype)
        out = conv2d(self.bn_size * self.growth_rate, 1, padding=0, dtype=self.dtype,
                     name="conv1")(out)
        out = _norm_act(self.norm, out, train, "norm2", self.dtype)
        out = conv2d(self.growth_rate, 3, padding=1, dtype=self.dtype, name="conv2")(out)
        return out


class _DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int = 4
    norm: str = "bn"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = x
        for i in range(self.num_layers):
            new = _DenseLayer(self.growth_rate, self.bn_size, norm=self.norm,
                              dtype=self.dtype,
                              name=f"denselayer{i + 1}")(features, train)
            features = jnp.concatenate([features, new], axis=-1)
        return features


class _DenseTransition(nn.Module):
    out_features: int
    norm: str = "bn"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _norm_act(self.norm, x, train, "norm", self.dtype)
        x = conv2d(self.out_features, 1, padding=0, dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _Features(nn.Module):
    growth_rate: int
    block_config: Sequence[int]
    bn_size: int = 4
    stem_type: str = ""
    norm: str = "bn"
    aa: bool = False  # BlurPool stem pooling, aa_stem_only (densenet.py:176-181)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_init = self.growth_rate * 2
        if "deep" in self.stem_type:
            c1 = c2 = self.growth_rate
            if "tiered" in self.stem_type:
                c1 = 3 * (self.growth_rate // 4)
                c2 = num_init if "narrow" in self.stem_type else 6 * (self.growth_rate // 4)
            x = conv2d(c1, 3, stride=2, padding=1, dtype=self.dtype, name="conv0")(x)
            x = _norm_act(self.norm, x, train, "norm0", self.dtype)
            x = conv2d(c2, 3, padding=1, dtype=self.dtype, name="conv1")(x)
            x = _norm_act(self.norm, x, train, "norm1", self.dtype)
            x = conv2d(num_init, 3, padding=1, dtype=self.dtype, name="conv2")(x)
            x = _norm_act(self.norm, x, train, "norm2", self.dtype)
        else:
            x = conv2d(num_init, 7, stride=2, padding=3, dtype=self.dtype, name="conv0")(x)
            x = _norm_act(self.norm, x, train, "norm0", self.dtype)
        if self.aa:
            x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
            x = blur_pool(x, stride=2)
        else:
            x = max_pool_3x3_s2_p1(x)

        num_features = num_init
        for i, num_layers in enumerate(self.block_config):
            x = _DenseBlock(num_layers, self.growth_rate, self.bn_size,
                            norm=self.norm, dtype=self.dtype,
                            name=f"denseblock{i + 1}")(x, train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                x = _DenseTransition(num_features // 2, norm=self.norm, dtype=self.dtype,
                                     name=f"transition{i + 1}")(x, train)
                num_features //= 2

        x = batch_norm(train, dtype=self.dtype, name="norm5")(x)
        return jnp.where(x >= 0, x, 0.01 * x) if self.norm == "iabn" else relu(x)


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    bn_size: int = 4
    stem_type: str = ""
    norm: str = "bn"
    aa: bool = False
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False  # 1-channel 3x3 stem surgery (slot_model.py:23-24)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        stem_type = self.stem_type
        feats = _Features(
            growth_rate=self.growth_rate, block_config=self.block_config,
            bn_size=self.bn_size, stem_type=stem_type, norm=self.norm,
            aa=self.aa, dtype=self.dtype,
            name="features",
        )(x, train)
        if features_only:
            return feats
        pooled = global_avg_pool(feats)
        pooled = head_dropout(pooled, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="classifier")(pooled)


@register_model
def densenet121(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return DenseNet(growth_rate=32, block_config=(6, 12, 24, 16),
                    num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def densenet121d(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return DenseNet(growth_rate=32, block_config=(6, 12, 24, 16), stem_type="deep",
                    num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def densenet169(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return DenseNet(growth_rate=32, block_config=(6, 12, 32, 32),
                    num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def densenet201(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return DenseNet(growth_rate=32, block_config=(6, 12, 48, 32),
                    num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def densenet161(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return DenseNet(growth_rate=48, block_config=(6, 12, 36, 24),
                    num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def densenet264(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return DenseNet(growth_rate=48, block_config=(6, 12, 64, 48),
                    num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def densenetblur121d(num_classes=1000, in_chans=3, **kw):
    """DenseNet-121 deep stem + BlurPool stem pooling (densenet.py:314-321)."""
    kw.pop("mnist_stem", None)
    return DenseNet(growth_rate=32, block_config=(6, 12, 24, 16), stem_type="deep",
                    aa=True, num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def tv_densenet121(num_classes=1000, in_chans=3, **kw):
    """torchvision-weights alias of densenet121 (densenet.py:387-394)."""
    kw.pop("mnist_stem", None)
    return DenseNet(growth_rate=32, block_config=(6, 12, 24, 16),
                    num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def densenet264d_iabn(num_classes=1000, in_chans=3, **kw):
    """DenseNet-264 deep stem with Inplace-ABN norm-act (densenet.py:376-384)."""
    kw.pop("mnist_stem", None)
    return DenseNet(growth_rate=48, block_config=(6, 12, 64, 48), stem_type="deep",
                    norm="iabn", num_classes=num_classes, in_chans=in_chans, **kw)
