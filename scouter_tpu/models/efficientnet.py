"""EfficientNet / MobileNetV3 families in Flax (NHWC) — capability of
``timm/models/efficientnet.py`` (+ ``efficientnet_blocks.py``, ``mobilenetv3.py``).

Block facts (cited): SqueezeExcite = 1x1 reduce -> act -> 1x1 expand -> gate,
reduced chs from the *block input* chs for EfficientNet
(efficientnet_blocks.py:100-117, resolve_se_args); DepthwiseSeparable =
dw conv -> bn -> act -> SE -> pw conv -> bn [+skip] (:145-205);
InvertedResidual = pw expand -> bn -> act -> dw -> bn -> act -> SE ->
pw linear -> bn [+skip] (:208-253); EfficientNet scaling via channel/depth
multipliers with divisor-8 channel rounding (efficientnet.py:713-760).

Param names mirror timm (conv_stem, bn1, blocks_{s}_{i}.{conv_pw,bn1,...},
conv_head, bn2, classifier) for checkpoint conversion.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import residual_add as _residual_add
from .layers import batch_norm, conv2d, global_avg_pool
from .pruned import WidthOverrides, scope_widths, width_of
from .registry import register_model

__all__ = ["EfficientNet", "MobileNetV3"]


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def round_channels(channels: float, multiplier: float = 1.0, divisor: int = 8) -> int:
    if not multiplier:
        return int(channels)
    return make_divisible(channels * multiplier, divisor)


def swish(x):
    return jax.nn.silu(x)


def hard_swish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hard_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


_ACTS = {"swish": swish, "relu": jax.nn.relu, "hard_swish": hard_swish}


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    kind: str  # 'ds' | 'ir' | 'cn'
    repeats: int
    kernel: int
    stride: int
    exp_ratio: float
    channels: int
    se_ratio: float = 0.0
    act: str = "swish"
    # SE options (mobilenetv3 uses gate=hard_sigmoid, reduce from mid chs, div 8)
    se_from_mid: bool = False
    se_gate: str = "sigmoid"
    se_divisor: int = 1
    se_act: Optional[str] = None


class _SE(nn.Module):
    in_chs: int
    reduced_chs: int
    act: Callable
    gate: Callable
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced_chs, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_reduce")(s)
        s = self.act(s)
        s = nn.Conv(self.in_chs, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_expand")(s)
        return x * self.gate(s)


def _se_module(spec: BlockSpec, block_in: int, mid: int, dtype,
               widths: WidthOverrides = None, mid_runtime: Optional[int] = None) -> Optional[_SE]:
    """block_in/mid are the UNPRUNED construction-time widths (reduced-chs
    formula parity); mid_runtime is the pruned channel count the gate must
    match. Pruned tables override both 1x1 convs (helpers.py:159-176)."""
    if spec.se_ratio <= 0:
        return None
    base = mid if spec.se_from_mid else block_in
    reduced = width_of(widths, "se.conv_reduce",
                       make_divisible(base * spec.se_ratio, spec.se_divisor))
    expand = width_of(widths, "se.conv_expand", mid_runtime or mid)
    act = _ACTS[spec.se_act or spec.act]
    gate = hard_sigmoid if spec.se_gate == "hard_sigmoid" else jax.nn.sigmoid
    return _SE(expand, reduced, act, gate, dtype=dtype, name="se")


class _DsBlock(nn.Module):
    spec: BlockSpec
    in_chs: int
    out_chs: int
    stride: int
    pad: Optional[str] = None  # None = torch symmetric; 'same' = TF SAME
    bn_eps: float = 1e-5
    widths: WidthOverrides = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.spec.act]
        dw = width_of(self.widths, "conv_dw", self.in_chs)
        pw = width_of(self.widths, "conv_pw", self.out_chs)
        residual = x
        x = conv2d(dw, self.spec.kernel, stride=self.stride, padding=self.pad,
                   groups=dw, dtype=self.dtype, name="conv_dw")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        x = act(x)
        se = _se_module(self.spec, self.in_chs, self.in_chs, self.dtype,
                        self.widths, mid_runtime=dw)
        if se is not None:
            x = se(x)
        x = conv2d(pw, 1, padding=0, dtype=self.dtype, name="conv_pw")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn2")(x)
        if self.stride == 1 and self.in_chs == self.out_chs:
            x = _residual_add(x, residual)
        return x


class _IrBlock(nn.Module):
    spec: BlockSpec
    in_chs: int
    out_chs: int
    stride: int
    pad: Optional[str] = None
    bn_eps: float = 1e-5
    widths: WidthOverrides = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.spec.act]
        mid = make_divisible(self.in_chs * self.spec.exp_ratio)
        pw = width_of(self.widths, "conv_pw", mid)
        dw = width_of(self.widths, "conv_dw", pw)
        pwl = width_of(self.widths, "conv_pwl", self.out_chs)
        residual = x
        x = conv2d(pw, 1, padding=0, dtype=self.dtype, name="conv_pw")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        x = act(x)
        x = conv2d(dw, self.spec.kernel, stride=self.stride, padding=self.pad,
                   groups=dw, dtype=self.dtype, name="conv_dw")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn2")(x)
        x = act(x)
        se = _se_module(self.spec, self.in_chs, mid, self.dtype,
                        self.widths, mid_runtime=dw)
        if se is not None:
            x = se(x)
        x = conv2d(pwl, 1, padding=0, dtype=self.dtype, name="conv_pwl")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn3")(x)
        if self.stride == 1 and self.in_chs == self.out_chs:
            x = _residual_add(x, residual)
        return x


class _CnBlock(nn.Module):
    spec: BlockSpec
    in_chs: int
    out_chs: int
    stride: int
    pad: Optional[str] = None
    bn_eps: float = 1e-5
    widths: WidthOverrides = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.spec.act]
        x = conv2d(width_of(self.widths, "conv", self.out_chs), self.spec.kernel,
                   stride=self.stride, padding=self.pad, dtype=self.dtype,
                   name="conv")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        return act(x)


_BLOCK_CLS = {"ds": _DsBlock, "ir": _IrBlock, "cn": _CnBlock}


def _apply_blocks(arch: Sequence[Sequence[BlockSpec]], x, in_chs: int,
                  channel_multiplier: float, depth_multiplier: float, train: bool, dtype,
                  pad: Optional[str] = None, bn_eps: float = 1e-5,
                  widths: WidthOverrides = None):
    """arch is a tuple of stages; a stage may hold several block defs (timm
    arch_def grouping — block index runs across the whole stage). ``in_chs``
    tracks UNPRUNED widths (construction-time semantics: residual-skip and
    se-reduction decisions predate the pruning surgery, helpers.py:157-186);
    actual runtime channels flow through the data."""
    for stage_idx, stage in enumerate(arch):
        block_idx = 0
        for spec in stage:
            out_chs = round_channels(spec.channels, channel_multiplier)
            repeats = int(math.ceil(spec.repeats * depth_multiplier))
            for r in range(repeats):
                stride = spec.stride if r == 0 else 1
                cls = _BLOCK_CLS[spec.kind]
                x = cls(spec, in_chs, out_chs, stride, pad=pad, bn_eps=bn_eps,
                        widths=scope_widths(widths, f"blocks.{stage_idx}.{block_idx}"),
                        dtype=dtype,
                        name=f"blocks_{stage_idx}_{block_idx}")(x, train)
                in_chs = out_chs
                block_idx += 1
    return x, in_chs


_EFFNET_ARCH = (
    (BlockSpec("ds", 1, 3, 1, 1.0, 16, 0.25),),
    (BlockSpec("ir", 2, 3, 2, 6.0, 24, 0.25),),
    (BlockSpec("ir", 2, 5, 2, 6.0, 40, 0.25),),
    (BlockSpec("ir", 3, 3, 2, 6.0, 80, 0.25),),
    (BlockSpec("ir", 3, 5, 1, 6.0, 112, 0.25),),
    (BlockSpec("ir", 4, 5, 2, 6.0, 192, 0.25),),
    (BlockSpec("ir", 1, 3, 1, 6.0, 320, 0.25),),
)


class EfficientNet(nn.Module):
    """EfficientNet-B* (timm/models/efficientnet.py:713-760 architecture)."""

    channel_multiplier: float = 1.0
    depth_multiplier: float = 1.0
    num_classes: int = 1000
    in_chans: int = 3
    drop_rate: float = 0.0
    mnist_stem: bool = False
    pad: Optional[str] = None  # 'same' for the pruned variants (TF heritage)
    bn_eps: float = 1e-5
    widths: WidthOverrides = None  # pruned surgery table (models/pruned.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False, rngs=None):
        stem = width_of(self.widths, "conv_stem", round_channels(32, self.channel_multiplier))
        x = conv2d(stem, 3, stride=2, padding=self.pad, dtype=self.dtype,
                   name="conv_stem")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        x = swish(x)
        x, chs = _apply_blocks(_EFFNET_ARCH, x,
                               round_channels(32, self.channel_multiplier),
                               self.channel_multiplier, self.depth_multiplier,
                               train, self.dtype, pad=self.pad, bn_eps=self.bn_eps,
                               widths=self.widths)
        head = width_of(self.widths, "conv_head",
                        round_channels(1280, self.channel_multiplier))
        x = conv2d(head, 1, padding=0, dtype=self.dtype, name="conv_head")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn2")(x)
        x = swish(x)
        if features_only:
            # head-neutralized feature map (reference strips global_pool +
            # classifier for 'efficient' models, slot_model.py:41-43)
            return x
        x = global_avg_pool(x)
        return nn.Dense(self.num_classes, name="classifier")(x)


_MBV3_SE = dict(se_from_mid=True, se_gate="hard_sigmoid", se_divisor=8, se_act="relu")

# timm mobilenetv3_large_100 arch_def grouping (mobilenetv3.py)
_MBV3_LARGE_ARCH = (
    (BlockSpec("ds", 1, 3, 1, 1.0, 16, 0.0, act="relu"),),
    (BlockSpec("ir", 1, 3, 2, 4.0, 24, 0.0, act="relu"),
     BlockSpec("ir", 1, 3, 1, 3.0, 24, 0.0, act="relu")),
    (BlockSpec("ir", 3, 5, 2, 3.0, 40, 0.25, act="relu", **_MBV3_SE),),
    (BlockSpec("ir", 1, 3, 2, 6.0, 80, 0.0, act="hard_swish"),
     BlockSpec("ir", 1, 3, 1, 2.5, 80, 0.0, act="hard_swish"),
     BlockSpec("ir", 2, 3, 1, 2.3, 80, 0.0, act="hard_swish")),
    (BlockSpec("ir", 2, 3, 1, 6.0, 112, 0.25, act="hard_swish", **_MBV3_SE),),
    (BlockSpec("ir", 3, 5, 2, 6.0, 160, 0.25, act="hard_swish", **_MBV3_SE),),
    (BlockSpec("cn", 1, 1, 1, 1.0, 960, 0.0, act="hard_swish"),),
)


class MobileNetV3(nn.Module):
    """MobileNetV3-Large (timm/models/mobilenetv3.py capability): hard-swish,
    hard-sigmoid SE gates, post-pool 1x1 conv_head."""

    channel_multiplier: float = 1.0
    num_classes: int = 1000
    in_chans: int = 3
    head_chs: int = 1280
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False, rngs=None):
        stem = round_channels(16, self.channel_multiplier)
        x = conv2d(stem, 3, stride=2, dtype=self.dtype, name="conv_stem")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn1")(x)
        x = hard_swish(x)
        x, _ = _apply_blocks(_MBV3_LARGE_ARCH, x, stem, self.channel_multiplier,
                             1.0, train, self.dtype)
        if features_only:
            # head-strip for mobilenet replaces global_pool, conv_head, act2,
            # classifier (slot_model.py:47-51) — features end here
            return x
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = nn.Conv(self.head_chs, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_head")(x)
        x = hard_swish(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="classifier")(x)


def _effnet(cm, dm, num_classes, in_chans, **kw):
    kw.pop("mnist_stem", None)
    return EfficientNet(channel_multiplier=cm, depth_multiplier=dm,
                        num_classes=num_classes, in_chans=in_chans, **kw)


@register_model
def efficientnet_b0(num_classes=1000, in_chans=3, **kw):
    return _effnet(1.0, 1.0, num_classes, in_chans, **kw)


@register_model
def efficientnet_b1(num_classes=1000, in_chans=3, **kw):
    return _effnet(1.0, 1.1, num_classes, in_chans, **kw)


@register_model
def efficientnet_b2(num_classes=1000, in_chans=3, **kw):
    return _effnet(1.1, 1.2, num_classes, in_chans, **kw)


@register_model
def efficientnet_b3(num_classes=1000, in_chans=3, **kw):
    return _effnet(1.2, 1.4, num_classes, in_chans, **kw)


@register_model
def efficientnet_b4(num_classes=1000, in_chans=3, **kw):
    return _effnet(1.4, 1.8, num_classes, in_chans, **kw)


@register_model
def efficientnet_b5(num_classes=1000, in_chans=3, **kw):
    return _effnet(1.6, 2.2, num_classes, in_chans, **kw)


def _effnet_pruned(variant, cm, dm, num_classes, in_chans, **kw):
    """Pruned EfficientNets (timm efficientnet.py:1255-1283): TF-SAME padding,
    TF bn eps 1e-3, widths from the pruned surgery table."""
    from .pruned import load_pruned_widths

    return _effnet(cm, dm, num_classes, in_chans, pad="same", bn_eps=1e-3,
                   widths=load_pruned_widths(variant), **kw)


@register_model
def efficientnet_b1_pruned(num_classes=1000, in_chans=3, **kw):
    return _effnet_pruned("efficientnet_b1_pruned", 1.0, 1.1, num_classes, in_chans, **kw)


@register_model
def efficientnet_b2_pruned(num_classes=1000, in_chans=3, **kw):
    return _effnet_pruned("efficientnet_b2_pruned", 1.1, 1.2, num_classes, in_chans, **kw)


@register_model
def efficientnet_b3_pruned(num_classes=1000, in_chans=3, **kw):
    return _effnet_pruned("efficientnet_b3_pruned", 1.2, 1.4, num_classes, in_chans, **kw)


@register_model
def mobilenetv3_large_100(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return MobileNetV3(channel_multiplier=1.0, num_classes=num_classes,
                       in_chans=in_chans, **kw)
