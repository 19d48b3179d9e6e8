"""Generic ResNet family in Flax (NHWC), covering the reference's backbone zoo.

Architecture facts mirror ``timm/models/resnet.py:309-509`` (universal ResNet:
stem variants, avg_down, output_stride) with ``BasicBlock``/``Bottleneck``
(``timm/models/resnet.py:142-275``) and the ResNeSt bottleneck with
split-attention conv (``timm/models/resnest.py:58-143``). The design is a fresh
Flax implementation, not a translation: a single configurable ``ResNet`` module
with a block-kind switch, explicit functional BN state, and NHWC layout for TPU
conv efficiency.

Param names mirror torch module names (conv1, bn1, layer2_0, downsample_1, ...)
so that torch checkpoints convert by pure name/layout mapping (models/convert.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import relu as _act_relu
from .layers import (
    SplitAttnConv,
    avg_pool_ceil_exclude_pad,
    avg_pool_include_pad,
    batch_norm,
    conv2d,
    global_avg_pool,
    max_pool_3x3_s2_p1,
)

__all__ = ["ResNet", "BlockKind"]

BlockKind = str  # 'basic' | 'bottleneck' | 'resnest'

_EXPANSION = {"basic": 1, "bottleneck": 4, "resnest": 4}


class _Downsample(nn.Module):
    """Skip-connection projection: 1x1 conv (optionally preceded by avg pool).

    Matches timm ``downsample_conv``/``downsample_avg``
    (``timm/models/resnet.py:277-306``). Param names use the torch Sequential
    indices: conv-path = [conv(0), bn(1)]; avg-path = [pool(0), conv(1), bn(2)].
    """

    out_channels: int
    stride: int
    avg_down: bool
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.avg_down:
            if self.stride > 1:
                x = avg_pool_ceil_exclude_pad(x, 2, self.stride)
            x = conv2d(self.out_channels, 1, stride=1, padding=0, dtype=self.dtype,
                       name="downsample_1")(x)
            x = batch_norm(train, dtype=self.dtype, name="downsample_2")(x)
        else:
            x = conv2d(self.out_channels, 1, stride=self.stride, padding=0,
                       dtype=self.dtype, name="downsample_0")(x)
            x = batch_norm(train, dtype=self.dtype, name="downsample_1")(x)
        return x


class _BasicBlock(nn.Module):
    """conv3x3(stride)-bn-relu-conv3x3-bn [+proj] -relu (resnet.py:142-199)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    has_downsample: bool = False
    avg_down: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = conv2d(self.planes, 3, stride=self.stride, padding=self.first_dilation,
                     dilation=self.first_dilation, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, dtype=self.dtype, name="bn1")(out)
        out = _act_relu(out)
        out = conv2d(self.planes, 3, padding=self.dilation, dilation=self.dilation,
                     dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn2")(out)
        if self.has_downsample:
            residual = _Downsample(self.planes, self.stride, self.avg_down,
                                   dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(out + residual)


class _Bottleneck(nn.Module):
    """1x1-bn-relu / 3x3(stride)-bn-relu / 1x1-bn [+proj] -relu (resnet.py:202-275)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    cardinality: int = 1
    base_width: int = 64
    has_downsample: bool = False
    avg_down: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        outplanes = self.planes * 4
        residual = x
        out = conv2d(width, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, dtype=self.dtype, name="bn1")(out)
        out = _act_relu(out)
        out = conv2d(width, 3, stride=self.stride, padding=self.first_dilation,
                     dilation=self.first_dilation, groups=self.cardinality,
                     dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn2")(out)
        out = _act_relu(out)
        out = conv2d(outplanes, 1, padding=0, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn3")(out)
        if self.has_downsample:
            residual = _Downsample(outplanes, self.stride, self.avg_down,
                                   dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(out + residual)


class _ResNestBottleneck(nn.Module):
    """ResNeSt bottleneck: 1x1 / split-attn 3x3 (+avd pool) / 1x1 (resnest.py:58-143)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    cardinality: int = 1
    base_width: int = 64
    radix: int = 2
    avd: bool = True
    avd_first: bool = False
    has_downsample: bool = False
    avg_down: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        group_width = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        outplanes = self.planes * 4
        # avd: move the stride out of the 3x3 conv into a 3x3 avg pool (:79-84)
        if self.avd and self.stride > 1:
            avd_stride, conv_stride = self.stride, 1
        else:
            avd_stride, conv_stride = 0, self.stride

        residual = x
        out = conv2d(group_width, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, dtype=self.dtype, name="bn1")(out)
        out = _act_relu(out)
        if avd_stride > 0 and self.avd_first:
            out = avg_pool_include_pad(out, 3, avd_stride, 1)
        out = SplitAttnConv(
            out_channels=group_width, in_channels=group_width, kernel_size=3,
            stride=conv_stride, padding=self.first_dilation, dilation=self.first_dilation,
            groups=self.cardinality, radix=self.radix, dtype=self.dtype, name="conv2",
        )(out, train)
        if avd_stride > 0 and not self.avd_first:
            out = avg_pool_include_pad(out, 3, avd_stride, 1)
        out = conv2d(outplanes, 1, padding=0, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn3")(out)
        if self.has_downsample:
            residual = _Downsample(outplanes, self.stride, self.avg_down,
                                   dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(out + residual)


_BLOCKS = {"basic": _BasicBlock, "bottleneck": _Bottleneck, "resnest": _ResNestBottleneck}


@dataclasses.dataclass(frozen=True)
class _StageSpec:
    planes: int
    blocks: int
    stride: int
    dilation: int


def _stage_specs(layers: Sequence[int], output_stride: int) -> Tuple[_StageSpec, ...]:
    """channels/strides/dilations schedule (timm/models/resnet.py:428-437)."""
    channels = [64, 128, 256, 512]
    strides = [1, 2, 2, 2]
    dilations = [1, 1, 1, 1]
    if output_stride == 16:
        strides[3], dilations[3] = 1, 2
    elif output_stride == 8:
        strides[2:4], dilations[2:4] = [1, 1], [2, 4]
    elif output_stride != 32:
        raise ValueError(f"unsupported output_stride {output_stride}")
    return tuple(
        _StageSpec(c, n, s, d) for c, n, s, d in zip(channels, layers, strides, dilations)
    )


class ResNet(nn.Module):
    """Universal ResNet/ResNeXt/ResNeSt (timm/models/resnet.py:309-509 parity).

    ``block``: 'basic' | 'bottleneck' | 'resnest'.
    ``stem_type``: '' (7x7) | 'deep' | 'deep_tiered' (3x 3x3 convs).
    ``mnist_stem``: replace the stem conv with Conv(1->64, 3x3, s2, p1) — the
    surgery the reference applies for MNIST (``sloter/slot_model.py:23-24``).
    """

    block: BlockKind = "basic"
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 1000
    in_chans: int = 3
    cardinality: int = 1
    base_width: int = 64
    stem_width: int = 64
    stem_type: str = ""
    avg_down: bool = False
    output_stride: int = 32
    radix: int = 2
    avd: bool = True
    avd_first: bool = False
    drop_rate: float = 0.0
    mnist_stem: bool = False
    dtype: Optional[jnp.dtype] = None

    @property
    def expansion(self) -> int:
        return _EXPANSION[self.block]

    @property
    def num_features(self) -> int:
        return 512 * self.expansion

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        features_only: bool = False,
        rngs: Optional[Any] = None,
        stop_after: Optional[str] = None,
        start_from: Optional[str] = None,
    ) -> jnp.ndarray:
        """``stop_after``/``start_from`` ('layer1'..'layer4') split the forward
        at a stage boundary — the functional replacement for torch forward
        hooks (used by the IBA bottleneck and layer-targeted attribution):
        ``stop_after='layer2'`` returns layer2's output; ``start_from='layer2'``
        consumes such a tensor and resumes at layer3."""
        deep_stem = "deep" in self.stem_type
        inplanes = self.stem_width * 2 if deep_stem else 64
        resume_after = int(start_from[-1]) if start_from is not None else 0

        # ---- Stem (timm/models/resnet.py:398-418)
        if start_from is not None:
            pass  # x is already an intermediate stage output
        elif self.mnist_stem:
            x = conv2d(64, 3, stride=2, padding=1, dtype=self.dtype, name="conv1")(x)
            inplanes = 64
        elif deep_stem:
            if "tiered" in self.stem_type:
                stem_chs_1 = 3 * (self.stem_width // 4)
                stem_chs_2 = (
                    self.stem_width if "narrow" in self.stem_type else 6 * (self.stem_width // 4)
                )
            else:
                stem_chs_1 = stem_chs_2 = self.stem_width
            x = conv2d(stem_chs_1, 3, stride=2, padding=1, dtype=self.dtype, name="conv1_0")(x)
            x = batch_norm(train, dtype=self.dtype, name="conv1_1")(x)
            x = _act_relu(x)
            x = conv2d(stem_chs_2, 3, padding=1, dtype=self.dtype, name="conv1_3")(x)
            x = batch_norm(train, dtype=self.dtype, name="conv1_4")(x)
            x = _act_relu(x)
            x = conv2d(inplanes, 3, padding=1, dtype=self.dtype, name="conv1_6")(x)
        else:
            x = conv2d(inplanes, 7, stride=2, padding=3, dtype=self.dtype, name="conv1")(x)
        if start_from is None:
            x = batch_norm(train, dtype=self.dtype, name="bn1")(x)
            x = _act_relu(x)
            x = max_pool_3x3_s2_p1(x)

        # ---- Stages
        block_cls = _BLOCKS[self.block]
        expansion = self.expansion
        current_planes = inplanes
        for stage_idx, spec in enumerate(_stage_specs(self.layers, self.output_stride), start=1):
            first_dilation = 1 if spec.dilation in (1, 2) else 2
            for block_idx in range(spec.blocks):
                stride = spec.stride if block_idx == 0 else 1
                needs_ds = block_idx == 0 and (
                    stride != 1 or current_planes != spec.planes * expansion
                )
                current_planes = spec.planes * expansion
                if stage_idx <= resume_after:
                    continue  # resuming mid-network: earlier stages not applied
                kwargs = dict(
                    planes=spec.planes,
                    stride=stride,
                    dilation=spec.dilation,
                    first_dilation=first_dilation if block_idx == 0 else spec.dilation,
                    has_downsample=needs_ds,
                    avg_down=self.avg_down,
                    dtype=self.dtype,
                )
                if self.block in ("bottleneck", "resnest"):
                    kwargs.update(cardinality=self.cardinality, base_width=self.base_width)
                if self.block == "resnest":
                    kwargs.update(radix=self.radix, avd=self.avd, avd_first=self.avd_first)
                x = block_cls(name=f"layer{stage_idx}_{block_idx}", **kwargs)(x, train)
            if stop_after == f"layer{stage_idx}":
                return x

        if features_only:
            # equivalent of the reference's head neutralization + reshape to the
            # spatial map (slot_model.py:35-51, forward_features resnet.py:491-501)
            return x

        # ---- Head (resnet.py:503-509)
        x = global_avg_pool(x)
        if self.drop_rate > 0.0 and train and rngs is not None:
            x = nn.Dropout(rate=self.drop_rate, deterministic=False)(x)
        x = nn.Dense(self.num_classes, name="fc")(x)
        return x
