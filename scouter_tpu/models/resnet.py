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
from .act import residual_add as _residual_add
from .pruned import WidthOverrides, scope_widths, width_of
from .layers import (
    Eca,
    SpaceToDepthStemConv,
    SplitAttnConv,
    SqueezeExcite,
    avg_pool_ceil_exclude_pad,
    avg_pool_same_zero_pad,
    avg_pool_include_pad,
    batch_norm,
    blur_pool,
    conv2d,
    global_avg_pool,
    head_dropout,
    max_pool_3x3_s2_p1,
)

__all__ = ["ResNet", "BlockKind"]

BlockKind = str  # 'basic' | 'bottleneck' | 'resnest'

_EXPANSION = {"basic": 1, "bottleneck": 4, "resnest": 4, "res2net": 4,
              "sk_basic": 1, "sk_bottleneck": 4}


class _Downsample(nn.Module):
    """Skip-connection projection: 1x1 conv (optionally preceded by avg pool).

    Matches timm ``downsample_conv``/``downsample_avg``
    (``timm/models/resnet.py:277-306``). Param names use the torch Sequential
    indices: conv-path = [conv(0), bn(1)]; avg-path = [pool(0), conv(1), bn(2)].
    """

    out_channels: int
    stride: int
    avg_down: bool
    kernel_size: int = 1  # down_kernel_size (3 for senet154, gluon_resnet.py:361)
    dilation: int = 1
    first_dilation: int = 0  # 0 = unset (timm's None)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.avg_down:
            # downsample_avg (resnet.py:292-306): dilated stages (output_stride
            # 8/16) pool at stride 1 via the SAME-padded variant — the skip is
            # still blurred even though nothing strides
            avg_stride = self.stride if self.dilation == 1 else 1
            if not (self.stride == 1 and self.dilation == 1):
                if avg_stride == 1 and self.dilation > 1:
                    x = avg_pool_same_zero_pad(x, 2, 1)
                else:
                    x = avg_pool_ceil_exclude_pad(x, 2, avg_stride)
            x = conv2d(self.out_channels, 1, stride=1, padding=0, dtype=self.dtype,
                       name="downsample_1")(x)
            x = batch_norm(train, dtype=self.dtype, name="downsample_2")(x)
        else:
            # stride-1 undilated projections always use a 1x1 regardless of
            # down_kernel_size (downsample_conv, resnet.py:277-283)
            k = 1 if (self.stride == 1 and self.dilation == 1) else self.kernel_size
            fd = (self.first_dilation or self.dilation) if k > 1 else 1
            pad = ((self.stride - 1) + fd * (k - 1)) // 2  # timm get_padding
            x = conv2d(self.out_channels, k, stride=self.stride, padding=pad,
                       dilation=fd, dtype=self.dtype, name="downsample_0")(x)
            x = batch_norm(train, dtype=self.dtype, name="downsample_1")(x)
        return x


def _apply_attn(attn: str, channels: int, dtype, out, train: bool = False):
    """timm create_attn capability ('' | 'se' | 'ese' | 'eca' | 'ceca' |
    'cbam' | 'lcbam', layers/create_attn.py:11-37), module named 'se'."""
    if attn == "se":
        return SqueezeExcite(channels, dtype=dtype, name="se")(out)
    if attn == "eca":
        return Eca(channels, dtype=dtype, name="se")(out)
    if attn:
        from .extra_layers import CbamModule, create_attn

        m = create_attn(attn, channels, dtype=dtype)
        return m(out, train) if isinstance(m, CbamModule) else m(out)
    return out


class _BasicBlock(nn.Module):
    """conv3x3(stride)-bn-relu-conv3x3-bn [+proj] -relu (resnet.py:142-199)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    reduce_first: int = 1
    has_downsample: bool = False
    avg_down: bool = False
    down_kernel_size: int = 1
    attn: str = ""  # '' | 'se' | 'eca' (timm create_attn capability)
    aa: bool = False  # BlurPool anti-aliasing (resnet.py:147-154)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        first_planes = self.planes // self.reduce_first
        out = conv2d(first_planes, 3, stride=1 if self.aa else self.stride,
                     padding=self.first_dilation, dilation=self.first_dilation,
                     dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, dtype=self.dtype, name="bn1")(out)
        out = _act_relu(out)
        if self.aa and self.stride == 2:
            out = blur_pool(out, stride=2)
        out = conv2d(self.planes, 3, padding=self.dilation, dilation=self.dilation,
                     dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn2")(out)
        out = _apply_attn(self.attn, self.planes, self.dtype, out, train)
        if self.has_downsample:
            residual = _Downsample(self.planes, self.stride, self.avg_down,
                                   kernel_size=self.down_kernel_size,
                                   dilation=self.dilation,
                                   first_dilation=self.first_dilation,
                                   dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(_residual_add(out, residual))


class _Bottleneck(nn.Module):
    """1x1-bn-relu / 3x3(stride)-bn-relu / 1x1-bn [+proj] -relu (resnet.py:202-275)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    cardinality: int = 1
    base_width: int = 64
    reduce_first: int = 1  # block_reduce_first (2 for [gluon_]senet154)
    has_downsample: bool = False
    avg_down: bool = False
    down_kernel_size: int = 1
    attn: str = ""  # '' | 'se' | 'eca' (timm create_attn capability)
    aa: bool = False  # BlurPool anti-aliasing (resnet.py:214-225)
    widths: WidthOverrides = None  # pruned per-conv out-channels (models/pruned.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        first_planes = width // self.reduce_first
        outplanes = self.planes * 4
        c1 = width_of(self.widths, "conv1", first_planes)
        c2 = width_of(self.widths, "conv2", width)
        c3 = width_of(self.widths, "conv3", outplanes)
        residual = x
        out = conv2d(c1, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, dtype=self.dtype, name="bn1")(out)
        out = _act_relu(out)
        out = conv2d(c2, 3, stride=1 if self.aa else self.stride,
                     padding=self.first_dilation,
                     dilation=self.first_dilation, groups=self.cardinality,
                     dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn2")(out)
        out = _act_relu(out)
        if self.aa and self.stride == 2:
            out = blur_pool(out, stride=2)
        out = conv2d(c3, 1, padding=0, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn3")(out)
        # attn modules keep the UNPRUNED channel count: the reference surgery
        # only rewrites nn.Conv2d, so eca's Conv1d kernel size stays derived
        # from `outplanes` (helpers.py:159-176)
        out = _apply_attn(self.attn, outplanes, self.dtype, out, train)
        if self.has_downsample:
            residual = _Downsample(c3, self.stride, self.avg_down,
                                   kernel_size=self.down_kernel_size,
                                   dilation=self.dilation,
                                   first_dilation=self.first_dilation,
                                   dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(_residual_add(out, residual))


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
                                   dilation=self.dilation,
                                   first_dilation=self.first_dilation,
                                   dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(_residual_add(out, residual))


class _Res2NetBottleneck(nn.Module):
    """Res2Net Bottle2neck (``timm/models/res2net.py:47-130``): the 3x3 conv is
    split into `scale` width-groups with hierarchical residual connections; the
    last split passes through (avg-pooled on stride blocks)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    cardinality: int = 1
    base_width: int = 26
    scale: int = 4
    has_downsample: bool = False
    avg_down: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _math

        width = int(_math.floor(self.planes * (self.base_width / 64.0))) * self.cardinality
        outplanes = self.planes * 4
        num_scales = max(1, self.scale - 1)
        is_first = self.stride > 1 or self.has_downsample

        residual = x
        out = conv2d(width * self.scale, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, dtype=self.dtype, name="bn1")(out)
        out = _act_relu(out)

        splits = [out[..., i * width:(i + 1) * width] for i in range(self.scale)]
        outs = []
        sp = None
        for i in range(num_scales):
            sp = splits[i] if (i == 0 or is_first) else sp + splits[i]
            sp = conv2d(width, 3, stride=self.stride, padding=self.first_dilation,
                        dilation=self.first_dilation, groups=self.cardinality,
                        dtype=self.dtype, name=f"convs_{i}")(sp)
            sp = batch_norm(train, dtype=self.dtype, name=f"bns_{i}")(sp)
            sp = _act_relu(sp)
            outs.append(sp)
        if self.scale > 1:
            last = splits[-1]
            if is_first:
                last = avg_pool_include_pad(last, 3, self.stride, 1)
            outs.append(last)
        out = jnp.concatenate(outs, axis=-1)

        out = conv2d(outplanes, 1, padding=0, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(train, dtype=self.dtype, name="bn3")(out)
        if self.has_downsample:
            residual = _Downsample(outplanes, self.stride, self.avg_down,
                                   dilation=self.dilation,
                                   first_dilation=self.first_dilation,
                                   dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(_residual_add(out, residual))


class _ConvBn(nn.Module):
    """ConvBnAct wrapper with torch child names (conv, bn)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1
    groups: int = 1
    act: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, self.kernel_size, stride=self.stride,
                   padding=self.padding, dilation=self.dilation, groups=self.groups,
                   dtype=self.dtype, name="conv")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn")(x)
        return _act_relu(x) if self.act else x


class _SKAttn(nn.Module):
    """SelectiveKernelAttn (``selective_kernel.py:20-47``)."""

    channels: int
    num_paths: int
    attn_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, stacked, train: bool = False):
        s = stacked.sum(axis=1).mean(axis=(1, 2), keepdims=True)  # (B,1,1,C)
        s = nn.Conv(self.attn_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="fc_reduce")(s)
        s = batch_norm(train, dtype=self.dtype, name="bn")(s)
        s = _act_relu(s)
        s = nn.Conv(self.channels * self.num_paths, (1, 1), use_bias=False,
                    dtype=self.dtype, name="fc_select")(s)
        s = s.reshape(s.shape[0], 1, 1, self.num_paths, self.channels)
        return jax.nn.softmax(s, axis=3).transpose(0, 3, 1, 2, 4)  # (B,P,1,1,C)


class _SKConv(nn.Module):
    """SelectiveKernelConv (``timm/models/layers/selective_kernel.py:50-117``):
    two 3x3 branches (dilation 1 and 2 for the nominal 3/5 kernels), softmax
    path attention over the summed branch features."""

    out_channels: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    attn_reduction: int = 16
    min_attn_channels: int = 32
    split_input: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dilations = [self.dilation * (k - 1) // 2 for k in (3, 5)]  # keep_3x3
        num_paths = len(dilations)
        in_full = x.shape[-1]
        groups = min(self.out_channels, self.groups)

        paths = []
        for i, d in enumerate(dilations):
            xin = x
            if self.split_input:
                w = in_full // num_paths
                xin = x[..., i * w:(i + 1) * w]
            p = _ConvBn(self.out_channels, 3, stride=self.stride, padding=d,
                        dilation=d, groups=groups, dtype=self.dtype,
                        name=f"paths_{i}")(xin, train)
            paths.append(p)
        stacked = jnp.stack(paths, axis=1)  # (B, P, H, W, C)

        attn_chs = max(int(self.out_channels / self.attn_reduction), self.min_attn_channels)
        attn = _SKAttn(self.out_channels, num_paths, attn_chs, dtype=self.dtype,
                       name="attn")(stacked, train)
        return (stacked * attn).sum(axis=1)


class _SKBasicBlock(nn.Module):
    """SelectiveKernelBasic (``timm/models/sknet.py:45-89``)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    sk_attn_reduction: int = 16
    sk_min_attn_channels: int = 32
    sk_split_input: bool = False
    has_downsample: bool = False
    avg_down: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _SKConv(
            self.planes, stride=self.stride, dilation=self.first_dilation,
            attn_reduction=self.sk_attn_reduction,
            min_attn_channels=self.sk_min_attn_channels,
            split_input=self.sk_split_input, dtype=self.dtype, name="conv1",
        )(x, train)
        out = _ConvBn(self.planes, 3, padding=self.dilation, dilation=self.dilation,
                      act=False, dtype=self.dtype, name="conv2")(out, train)
        if self.has_downsample:
            residual = _Downsample(self.planes, self.stride, self.avg_down,
                                   dilation=self.dilation,
                                   first_dilation=self.first_dilation,
                                   dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(_residual_add(out, residual))


class _SKBottleneck(nn.Module):
    """SelectiveKernelBottleneck (``timm/models/sknet.py:92-137``)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    cardinality: int = 1
    base_width: int = 64
    sk_attn_reduction: int = 16
    sk_min_attn_channels: int = 32
    sk_split_input: bool = False
    has_downsample: bool = False
    avg_down: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _math

        width = int(_math.floor(self.planes * (self.base_width / 64)) * self.cardinality)
        outplanes = self.planes * 4
        residual = x
        out = _ConvBn(width, 1, padding=0, dtype=self.dtype, name="conv1")(x, train)
        out = _SKConv(
            width, stride=self.stride, dilation=self.first_dilation,
            groups=self.cardinality, attn_reduction=self.sk_attn_reduction,
            min_attn_channels=self.sk_min_attn_channels,
            split_input=self.sk_split_input, dtype=self.dtype, name="conv2",
        )(out, train)
        out = _ConvBn(outplanes, 1, padding=0, act=False, dtype=self.dtype,
                      name="conv3")(out, train)
        if self.has_downsample:
            residual = _Downsample(outplanes, self.stride, self.avg_down,
                                   dilation=self.dilation,
                                   first_dilation=self.first_dilation,
                                   dtype=self.dtype, name="downsample")(x, train)
        return _act_relu(_residual_add(out, residual))


_BLOCKS = {
    "basic": _BasicBlock,
    "bottleneck": _Bottleneck,
    "resnest": _ResNestBottleneck,
    "res2net": _Res2NetBottleneck,
    "sk_basic": _SKBasicBlock,
    "sk_bottleneck": _SKBottleneck,
}


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
    attn: str = ""  # '' | 'se' | 'eca' for basic/bottleneck blocks
    aa: bool = False  # BlurPool anti-aliasing (resnetblur*, resnet.py:414-418)
    reduce_first: int = 1  # block_reduce_first ([gluon_]senet154)
    down_kernel_size: int = 1  # 3 for [gluon_]senet154
    scale: int = 4  # res2net
    sk_attn_reduction: int = 16  # sknet
    sk_min_attn_channels: int = 32
    sk_split_input: bool = False
    drop_rate: float = 0.0
    mnist_stem: bool = False
    # lower the stem's first stride-2 conv through space-to-depth (exact
    # arithmetic, better MXU shape for the 1-3-channel input tile; see
    # layers.SpaceToDepthStemConv). Off by default; enabled by the TPU bench.
    s2d_stem: bool = False
    # pruned-channel surgery table (timm adapt_model_from_file capability,
    # helpers.py:146-196): torch-style conv prefix -> out_channels
    widths: WidthOverrides = None
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
            if self.s2d_stem:
                x = SpaceToDepthStemConv(64, 3, dtype=self.dtype, name="conv1")(x)
            else:
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
            stem0 = width_of(self.widths, "conv1.0", stem_chs_1)
            if self.s2d_stem:
                x = SpaceToDepthStemConv(stem0, 3, dtype=self.dtype, name="conv1_0")(x)
            else:
                x = conv2d(stem0, 3, stride=2, padding=1, dtype=self.dtype,
                           name="conv1_0")(x)
            x = batch_norm(train, dtype=self.dtype, name="conv1_1")(x)
            x = _act_relu(x)
            x = conv2d(width_of(self.widths, "conv1.3", stem_chs_2), 3, padding=1,
                       dtype=self.dtype, name="conv1_3")(x)
            x = batch_norm(train, dtype=self.dtype, name="conv1_4")(x)
            x = _act_relu(x)
            x = conv2d(width_of(self.widths, "conv1.6", inplanes), 3, padding=1,
                       dtype=self.dtype, name="conv1_6")(x)
        elif self.s2d_stem:
            x = SpaceToDepthStemConv(inplanes, 7, dtype=self.dtype, name="conv1")(x)
        else:
            x = conv2d(inplanes, 7, stride=2, padding=3, dtype=self.dtype, name="conv1")(x)
        if start_from is None:
            x = batch_norm(train, dtype=self.dtype, name="bn1")(x)
            x = _act_relu(x)
            if self.aa:
                # stem pooling becomes maxpool(s1) + anti-aliased downsample
                # (resnet.py:414-418)
                x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
                x = blur_pool(x, stride=2)
            else:
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
                if self.block in ("basic", "bottleneck"):
                    kwargs.update(attn=self.attn, aa=self.aa,
                                  reduce_first=self.reduce_first,
                                  down_kernel_size=self.down_kernel_size)
                if self.block == "bottleneck" and self.widths:
                    kwargs.update(widths=scope_widths(
                        self.widths, f"layer{stage_idx}.{block_idx}"))
                if self.block in ("bottleneck", "resnest", "res2net", "sk_bottleneck"):
                    kwargs.update(cardinality=self.cardinality, base_width=self.base_width)
                if self.block == "resnest":
                    kwargs.update(radix=self.radix, avd=self.avd, avd_first=self.avd_first)
                if self.block == "res2net":
                    kwargs.update(scale=self.scale)
                if self.block in ("sk_basic", "sk_bottleneck"):
                    kwargs.update(
                        sk_attn_reduction=self.sk_attn_reduction,
                        sk_min_attn_channels=self.sk_min_attn_channels,
                        sk_split_input=self.sk_split_input,
                    )
                x = block_cls(name=f"layer{stage_idx}_{block_idx}", **kwargs)(x, train)
            if stop_after == f"layer{stage_idx}":
                return x

        if features_only:
            # equivalent of the reference's head neutralization + reshape to the
            # spatial map (slot_model.py:35-51, forward_features resnet.py:491-501)
            return x

        # ---- Head (resnet.py:503-509)
        x = global_avg_pool(x)
        x = head_dropout(x, self.drop_rate, train)
        x = nn.Dense(self.num_classes, name="fc")(x)
        return x
