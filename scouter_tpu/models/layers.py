"""Shared NHWC layers for the backbone zoo.

These reproduce the numeric behavior of the reference's layer library
(``timm/models/layers/``) where the SCOUTER recipes exercise it, in idiomatic
Flax/XLA form: explicit symmetric padding (torch conv semantics), BatchNorm with
torch's momentum/eps defaults, and the two average-pool variants torch
distinguishes (count_include_pad True/False, ceil_mode).

Module/param names intentionally mirror the torch module names (conv1, bn1,
layer1_0, downsample_1, ...) so torch checkpoints convert by name mapping.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import relu as _act_relu

# Conv-substitution hook for serving-time quantization: serve/quant.py's
# quantized_convs(...) context manager installs a policy callable
# (kernel_size, groups) -> conv_general_dilated-or-None here; conv2d consults
# it at module-construction (trace) time. threading.local because the serving
# engine compiles bucket programs from its dispatcher thread.
import threading as _threading

_conv_policy = _threading.local()

__all__ = [
    "conv2d",
    "batch_norm",
    "max_pool_3x3_s2_p1",
    "avg_pool_include_pad",
    "avg_pool_ceil_exclude_pad",
    "global_avg_pool",
    "SpaceToDepthStemConv",
    "SplitAttnConv",
    "SqueezeExcite",
    "Eca",
    "blur_pool",
    "drop_path",
    "torch_conv_padding",
]


def torch_conv_padding(kernel_size: int, stride: int, dilation: int = 1) -> int:
    """The symmetric padding timm computes (``timm/models/resnet.py:137-139``)."""
    return ((stride - 1) + dilation * (kernel_size - 1)) // 2


def conv2d(
    features: int,
    kernel_size: int,
    *,
    stride: int = 1,
    padding=None,
    dilation: int = 1,
    groups: int = 1,
    use_bias: bool = False,
    dtype=None,
    name: str,
) -> nn.Conv:
    """nn.Conv with torch-style symmetric integer padding (NHWC/HWIO), or TF
    asymmetric SAME when ``padding='same'`` (timm Conv2dSame / pad_type='same',
    ``timm/models/layers/conv2d_same.py`` — XLA's SAME is exactly TF's)."""
    if padding == "same":
        pad = "SAME"
    else:
        p = torch_conv_padding(kernel_size, stride, dilation) if padding is None else padding
        pad = [(p, p), (p, p)]
    # serving-time quantization hook (serve/quant.py): inside a
    # quantized_convs(...) context the active policy may substitute an int8
    # conv_general_dilated for this conv's shape; None = plain lax conv.
    policy = getattr(_conv_policy, "fn", None)
    injected = policy(kernel_size, groups) if policy is not None else None
    return nn.Conv(
        conv_general_dilated=injected,
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=pad,
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
        name=name,
    )


def batch_norm(train: bool, *, eps: float = 1e-5, dtype=None, name: str) -> nn.BatchNorm:
    """BatchNorm with torch defaults (momentum 0.1 -> flax 0.9, eps 1e-5; the
    pruned efficientnets use the TF default eps 1e-3, efficientnet.py:1256-1258).

    No cross-device axis_name: statistics are computed over whatever batch the
    surrounding program presents. Under a plain jit over a data-sharded batch
    that is the GLOBAL batch (sync-BN); under the shard_map train step
    (``train/steps.py sync_bn=False``) it is the LOCAL shard — the reference's
    DDP behavior where BN is never synced (SURVEY.md §7 hard part 5).
    """
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=eps, dtype=dtype, name=name
    )


def max_pool_3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(3, 2, 1): pads with -inf."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def avg_pool_include_pad(x: jnp.ndarray, window: int, stride: int, pad: int) -> jnp.ndarray:
    """torch AvgPool2d(window, stride, pad) with count_include_pad=True (default).

    Zero-pads and divides by the full window size — exactly flax's avg_pool.
    """
    return nn.avg_pool(
        x, (window, window), strides=(stride, stride), padding=[(pad, pad), (pad, pad)]
    )


def head_dropout(x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """timm head dropout: ``F.dropout(x, drop_rate, training)`` right before
    the classifier (e.g. ``timm/models/resnet.py:505-507``). Active only when
    training with rate > 0; the training step must then supply a ``'dropout'``
    rng to ``apply()`` (train/steps.py does)."""
    if rate > 0.0:
        x = nn.Dropout(rate=rate)(x, deterministic=not train)
    return x


def avg_pool_same_zero_pad(x: jnp.ndarray, window: int = 2, stride: int = 1) -> jnp.ndarray:
    """timm ``AvgPool2dSame(window, stride, ceil_mode=True,
    count_include_pad=False)`` (``layers/pool2d_same.py:14-31``): SAME
    zero-pad then a PLAIN average — the externally padded zeros count as real
    elements (the module pads before calling avg_pool2d with padding=0, per
    its own FIXME), so edge windows divide by the full window size. Used by
    ``downsample_avg`` for dilated stride-1 skips (output_stride 8/16)."""
    b, h, w, c = x.shape
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    pad_h = max((out_h - 1) * stride + window - h, 0)
    pad_w = max((out_w - 1) * stride + window - w, 0)
    x = jnp.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                    (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


def avg_pool_ceil_exclude_pad(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """torch AvgPool2d(window, stride, ceil_mode=True, count_include_pad=False).

    Used by timm's ``downsample_avg`` (``timm/models/resnet.py:291-301``) in the
    ResNet-D / ResNeSt skip connections. ceil_mode implicitly pads bottom/right;
    exclude-from-count means edge windows divide by the true element count.
    """
    b, h, w, c = x.shape
    out_h = -(-max(h - window, 0) // stride) + 1  # ceil
    out_w = -(-max(w - window, 0) // stride) + 1
    pad_h = max((out_h - 1) * stride + window - h, 0)
    pad_w = max((out_w - 1) * stride + window - w, 0)
    if pad_h == 0 and pad_w == 0:
        # exact tiling (e.g. 2x2/s2 on even maps — every ResNet-D/ResNeSt
        # downsample at standard sizes): every window is full, so ceil-mode
        # exclude-pad reduces to a plain average pool — one reduce_window
        # instead of two (the counts pass is the HBM-bound half)
        return nn.avg_pool(x, (window, window), strides=(stride, stride))
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
    # init must be a Python scalar so lax recognizes the summing monoid and
    # keeps the op reverse-mode differentiable (generic reduce_window is not)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, padding)
    ones = jnp.ones((1, h, w, 1), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, padding)
    return summed / counts


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """SelectAdaptivePool2d('avg') + flatten: (B,H,W,C) -> (B,C)."""
    return jnp.mean(x, axis=(1, 2))


class SqueezeExcite(nn.Module):
    """SE block (timm/models/layers/se.py SEModule): avgpool-fc-relu-fc-sigmoid,
    reduced channels max(c/reduction, 8)."""

    channels: int
    reduction: int = 16
    min_channels: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        reduced = max(self.channels // self.reduction, self.min_channels)
        s = nn.Conv(reduced, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(s)
        s = _act_relu(s)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class Eca(nn.Module):
    """ECA attention (timm/models/layers/eca.py:41-73): GAP -> adaptive-kernel
    1D conv over the channel descriptor -> sigmoid scale."""

    channels: int
    gamma: float = 2.0
    beta: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        import math as _math

        t = int(abs(_math.log(self.channels, 2) + self.beta) / self.gamma)
        k = max(t if t % 2 else t + 1, 3)
        s = jnp.mean(x, axis=(1, 2))  # (B, C)
        s = nn.Conv(1, (k,), padding=[( (k - 1) // 2, (k - 1) // 2 )], use_bias=False,
                    dtype=self.dtype, name="conv")(s[..., None])  # (B, C, 1)
        return x * jax.nn.sigmoid(s[..., 0])[:, None, None, :]


class SplitAttnConv(nn.Module):
    """ResNeSt split-attention conv (``timm/models/layers/split_attn.py:31-80``).

    conv (groups*radix) -> bn -> relu -> per-radix sum -> global pool -> fc1 ->
    bn -> relu -> fc2 -> radix softmax -> weighted sum over radix splits.
    Supports cardinality (groups) > 1 and radix 1 (sigmoid gate) for the
    resnest50d_1s4x24d / 4s2x40d ablation variants (resnest.py:240-266).
    """

    out_channels: int
    in_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid_chs = self.out_channels * self.radix
        attn_chs = max(self.in_channels * self.radix // self.reduction_factor, 32)

        x = nn.Conv(
            mid_chs,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups * self.radix,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = batch_norm(train, dtype=self.dtype, name="bn0")(x)
        x = _act_relu(x)

        b, h, w, rc = x.shape
        chs = rc // self.radix
        if self.radix > 1:
            # channel layout is radix-major (grouped-conv output order),
            # matching the reference's view(B, radix, RC//radix, H, W).
            # NOTE: measured on v5e — a 5-D reshape here beats static channel
            # slices by ~40% end-to-end: slicing the minor (lane) dimension at
            # sub-128 widths forces strided copies, while XLA lays the 5-D
            # reshape out for free and fuses the radix sum.
            x_r = x.reshape(b, h, w, self.radix, chs)
            # gap = spatial mean of the radix sum. Mean-over-space and
            # sum-over-radix commute, so reduce the BIG activation once
            # (profile: the sum(radix)->mean(space) order left a standalone
            # reduce_sum pass over every stage's conv2 output, ~18% of step
            # time) and fold radix on the tiny pooled vector instead.
            m = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,RC)
            gap = m.reshape(b, 1, 1, self.radix, chs).sum(axis=3)
        else:
            x_r = x
            gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gap = nn.Conv(attn_chs, (1, 1), feature_group_count=self.groups, use_bias=True,
                      dtype=self.dtype, name="fc1")(gap)
        gap = batch_norm(train, dtype=self.dtype, name="bn1")(gap)
        gap = _act_relu(gap)
        attn = nn.Conv(mid_chs, (1, 1), feature_group_count=self.groups, use_bias=True,
                       dtype=self.dtype, name="fc2")(gap)  # (B,1,1,mid)

        if self.radix > 1:
            # RadixSoftmax (split_attn.py:14-28): view the grouped fc2 output
            # as (cardinality, radix, chs), softmax across radix, then apply in
            # the TRANSPOSED (radix, cardinality, chs) flat order — the exact
            # reshape algebra of the reference (quirk faithfully preserved).
            # The attn tensor is tiny (b, rc); only the weighted sum touches
            # the big activation, as fused elementwise multiply-adds.
            attn = attn.reshape(b, self.groups, self.radix, -1)
            attn = jax.nn.softmax(attn.transpose(0, 2, 1, 3), axis=1)
            attn = attn.reshape(b, self.radix, chs)
            out = (x_r * attn[:, None, None, :, :]).sum(axis=3)
        else:
            attn = jax.nn.sigmoid(attn)
            out = x_r * attn
        return out


def blur_pool(x: jnp.ndarray, stride: int = 2, filt_size: int = 3) -> jnp.ndarray:
    """BlurPool2d (``timm/models/layers/blur_pool.py:19-60``): reflect-pad then
    a fixed binomial depthwise filter with stride — anti-aliased downsampling.

    The filter is a constant (binomial coefficients, e.g. [1,2,1]/4 outer
    product), not a parameter — the torch module keeps it as a buffer named
    ``filt`` which the weight converter skips.
    """
    coeffs = [1.0]
    for _ in range(filt_size - 1):
        coeffs = [0.5 * a + 0.5 * b for a, b in zip(coeffs + [0.0], [0.0] + coeffs)]
    c = jnp.asarray(coeffs, x.dtype)
    filt2d = c[:, None] * c[None, :]
    pad = ((stride - 1) + (filt_size - 1)) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    chs = x.shape[-1]
    kernel = jnp.tile(filt2d[:, :, None, None], (1, 1, 1, chs))  # HWIO, I/g=1
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=chs)


def drop_path(x: jnp.ndarray, rate: float, rng: Optional[jax.Array], train: bool) -> jnp.ndarray:
    """Stochastic depth (timm/models/layers/drop.py DropPath semantics)."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    return jnp.where(mask, x / keep, 0.0)


class SpaceToDepthStemConv(nn.Module):
    """Stride-2 odd-kernel conv lowered through space-to-depth — exact.

    The stem's first conv (C_in=3, full resolution) is the worst MXU shape in
    the network (3 input channels pad to a mostly-empty 128-lane tile; the
    round-2 profile measured it at ~39 TF/s vs ~105 TF/s for the stage convs).
    Rearranging the input into 2x2 blocks (B,H,W,C) -> (B,H/2,W/2,4C) and
    scattering the k x k taps into an equivalent block-space kernel turns it
    into a stride-1 conv with 4x the input channels at quarter the positions —
    identical arithmetic (each tap multiplies the same pixel), so converted
    torch checkpoints produce bit-equivalent-up-to-reassociation outputs.

    The parameter keeps the standard (k, k, C_in, C_out) layout/name so the
    torch converter lands it unchanged.
    """

    features: int
    kernel_size: int  # odd
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        assert k % 2 == 1, "odd kernels only"
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, cin, self.features),
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if h % 2 or w % 2:
            # odd spatial size: fall back to the plain strided conv
            p = (k - 1) // 2
            y = jax.lax.conv_general_dilated(
                x, jnp.asarray(kernel, x.dtype), (2, 2), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias if bias is not None else y

        p = (k - 1) // 2
        dp_min, dp_max = -((p + 1) // 2), p // 2
        bk = dp_max - dp_min + 1  # block kernel size = p + 1

        # scatter taps: w2[kp,kq,(a*2+b)*C + c, o] = w[2(kp+dp_min)+a+p, ...]
        w2 = jnp.zeros((bk, bk, 4 * cin, self.features), kernel.dtype)
        for kp in range(bk):
            for a in range(2):
                di = 2 * (kp + dp_min) + a
                if not -p <= di <= p:
                    continue
                for kq in range(bk):
                    for bb in range(2):
                        dj = 2 * (kq + dp_min) + bb
                        if not -p <= dj <= p:
                            continue
                        ch = (a * 2 + bb) * cin
                        w2 = w2.at[kp, kq, ch:ch + cin].set(kernel[di + p, dj + p])

        y = x.reshape(b, h // 2, 2, w // 2, 2, cin)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)
        left, right = -dp_min, dp_max
        dtype = self.dtype or y.dtype
        out = jax.lax.conv_general_dilated(
            jnp.asarray(y, dtype), jnp.asarray(w2, dtype), (1, 1),
            [(left, right), (left, right)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + jnp.asarray(bias, dtype) if bias is not None else out
