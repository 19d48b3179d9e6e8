"""EfficientNet superfamily in Flax (NHWC) — full capability of
``timm/models/efficientnet.py`` + ``efficientnet_builder.py`` +
``efficientnet_blocks.py`` + ``mobilenetv3.py``.

Families: MNASNet B1/A1/small (efficientnet.py:518-616), MobileNetV2
(:619-645), FBNet-C (:648-675), SPNASNet (:678-710), EfficientNet B0-B8/L2
(:713-757), EfficientNet-EdgeTPU ES/EM/EL (:760-786), EfficientNet-CondConv
(:789-816), EfficientNet-Lite (:819-858), MixNet S/M/L/XL/XXL (:860-925),
MobileNetV3 large/small/minimal/rw (mobilenetv3.py:260-414), the pruned
variants, and every ``tf_*`` Tensorflow-compatible twin (SAME padding +
bn_eps 1e-3, e.g. efficientnet.py:1286-1294).

Architectures are expressed in timm's block-string notation (the strings ARE
the published spec) and decoded by :func:`decode_arch_def`, whose repeat
scaling reproduces ``efficientnet_builder.py:142-197`` exactly (stage-summed
repeats, reverse proportional allocation, ceil/round truncation,
fix_first_last). Block numerics:

- DepthwiseSeparable: dw -> bn -> act -> SE -> pw -> bn [-> act if dsa]
  [+skip] (efficientnet_blocks.py:145-205)
- InvertedResidual: pw expand -> bn -> act -> dw -> bn -> act -> SE ->
  pw linear -> bn [+skip]; mid = make_divisible(in*e) (:208-283)
- CondConvResidual: same with per-sample expert-mixed kernels routed by
  sigmoid(Linear(pooled input)) (:285-339; layers/cond_conv2d.py:34-106)
- EdgeResidual: expand kxk -> bn -> act -> SE -> pw linear (stride here!)
  -> bn [+skip]; mid from fake_in_chs when given (:341-410)
- MixedConv: channel splits (first takes remainder) each with its own
  kernel size (layers/mixed_conv2d.py:14-52)
- SqueezeExcite: reduced = make_divisible(base*ratio, divisor), base =
  block input (default) or mid (reduce_mid) (:100-117, builder
  resolve_se_args :40-52)

Param names mirror timm (conv_stem, bn1, blocks_{s}_{i}.{conv_pw,bn1,...},
conv_head, bn2, classifier; mixed convs conv_dw_0.., condconv kernels kept in
the torch flat (params, experts) layout) for checkpoint conversion.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .act import relu as _act_relu, residual_add as _residual_add
from .layers import batch_norm, conv2d, global_avg_pool, head_dropout, torch_conv_padding
from .pruned import WidthOverrides, scope_widths, width_of
from .registry import register_model

__all__ = ["EfficientNet", "MobileNetV3", "decode_arch_def", "BlockSpec"]


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


_ACTS = {
    "swish": swish,
    "relu": _act_relu,
    "relu6": jax.nn.relu6,
    "hard_swish": hard_swish,
}


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """One fully-expanded block (post repeat-scaling, stride already fixed)."""

    kind: str  # 'ds' | 'dsa' | 'ir' | 'er' | 'cn'
    kernel: Tuple[int, ...] = (3,)  # dw kernel(s); er: expansion kernel(s); cn: conv kernel
    exp_kernel: Tuple[int, ...] = (1,)  # ir: pw-expansion kernel(s)
    pw_kernel: Tuple[int, ...] = (1,)  # ir/ds/er: pw-linear kernel(s)
    stride: int = 1
    exp_ratio: float = 1.0
    channels: int = 0
    se_ratio: float = 0.0
    act: Optional[str] = None  # None -> model default act
    noskip: bool = False
    fake_in: int = 0  # er only (efficientnet.py:768 'fc24')
    num_experts: int = 0  # CondConv
    # SE behavior (model-level se_kwargs merged in at decode time)
    se_from_mid: bool = False
    se_gate: str = "sigmoid"
    se_divisor: int = 1
    se_act: Optional[str] = None  # None -> block act


_BLOCK_ACTS = {"re": "relu", "r6": "relu6", "hs": "hard_swish", "sw": "swish"}


def _parse_ksize(s: str) -> Tuple[int, ...]:
    return tuple(int(k) for k in s.split("."))


def _decode_block_str(block_str: str):
    """timm block-string grammar (``efficientnet_builder.py:22-139``) ->
    (field dict, num_repeat)."""
    ops = block_str.split("_")
    kind, ops = ops[0], ops[1:]
    opts = {}
    noskip = False
    for op in ops:
        if op == "noskip":
            noskip = True
        elif op.startswith("n"):
            opts["n"] = _BLOCK_ACTS[op[1:]]
        else:
            # key = leading letters, value = rest starting at the first digit
            for i, ch in enumerate(op):
                if ch.isdigit():
                    opts[op[:i]] = op[i:]
                    break
    fields = dict(
        kind=kind,
        stride=int(opts["s"]),
        channels=int(opts["c"]),
        act=opts.get("n"),
        noskip=noskip or kind == "dsa",
        se_ratio=float(opts.get("se", 0.0)),
    )
    if kind in ("ds", "dsa", "ir"):
        fields["kernel"] = _parse_ksize(opts["k"])
        fields["pw_kernel"] = _parse_ksize(opts.get("p", "1"))
    if kind == "ir":
        fields["exp_kernel"] = _parse_ksize(opts.get("a", "1"))
        fields["exp_ratio"] = float(opts["e"])
        if "cc" in opts:
            fields["num_experts"] = int(opts["cc"])
    elif kind == "er":
        fields["kernel"] = _parse_ksize(opts["k"])
        fields["pw_kernel"] = _parse_ksize(opts.get("p", "1"))
        fields["exp_ratio"] = float(opts["e"])
        fields["fake_in"] = int(opts.get("fc", 0))
    elif kind == "cn":
        fields["kernel"] = (int(opts["k"]),)
    return fields, int(opts["r"])


def _scale_stage_depth(defs, repeats, depth_multiplier, depth_trunc):
    """Stage repeat scaling — reverse proportional allocation so the first
    block def is least likely to be duplicated (builder:142-177)."""
    num_repeat = sum(repeats)
    if depth_trunc == "round":
        num_repeat_scaled = max(1, round(num_repeat * depth_multiplier))
    else:
        num_repeat_scaled = int(math.ceil(num_repeat * depth_multiplier))
    scaled = []
    for r in repeats[::-1]:
        rs = max(1, round(r / num_repeat * num_repeat_scaled))
        scaled.append(rs)
        num_repeat -= r
        num_repeat_scaled -= rs
    scaled = scaled[::-1]
    out = []
    for fields, rep in zip(defs, scaled):
        out.extend([dict(fields)] * rep)
    return out


def decode_arch_def(
    arch_def: Sequence[Sequence[str]],
    depth_multiplier: float = 1.0,
    depth_trunc: str = "ceil",
    experts_multiplier: int = 1,
    fix_first_last: bool = False,
    se_overrides: Optional[dict] = None,
) -> Tuple[Tuple[BlockSpec, ...], ...]:
    """Decode + expand an arch table (``efficientnet_builder.py:180-197``).

    Beyond the reference decoder this also resolves two things the torch
    builder does later, so the Flax module stays a plain loop: strides of
    non-first blocks in a stage are forced to 1 (builder:312-314), and
    model-level SE kwargs are merged into each SE-carrying block
    (resolve_se_args, efficientnet_blocks.py:40-52).
    """
    stages = []
    for stack_idx, block_strs in enumerate(arch_def):
        defs, repeats = [], []
        for s in block_strs:
            fields, rep = _decode_block_str(s)
            if fields.get("num_experts", 0) and experts_multiplier > 1:
                fields["num_experts"] *= experts_multiplier
            defs.append(fields)
            repeats.append(rep)
        dm = 1.0 if fix_first_last and stack_idx in (0, len(arch_def) - 1) else depth_multiplier
        expanded = _scale_stage_depth(defs, repeats, dm, depth_trunc)
        specs = []
        for i, fields in enumerate(expanded):
            if i >= 1:
                fields["stride"] = 1
            if fields["se_ratio"] > 0 and se_overrides:
                fields.update(se_overrides)
            specs.append(BlockSpec(**fields))
        stages.append(tuple(specs))
    return tuple(stages)


# ---------------------------------------------------------------------------
# conv building blocks
# ---------------------------------------------------------------------------


def _split_channels(num_chan: int, num_groups: int):
    split = [num_chan // num_groups] * num_groups
    split[0] += num_chan - sum(split)
    return split


def _conv_any(x, out_chs: int, kernels: Tuple[int, ...], *, stride: int = 1,
              pad=None, depthwise: bool = False, dtype=None, name: str):
    """create_conv2d equivalent: plain conv, or MixedConv2d when several
    kernel sizes are given (``timm/models/layers/create_conv2d.py``,
    ``mixed_conv2d.py:20-52``). Mixed sub-convs are named ``{name}_{i}`` to
    line up with the torch ModuleDict keys under name conversion."""
    if len(kernels) == 1:
        groups = out_chs if depthwise else 1
        return conv2d(out_chs, kernels[0], stride=stride, padding=pad,
                      groups=groups, dtype=dtype, name=name)(x)
    in_chs = x.shape[-1]
    in_splits = _split_channels(in_chs, len(kernels))
    out_splits = _split_channels(out_chs, len(kernels))
    outs = []
    start = 0
    for i, (k, ci, co) in enumerate(zip(kernels, in_splits, out_splits)):
        xi = x[..., start:start + ci]
        start += ci
        groups = co if depthwise else 1
        outs.append(conv2d(co, k, stride=stride, padding=pad, groups=groups,
                           dtype=dtype, name=f"{name}_{i}")(xi))
    return jnp.concatenate(outs, axis=-1)


class _CondConv(nn.Module):
    """CondConv2d (``timm/models/layers/cond_conv2d.py:34-106``): per-sample
    kernels mixed from ``num_experts`` expert kernels by routing weights.

    The kernel parameter keeps the torch flat layout transposed —
    (out*in/g*kh*kw, experts) — so the generic name-based converter
    (convert.py: 2-D ``weight`` -> transposed ``kernel``) lands it untouched.
    The per-sample convolution is a vmapped ``lax.conv_general_dilated``; XLA
    lowers that to one batch-grouped convolution (the same trick as the torch
    impl's groups=B reshape, but compiler-native).
    """

    out_chs: int
    kernel_size: int
    stride: int = 1
    groups: int = 1  # out_chs for depthwise
    num_experts: int = 4
    pad: Optional[str] = None  # None = torch symmetric; 'same' = TF SAME
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, routing):  # x (B,H,W,C), routing (B,E)
        in_chs = x.shape[-1]
        k = self.kernel_size
        per_group_in = in_chs // self.groups
        num_params = self.out_chs * per_group_in * k * k

        def expert_conv_init(key, shape, dtype=jnp.float32):
            # timm get_condconv_initializer semantics (cond_conv2d.py:16-31):
            # each expert row is an (O, I/g, kh, kw) conv initialized with the
            # torch conv default kaiming_uniform(a=sqrt(5)), i.e. fan computed
            # from the PER-EXPERT conv shape, not the 2-D flat (params, E) shape
            fan_in = per_group_in * k * k
            bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", expert_conv_init,
                            (num_params, self.num_experts))
        w = jnp.einsum("be,pe->bp", routing, jnp.asarray(kernel, x.dtype))
        # torch flat order is (O, I/g, kh, kw) -> rearrange to HWIO per sample
        w = w.reshape(-1, self.out_chs, per_group_in, k, k).transpose(0, 3, 4, 2, 1)
        if self.pad == "same":
            padding = "SAME"
        else:
            p = torch_conv_padding(k, self.stride)
            padding = [(p, p), (p, p)]

        def one(xi, wi):
            return jax.lax.conv_general_dilated(
                xi[None], wi, (self.stride, self.stride), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )[0]

        return jax.vmap(one)(x, w)


class _SE(nn.Module):
    in_chs: int
    reduced_chs: int
    act: str
    gate: str
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced_chs, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_reduce")(s)
        s = _ACTS[self.act](s)
        s = nn.Conv(self.in_chs, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv_expand")(s)
        gate = hard_sigmoid if self.gate == "hard_sigmoid" else jax.nn.sigmoid
        return x * gate(s)


def _se_module(spec: BlockSpec, block_in: int, mid: int, act: str, dtype,
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
    return _SE(expand, reduced, spec.se_act or act, spec.se_gate, dtype=dtype, name="se")


def _routing(x, num_experts: int, dtype, name: str = "routing_fn"):
    """CondConvResidual routing (efficientnet_blocks.py:306-311):
    sigmoid(Linear(global-avg-pooled block input))."""
    pooled = jnp.mean(x, axis=(1, 2))
    return jax.nn.sigmoid(nn.Dense(num_experts, dtype=dtype, name=name)(pooled))


class _DsBlock(nn.Module):
    spec: BlockSpec
    in_chs: int
    out_chs: int
    act: str  # resolved act name (block override or model default)
    pad: Optional[str] = None
    bn_eps: float = 1e-5
    widths: WidthOverrides = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.act]
        dw = width_of(self.widths, "conv_dw", self.in_chs)
        pw = width_of(self.widths, "conv_pw", self.out_chs)
        residual = x
        x = _conv_any(x, dw, self.spec.kernel, stride=self.spec.stride,
                      pad=self.pad, depthwise=True, dtype=self.dtype, name="conv_dw")
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        x = act(x)
        se = _se_module(self.spec, self.in_chs, self.in_chs, self.act, self.dtype,
                        self.widths, mid_runtime=dw)
        if se is not None:
            x = se(x)
        x = _conv_any(x, pw, self.spec.pw_kernel, pad=self.pad, dtype=self.dtype,
                      name="conv_pw")
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn2")(x)
        if self.spec.kind == "dsa":
            x = act(x)
        if (self.spec.stride == 1 and self.in_chs == self.out_chs
                and not self.spec.noskip):
            x = _residual_add(x, residual)
        return x


class _IrBlock(nn.Module):
    """InvertedResidual; with spec.num_experts > 0 this is CondConvResidual
    (all three convs expert-routed from the block input)."""

    spec: BlockSpec
    in_chs: int
    out_chs: int
    act: str
    pad: Optional[str] = None
    bn_eps: float = 1e-5
    widths: WidthOverrides = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.act]
        spec = self.spec
        mid = make_divisible(self.in_chs * spec.exp_ratio)
        pw = width_of(self.widths, "conv_pw", mid)
        dw = width_of(self.widths, "conv_dw", pw)
        pwl = width_of(self.widths, "conv_pwl", self.out_chs)
        residual = x
        if spec.num_experts > 0:
            routing = _routing(x, spec.num_experts, self.dtype)
            x = _CondConv(pw, spec.exp_kernel[0], num_experts=spec.num_experts,
                          pad=self.pad, dtype=self.dtype, name="conv_pw")(x, routing)
        else:
            x = _conv_any(x, pw, spec.exp_kernel, pad=self.pad, dtype=self.dtype,
                          name="conv_pw")
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        x = act(x)
        if spec.num_experts > 0:
            x = _CondConv(dw, spec.kernel[0], stride=spec.stride, groups=dw,
                          num_experts=spec.num_experts, pad=self.pad,
                          dtype=self.dtype, name="conv_dw")(x, routing)
        else:
            x = _conv_any(x, dw, spec.kernel, stride=spec.stride, pad=self.pad,
                          depthwise=True, dtype=self.dtype, name="conv_dw")
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn2")(x)
        x = act(x)
        se = _se_module(spec, self.in_chs, mid, self.act, self.dtype,
                        self.widths, mid_runtime=dw)
        if se is not None:
            x = se(x)
        if spec.num_experts > 0:
            x = _CondConv(pwl, spec.pw_kernel[0], num_experts=spec.num_experts,
                          pad=self.pad, dtype=self.dtype, name="conv_pwl")(x, routing)
        else:
            x = _conv_any(x, pwl, spec.pw_kernel, pad=self.pad, dtype=self.dtype,
                          name="conv_pwl")
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn3")(x)
        if spec.stride == 1 and self.in_chs == self.out_chs and not spec.noskip:
            x = _residual_add(x, residual)
        return x


class _ErBlock(nn.Module):
    """EdgeResidual (efficientnet_blocks.py:341-410): expansion conv kxk,
    SE, then the STRIDED pointwise-linear projection."""

    spec: BlockSpec
    in_chs: int
    out_chs: int
    act: str
    pad: Optional[str] = None
    bn_eps: float = 1e-5
    widths: WidthOverrides = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = _ACTS[self.act]
        spec = self.spec
        base_in = spec.fake_in or self.in_chs
        mid = make_divisible(base_in * spec.exp_ratio)
        residual = x
        x = _conv_any(x, mid, spec.kernel, pad=self.pad, dtype=self.dtype,
                      name="conv_exp")
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        x = act(x)
        se = _se_module(spec, self.in_chs, mid, self.act, self.dtype)
        if se is not None:
            x = se(x)
        x = _conv_any(x, self.out_chs, spec.pw_kernel, stride=spec.stride,
                      pad=self.pad, dtype=self.dtype, name="conv_pwl")
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn2")(x)
        if spec.stride == 1 and self.in_chs == self.out_chs and not spec.noskip:
            x = _residual_add(x, residual)
        return x


class _CnBlock(nn.Module):
    spec: BlockSpec
    in_chs: int
    out_chs: int
    act: str
    pad: Optional[str] = None
    bn_eps: float = 1e-5
    widths: WidthOverrides = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv_any(x, width_of(self.widths, "conv", self.out_chs), self.spec.kernel,
                      stride=self.spec.stride, pad=self.pad, dtype=self.dtype,
                      name="conv")
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        return _ACTS[self.act](x)


_BLOCK_CLS = {"ds": _DsBlock, "dsa": _DsBlock, "ir": _IrBlock, "er": _ErBlock,
              "cn": _CnBlock}


def _apply_blocks(arch, x, in_chs: int, channel_multiplier: float, default_act: str,
                  train: bool, dtype, pad=None, bn_eps: float = 1e-5,
                  widths: WidthOverrides = None):
    """arch is the decoded tuple-of-stages. ``in_chs`` tracks UNPRUNED widths
    (construction-time semantics: residual-skip and se-reduction decisions
    predate the pruning surgery, helpers.py:157-186); actual runtime channels
    flow through the data."""
    for stage_idx, stage in enumerate(arch):
        for block_idx, spec in enumerate(stage):
            out_chs = round_channels(spec.channels, channel_multiplier)
            cls = _BLOCK_CLS[spec.kind]
            x = cls(spec, in_chs, out_chs, spec.act or default_act, pad=pad,
                    bn_eps=bn_eps,
                    widths=scope_widths(widths, f"blocks.{stage_idx}.{block_idx}"),
                    dtype=dtype,
                    name=f"blocks_{stage_idx}_{block_idx}")(x, train)
            in_chs = out_chs
    return x, in_chs


# ---------------------------------------------------------------------------
# model shells
# ---------------------------------------------------------------------------


class EfficientNet(nn.Module):
    """Generic EfficientNet shell (timm/models/efficientnet.py:302-410):
    conv_stem/bn1/act -> decoded block stages -> conv_head/bn2/act ->
    global pool -> classifier. Hosts every non-MobileNetV3 family."""

    arch: Tuple[Tuple[BlockSpec, ...], ...]
    channel_multiplier: float = 1.0
    num_classes: int = 1000
    in_chans: int = 3
    stem_size: int = 32
    fix_stem: bool = False
    num_features: int = 1280  # gen-resolved head width (already rounded/fixed)
    act: str = "relu"  # model default act (block strings may override)
    drop_rate: float = 0.0
    pad: Optional[str] = None  # 'same' for tf_/pruned variants (TF heritage)
    bn_eps: float = 1e-5
    widths: WidthOverrides = None  # pruned surgery table (models/pruned.py)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        act = _ACTS[self.act]
        stem = self.stem_size if self.fix_stem else round_channels(
            self.stem_size, self.channel_multiplier)
        stem = width_of(self.widths, "conv_stem", stem)
        x = conv2d(stem, 3, stride=2, padding=self.pad, dtype=self.dtype,
                   name="conv_stem")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        x = act(x)
        unpruned_stem = (self.stem_size if self.fix_stem
                         else round_channels(self.stem_size, self.channel_multiplier))
        x, chs = _apply_blocks(self.arch, x, unpruned_stem, self.channel_multiplier,
                               self.act, train, self.dtype, pad=self.pad,
                               bn_eps=self.bn_eps, widths=self.widths)
        head = width_of(self.widths, "conv_head", self.num_features)
        x = conv2d(head, 1, padding=0, dtype=self.dtype, name="conv_head")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn2")(x)
        x = act(x)
        if features_only:
            # head-neutralized feature map (reference strips global_pool +
            # classifier for 'efficient' models, slot_model.py:41-43)
            return x
        x = global_avg_pool(x)
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="classifier")(x)


class MobileNetV3(nn.Module):
    """MobileNetV3 shell (timm/models/mobilenetv3.py:70-150): the head conv
    comes AFTER global pooling and has a bias (no bn); rw variant drops the
    bias (head_bias=False, mobilenetv3.py:286)."""

    arch: Tuple[Tuple[BlockSpec, ...], ...]
    channel_multiplier: float = 1.0
    num_classes: int = 1000
    in_chans: int = 3
    stem_size: int = 16
    num_features: int = 1280
    act: str = "hard_swish"
    head_bias: bool = True
    drop_rate: float = 0.0
    pad: Optional[str] = None
    bn_eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        act = _ACTS[self.act]
        stem = round_channels(self.stem_size, self.channel_multiplier)
        x = conv2d(stem, 3, stride=2, padding=self.pad, dtype=self.dtype,
                   name="conv_stem")(x)
        x = batch_norm(train, eps=self.bn_eps, dtype=self.dtype, name="bn1")(x)
        x = act(x)
        x, _ = _apply_blocks(self.arch, x, stem, self.channel_multiplier, self.act,
                             train, self.dtype, pad=self.pad, bn_eps=self.bn_eps)
        if features_only:
            # head-strip for mobilenet replaces global_pool, conv_head, act2,
            # classifier (slot_model.py:47-51) — features end here
            return x
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = nn.Conv(self.num_features, (1, 1), use_bias=self.head_bias,
                    dtype=self.dtype, name="conv_head")(x)
        x = act(x)
        x = x.reshape(x.shape[0], -1)
        x = head_dropout(x, self.drop_rate, train)
        return nn.Dense(self.num_classes, name="classifier")(x)


# ---------------------------------------------------------------------------
# architecture tables (block strings = the published spec; cited per family)
# ---------------------------------------------------------------------------

_EFFNET_ARCH = (  # efficientnet.py:737-745
    ("ds_r1_k3_s1_e1_c16_se0.25",),
    ("ir_r2_k3_s2_e6_c24_se0.25",),
    ("ir_r2_k5_s2_e6_c40_se0.25",),
    ("ir_r3_k3_s2_e6_c80_se0.25",),
    ("ir_r3_k5_s1_e6_c112_se0.25",),
    ("ir_r4_k5_s2_e6_c192_se0.25",),
    ("ir_r1_k3_s1_e6_c320_se0.25",),
)

_EDGE_ARCH = (  # efficientnet.py:766-775
    ("er_r1_k3_s1_e4_c24_fc24_noskip",),
    ("er_r2_k3_s2_e8_c32",),
    ("er_r4_k3_s2_e8_c48",),
    ("ir_r5_k5_s2_e8_c96",),
    ("ir_r4_k5_s1_e8_c144",),
    ("ir_r2_k5_s2_e8_c192",),
)

_CONDCONV_ARCH = (  # efficientnet.py:795-803
    ("ds_r1_k3_s1_e1_c16_se0.25",),
    ("ir_r2_k3_s2_e6_c24_se0.25",),
    ("ir_r2_k5_s2_e6_c40_se0.25",),
    ("ir_r3_k3_s2_e6_c80_se0.25",),
    ("ir_r3_k5_s1_e6_c112_se0.25_cc4",),
    ("ir_r4_k5_s2_e6_c192_se0.25_cc4",),
    ("ir_r1_k3_s1_e6_c320_se0.25_cc4",),
)

_LITE_ARCH = (  # efficientnet.py:837-845
    ("ds_r1_k3_s1_e1_c16",),
    ("ir_r2_k3_s2_e6_c24",),
    ("ir_r2_k5_s2_e6_c40",),
    ("ir_r3_k3_s2_e6_c80",),
    ("ir_r3_k5_s1_e6_c112",),
    ("ir_r4_k5_s2_e6_c192",),
    ("ir_r1_k3_s1_e6_c320",),
)

_MNASNET_A1_ARCH = (  # efficientnet.py:527-543
    ("ds_r1_k3_s1_e1_c16_noskip",),
    ("ir_r2_k3_s2_e6_c24",),
    ("ir_r3_k5_s2_e3_c40_se0.25",),
    ("ir_r4_k3_s2_e6_c80",),
    ("ir_r2_k3_s1_e6_c112_se0.25",),
    ("ir_r3_k5_s2_e6_c160_se0.25",),
    ("ir_r1_k3_s1_e6_c320",),
)

_MNASNET_B1_ARCH = (  # efficientnet.py:563-579
    ("ds_r1_k3_s1_c16_noskip",),
    ("ir_r3_k3_s2_e3_c24",),
    ("ir_r3_k5_s2_e3_c40",),
    ("ir_r3_k5_s2_e6_c80",),
    ("ir_r2_k3_s1_e6_c96",),
    ("ir_r4_k5_s2_e6_c192",),
    ("ir_r1_k3_s1_e6_c320_noskip",),
)

_MNASNET_SMALL_ARCH = (  # efficientnet.py:599-607
    ("ds_r1_k3_s1_c8",),
    ("ir_r1_k3_s2_e3_c16",),
    ("ir_r2_k3_s2_e6_c16",),
    ("ir_r4_k5_s2_e6_c32_se0.25",),
    ("ir_r3_k3_s1_e6_c32_se0.25",),
    ("ir_r3_k5_s2_e6_c88_se0.25",),
    ("ir_r1_k3_s1_e6_c144",),
)

_MOBILENET_V2_ARCH = (  # efficientnet.py:625-633
    ("ds_r1_k3_s1_c16",),
    ("ir_r2_k3_s2_e6_c24",),
    ("ir_r3_k3_s2_e6_c32",),
    ("ir_r4_k3_s2_e6_c64",),
    ("ir_r3_k3_s1_e6_c96",),
    ("ir_r3_k3_s2_e6_c160",),
    ("ir_r1_k3_s1_e6_c320",),
)

_FBNETC_ARCH = (  # efficientnet.py:657-665
    ("ir_r1_k3_s1_e1_c16",),
    ("ir_r1_k3_s2_e6_c24", "ir_r2_k3_s1_e1_c24"),
    ("ir_r1_k5_s2_e6_c32", "ir_r1_k5_s1_e3_c32", "ir_r1_k5_s1_e6_c32",
     "ir_r1_k3_s1_e6_c32"),
    ("ir_r1_k5_s2_e6_c64", "ir_r1_k5_s1_e3_c64", "ir_r2_k5_s1_e6_c64"),
    ("ir_r3_k5_s1_e6_c112", "ir_r1_k5_s1_e3_c112"),
    ("ir_r4_k5_s2_e6_c184",),
    ("ir_r1_k3_s1_e6_c352",),
)

_SPNASNET_ARCH = (  # efficientnet.py:686-702
    ("ds_r1_k3_s1_c16_noskip",),
    ("ir_r3_k3_s2_e3_c24",),
    ("ir_r1_k5_s2_e6_c40", "ir_r3_k3_s1_e3_c40"),
    ("ir_r1_k5_s2_e6_c80", "ir_r3_k3_s1_e3_c80"),
    ("ir_r1_k5_s1_e6_c96", "ir_r3_k5_s1_e3_c96"),
    ("ir_r4_k5_s2_e6_c192",),
    ("ir_r1_k3_s1_e6_c320_noskip",),
)

_MIXNET_S_ARCH = (  # efficientnet.py:866-880
    ("ds_r1_k3_s1_e1_c16",),
    ("ir_r1_k3_a1.1_p1.1_s2_e6_c24", "ir_r1_k3_a1.1_p1.1_s1_e3_c24"),
    ("ir_r1_k3.5.7_s2_e6_c40_se0.5_nsw", "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"),
    ("ir_r1_k3.5.7_p1.1_s2_e6_c80_se0.25_nsw", "ir_r2_k3.5_p1.1_s1_e6_c80_se0.25_nsw"),
    ("ir_r1_k3.5.7_a1.1_p1.1_s1_e6_c120_se0.5_nsw",
     "ir_r2_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"),
    ("ir_r1_k3.5.7.9.11_s2_e6_c200_se0.5_nsw",
     "ir_r2_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"),
)

_MIXNET_M_ARCH = (  # efficientnet.py:899-913
    ("ds_r1_k3_s1_e1_c24",),
    ("ir_r1_k3.5.7_a1.1_p1.1_s2_e6_c32", "ir_r1_k3_a1.1_p1.1_s1_e3_c32"),
    ("ir_r1_k3.5.7.9_s2_e6_c40_se0.5_nsw", "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"),
    ("ir_r1_k3.5.7_s2_e6_c80_se0.25_nsw", "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e6_c80_se0.25_nsw"),
    ("ir_r1_k3_s1_e6_c120_se0.5_nsw", "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"),
    ("ir_r1_k3.5.7.9_s2_e6_c200_se0.5_nsw", "ir_r3_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"),
)

_MBV3_LARGE_ARCH = (  # mobilenetv3.py:365-381
    ("ds_r1_k3_s1_e1_c16_nre",),
    ("ir_r1_k3_s2_e4_c24_nre", "ir_r1_k3_s1_e3_c24_nre"),
    ("ir_r3_k5_s2_e3_c40_se0.25_nre",),
    ("ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"),
    ("ir_r2_k3_s1_e6_c112_se0.25",),
    ("ir_r3_k5_s2_e6_c160_se0.25",),
    ("cn_r1_k1_s1_c960",),
)

_MBV3_LARGE_MINIMAL_ARCH = (  # mobilenetv3.py:346-362
    ("ds_r1_k3_s1_e1_c16",),
    ("ir_r1_k3_s2_e4_c24", "ir_r1_k3_s1_e3_c24"),
    ("ir_r3_k3_s2_e3_c40",),
    ("ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"),
    ("ir_r2_k3_s1_e6_c112",),
    ("ir_r3_k3_s2_e6_c160",),
    ("cn_r1_k1_s1_c960",),
)

_MBV3_SMALL_ARCH = (  # mobilenetv3.py:327-342
    ("ds_r1_k3_s2_e1_c16_se0.25_nre",),
    ("ir_r1_k3_s2_e4.5_c24_nre", "ir_r1_k3_s1_e3.67_c24_nre"),
    ("ir_r1_k5_s2_e4_c40_se0.25", "ir_r2_k5_s1_e6_c40_se0.25"),
    ("ir_r2_k5_s1_e3_c48_se0.25",),
    ("ir_r3_k5_s2_e6_c96_se0.25",),
    ("cn_r1_k1_s1_c576",),
)

_MBV3_SMALL_MINIMAL_ARCH = (  # mobilenetv3.py:311-324
    ("ds_r1_k3_s2_e1_c16",),
    ("ir_r1_k3_s2_e4.5_c24", "ir_r1_k3_s1_e3.67_c24",),
    ("ir_r1_k3_s2_e4_c40", "ir_r2_k3_s1_e6_c40"),
    ("ir_r2_k3_s1_e3_c48",),
    ("ir_r3_k3_s2_e6_c96",),
    ("cn_r1_k1_s1_c576",),
)

_MBV3_RW_ARCH = (  # mobilenetv3.py:269-284
    ("ds_r1_k3_s1_e1_c16_nre_noskip",),
    ("ir_r1_k3_s2_e4_c24_nre", "ir_r1_k3_s1_e3_c24_nre"),
    ("ir_r3_k5_s2_e3_c40_se0.25_nre",),
    ("ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"),
    ("ir_r2_k3_s1_e6_c112_se0.25",),
    ("ir_r3_k5_s2_e6_c160_se0.25",),
    ("cn_r1_k1_s1_c960",),
)

# model-level SE kwargs (resolve_se_args inputs)
_SE_MBV3 = dict(se_act="relu", se_gate="hard_sigmoid", se_from_mid=True, se_divisor=8)
_SE_MBV3_RW = dict(se_gate="hard_sigmoid", se_from_mid=True, se_divisor=1)


# ---------------------------------------------------------------------------
# generators (one per reference _gen_*) + entrypoint registration
# ---------------------------------------------------------------------------


def _common(kw):
    kw.pop("mnist_stem", None)
    tf = kw.pop("tf", False)
    if tf:  # tf_ twins: kwargs['bn_eps']=1e-3, pad_type='same' (efficientnet.py:1289-1290)
        kw.setdefault("bn_eps", 1e-3)
        kw.setdefault("pad", "same")
    return kw


def _gen_efficientnet(cm, dm, num_classes=1000, in_chans=3, arch=_EFFNET_ARCH,
                      act="swish", **kw):
    """_gen_efficientnet (efficientnet.py:713-757)."""
    return EfficientNet(arch=decode_arch_def(arch, dm),
                        channel_multiplier=cm, num_classes=num_classes,
                        in_chans=in_chans, stem_size=32,
                        num_features=round_channels(1280, cm), act=act,
                        **_common(kw))


def _gen_efficientnet_edge(cm, dm, num_classes=1000, in_chans=3, **kw):
    """_gen_efficientnet_edge (efficientnet.py:760-786)."""
    return EfficientNet(arch=decode_arch_def(_EDGE_ARCH, dm),
                        channel_multiplier=cm, num_classes=num_classes,
                        in_chans=in_chans, stem_size=32,
                        num_features=round_channels(1280, cm), act="relu",
                        **_common(kw))


def _gen_efficientnet_condconv(cm, dm, experts_multiplier=1, num_classes=1000,
                               in_chans=3, **kw):
    """_gen_efficientnet_condconv (efficientnet.py:789-816)."""
    return EfficientNet(arch=decode_arch_def(_CONDCONV_ARCH, dm,
                                             experts_multiplier=experts_multiplier),
                        channel_multiplier=cm, num_classes=num_classes,
                        in_chans=in_chans, stem_size=32,
                        num_features=round_channels(1280, cm), act="swish",
                        **_common(kw))


def _gen_efficientnet_lite(cm, dm, num_classes=1000, in_chans=3, **kw):
    """_gen_efficientnet_lite (efficientnet.py:819-858): fixed stem/head, relu6."""
    return EfficientNet(arch=decode_arch_def(_LITE_ARCH, dm, fix_first_last=True),
                        channel_multiplier=cm, num_classes=num_classes,
                        in_chans=in_chans, stem_size=32, fix_stem=True,
                        num_features=1280, act="relu6", **_common(kw))


def _gen_mixnet_s(cm, num_classes=1000, in_chans=3, **kw):
    """_gen_mixnet_s (efficientnet.py:860-890)."""
    return EfficientNet(arch=decode_arch_def(_MIXNET_S_ARCH),
                        channel_multiplier=cm, num_classes=num_classes,
                        in_chans=in_chans, stem_size=16, num_features=1536,
                        act="relu", **_common(kw))


def _gen_mixnet_m(cm, dm=1.0, num_classes=1000, in_chans=3, **kw):
    """_gen_mixnet_m (efficientnet.py:893-925): depth_trunc='round'."""
    return EfficientNet(arch=decode_arch_def(_MIXNET_M_ARCH, dm, depth_trunc="round"),
                        channel_multiplier=cm, num_classes=num_classes,
                        in_chans=in_chans, stem_size=24, num_features=1536,
                        act="relu", **_common(kw))


def _gen_mnasnet(arch, cm, stem_size=32, num_features=1280, num_classes=1000,
                 in_chans=3, **kw):
    """_gen_mnasnet_a1/_b1/_small + _gen_fbnetc/_gen_spnasnet share this shell
    (efficientnet.py:518-710): default relu act, default SE args."""
    return EfficientNet(arch=decode_arch_def(arch), channel_multiplier=cm,
                        num_classes=num_classes, in_chans=in_chans,
                        stem_size=stem_size, num_features=num_features,
                        act="relu", **_common(kw))


def _gen_mobilenet_v2(cm, dm=1.0, fix_stem_head=False, num_classes=1000,
                      in_chans=3, **kw):
    """_gen_mobilenet_v2 (efficientnet.py:619-645): relu6; the 110d/120d
    variants fix stem+head widths and first/last stage depths."""
    return EfficientNet(arch=decode_arch_def(_MOBILENET_V2_ARCH, dm,
                                             fix_first_last=fix_stem_head),
                        channel_multiplier=cm, num_classes=num_classes,
                        in_chans=in_chans, stem_size=32, fix_stem=fix_stem_head,
                        num_features=1280 if fix_stem_head else round_channels(1280, cm),
                        act="relu6", **_common(kw))


def _gen_mobilenet_v3(cm, variant, num_classes=1000, in_chans=3, **kw):
    """_gen_mobilenet_v3 (mobilenetv3.py:298-414)."""
    if "small" in variant:
        num_features = 1024
        if "minimal" in variant:
            arch, act = _MBV3_SMALL_MINIMAL_ARCH, "relu"
        else:
            arch, act = _MBV3_SMALL_ARCH, "hard_swish"
    else:
        num_features = 1280
        if "minimal" in variant:
            arch, act = _MBV3_LARGE_MINIMAL_ARCH, "relu"
        else:
            arch, act = _MBV3_LARGE_ARCH, "hard_swish"
    return MobileNetV3(arch=decode_arch_def(arch, se_overrides=_SE_MBV3),
                       channel_multiplier=cm, num_classes=num_classes,
                       in_chans=in_chans, stem_size=16, num_features=num_features,
                       act=act, **_common(kw))


def _gen_mobilenet_v3_rw(cm, num_classes=1000, in_chans=3, **kw):
    """_gen_mobilenet_v3_rw (mobilenetv3.py:260-296): head conv without bias,
    SE acts with the block act, divisor 1."""
    return MobileNetV3(arch=decode_arch_def(_MBV3_RW_ARCH, se_overrides=_SE_MBV3_RW),
                       channel_multiplier=cm, num_classes=num_classes,
                       in_chans=in_chans, stem_size=16, num_features=1280,
                       act="hard_swish", head_bias=False, **_common(kw))


def _register(name, gen, *args, **cfg):
    def fn(num_classes=1000, in_chans=3, **kw):
        return gen(*args, num_classes=num_classes, in_chans=in_chans, **{**cfg, **kw})

    fn.__name__ = name
    register_model(fn)


# EfficientNet B0-B8 / L2 (efficientnet.py:1050-1180): (cm, dm) per letter
_B = {"b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
      "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
      "b8": (2.2, 3.6), "l2": (4.3, 5.3)}
for _n, (_cm, _dm) in _B.items():
    _register(f"efficientnet_{_n}", _gen_efficientnet, _cm, _dm)
for _n in ("b2a", "b3a"):  # 288/320-eval twins of b2/b3 (efficientnet.py:1076-1103)
    _register(f"efficientnet_{_n}", _gen_efficientnet, *_B[_n[:2]])
for _n in list(_B) + [f"{k}_ap" for k in _B if k != "l2"] + \
        [f"{k}_ns" for k in _B if k not in ("b8", "l2")]:
    if _n.startswith("l2"):
        continue
    _register(f"tf_efficientnet_{_n}", _gen_efficientnet, *_B[_n[:2]], tf=True)
_register("tf_efficientnet_l2_ns", _gen_efficientnet, *_B["l2"], tf=True)
_register("tf_efficientnet_l2_ns_475", _gen_efficientnet, *_B["l2"], tf=True)

# EdgeTPU ES/EM/EL (efficientnet.py:1121-1156)
_EDGE = {"es": (1.0, 1.0), "em": (1.0, 1.1), "el": (1.2, 1.4)}
for _n, (_cm, _dm) in _EDGE.items():
    _register(f"efficientnet_{_n}", _gen_efficientnet_edge, _cm, _dm)
    _register(f"tf_efficientnet_{_n}", _gen_efficientnet_edge, _cm, _dm, tf=True)

# CondConv (efficientnet.py:1181-1215)
_CC = {"cc_b0_4e": (1.0, 1.0, 1), "cc_b0_8e": (1.0, 1.0, 2), "cc_b1_8e": (1.0, 1.1, 2)}
for _n, (_cm, _dm, _em) in _CC.items():
    _register(f"efficientnet_{_n}", _gen_efficientnet_condconv, _cm, _dm, _em)
    _register(f"tf_efficientnet_{_n}", _gen_efficientnet_condconv, _cm, _dm, _em, tf=True)

# Lite 0-4 (efficientnet.py:1216-1254)
_LITE = {"lite0": (1.0, 1.0), "lite1": (1.0, 1.1), "lite2": (1.1, 1.2),
         "lite3": (1.2, 1.4), "lite4": (1.4, 1.8)}
for _n, (_cm, _dm) in _LITE.items():
    _register(f"efficientnet_{_n}", _gen_efficientnet_lite, _cm, _dm)
    _register(f"tf_efficientnet_{_n}", _gen_efficientnet_lite, _cm, _dm, tf=True)

# MixNet (efficientnet.py:1696-1772)
_register("mixnet_s", _gen_mixnet_s, 1.0)
_register("mixnet_m", _gen_mixnet_m, 1.0)
_register("mixnet_l", _gen_mixnet_m, 1.3)
_register("mixnet_xl", _gen_mixnet_m, 1.6, 1.2)
_register("mixnet_xxl", _gen_mixnet_m, 2.4, 1.3)
_register("tf_mixnet_s", _gen_mixnet_s, 1.0, tf=True)
_register("tf_mixnet_m", _gen_mixnet_m, 1.0, tf=True)
_register("tf_mixnet_l", _gen_mixnet_m, 1.3, tf=True)

# MNASNet family (efficientnet.py:941-1016)
for _n, _cm in (("050", 0.5), ("075", 0.75), ("100", 1.0), ("140", 1.4)):
    _register(f"mnasnet_{_n}", _gen_mnasnet, _MNASNET_B1_ARCH, _cm)
    _register(f"semnasnet_{_n}", _gen_mnasnet, _MNASNET_A1_ARCH, _cm)
_register("mnasnet_b1", _gen_mnasnet, _MNASNET_B1_ARCH, 1.0)  # alias of mnasnet_100
_register("mnasnet_a1", _gen_mnasnet, _MNASNET_A1_ARCH, 1.0)  # alias of semnasnet_100
_register("mnasnet_small", _gen_mnasnet, _MNASNET_SMALL_ARCH, 1.0, stem_size=8)
_register("fbnetc_100", _gen_mnasnet, _FBNETC_ARCH, 1.0, stem_size=16,
          num_features=1984)
_register("spnasnet_100", _gen_mnasnet, _SPNASNET_ARCH, 1.0)

# MobileNetV2 (efficientnet.py:1002-1030)
_register("mobilenetv2_100", _gen_mobilenet_v2, 1.0)
_register("mobilenetv2_140", _gen_mobilenet_v2, 1.4)
_register("mobilenetv2_110d", _gen_mobilenet_v2, 1.1, 1.2, True)
_register("mobilenetv2_120d", _gen_mobilenet_v2, 1.2, 1.4, True)

# MobileNetV3 (mobilenetv3.py:416-520)
for _n, _cm in (("large_075", 0.75), ("large_100", 1.0),
                ("small_075", 0.75), ("small_100", 1.0)):
    _register(f"mobilenetv3_{_n}", _gen_mobilenet_v3, _cm, _n)
_register("mobilenetv3_rw", _gen_mobilenet_v3_rw, 1.0)
for _n, _cm in (("large_075", 0.75), ("large_100", 1.0), ("large_minimal_100", 1.0),
                ("small_075", 0.75), ("small_100", 1.0), ("small_minimal_100", 1.0)):
    _register(f"tf_mobilenetv3_{_n}", _gen_mobilenet_v3, _cm, _n, tf=True)


def _effnet_pruned(variant, cm, dm, num_classes, in_chans, **kw):
    """Pruned EfficientNets (timm efficientnet.py:1255-1283): TF-SAME padding,
    TF bn eps 1e-3, widths from the pruned surgery table."""
    from .pruned import load_pruned_widths

    return _gen_efficientnet(cm, dm, num_classes=num_classes, in_chans=in_chans,
                             pad="same", bn_eps=1e-3,
                             widths=load_pruned_widths(variant), **kw)


@register_model
def efficientnet_b1_pruned(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return _effnet_pruned("efficientnet_b1_pruned", 1.0, 1.1, num_classes, in_chans, **kw)


@register_model
def efficientnet_b2_pruned(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return _effnet_pruned("efficientnet_b2_pruned", 1.1, 1.2, num_classes, in_chans, **kw)


@register_model
def efficientnet_b3_pruned(num_classes=1000, in_chans=3, **kw):
    kw.pop("mnist_stem", None)
    return _effnet_pruned("efficientnet_b3_pruned", 1.2, 1.4, num_classes, in_chans, **kw)
