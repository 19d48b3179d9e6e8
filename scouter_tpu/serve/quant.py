"""Hybrid int8 post-training quantization for the serving path — TPU-first.

The v5e MXU runs int8 matmuls at roughly twice the bf16 rate, but the benefit
is shape-dependent (measured on-chip, round 4):

- dense 1x1 convs (the ResNe(S)t pointwise projections): bf16 42.2 ->
  int8 69.6 TF/s (**1.65x**) at the layer4 shape;
- grouped radix 3x3 convs (SplitAttn): 43.0 -> 46.4 TF/s (+8%) — the
  per-group contraction (ci/groups <= 128) underfills the MXU either way.

So the int8 policy here is HYBRID: only pointwise (kernel=1, groups=1) convs
run int8; the radix 3x3s, the 3-channel stem (where PTQ hurts accuracy most
and FLOPs are negligible), the BN/activation tail, and the slot head stay in
the float compute dtype. This is a serving-only transform: weights are
quantized per-output-channel symmetric, activations per-tensor dynamic
(absmax), and because serving weights are closed over, XLA constant-folds the
weight quantization to int8 literals at compile time.

No reference counterpart (the reference serves fp32 torch); this extends the
TPU-first serving subsystem (serve/export.py, serve/engine.py).

END-TO-END VERDICT on the flagship (resnest26d+xSlot, 224px, bs=70, measured
on v5e, round 4): **negative** — bf16 10,351 img/s, int8 hybrid 9,502 (-8%);
a static-activation-scale diagnostic (zero calibration cost) still measures
10,040 (-3%), so the loss is the quantize/dequantize round-trip
materialization around each conv, not the dynamic absmax reduce. The same
story as the dense radix lowering and the s2d stem (docs/ROADMAP.md): this
model is fusion/bandwidth-balanced, and re-lowering any one op class loses
more in layout/fusion perturbation than the MXU saving. The path is kept —
tested and correct — for deployments whose models are genuinely
pointwise-conv-dominated (where the isolated 1.65x can survive), with the
flagship default staying bf16.
"""

from __future__ import annotations

import contextlib

__all__ = ["int8_conv_general_dilated", "quantized_convs", "QUANT_POLICIES"]


def int8_conv_general_dilated(
    lhs,
    rhs,
    window_strides,
    padding,
    lhs_dilation=None,
    rhs_dilation=None,
    dimension_numbers=None,
    feature_group_count=1,
    batch_group_count=1,
    precision=None,
    preferred_element_type=None,
):
    """Drop-in ``lax.conv_general_dilated`` that runs the MXU contraction in
    int8 (s8 x s8 -> s32) and rescales back to ``lhs.dtype``.

    - activations: per-tensor dynamic symmetric absmax -> int8;
    - weights (flax HWIO, so the output channel is the LAST rhs axis):
      per-output-channel symmetric absmax -> int8.
    """
    import jax.numpy as jnp
    from jax import lax

    orig_dtype = lhs.dtype
    f32 = jnp.float32

    a = lhs.astype(f32)
    a_max = jnp.maximum(jnp.max(jnp.abs(a)), 1e-6)
    a_scale = a_max / 127.0
    qa = jnp.clip(jnp.round(a / a_scale), -127, 127).astype(jnp.int8)

    w = rhs.astype(f32)
    reduce_axes = tuple(range(w.ndim - 1))  # (kh, kw, ci) for HWIO
    w_max = jnp.maximum(jnp.max(jnp.abs(w), axis=reduce_axes), 1e-6)
    w_scale = w_max / 127.0  # (co,)
    qw = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)

    out = lax.conv_general_dilated(
        qa,
        qw,
        window_strides,
        padding,
        lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        batch_group_count=batch_group_count,
        preferred_element_type=jnp.int32,
    )
    # out channel is last for the flax NHWC/HWIO/NHWC numbers
    return (out.astype(f32) * (a_scale * w_scale)).astype(orig_dtype)


def _policy_int8_pointwise(kernel_size: int, groups: int):
    """The measured-win policy: int8 only where the MXU speedup is real."""
    if kernel_size == 1 and groups == 1:
        return int8_conv_general_dilated
    return None


QUANT_POLICIES = {"int8": _policy_int8_pointwise}


@contextlib.contextmanager
def quantized_convs(policy: str):
    """Activate a conv-quantization policy for every ``models.layers.conv2d``
    constructed while tracing under this context (the central conv helper
    consults the hook installed here). Thread-local: activate it in the
    thread that TRACES the serving function."""
    from ..models.layers import _conv_policy

    if policy not in QUANT_POLICIES:
        raise ValueError(f"unknown quantization policy {policy!r}; "
                         f"known: {sorted(QUANT_POLICIES)}")
    prev = getattr(_conv_policy, "fn", None)
    _conv_policy.fn = QUANT_POLICIES[policy]
    try:
        yield
    finally:
        _conv_policy.fn = prev
