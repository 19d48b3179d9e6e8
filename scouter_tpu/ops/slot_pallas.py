"""Fused Pallas TPU kernel for the xSlot attention inner loop.

The reference's hot loop (``sloter/utils/slot_attention.py:49-66``) is three
sequential iterations of {dots, renorm, sigmoid, weighted update, GRU} over
small operands (S<=128 slots, N=81 positions, d=64). On TPU the win is VMEM
residency: one kernel invocation per batch element keeps slots, keys, values,
and all intermediates on-chip across the three iterations — zero HBM round
trips between iterations.

Gradients: the kernel checkpoints each iteration's input slots into a third
output (``hist``), and the ``jax.custom_vjp`` backward walks the iterations in
reverse, re-deriving one iteration's intermediates at a time from its
checkpoint via the oracle-tested jnp formulas (ops/slot_attention.py). Total
backward recompute is one forward's worth — no full-chain forward replay.

The key projection ``to_k`` stays outside the kernel: it is a clean batched
matmul XLA already maps to the MXU optimally.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gru import GRUParams

__all__ = ["xslot_iterations_fused", "xslot_iterations_ref"]


def _gru_mm(x, w):
    # (S, d) @ (3d, d)^T -> (S, 3d)
    return jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel(k_ref, v_ref, slots_ref, w_ih_ref, w_hh_ref, b_ih_ref, b_hh_ref,
            upd_ref, attn_ref, hist_ref=None, *, iters: int, scale: float):
    k = k_ref[0]  # (N, d)
    v = v_ref[0]  # (N, d)
    slots = slots_ref[:]  # (S, d)
    w_ih = w_ih_ref[:]  # (3d, d)
    w_hh = w_hh_ref[:]
    b_ih = b_ih_ref[:]  # (1, 3d)
    b_hh = b_hh_ref[:]
    d = slots.shape[-1]

    updates = attn = None
    for it in range(iters):
        # checkpoint the iteration's input slots for the backward pass
        # (inference builds without the hist output — no wasted HBM writes)
        if hist_ref is not None:
            hist_ref[0, it] = slots
        # dots = (slots @ k^T) * d^-0.5              (slot_attention.py:55)
        dots = jax.lax.dot_general(
            slots, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (S, N)
        # renorm: rows to unit sum, rescaled by the global sum (:56)
        row_sum = jnp.sum(dots, axis=1, keepdims=True)
        total = jnp.sum(dots)
        dots = dots / row_sum * total
        attn = jax.nn.sigmoid(dots)
        # updates = attn @ v / d                      (:58-59)
        updates = jax.lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) / d  # (S, d)
        # GRU cell (torch gate order r,z,n)           (:60-66)
        gi = _gru_mm(updates, w_ih) + b_ih
        gh = _gru_mm(slots, w_hh) + b_hh
        r = jax.nn.sigmoid(gi[:, :d] + gh[:, :d])
        z = jax.nn.sigmoid(gi[:, d:2 * d] + gh[:, d:2 * d])
        n = jnp.tanh(gi[:, 2 * d:] + r * gh[:, 2 * d:])
        slots = (1.0 - z) * n + z * slots

    upd_ref[0] = updates
    attn_ref[0] = attn


def _fused_forward(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh,
                   *, iters: int, interpret: bool, emit_hist: bool = True):
    """Returns (updates, attn[, slots_history]); history[i] = slots entering
    iteration i — the checkpoints the backward pass rebuilds each step from.
    ``emit_hist=False`` (inference) builds the kernel without the history
    output: no (B, iters, S, d) HBM writes for a buffer nobody reads."""
    b, n, d = k.shape
    s = initial_slots.shape[0]
    scale = float(d) ** -0.5
    kernel = functools.partial(_kernel, iters=iters, scale=scale)
    grid = (b,)
    out_specs = [
        pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, s, d), jnp.float32),
        jax.ShapeDtypeStruct((b, s, n), jnp.float32),
    ]
    if emit_hist:
        out_specs.append(pl.BlockSpec((1, iters, s, d), lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, iters, s, d), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh)


def _ref_iterations(k, v, initial_slots, gru: GRUParams, iters: int):
    """Pure-jnp reference (same math as ops/slot_attention.xslot_iteration)."""
    from .slot_attention import xslot_iteration

    b = k.shape[0]
    s, d = initial_slots.shape
    slots = jnp.broadcast_to(initial_slots[None], (b, s, d))
    scale = float(d) ** -0.5
    updates = attn = None
    for _ in range(iters):
        slots, updates, attn = xslot_iteration(slots, k, v, gru, scale)
    return updates, attn


def xslot_iterations_ref(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh, *, iters=3):
    gru = GRUParams(w_ih=w_ih, w_hh=w_hh, b_ih=b_ih[0], b_hh=b_hh[0])
    return _ref_iterations(k, v, initial_slots, gru, iters)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def xslot_iterations_fused(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh,
                           iters: int = 3, interpret: bool = False):
    """Fused 3-iteration xSlot loop.

    Args:
      k: (B, N, d) keys (to_k output); v: (B, N, d) values (raw features).
      initial_slots: (S, d); GRU weights in torch layout, biases as (1, 3d).
    Returns: (updates (B, S, d), attn (B, S, N)) from the final iteration.
    """
    # primal (inference, no grad being traced): hist-free kernel build —
    # the (B, iters, S, d) checkpoint buffer exists only under the VJP
    upd, attn = _fused_forward(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh,
                               iters=iters, interpret=interpret,
                               emit_hist=False)
    return upd, attn


def _fwd(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh, iters, interpret):
    upd, attn, hist = _fused_forward(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh,
                                     iters=iters, interpret=interpret)
    return (upd, attn), (k, v, w_ih, w_hh, b_ih, b_hh, hist)


def _bwd(iters, interpret, residuals, grads):
    """Checkpointed backward: the kernel saved each iteration's input slots
    (``hist``), so the VJP walks the iterations in reverse, rebuilding one
    iteration's intermediates at a time from its checkpoint — total recompute
    is one forward's worth, with no full-chain replay (the previous
    implementation re-ran the entire jnp forward under ``jax.vjp``).

    The single-iteration math is ``ops.slot_attention.xslot_iteration`` — the
    oracle-tested formula set, identical to the kernel's.
    """
    from .slot_attention import xslot_iteration

    k, v, w_ih, w_hh, b_ih, b_hh, hist = residuals
    du, dattn = grads
    d = k.shape[-1]
    scale = float(d) ** -0.5

    def one_iter(slots, k_, v_, wi, wh, bi, bh):
        gru = GRUParams(w_ih=wi, w_hh=wh, b_ih=bi[0], b_hh=bh[0])
        return xslot_iteration(slots, k_, v_, gru, scale)

    zero_du = jnp.zeros_like(du)
    zero_dattn = jnp.zeros_like(dattn)
    dslots = jnp.zeros_like(hist[:, 0])
    dk = dv = dwi = dwh = dbi = dbh = None
    for i in range(iters - 1, -1, -1):
        _, vjp = jax.vjp(one_iter, hist[:, i], k, v, w_ih, w_hh, b_ih, b_hh)
        # only the FINAL iteration's updates/attn leave the op (:58-59 outputs)
        cot = (dslots, du, dattn) if i == iters - 1 else (dslots, zero_du, zero_dattn)
        dslots, dk_i, dv_i, dwi_i, dwh_i, dbi_i, dbh_i = vjp(cot)
        if dk is None:
            dk, dv, dwi, dwh, dbi, dbh = dk_i, dv_i, dwi_i, dwh_i, dbi_i, dbh_i
        else:
            dk, dv, dwi, dwh, dbi, dbh = (
                dk + dk_i, dv + dv_i, dwi + dwi_i, dwh + dwh_i,
                dbi + dbi_i, dbh + dbh_i,
            )
    # initial slots are broadcast over the batch in the forward — sum the
    # batch cotangent back down to the (S, d) parameter
    d_init = dslots.sum(axis=0)
    return dk, dv, d_init, dwi, dwh, dbi, dbh


xslot_iterations_fused.defvjp(_fwd, _bwd)
