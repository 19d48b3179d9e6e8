"""Fused Pallas TPU kernel for the xSlot attention inner loop.

The reference's hot loop (``sloter/utils/slot_attention.py:49-66``) is three
sequential iterations of {dots, renorm, sigmoid, weighted update, GRU} over
small operands (S<=128 slots, N=81 positions, d=64). On TPU the win is VMEM
residency: one kernel invocation per batch element keeps slots, keys, values,
and all intermediates on-chip across the three iterations — zero HBM round
trips between iterations.

Gradients: the kernel is wrapped in ``jax.custom_vjp`` whose backward replays
the pure-jnp reference implementation (ops/slot_attention.py) under ``jax.vjp``
— identical math (same formulas, fp32), so forward speed comes from the kernel
while training correctness is anchored to the oracle-tested jnp path.

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
            upd_ref, attn_ref, *, iters: int, scale: float):
    k = k_ref[0]  # (N, d)
    v = v_ref[0]  # (N, d)
    slots = slots_ref[:]  # (S, d)
    w_ih = w_ih_ref[:]  # (3d, d)
    w_hh = w_hh_ref[:]
    b_ih = b_ih_ref[:]  # (1, 3d)
    b_hh = b_hh_ref[:]
    d = slots.shape[-1]

    updates = attn = None
    for _ in range(iters):
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
                   *, iters: int, interpret: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, n, d = k.shape
    s = initial_slots.shape[0]
    scale = float(d) ** -0.5
    kernel = functools.partial(_kernel, iters=iters, scale=scale)
    grid = (b,)
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
        out_specs=[
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, d), jnp.float32),
            jax.ShapeDtypeStruct((b, s, n), jnp.float32),
        ],
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
    return _fused_forward(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh,
                          iters=iters, interpret=interpret)


def _fwd(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh, iters, interpret):
    out = _fused_forward(k, v, initial_slots, w_ih, w_hh, b_ih, b_hh,
                         iters=iters, interpret=interpret)
    return out, (k, v, initial_slots, w_ih, w_hh, b_ih, b_hh)


def _bwd(iters, interpret, residuals, grads):
    k, v, initial_slots, w_ih, w_hh, b_ih, b_hh = residuals

    def ref(k_, v_, s_, wi_, wh_, bi_, bh_):
        return xslot_iterations_ref(k_, v_, s_, wi_, wh_, bi_, bh_, iters=iters)

    _, vjp = jax.vjp(ref, k, v, initial_slots, w_ih, w_hh, b_ih, b_hh)
    return vjp(tuple(grads))


xslot_iterations_fused.defvjp(_fwd, _bwd)
