"""The xSlot attention iteration — SCOUTER's heart — as a pure JAX function.

Numeric contract (reference ``sloter/utils/slot_attention.py:44-96``):

- ``num_slots = num_classes * slots_per_class`` (:14)
- learned initial slots, shape (1, S, d), broadcast over batch (:46)
- keys ``k = to_k(inputs_pe)`` where ``to_k`` is a stack of ``to_k_layer`` Linear
  layers with ReLU between (:30-37,47); values are the *non*-position-embedded
  features ``inputs_x`` (:58)
- ``to_q`` exists in the reference but is bypassed (``q = slots``, :52-53); we
  simply do not create it
- per iteration (3 fixed iterations, :49):
    dots  = (q @ k^T) * d**-0.5                                  (:55)
    dots  = dots / dots.sum(j, keepdims) * dots.sum(i&j, keepdims)  (:56)
    attn  = sigmoid(dots)                                        (:57)
    upd   = (attn @ inputs_x) / d                                (:58-59)
    slots = GRUCell(upd, slots)   # flattened over (batch, slot) (:60-66)
- after the loop, if slots_per_class > 1 the *updates* (not slots) are sum-pooled
  per class (:87-91)
- returns ``loss_status * updates.sum(-1)`` as class confidences and the area
  loss ``(sum(attn) / (B*S*N)) ** power`` (:93-96). ``relu(attn)`` in the
  reference (:93) is a no-op since attn is a sigmoid output.

The final-iteration attention maps are returned as a regular output for host-side
rendering — the reference writes PNGs inside ``forward`` (:68-85); we do not.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .gru import GRUParams, gru_cell, init_gru_params

__all__ = ["XSlotConfig", "init_xslot_params", "xslot_attention"]


@dataclasses.dataclass(frozen=True)
class XSlotConfig:
    """Static configuration of the xSlot module (reference :10)."""

    num_classes: int
    slots_per_class: int = 1
    dim: int = 64
    iters: int = 3
    loss_status: float = 1.0
    power: float = 1.0
    to_k_layer: int = 1

    @property
    def num_slots(self) -> int:
        return self.num_classes * self.slots_per_class


def init_xslot_params(key: jax.Array, cfg: XSlotConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Initialize xSlot parameters.

    Matches the reference's init distributions (slot_attention.py:20-38): initial
    slots ~ N(mu, |sigma|) with mu, sigma themselves standard-normal per feature
    (shared across slots at init), Linear layers with torch default
    U(-1/sqrt(d), 1/sqrt(d)), and the GRU's torch default init.
    """
    k_mu, k_sigma, k_draw, k_gru, *k_lin = jax.random.split(key, 4 + cfg.to_k_layer)
    d = cfg.dim
    mu = jax.random.normal(k_mu, (1, 1, d), dtype)
    sigma = jax.random.normal(k_sigma, (1, 1, d), dtype)
    initial_slots = mu + jnp.abs(sigma) * jax.random.normal(k_draw, (1, cfg.num_slots, d), dtype)

    bound = 1.0 / (d**0.5)
    to_k: List[Dict[str, jnp.ndarray]] = []
    for lk in k_lin:
        kw, kb = jax.random.split(lk)
        to_k.append(
            {
                # torch Linear layout (out, in) so checkpoints convert 1:1
                "weight": jax.random.uniform(kw, (d, d), dtype, -bound, bound),
                "bias": jax.random.uniform(kb, (d,), dtype, -bound, bound),
            }
        )

    return {
        "initial_slots": initial_slots,  # (1, S, d)
        "to_k": to_k,
        "gru": init_gru_params(k_gru, d, dtype),
    }


def _apply_to_k(to_k: List[Dict[str, jnp.ndarray]], x: jnp.ndarray) -> jnp.ndarray:
    """Linear(+ReLU+Linear)*: ReLU between layers, none after the last (:30-37)."""
    for i, layer in enumerate(to_k):
        if i > 0:
            x = jax.nn.relu(x)
        x = x @ layer["weight"].T + layer["bias"]
    return x


def xslot_iteration(
    slots: jnp.ndarray,
    k: jnp.ndarray,
    values: jnp.ndarray,
    gru: GRUParams,
    scale: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One xSlot iteration. Returns (new_slots, updates, attn).

    slots: (B, S, d), k/values: (B, N, d).
    """
    b, s, d = slots.shape
    dots = jnp.einsum("bid,bjd->bij", slots, k) * scale  # (B, S, N)
    row_sum = jnp.sum(dots, axis=2, keepdims=True)  # (B, S, 1)
    total = jnp.sum(dots, axis=(1, 2), keepdims=True)  # (B, 1, 1)
    dots = dots / row_sum * total  # reference :56 — no epsilon, by design
    attn = jax.nn.sigmoid(dots)
    updates = jnp.einsum("bij,bjd->bid", attn, values) / d  # :58-59
    new_slots = gru_cell(gru, updates.reshape(b * s, d), slots.reshape(b * s, d))
    return new_slots.reshape(b, s, d), updates, attn


def xslot_attention(
    params: Dict[str, Any],
    cfg: XSlotConfig,
    inputs_pe: jnp.ndarray,
    inputs_x: jnp.ndarray,
    *,
    fused: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full xSlot module forward.

    Args:
      params: from :func:`init_xslot_params` (or converted torch weights).
      inputs_pe: (B, N, d) position-embedded features — key source.
      inputs_x: (B, N, d) raw features — value source.
      fused: run the 3-iteration loop as one Pallas TPU kernel (VMEM-resident);
        backward replays the jnp path via custom_vjp (ops/slot_pallas.py).
      interpret: Pallas interpreter mode (for CPU tests of the fused path).

    Returns:
      (class_logits (B, C), area_loss scalar, attn (B, S, N)) where attn is the
      final iteration's attention map for host-side visualization.
    """
    b, n, d = inputs_pe.shape
    scale = float(d) ** -0.5
    k = _apply_to_k(params["to_k"], inputs_pe)

    if fused:
        from .slot_pallas import xslot_iterations_fused

        gru = params["gru"]
        updates, attn = xslot_iterations_fused(
            k, inputs_x, params["initial_slots"][0],
            gru["w_ih"], gru["w_hh"], gru["b_ih"][None], gru["b_hh"][None],
            cfg.iters, interpret,
        )
    else:
        slots = jnp.broadcast_to(params["initial_slots"], (b, cfg.num_slots, d))
        updates = attn = None
        for _ in range(cfg.iters):  # static loop; XLA fully unrolls/fuses
            slots, updates, attn = xslot_iteration(slots, k, inputs_x, params["gru"], scale)

    if cfg.slots_per_class > 1:
        # per-class sum-pool of the final updates (reference :87-91)
        pooled = updates.reshape(b, cfg.num_classes, cfg.slots_per_class, d).sum(axis=2)
    else:
        pooled = updates

    area = jnp.sum(attn) / (attn.shape[0] * attn.shape[1] * attn.shape[2])
    area = jnp.power(area, cfg.power)  # :94-96
    logits = cfg.loss_status * jnp.sum(pooled, axis=-1)  # (B, C)
    return logits, area, attn


def class_attention_maps(attn: jnp.ndarray, num_classes: int, slots_per_class: int) -> jnp.ndarray:
    """Collapse per-slot attention to per-class maps (reference :72-76).

    attn: (B, S, N) -> (B, C, N), summing over slots of the same class.
    """
    if slots_per_class == 1:
        return attn
    b, s, n = attn.shape
    return attn.reshape(b, num_classes, slots_per_class, n).sum(axis=2)
