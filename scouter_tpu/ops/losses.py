"""SCOUTER loss composition.

Reference contract (``sloter/slot_model.py:117-125``):
    output = log_softmax(logits, axis=1)
    loss   = nll_loss(output, target) + lambda_value * area_loss   (slot mode)
    loss   = nll_loss(output, target)                              (no-slot mode)

``nll_loss`` with log-probabilities is mean cross-entropy over the batch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["log_softmax_nll", "scouter_loss"]


def log_softmax_nll(logits: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (log_probs, mean NLL). labels: int (B,).

    Logits are upcast to float32 first: under the bf16 compute path
    (``compute_dtype='bfloat16'``) the model emits bf16 class scores, and
    log-softmax / NLL in bf16 loses ~2 decimal digits of loss resolution —
    the reduction is cheap, so it always runs in fp32."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    nll = -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=1))
    return log_probs, nll


def scouter_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    area_loss: Optional[jnp.ndarray] = None,
    lambda_value: float = 1.0,
):
    """Compose the SCOUTER training loss.

    Returns (log_probs, loss_dict) where loss_dict mirrors the reference's
    ``[loss, nll, att_loss]`` list (``slot_model.py:121-122``).
    """
    log_probs, nll = log_softmax_nll(logits, labels)
    if area_loss is None:
        return log_probs, {"loss": nll}
    area_loss = jnp.asarray(area_loss, jnp.float32)
    total = nll + lambda_value * area_loss
    return log_probs, {"loss": total, "log_loss": nll, "att_loss": area_loss}
