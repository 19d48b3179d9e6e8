"""Accuracy metrics — ``tools/calculate_tool.py:4-16`` parity, on-device."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["evaluate_top1", "evaluate_top5"]


def evaluate_top1(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Fraction of samples whose argmax matches the label."""
    return jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))


def evaluate_top5(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Fraction of samples whose label is in the top-5 logits."""
    k = min(5, logits.shape[1])
    top = jnp.argsort(logits, axis=1)[:, -k:]
    hit = (top == labels[:, None]).any(axis=1)
    return jnp.mean(hit.astype(jnp.float32))
