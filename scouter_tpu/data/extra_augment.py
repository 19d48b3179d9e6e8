"""Batch-level augmentations — capability of timm's data pipeline extras
(``timm/data/mixup.py``, ``timm/data/random_erasing.py``), TPU-side.

- :func:`mixup`: convex combination of the batch with its flipped self plus
  label smoothing into soft targets (mixup.py semantics: one lambda per batch).
- :func:`random_erasing`: per-image random rectangle replaced with gaussian
  noise ('pixel' mode) — fully vectorized with masks (no dynamic shapes).

Both are jit-friendly and keyed by explicit PRNG keys.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["mixup", "one_hot_smooth", "random_erasing"]


def one_hot_smooth(labels: jnp.ndarray, num_classes: int, smoothing: float = 0.0,
                   on_value: float = 1.0) -> jnp.ndarray:
    off = smoothing / num_classes
    on = on_value - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def mixup(
    images: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    key,
    *,
    alpha: float = 0.2,
    smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """timm mixup: blend the batch with its reverse by lam ~ Beta(alpha, alpha)."""
    lam = jax.random.beta(key, alpha, alpha)
    mixed = images * lam + images[::-1] * (1.0 - lam)
    y1 = one_hot_smooth(labels, num_classes, smoothing)
    y2 = one_hot_smooth(labels[::-1], num_classes, smoothing)
    targets = y1 * lam + y2 * (1.0 - lam)
    return mixed, targets


def random_erasing(
    images: jnp.ndarray,
    key,
    *,
    probability: float = 0.5,
    min_area: float = 0.02,
    max_area: float = 1.0 / 3.0,
    min_aspect: float = 0.3,
) -> jnp.ndarray:
    """Per-image random erase with gaussian-noise fill ('pixel' mode)."""
    b, h, w, c = images.shape
    keys = jax.random.split(key, 6)
    do = jax.random.bernoulli(keys[0], probability, (b,))
    area = h * w
    target_area = jax.random.uniform(keys[1], (b,), minval=min_area, maxval=max_area) * area
    log_ar = jax.random.uniform(
        keys[2], (b,), minval=jnp.log(min_aspect), maxval=jnp.log(1 / min_aspect)
    )
    aspect = jnp.exp(log_ar)
    eh = jnp.clip(jnp.sqrt(target_area * aspect), 1, h).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(target_area / aspect), 1, w).astype(jnp.int32)
    top = (jax.random.uniform(keys[3], (b,)) * (h - eh)).astype(jnp.int32)
    left = (jax.random.uniform(keys[4], (b,)) * (w - ew)).astype(jnp.int32)

    ys = jnp.arange(h)[None, :, None]  # (1, H, 1)
    xs = jnp.arange(w)[None, None, :]  # (1, 1, W)
    in_rect = (
        (ys >= top[:, None, None]) & (ys < (top + eh)[:, None, None])
        & (xs >= left[:, None, None]) & (xs < (left + ew)[:, None, None])
    )  # (B, H, W)
    mask = (in_rect & do[:, None, None])[..., None]
    noise = jax.random.normal(keys[5], images.shape, images.dtype)
    return jnp.where(mask, noise, images)
