"""DETR-style sine position embedding.

Numeric contract mirrors the reference ``sloter/utils/position_encode.py:10-46``
(``PositionEmbeddingSine`` with ``normalize=True``, ``scale=2*pi``,
``temperature=10000``) as built by ``build_position_encoding('sine', hidden_dim)``
(``sloter/utils/position_encode.py:77-87``, ``N_steps = hidden_dim // 2``).

TPU-first differences from the reference:
- Computed once per (h, w, dim) shape at trace time as a constant — the reference
  recomputes it on-device every forward.
- NHWC layout: returns ``(h, w, hidden_dim)`` with the channel order
  ``[y-features, x-features]`` matching the reference's channel-first concat.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["sine_position_embedding"]


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """[sin(p0), cos(p1), sin(p2), cos(p3), ...] over the last axis.

    Matches ``torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()), -1).flatten(-2)``
    (reference ``position_encode.py:43-44``).
    """
    even = jnp.sin(pos[..., 0::2])
    odd = jnp.cos(pos[..., 1::2])
    out = jnp.stack([even, odd], axis=-1)
    return out.reshape(*pos.shape[:-1], -1)


def sine_position_embedding(
    h: int,
    w: int,
    hidden_dim: int,
    *,
    temperature: float = 10000.0,
    scale: float = 2.0 * math.pi,
    eps: float = 1e-6,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Return the (h, w, hidden_dim) sine position embedding.

    ``hidden_dim`` must be even; each spatial axis gets ``hidden_dim // 2``
    features (reference ``position_encode.py:78``).
    """
    num_pos_feats = hidden_dim // 2
    if hidden_dim % 4 != 0:
        # the sin/cos interleave splits num_pos_feats = hidden_dim//2 into
        # even/odd halves that must be equal-sized; hidden_dim = 2 mod 4
        # crashes the reference's torch.stack the same way (DETR position
        # encoding requires hidden_dim divisible by 4)
        raise ValueError(f"hidden_dim must be divisible by 4, got {hidden_dim}")

    # cumsum of an all-ones mask == 1..h / 1..w (reference :29-32), then
    # normalized by the last value + eps and scaled by 2*pi (reference :33-36).
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)
    x_embed = jnp.arange(1, w + 1, dtype=jnp.float32)
    y_embed = y_embed / (float(h) + eps) * scale
    x_embed = x_embed / (float(w) + eps) * scale

    # dim_t[i] = temperature ** (2 * (i // 2) / num_pos_feats)  (reference :38-39)
    idx = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = jnp.power(temperature, 2.0 * jnp.floor(idx / 2.0) / num_pos_feats)

    pos_x = x_embed[None, :, None] / dim_t  # (1, w, npf)
    pos_y = y_embed[:, None, None] / dim_t  # (h, 1, npf)
    pos_x = _interleave_sin_cos(pos_x)
    pos_y = _interleave_sin_cos(pos_y)

    pos_x = jnp.broadcast_to(pos_x, (h, w, num_pos_feats))
    pos_y = jnp.broadcast_to(pos_y, (h, w, num_pos_feats))
    # Channel-first concat (pos_y, pos_x) in the reference (:45) maps to a
    # trailing-axis concat in NHWC.
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)
