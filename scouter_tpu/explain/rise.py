"""RISE attribution — batched JAX port of the capability of
``torchray/attribution/rise.py:110-240``.

Semantics: ``num_masks`` random low-res binary grids (cell value 1 w.p. ``p``),
bilinearly upsampled to input+cell size, randomly shifted, applied
multiplicatively to the input; per-mask class scores pass through sigmoid, and
the saliency for each class is the score-weighted average of the masks.

TPU-first: mask generation, masking, forwards, and the weighted accumulation
are one scanned program over chunks — the reference's per-image python loop and
RNG state save/restore (rise.py:176-233) are replaced by an explicit PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rise"]


def _make_masks(key, num: int, num_cells: int, p: float,
                height: int, width: int) -> jnp.ndarray:
    """(num, H, W) float masks: low-res binary -> bilinear upsample -> shift crop."""
    kg, kx, ky = jax.random.split(key, 3)
    cell_h = -(-height // num_cells)
    cell_w = -(-width // num_cells)
    up_h, up_w = height + cell_h, width + cell_w

    grid = (jax.random.uniform(kg, (num, num_cells, num_cells)) < p).astype(jnp.float32)
    up = jax.image.resize(grid, (num, up_h, up_w), method="bilinear")
    sx = jax.random.randint(kx, (num,), 0, cell_h)
    sy = jax.random.randint(ky, (num,), 0, cell_w)

    def crop(m, ox, oy):
        return jax.lax.dynamic_slice(m, (ox, oy), (height, width))

    return jax.vmap(crop)(up, sx, sy)


def rise(
    forward,
    x: jnp.ndarray,
    key,
    *,
    num_masks: int = 8000,
    num_cells: int = 7,
    batch_size: int = 32,
    p: float = 0.5,
) -> jnp.ndarray:
    """RISE saliency for all classes.

    Args:
      forward: images (B, H, W, C) -> logits (B, num_classes).
      x: (1, H, W, C) input.
    Returns: (num_classes, H, W) saliency.
    """
    h, w = x.shape[1:3]
    num_chunks = -(-num_masks // batch_size)
    total = num_chunks * batch_size
    keys = jax.random.split(key, num_chunks)

    def chunk(carry, k):
        masks = _make_masks(k, batch_size, num_cells, p, h, w)  # (bs, H, W)
        masked = x * masks[..., None]  # (bs, H, W, C)
        scores = jax.nn.sigmoid(forward(masked))  # (bs, C)
        # saliency += scores^T @ masks
        sal = jnp.einsum("bc,bhw->chw", scores, masks)
        return carry + sal, None

    n_classes = forward(x).shape[1]
    init = jnp.zeros((n_classes, h, w), jnp.float32)
    sal, _ = jax.lax.scan(chunk, init, keys)
    return sal / total
