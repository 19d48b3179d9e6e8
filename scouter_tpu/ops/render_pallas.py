"""Fused Pallas TPU kernel for attention-map rendering.

BASELINE.json asks for the heatmap render path fused on-device alongside the
slot kernel. This kernel takes the final-iteration attention maps (C, N) and
produces per-class RGBA jet heatmaps in one pass: per-class min-max scaling to
[0, 1] (slot_attention.py:79 semantics) followed by the classic piecewise-linear
jet colormap with the overlay alpha baked in (vis.py:7-28 contract: alpha 0.4).
Host code then only alpha-composites/encodes PNGs.

The exact-matplotlib path (explain/vis.py) remains the parity reference; this
kernel is the production fast path (identical up to jet-LUT interpolation
details). Output is float in [0, 255]; cast/quantize on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["render_heatmaps_fused", "render_heatmaps_ref", "jet_rgba"]


def jet_rgba(v: jnp.ndarray, alpha: float = 0.4) -> jnp.ndarray:
    """Classic jet colormap on v in [0, 1] -> (..., 4) in [0, 1]."""
    r = jnp.clip(jnp.minimum(4.0 * v - 1.5, -4.0 * v + 4.5), 0.0, 1.0)
    g = jnp.clip(jnp.minimum(4.0 * v - 0.5, -4.0 * v + 3.5), 0.0, 1.0)
    b = jnp.clip(jnp.minimum(4.0 * v + 0.5, -4.0 * v + 2.5), 0.0, 1.0)
    a = jnp.full_like(v, alpha)
    return jnp.stack([r, g, b, a], axis=-1)


def _kernel(attn_ref, out_ref, *, alpha: float):
    attn = attn_ref[0]  # (1, N) block -> one class row
    lo = jnp.min(attn)
    hi = jnp.max(attn)
    scaled = (attn - lo) / jnp.maximum(hi - lo, 1e-12)
    out_ref[0] = jet_rgba(scaled, alpha) * 255.0


def render_heatmaps_fused(attn: jnp.ndarray, alpha: float = 0.4,
                          interpret: bool = False) -> jnp.ndarray:
    """(C, N) attention -> (C, N, 4) jet RGBA in [0, 255], one kernel pass.

    Per-class min-max scaling (each class map normalized independently, the
    per-image behavior of the reference render path).
    """
    c, n = attn.shape
    kernel = functools.partial(_kernel, alpha=alpha)
    return pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n, 4), jnp.float32),
        interpret=interpret,
    )(attn.astype(jnp.float32))


def render_heatmaps_ref(attn: jnp.ndarray, alpha: float = 0.4) -> jnp.ndarray:
    """Pure-jnp reference of the same math."""
    lo = attn.min(axis=1, keepdims=True)
    hi = attn.max(axis=1, keepdims=True)
    scaled = (attn - lo) / jnp.maximum(hi - lo, 1e-12)
    return jet_rgba(scaled, alpha) * 255.0
