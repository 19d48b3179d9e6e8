"""GRU cell with torch gate semantics.

The reference updates slot state with a single-layer ``nn.GRU(dim, dim)`` applied
to a length-1 sequence (``sloter/utils/slot_attention.py:38,60-66``), which is
exactly one GRUCell step per slot. Torch gate math (what cuDNN computes):

    r = sigmoid(x @ W_ir^T + b_ir + h @ W_hr^T + b_hr)
    z = sigmoid(x @ W_iz^T + b_iz + h @ W_hz^T + b_hz)
    n = tanh  (x @ W_in^T + b_in + r * (h @ W_hn^T + b_hn))
    h' = (1 - z) * n + z * h

Parameters are stored in torch layout — ``w_ih``/``w_hh`` of shape ``(3*d, d)``
with gate order (r, z, n), ``b_ih``/``b_hh`` of shape ``(3*d,)`` — so that torch
checkpoints convert without reshuffling.
"""

from __future__ import annotations

from typing import TypedDict

import jax
import jax.numpy as jnp

__all__ = ["GRUParams", "gru_cell", "init_gru_params"]


class GRUParams(TypedDict):
    w_ih: jnp.ndarray  # (3d, d)
    w_hh: jnp.ndarray  # (3d, d)
    b_ih: jnp.ndarray  # (3d,)
    b_hh: jnp.ndarray  # (3d,)


def init_gru_params(key: jax.Array, dim: int, dtype=jnp.float32) -> GRUParams:
    """Uniform(-1/sqrt(d), 1/sqrt(d)) init, the torch nn.GRU default."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / (dim**0.5)

    def u(k, shape):
        return jax.random.uniform(k, shape, dtype, minval=-bound, maxval=bound)

    return GRUParams(
        w_ih=u(k1, (3 * dim, dim)),
        w_hh=u(k2, (3 * dim, dim)),
        b_ih=u(k3, (3 * dim,)),
        b_hh=u(k4, (3 * dim,)),
    )


def gru_cell(params: GRUParams, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step. x, h: (..., d) -> (..., d)."""
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h
