"""Layer DeepLift (Rescale rule) — the capability the reference drives through
captum in ``captum_vis.py:113-128`` (LayerDeepLift on the backbone).

Rescale rule: every ReLU's backward multiplier becomes delta_out/delta_in
between the actual and baseline activations (falling back to the local gradient
when |delta_in| < 1e-7). Implemented by stacking [input; baseline] into one
batch and swapping in a paired custom-vjp ReLU via models/act.override_relu —
the chain of multipliers is then exactly the gradient of
``score(x) - score(x0)`` through the modified graph. Layer attribution is
``(a - a0) * m`` at the chosen stage output.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.act import override_relu

__all__ = ["layer_deeplift", "deeplift"]


def _paired_rescale_relu(z):
    """ReLU whose backward uses the DeepLift rescale multiplier.

    z: (2B, ...) stacked [actual; baseline] activations.
    """

    @jax.custom_vjp
    def f(z):
        return jax.nn.relu(z)

    def fwd(z):
        return jax.nn.relu(z), z

    def bwd(z, g):
        b = z.shape[0] // 2
        za, zb = z[:b], z[b:]
        delta = za - zb
        local = (za > 0).astype(z.dtype)
        m = jnp.where(jnp.abs(delta) > 1e-7,
                      (jax.nn.relu(za) - jax.nn.relu(zb)) / jnp.where(delta == 0, 1.0, delta),
                      local)
        ga, gb = g[:b], g[b:]
        return (jnp.concatenate([ga * m, gb * m]),)

    f.defvjp(fwd, bwd)
    return f(z)


def layer_deeplift(model, variables, x, class_idx: int,
                   baseline: Optional[jnp.ndarray] = None,
                   layer: str = "layer4") -> jnp.ndarray:
    """DeepLift attribution at a stage output. Returns (h, w, C) contributions.

    x: (1, H, W, C); baseline defaults to zeros (captum default).
    """
    if baseline is None:
        baseline = jnp.zeros_like(x)
    stacked = jnp.concatenate([x, baseline])
    feats_pair = model.apply(variables, stacked, stop_after=layer)

    def score(f_pair):
        with override_relu(_paired_rescale_relu):
            out = model.apply(variables, f_pair, start_from=layer)
        return out[0, class_idx] - out[1, class_idx]

    g = jax.grad(score)(feats_pair)
    delta = feats_pair[0] - feats_pair[1]
    return delta * g[0]


def deeplift(model, variables, x, class_idx: int,
             baseline: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Input-level DeepLift: (x - x0) * multiplier-chain gradient. (H, W, C)."""
    if baseline is None:
        baseline = jnp.zeros_like(x)
    stacked = jnp.concatenate([x, baseline])

    def score(s):
        with override_relu(_paired_rescale_relu):
            out = model.apply(variables, s)
        return out[0, class_idx] - out[1, class_idx]

    g = jax.grad(score)(stacked)
    return (x[0] - baseline[0]) * g[0]
