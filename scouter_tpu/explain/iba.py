"""Information Bottleneck Attribution (IBA) — the capability of
``torchcam/IBA/pytorch.py:129-626``, functional JAX.

Pipeline parity:
1. Feature statistics over ~10k samples via a Welford-equivalent streaming
   estimator (TorchWelfordEstimator, :129-201): per-neuron mean, std (ddof=1),
   and active mask (nonzero fraction > threshold).
2. Per-sample analysis (:534-607): optimize a per-neuron logit map ``alpha``
   (init 5.0) with Adam(lr=1) for 10 steps, minimizing
   ``model_loss + beta * capacity.mean()`` where the bottleneck replaces
   features by ``z = lam*x + (1-lam)*(std*eps + mean)`` with
   ``lam = smooth(sigmoid(alpha))`` (gaussian kernel, sigma=1), and capacity is
   the feature-wise KL (:395-409).
3. Saliency = channel-summed capacity in bits, rescaled and bilinearly resized
   to the input (:617-626, utils.py:128-150).

The bottleneck injection point uses the backbone's functional stage split
(models/resnet.py stop_after/start_from) instead of forward hooks.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FeatureStats", "estimate_stats", "iba_analyze"]


class FeatureStats(NamedTuple):
    mean: jnp.ndarray
    std: jnp.ndarray
    active: jnp.ndarray  # float mask
    n_samples: int


def estimate_stats(feature_fn: Callable, batches, active_threshold: float = 0.01
                   ) -> FeatureStats:
    """Streaming per-neuron mean/std(ddof=1)/active-fraction over batches.

    Numerically equivalent to the reference's per-sample Welford update
    (pytorch.py:171-183) via the parallel combine form. The combine runs ON
    DEVICE in one jitted step per batch (feature extraction fused in), so
    only the input batches cross the host boundary — fetching every feature
    batch to host dominated the 5,000-image estimate on the remote runtime.
    """
    def update(carry, batch):
        n, mean, m2, nonzero = carry
        feats = feature_fn(batch)  # (B, ...)
        b = feats.shape[0]
        b_mean = feats.mean(axis=0)
        b_m2 = ((feats - b_mean) ** 2).sum(axis=0)
        b_nonzero = (feats != 0).sum(axis=0).astype(jnp.float32)
        delta = b_mean - mean
        tot = n + b
        # n=0 init degenerates to (b_mean, b_m2): delta*(b/tot)=b_mean,
        # delta^2*(n*b/tot)=0 — same first-batch seeding as the host loop.
        mean = mean + delta * (b / tot)
        m2 = m2 + b_m2 + delta**2 * (n * b / tot)
        return (tot, mean, m2, nonzero + b_nonzero)

    jit_update = jax.jit(update)
    n = jnp.float32(0.0)
    mean = m2 = nonzero = None
    for batch in batches:
        if mean is None:
            shape = jax.eval_shape(feature_fn, jnp.asarray(batch)).shape[1:]
            mean = jnp.zeros(shape, jnp.float32)
            m2 = jnp.zeros(shape, jnp.float32)
            nonzero = jnp.zeros(shape, jnp.float32)
        n, mean, m2, nonzero = jit_update((n, mean, m2, nonzero), batch)
    n = int(np.asarray(n))
    std = jnp.sqrt(m2 / max(n - 1, 1))
    active = (nonzero / n) > active_threshold
    return FeatureStats(
        mean=jnp.asarray(mean, jnp.float32),
        std=jnp.asarray(std, jnp.float32),
        active=jnp.asarray(active, jnp.float32),
        n_samples=n,
    )


def _gaussian_smooth(lam: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Fixed 2D gaussian depthwise conv with reflection padding
    (_SpatialGaussianKernel, pytorch.py:94-127). lam: (B, H, W, C)."""
    if sigma is None or sigma <= 0:
        return lam
    ks = int(round(2 * sigma)) * 2 + 1
    coords = np.arange(ks, dtype=np.float32)
    g = np.exp(-((coords - (ks - 1) / 2.0) ** 2) / (2 * sigma**2))
    k2d = np.outer(g, g)
    k2d /= k2d.sum()
    pad = (ks - 1) // 2
    lam = jnp.pad(lam, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    c = lam.shape[-1]
    kernel = jnp.asarray(k2d)[:, :, None, None] * jnp.ones((1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        lam, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _capacity(x, lam, mean, std):
    """Feature-wise KL of p(z|x) vs q(z) (_kl_div, pytorch.py:400-409)."""
    r_norm = (x - mean) / std
    var_z = (1.0 - lam) ** 2
    log_var_z = jnp.log(var_z)
    mu_z = r_norm * lam
    return -0.5 * (1 + log_var_z - mu_z**2 - var_z)


def iba_analyze(
    feature_fn: Callable,
    readout_loss_fn: Callable,
    x: jnp.ndarray,
    stats: FeatureStats,
    key,
    *,
    beta: float = 10.0,
    optimization_steps: int = 10,
    lr: float = 1.0,
    batch_size: int = 10,
    sigma: float = 1.0,
    min_std: float = 0.01,
    initial_alpha: float = 5.0,
    out_shape: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Per-sample IBA saliency.

    Args:
      feature_fn: (1, H, W, C_in) image -> (1, h, w, C) features at the
        bottleneck layer.
      readout_loss_fn: (B, h, w, C) bottlenecked features -> scalar model loss
        (e.g. NLL of the target class through the rest of the network).
      x: (1, H, W, C_in) input image.
      stats: from :func:`estimate_stats` at the same layer.
      out_shape: if given, resize the saliency map to this (H, W).

    Returns: (h, w) or out_shape saliency map in bits.
    """
    import optax

    feats = feature_fn(x)  # (1, h, w, C)
    feats_b = jnp.broadcast_to(feats, (batch_size, *feats.shape[1:]))
    std = jnp.maximum(stats.std, min_std)
    mean, active = stats.mean, stats.active

    alpha0 = jnp.full(feats.shape[1:], initial_alpha, jnp.float32)
    tx = optax.adam(lr)

    def loss_fn(alpha, eps):
        lam = jax.nn.sigmoid(alpha)[None]
        lam = _gaussian_smooth(jnp.broadcast_to(lam, feats_b.shape), sigma)
        capacity = _capacity(feats_b, lam, mean, std) * active
        z = (lam * feats_b + (1.0 - lam) * (std * eps + mean)) * active
        model_loss = readout_loss_fn(z)
        info_loss = capacity.mean()
        return model_loss + beta * info_loss, capacity

    def step(carry, k):
        alpha, opt_state = carry
        eps = jax.random.normal(k, feats_b.shape)
        (_, capacity), grads = jax.value_and_grad(loss_fn, has_aux=True)(alpha, eps)
        updates, opt_state = tx.update(grads, opt_state, alpha)
        alpha = optax.apply_updates(alpha, updates)
        return (alpha, opt_state), capacity

    keys = jax.random.split(key, optimization_steps)
    (_, _), capacities = jax.lax.scan(step, (alpha0, tx.init(alpha0)), keys)
    capacity = capacities[-1].mean(axis=0)  # (h, w, C), batch-averaged (:612-615)

    saliency = jnp.nansum(capacity, axis=-1) / math.log(2.0)  # bits (:141-142)
    if out_shape is not None:
        ho, wo = saliency.shape
        h, w = out_shape
        saliency = saliency * (ho * wo) / (h * w)
        saliency = jax.image.resize(saliency, out_shape, method="bilinear")
    return saliency
