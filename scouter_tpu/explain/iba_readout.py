"""Readout-IBA — capability of ``torchcam/IBA/pytorch_readout.py``.

Instead of optimizing a per-sample alpha (iba.py), a small readout network
(three 1x1 convs, identity-biased init: conv3 bias 5, weights x1e-3 — see
pytorch_readout.py:46-64) predicts alpha from the *normalized* intermediate
feature maps of a nested forward pass, resized to the bottleneck resolution.
The readout net is trained once over a dataset with the same IBA objective
(model loss + beta * mean capacity); analysis is then a single forward pass.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .iba import FeatureStats, _capacity, _gaussian_smooth

__all__ = ["ReadoutNet", "readout_inputs", "train_readout", "readout_analyze"]


class ReadoutNet(nn.Module):
    """1x1 conv stack: in -> in//2 -> 2*out -> out (alpha logits)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        in_chs = x.shape[-1]
        x = nn.Conv(in_chs // 2, (1, 1), use_bias=True, name="conv1")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_channels * 2, (1, 1), use_bias=True, name="conv2")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(
            self.out_channels, (1, 1), use_bias=True,
            kernel_init=lambda k, s, d=jnp.float32: (
                nn.initializers.lecun_normal()(k, s, d) * 1e-3
            ),
            bias_init=nn.initializers.constant(5.0),  # identity-ish start (:60-62)
            name="conv3",
        )(x)
        return x


def readout_inputs(
    feature_maps: Sequence[jnp.ndarray],
    stats: Sequence[FeatureStats],
    target_hw,
) -> jnp.ndarray:
    """Normalize each readout layer's features and resize to the bottleneck
    resolution, concatenated over channels. feature_maps: list of (B, h, w, C)."""
    outs = []
    for f, s in zip(feature_maps, stats):
        z = (f - s.mean) / jnp.maximum(s.std, 1e-5)
        b, h, w, c = z.shape
        if (h, w) != tuple(target_hw):
            z = jax.image.resize(z, (b, *target_hw, c), method="bilinear")
        outs.append(z)
    return jnp.concatenate(outs, axis=-1)


def _bottleneck_forward(params, readout, inputs, feats, stats: FeatureStats, eps,
                        sigma, min_std):
    alpha = readout.apply(params, inputs)
    lam = jax.nn.sigmoid(alpha)
    lam = _gaussian_smooth(lam, sigma)
    std = jnp.maximum(stats.std, min_std)
    capacity = _capacity(feats, lam, stats.mean, std) * stats.active
    z = (lam * feats + (1.0 - lam) * (std * eps + stats.mean)) * stats.active
    return z, capacity


def train_readout(
    readout_params,
    readout: ReadoutNet,
    batches: Callable,
    feature_fn: Callable,
    readout_feature_fn: Callable,
    readout_stats: Sequence[FeatureStats],
    bottleneck_stats: FeatureStats,
    model_loss_fn: Callable,
    key,
    *,
    steps: int = 100,
    lr: float = 1e-3,
    beta: float = 10.0,
    sigma: float = 1.0,
    min_std: float = 0.01,
):
    """Train the readout net over a dataset (pytorch_readout training loop
    capability). ``batches()`` yields image batches; ``feature_fn`` maps images
    to bottleneck features; ``readout_feature_fn`` to the list of readout maps;
    ``model_loss_fn(z, batch)`` completes the network from bottlenecked features.
    """
    import optax

    tx = optax.adam(lr)
    opt_state = tx.init(readout_params)

    @jax.jit
    def step(params, opt_state, images, batch_aux, k):
        feats = feature_fn(images)
        rfeats = readout_feature_fn(images)
        inputs = readout_inputs(rfeats, readout_stats, feats.shape[1:3])
        eps = jax.random.normal(k, feats.shape)

        def loss_fn(p):
            z, capacity = _bottleneck_forward(
                p, readout, inputs, feats, bottleneck_stats, eps, sigma, min_std
            )
            return model_loss_fn(z, batch_aux) + beta * capacity.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    it = batches()
    for i in range(steps):
        try:
            images, aux = next(it)
        except StopIteration:
            it = batches()
            images, aux = next(it)
        key, k = jax.random.split(key)
        readout_params, opt_state, loss = step(readout_params, opt_state, images, aux, k)
        losses.append(float(loss))
    return readout_params, losses


def readout_analyze(
    readout_params,
    readout: ReadoutNet,
    image,
    feature_fn: Callable,
    readout_feature_fn: Callable,
    readout_stats: Sequence[FeatureStats],
    bottleneck_stats: FeatureStats,
    *,
    sigma: float = 1.0,
    min_std: float = 0.01,
    out_shape=None,
) -> jnp.ndarray:
    """Single-pass saliency from the trained readout (analyze capability)."""
    import math

    feats = feature_fn(image)
    rfeats = readout_feature_fn(image)
    inputs = readout_inputs(rfeats, readout_stats, feats.shape[1:3])
    alpha = readout.apply(readout_params, inputs)
    lam = _gaussian_smooth(jax.nn.sigmoid(alpha), sigma)
    std = jnp.maximum(bottleneck_stats.std, min_std)
    capacity = _capacity(feats, lam, bottleneck_stats.mean, std) * bottleneck_stats.active
    saliency = jnp.nansum(capacity[0], axis=-1) / math.log(2.0)
    if out_shape is not None:
        ho, wo = saliency.shape
        saliency = saliency * (ho * wo) / (out_shape[0] * out_shape[1])
        saliency = jax.image.resize(saliency, out_shape, method="bilinear")
    return saliency
