"""CAM-family attribution — functional JAX port of the capabilities of the
vendored torchcam (``torchcam/cams/cam.py:15-447``, ``gradcam.py:15-274``).

No hooks: the backbone's features/head split is explicit (features_only +
replicated pooling head), activations and their gradients come from jax.grad
over the head, and masked-forward families (Score-CAM etc.) are batched
channel sweeps instead of chunked loops.

All extractors take a single image (N=1, like the reference's precheck,
``cam.py:66-70``) and return a (h, w) map, min-max normalized by default
(``cam.py:50-56``). ReLU-before-normalize follows each method's reference flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "backbone_split",
    "fc_params",
    "cam",
    "gradcam",
    "gradcampp",
    "smooth_gradcampp",
    "scorecam",
    "sscam",
    "isscam",
]


def fc_params(variables):
    """(kernel, bias) of the classifier head, tolerant of both param layouts:
    the zoo's nested ``fc`` Dense module and the caffe benchmark models' flat
    ``fc_kernel``/``fc_bias`` (explain/benchmark_models.py)."""
    params = variables["params"]
    if "fc" in params:
        return params["fc"]["kernel"], params["fc"]["bias"]
    return params["fc_kernel"], params["fc_bias"]


def backbone_split(model, variables):
    """(features, head, forward) closures for a zoo backbone.

    head replicates the ResNet pooling head (global_avg_pool + fc) so that
    gradients w.r.t. the last conv features are direct.
    """

    def features(x):
        return model.apply(variables, x, features_only=True)  # (1, h, w, K)

    kernel, bias = fc_params(variables)

    def head(feats):
        pooled = feats.mean(axis=(1, 2))
        return pooled @ kernel + bias

    def forward(x):
        return head(features(x))

    return features, head, forward


def _normalize(m: jnp.ndarray) -> jnp.ndarray:
    """Per-map min-max over the spatial dims (torchcam _normalize)."""
    lo = m.min(axis=(-2, -1), keepdims=True)
    hi = m.max(axis=(-2, -1), keepdims=True)
    return (m - lo) / (hi - lo)


def _combine(feats: jnp.ndarray, weights: jnp.ndarray, relu: bool, normalized: bool):
    """weighted channel sum -> (h, w). feats: (1, h, w, K), weights: (K,)."""
    a = feats[0] * weights  # (h, w, K)
    a = jnp.where(jnp.isnan(a), 1.0, a)  # torchcam nan -> 1 quirk (cam.py:105-107)
    m = a.sum(axis=-1)
    if relu:
        m = jax.nn.relu(m)
    return _normalize(m) if normalized else m


def cam(model, variables, x, class_idx: int, normalized: bool = True):
    """Plain CAM: fc weights of the target class (cam.py:121-164)."""
    features, _, _ = backbone_split(model, variables)
    feats = features(x)
    weights = fc_params(variables)[0][:, class_idx]  # (K,)
    return _combine(feats, weights, relu=False, normalized=normalized)


def _feat_grad(model, variables, x, class_idx: int):
    features, head, _ = backbone_split(model, variables)
    feats = features(x)
    g = jax.grad(lambda f: head(f)[0, class_idx])(feats)
    return feats, g


def gradcam(model, variables, x, class_idx: int, normalized: bool = True):
    """Grad-CAM: spatial-mean gradient weights (gradcam.py:93-119)."""
    feats, g = _feat_grad(model, variables, x, class_idx)
    weights = g[0].mean(axis=(0, 1))  # (K,)
    return _combine(feats, weights, relu=True, normalized=normalized)


def _pp_weights(feats, g):
    """Grad-CAM++ alpha-weighted ReLU-gradient weights (gradcam.py:150-160)."""
    g2 = g**2
    g3 = g**3
    denom = 2.0 * g2 + (g3 * feats).sum(axis=(1, 2), keepdims=True)
    alpha = g2 / denom
    return (alpha[0] * jax.nn.relu(g[0])).sum(axis=(0, 1))  # (K,)


def gradcampp(model, variables, x, class_idx: int, normalized: bool = True):
    feats, g = _feat_grad(model, variables, x, class_idx)
    weights = _pp_weights(feats, g)
    return _combine(feats, weights, relu=True, normalized=normalized)


def smooth_gradcampp(model, variables, x, class_idx: int, key=None,
                     num_samples: int = 4, std: float = 0.3, normalized: bool = True,
                     noise=None):
    """Smooth Grad-CAM++ (gradcam.py:162-274): gradient moments averaged over
    noisy inputs; the ReLU-gradient factor uses the last sample's gradient
    (reference quirk, gradcam.py:268-271).

    ``noise``: optional pre-drawn (num_samples, 1, H, W, C) perturbations.
    Injecting the same samples into the reference enables exact parity checks
    despite the in-loop RNG (same technique as the RISE shared-mask test)."""
    features, head, _ = backbone_split(model, variables)
    init_feats = features(x)

    if noise is None:
        keys = jax.random.split(key, num_samples)
        noise = std * jax.vmap(lambda k: jax.random.normal(k, x.shape))(keys)
    else:
        noise = jnp.asarray(noise)
        num_samples = noise.shape[0]

    def sample_grad(n):
        feats_n = features(x + n)
        g = jax.grad(lambda f: head(f)[0, class_idx])(feats_n)
        return g

    grads = jax.lax.map(sample_grad, noise)  # (n, 1, h, w, K)
    g2 = (grads**2).mean(axis=0)
    g3 = (grads**3).mean(axis=0)
    last_g = grads[-1]
    denom = 2.0 * g2 + (g3 * init_feats).sum(axis=(1, 2), keepdims=True)
    alpha = g2 / denom
    weights = (alpha[0] * jax.nn.relu(last_g[0])).sum(axis=(0, 1))
    # reference quirk: the hooked activation is overwritten by each noisy
    # forward, so compute_cams (cam.py:103) combines with the LAST noisy
    # sample's feature map, not the clean one
    last_feats = features(x + noise[-1])
    return _combine(last_feats, weights, relu=True, normalized=normalized)


def _normalize_channels(feats: jnp.ndarray) -> jnp.ndarray:
    """Per-channel spatial min-max of (1, h, w, K) activations (NaN where a
    channel is constant — the 0/0 the reference also produces)."""
    lo = feats.min(axis=(1, 2), keepdims=True)
    hi = feats.max(axis=(1, 2), keepdims=True)
    return (feats - lo) / (hi - lo)


def _channel_masks(norm_feats: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Per-channel normalized activation upsampled to input size (cam.py:221-231).

    Takes the `_normalize_channels` output; returns (K, H, W, 1) masks for the
    (1, H, W, C) input.
    """
    a = jnp.moveaxis(norm_feats[0], -1, 0)[..., None]  # (K, h, w, 1)
    k, h, w, _ = a.shape
    H, W = x.shape[1:3]
    return jax.image.resize(a, (k, H, W, 1), method="bilinear")


def _masked_scores(forward, masked: jnp.ndarray, class_idx: int, batch_size: int):
    """softmax class probabilities for a (K, H, W, C) stack, chunked."""
    k = masked.shape[0]
    pad = (-k) % batch_size
    if pad:
        masked = jnp.concatenate([masked, jnp.zeros((pad, *masked.shape[1:]), masked.dtype)])
    chunks = masked.reshape(-1, batch_size, *masked.shape[1:])
    probs = jax.lax.map(lambda c: jax.nn.softmax(forward(c), axis=1)[:, class_idx], chunks)
    return probs.reshape(-1)[:k]


def scorecam(model, variables, x, class_idx: int, batch_size: int = 32,
             normalized: bool = True):
    """Score-CAM (cam.py:166-258): masked-input softmax re-scoring.

    Reference quirk preserved: ``_normalize(self.hook_a)`` mutates the hooked
    activation in place (cam.py:231), so the final weighted combination uses
    the per-channel NORMALIZED maps, not the raw activations."""
    features, _, forward = backbone_split(model, variables)
    norm_feats = _normalize_channels(features(x))
    masks = _channel_masks(norm_feats, x)  # (K, H, W, 1)
    weights = _masked_scores(forward, masks * x[0], class_idx, batch_size)
    return _combine(norm_feats, weights, relu=True, normalized=normalized)


def sscam(model, variables, x, class_idx: int, key=None, batch_size: int = 32,
          num_samples: int = 35, std: float = 2.0, normalized: bool = True,
          noise=None):
    """SS-CAM (cam.py:260-358): noise added to the mask before multiplying.
    Same in-place-normalization quirk as scorecam (cam.py:330-333).

    ``noise``: optional pre-drawn (num_samples, H, W, C) perturbations for
    exact parity against the reference's in-loop RNG (see smooth_gradcampp)."""
    features, _, forward = backbone_split(model, variables)
    norm_feats = _normalize_channels(features(x))
    masks = _channel_masks(norm_feats, x)

    if noise is None:
        keys = jax.random.split(key, num_samples)
        noise = std * jax.vmap(lambda k: jax.random.normal(k, x[0].shape))(keys)
    else:
        noise = jnp.asarray(noise)

    def one(n):
        return _masked_scores(forward, x[0] * (masks + n), class_idx, batch_size)

    weights = jax.lax.map(one, noise).mean(axis=0)
    return _combine(norm_feats, weights, relu=True, normalized=normalized)


def isscam(model, variables, x, class_idx: int, batch_size: int = 32,
           num_samples: int = 10, normalized: bool = True):
    """ISS-CAM (cam.py:361-447): integration over mask intensity scaling.

    fmap accumulates sum_{i<=m} i/N * (x*mask); scores accumulate per step.
    Same in-place-normalization quirk as scorecam (cam.py:419-422).
    """
    features, _, forward = backbone_split(model, variables)
    norm_feats = _normalize_channels(features(x))
    masks = _channel_masks(norm_feats, x)
    base = x[0] * masks  # (K, H, W, C)

    def step(carry, idx):
        fmap = carry + (idx + 1.0) / num_samples * base
        w = _masked_scores(forward, fmap, class_idx, batch_size)
        return fmap, w

    _, ws = jax.lax.scan(step, jnp.zeros_like(base), jnp.arange(num_samples, dtype=jnp.float32))
    weights = ws.sum(axis=0)
    return _combine(norm_feats, weights, relu=True, normalized=normalized)
