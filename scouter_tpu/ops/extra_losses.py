"""Auxiliary loss functions — timm's loss library capability
(``timm/loss/``: label-smoothing CE, soft-target CE, JSD; plus the orphaned
``SoltLoss`` formula ``nll + area``, ``timm/loss/slot_loss.py:5-11``, which in
this framework is the first-class ``scouter_loss``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["label_smoothing_cross_entropy", "soft_target_cross_entropy", "jsd_cross_entropy"]


def label_smoothing_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                                  smoothing: float = 0.1) -> jnp.ndarray:
    """LabelSmoothingCrossEntropy: (1-eps)*nll + eps*mean(-logprobs)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    smooth = -logp.mean(axis=-1)
    return ((1.0 - smoothing) * nll + smoothing * smooth).mean()


def soft_target_cross_entropy(logits: jnp.ndarray, target_probs: jnp.ndarray) -> jnp.ndarray:
    """SoftTargetCrossEntropy: -sum(target * logprobs) averaged over batch."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return (-(target_probs * logp).sum(axis=-1)).mean()


def jsd_cross_entropy(logits_clean: jnp.ndarray, logits_aug1: jnp.ndarray,
                      logits_aug2: jnp.ndarray, labels: jnp.ndarray,
                      alpha: float = 12.0, smoothing: float = 0.1) -> jnp.ndarray:
    """JsdCrossEntropy (AugMix): smoothed CE on clean + alpha * mean KL of each
    branch to the mixture distribution."""
    ce = label_smoothing_cross_entropy(logits_clean, labels, smoothing)
    ps = [jax.nn.softmax(l, axis=-1) for l in (logits_clean, logits_aug1, logits_aug2)]
    mix = jnp.clip(sum(ps) / 3.0, 1e-7, 1.0)
    log_mix = jnp.log(mix)
    kl = sum(
        (p * (jnp.log(jnp.clip(p, 1e-7, 1.0)) - log_mix)).sum(axis=-1).mean() for p in ps
    ) / 3.0
    return ce + alpha * kl
