"""Extremal perturbation — the capability of
``torchray/attribution/extremal_perturbation.py:90-691``, as one compiled
program.

Components (same math, cited to the reference):
- blur/fade perturbation pyramid with per-pixel level interpolation
  (Perturbation, :90-220)
- smooth-max mask generator from a low-res parameterization: patch unfold,
  nearest upsample, radial kernel weights, coldness-20 softmax pooling
  (MaskGenerator, :318-453)
- simple / contrastive rewards (:230-316)
- 800-step SGD (momentum 0.9 with dampening 0.9) maximizing reward plus a
  sorted-mask area regularizer whose weight escalates x1.0035/iter (:456-691)

TPU-first: the whole optimization is a ``lax.scan`` — one compile, no
host-device chatter per iteration (the reference pays a python round trip and
an optimizer step per iteration).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "imsmooth",
    "perturbation_pyramid",
    "apply_pyramid",
    "MaskGenerator",
    "simple_reward",
    "contrastive_reward",
    "extremal_perturbation",
]

BLUR = "blur"
FADE = "fade"
PRESERVE = "preserve"
DELETE = "delete"
DUAL = "dual"

_SQRT2 = float(np.sqrt(np.float32(2.0)))
_EPS = float(np.finfo(np.float32).eps)


def imsmooth(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur, kernel half-width ceil(4*sigma), zero padding
    (``torchray/utils.py:344-409`` semantics). x: (B, H, W, C)."""
    if sigma <= 0:
        return x
    width = int(math.ceil(4 * sigma))
    i = np.arange(-width, width + 1, dtype=np.float32) / (_SQRT2 * sigma + _EPS)
    filt = np.exp(-i * i)
    filt /= filt.sum()
    k = jnp.asarray(filt)
    xt = x.transpose(0, 3, 1, 2)[:, :, None]  # (B, C, 1, H, W) -> conv per channel
    b, c = xt.shape[:2]
    xt = xt.reshape(b * c, 1, *x.shape[1:3])
    kv = k.reshape(1, 1, -1, 1)
    kh = k.reshape(1, 1, 1, -1)
    out = jax.lax.conv_general_dilated(xt, kv, (1, 1), [(width, width), (0, 0)])
    out = jax.lax.conv_general_dilated(out, kh, (1, 1), [(0, 0), (width, width)])
    return out.reshape(b, c, *x.shape[1:3]).transpose(0, 2, 3, 1)


def perturbation_pyramid(x: jnp.ndarray, num_levels: int = 8, max_blur: float = 20.0,
                         kind: str = BLUR) -> jnp.ndarray:
    """(L, H, W, C) pyramid; level L-1 is the unperturbed input (Perturbation:141-156)."""
    levels = []
    for s in np.linspace(0.0, 1.0, num_levels):
        if kind == BLUR:
            levels.append(imsmooth(x, (1.0 - s) * max_blur)[0])
        elif kind == FADE:
            levels.append(x[0] * s)
        else:
            raise ValueError(kind)
    return jnp.stack(levels)


def apply_pyramid(pyramid: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel linear interpolation across pyramid levels (Perturbation.apply
    :158-204). pyramid: (L, H, W, C); mask: (K, H, W) in [0,1] -> (K, H, W, C)."""
    L = pyramid.shape[0]
    w = mask * (L - 1)
    k = jnp.floor(w)
    frac = (w - k)[..., None]  # (K, H, W, 1)
    out = jnp.zeros((mask.shape[0], *pyramid.shape[1:]), pyramid.dtype)
    for lvl in range(L):
        w0 = (k == lvl).astype(pyramid.dtype)[..., None] * (1.0 - frac)
        w1 = (jnp.clip(k + 1, max=L - 1) == lvl).astype(pyramid.dtype)[..., None] * frac
        out = out + (w0 + w1) * pyramid[lvl]
    return out


class MaskGenerator:
    """Smooth-max mask generator (MaskGenerator:318-453). Precomputes the radial
    kernel weight tensor with numpy; generate() is pure jax."""

    def __init__(self, shape: Tuple[int, int], step: int = 7, sigma: float = 21.0,
                 clamp: bool = True, pooling_method: str = "softmax"):
        self.shape = tuple(shape)
        self.step = int(step)
        self.sigma = float(sigma)
        self.coldness = 20.0
        self.clamp = clamp
        self.pooling_method = pooling_method

        self.margin = self.sigma
        self.padding = 1 + math.ceil((self.margin + sigma) / step)
        self.radius = 1 + math.ceil(sigma / step)
        self.shape_in = [math.ceil(z / step) for z in self.shape]
        self.shape_mid = [
            z + 2 * self.padding - (2 * self.radius + 1) + 1 for z in self.shape_in
        ]
        self.shape_up = [self.step * z for z in self.shape_mid]
        self.shape_out = [z - step + 1 for z in self.shape_up]

        kside = 2 * self.radius + 1
        weight = np.zeros((1, kside**2, *self.shape_out), np.float32)
        step_inv = [zm / zo for zm, zo in zip(self.shape_mid, self.shape_up)]
        uy, ux = np.meshgrid(
            np.arange(self.shape_out[0], dtype=np.float32),
            np.arange(self.shape_out[1], dtype=np.float32),
            indexing="ij",
        )
        for ky in range(kside):
            for kx in range(kside):
                iy = np.floor(step_inv[0] * uy) + ky - self.padding
                ix = np.floor(step_inv[1] * ux) + kx - self.padding
                delta = np.sqrt(
                    (uy - (self.margin + self.step * iy)) ** 2
                    + (ux - (self.margin + self.step * ix)) ** 2
                )
                z = delta / sigma
                weight[0, ky * kside + kx] = np.exp(
                    -2.0 * np.clip(z - 0.5, 0.0, None) ** 2
                )  # kernel (:429)
        self.weight = jnp.asarray(weight)

    def generate(self, pmask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pmask: (K, h_in, w_in) -> (cropped (K, H, W), full (K, Ho, Wo))."""
        k = pmask.shape[0]
        kside = 2 * self.radius + 1
        x = pmask[:, None]  # (K, 1, h, w) NCHW
        patches = jax.lax.conv_general_dilated_patches(
            x, (kside, kside), (1, 1), [(self.padding, self.padding)] * 2
        )  # (K, kside^2, hm, wm)
        up = jnp.repeat(jnp.repeat(patches, self.step, axis=2), self.step, axis=3)
        up = up[:, :, : self.shape_out[0], : self.shape_out[1]]  # negative pad (:439)
        m = self.weight * up

        if self.pooling_method == "softmax":
            pooled = (m * jax.nn.softmax(self.coldness * m, axis=1)).sum(1)
        elif self.pooling_method == "sigmoid":
            pooled = jax.nn.sigmoid(self.coldness * m.sum(1) - 3.0)
        elif self.pooling_method == "sum":
            pooled = m.sum(1)
        else:
            raise ValueError(self.pooling_method)

        if self.clamp:
            pooled = jnp.clip(pooled, 0.0, 1.0)
        mg = int(round(self.margin))
        cropped = pooled[:, mg: mg + self.shape[0], mg: mg + self.shape[1]]
        return cropped, pooled


def simple_reward(y: jnp.ndarray, target: int, variant: str) -> jnp.ndarray:
    if variant == DELETE:
        return -y[:, target]
    if variant == PRESERVE:
        return y[:, target]
    if variant == DUAL:
        n = y.shape[0] // 2
        return y[:n, target] - y[n:, target]
    raise ValueError(variant)


def contrastive_reward(y: jnp.ndarray, target: int, variant: str) -> jnp.ndarray:
    def get(pred):
        masked = pred.at[:, target].set(-100.0)
        return pred[:, target] - masked.max(axis=1)

    if variant == DELETE:
        return -get(y)
    if variant == PRESERVE:
        return get(y)
    if variant == DUAL:
        n = y.shape[0] // 2
        return get(y[:n]) - get(y[n:])
    raise ValueError(variant)


def extremal_perturbation(
    forward,
    x: jnp.ndarray,
    target: int,
    areas: Sequence[float] = (0.1,),
    *,
    perturbation: str = BLUR,
    max_iter: int = 800,
    num_levels: int = 8,
    step: int = 7,
    sigma: float = 21.0,
    jitter: bool = True,
    variant: str = PRESERVE,
    reward_func=simple_reward,
    smooth: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (masks (K, H, W, 1), history (K, 2, max_iter): [reward, regul])."""
    momentum = 0.9
    learning_rate = 0.01
    regul_weight0 = 300.0

    h, w = x.shape[1:3]
    pyramid = perturbation_pyramid(x, num_levels, kind=perturbation)
    gen = MaskGenerator((h, w), step, sigma)
    k_areas = len(areas)

    max_area = int(np.prod(gen.shape_out))
    reference = np.ones((k_areas, max_area), np.float32)
    for i, a in enumerate(areas):
        reference[i, : int(max_area * (1 - a))] = 0.0
    reference = jnp.asarray(reference)

    pmask0 = jnp.ones((k_areas, *gen.shape_in), jnp.float32)

    def energy_fn(pmask, t):
        cropped, full = gen.generate(pmask)
        if variant == DELETE:
            imgs = apply_pyramid(pyramid, 1.0 - cropped)
        elif variant == PRESERVE:
            imgs = apply_pyramid(pyramid, cropped)
        else:  # DUAL
            imgs = jnp.concatenate(
                [apply_pyramid(pyramid, cropped), apply_pyramid(pyramid, 1.0 - cropped)]
            )
        if jitter:
            imgs = jnp.where(t % 2 == 0, imgs[:, :, ::-1, :], imgs)
        y = forward(imgs)
        reward = reward_func(y, target, variant).reshape(k_areas, -1).mean(axis=1)
        mask_sorted = jnp.sort(full.reshape(k_areas, -1), axis=1)
        regul_weight = regul_weight0 * (1.0035**t)
        regul = -((mask_sorted - reference) ** 2).mean(axis=1) * regul_weight
        return -(reward + regul).sum(), (reward, regul)

    def sgd_step(carry, t):
        pmask, vel = carry
        grads, aux = jax.grad(energy_fn, has_aux=True)(pmask, t.astype(jnp.float32))
        # torch SGD(momentum=m, dampening=m): v <- m*v + (1-m)*g; p <- p - lr*v
        # (first step initializes the buffer to the raw gradient)
        vel = jnp.where(t == 0, grads, momentum * vel + (1.0 - momentum) * grads)
        pmask = jnp.clip(pmask - learning_rate * vel, 0.0, 1.0)
        return (pmask, vel), aux

    # the reference returns the mask generated from pmask at the TOP of the
    # final iteration, i.e. BEFORE the last optimizer.step()
    # (extremal_perturbation.py:586,674): scan max_iter-1 updates, then run
    # the last iteration's energy for hist and keep its pre-update mask
    (pmask, vel), (rewards, reguls) = jax.lax.scan(
        sgd_step, (pmask0, jnp.zeros_like(pmask0)), jnp.arange(max_iter - 1)
    )
    _, (last_reward, last_regul) = energy_fn(
        pmask, jnp.asarray(max_iter - 1, jnp.float32)
    )
    rewards = jnp.concatenate([rewards, last_reward[None]])
    reguls = jnp.concatenate([reguls, last_regul[None]])
    cropped, _ = gen.generate(pmask)
    masks = cropped[..., None]
    if smooth > 0:
        masks = imsmooth(masks, smooth * min(h, w))
    hist = jnp.stack([rewards.T, reguls.T], axis=1)  # (K, 2, T)
    return masks, hist
