"""IGOS — Integrated-Gradient Optimized Saliency, the capability of
``torchcam/IGOS.py`` as compiled JAX programs.

Algorithm parity (cited to the reference):
- blur baseline: 51x51 Gaussian, sigma 50 (Get_blurred_img :151-196)
- mask optimization (Integrated_Mask :234-527): a size_init^2 mask initialized
  to ones; each outer iteration computes the gradient of
  ``l1*mean|1-m| + tv*TV_beta(m) + (1/K) sum_j softmax(model(img*(j/K)*up(m) +
  blurred*(1-(j/K)*up(m)) + noise))[c]`` (integrated gradients over K=20 mask
  scalings, gaussian noise sigma 0.2), then takes a revised-Armijo
  backtracking line-search step (start 200, shrink x0.2, alpha 1e-4,
  floor 1e-5) and clamps to [0,1]. l1_coeff anneals when the score curve
  stalls (:482-494).
- deletion/insertion: progressively remove (insert) the top-k pixels by mask
  order and record the class probability (Deletion_Insertion :588-755,
  topmaxPixel :33-55).

TPU-first: the integrated-gradient inner sum is one vmapped batch of K masked
forwards; the line search is a ``lax.while_loop``; outer iterations are a
``lax.scan`` — the whole optimization is a single XLA program.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_blur_baseline", "tv_norm", "integrated_mask",
           "deletion_insertion_curve", "write_video"]


def gaussian_blur_baseline(img: jnp.ndarray, ksize: int = 51, sigma: float = 50.0) -> jnp.ndarray:
    """cv2.GaussianBlur(img, (51, 51), 50) equivalent. img: (1, H, W, C)."""
    half = ksize // 2
    xs = np.arange(ksize, dtype=np.float32) - half
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g /= g.sum()
    k = jnp.asarray(g)
    b, h, w, c = img.shape
    xt = img.transpose(0, 3, 1, 2).reshape(b * c, 1, h, w)
    kv = k.reshape(1, 1, -1, 1)
    kh = k.reshape(1, 1, 1, -1)
    # cv2 uses reflect-101 border by default
    xt = jnp.pad(xt, ((0, 0), (0, 0), (half, half), (half, half)), mode="reflect")
    out = jax.lax.conv_general_dilated(xt, kv, (1, 1), "VALID")
    out = jax.lax.conv_general_dilated(out, kh, (1, 1), "VALID")
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def _resize_bilinear_align_corners(m: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """2-D bilinear resize with align_corners=True — torch
    ``nn.UpsamplingBilinear2d`` semantics, the reference's mask upsampler
    (``IGOS.py:274-276``). ``jax.image.resize`` uses half-pixel centers
    (align_corners=False) and differs by up to ~0.3 on a 112->224 map."""
    ih, iw = m.shape
    ys = jnp.linspace(0.0, ih - 1.0, oh)
    xs = jnp.linspace(0.0, iw - 1.0, ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, ih - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, iw - 1)
    y1 = jnp.minimum(y0 + 1, ih - 1)
    x1 = jnp.minimum(x0 + 1, iw - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    top = m[y0][:, x0] * (1 - wx) + m[y0][:, x1] * wx
    bot = m[y1][:, x0] * (1 - wx) + m[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def tv_norm(mask: jnp.ndarray, tv_beta: float = 2.0) -> jnp.ndarray:
    """Total-variation norm of a (h, w) mask (IGOS.py:60-64)."""
    row = jnp.mean(jnp.abs(mask[:-1, :] - mask[1:, :]) ** tv_beta)
    col = jnp.mean(jnp.abs(mask[:, :-1] - mask[:, 1:]) ** tv_beta)
    return row + col


class IgosResult(NamedTuple):
    mask: jnp.ndarray  # (size_init, size_init) in [0, 1]; 0 = important
    upsampled: jnp.ndarray  # (H, W)
    curve_reg: jnp.ndarray  # (T,) l1+tv values
    curve_score: jnp.ndarray  # (T,) class prob under the current mask


def integrated_mask(
    forward: Callable,
    img: jnp.ndarray,
    blurred: jnp.ndarray,
    category: int,
    key,
    *,
    max_iterations: int = 15,
    integ_iter: int = 20,
    tv_beta: float = 2.0,
    l1_coeff: float = 0.01 * 300,
    tv_coeff: float = 0.2 * 300,
    size_init: int = 112,
    noise_std: float = 0.2,
) -> IgosResult:
    """IGOS mask optimization. forward: (B,H,W,C)->logits. img/blurred: (1,H,W,C)."""
    h, w = img.shape[1:3]

    def upsample(m):
        return _resize_bilinear_align_corners(m, h, w)[None, :, :, None]

    def class_prob(x):
        return jax.nn.softmax(forward(x), axis=1)[:, category]

    def reg_loss(m, l1c):
        return l1c * jnp.mean(jnp.abs(1.0 - m)) + tv_coeff * tv_norm(m, tv_beta)

    def total_loss(m, l1c, noise_keys):
        um = upsample(m)  # (1, H, W, 1)
        scales = (jnp.arange(integ_iter, dtype=jnp.float32) + 1.0) / integ_iter
        masks = scales[:, None, None, None] * um  # (K, H, W, 1)
        perturbed = img * masks + blurred * (1.0 - masks)
        noise = noise_std * jax.random.normal(noise_keys, perturbed.shape)
        probs = class_prob(perturbed + noise)
        return reg_loss(m, l1c) + jnp.sum(probs) / integ_iter

    def masked_score(m):
        um = upsample(m)
        return class_prob(img * um + blurred * (1.0 - um))[0]

    alpha, beta = 1e-4, 0.2

    def outer(carry, inputs):
        m, l1c, score0 = carry
        t, k = inputs
        grad = jax.grad(total_loss)(m, l1c, k)
        score_ori = masked_score(m)
        loss_ori = reg_loss(m, l1c) + score_ori
        gnorm2 = jnp.sum(grad**2)

        def ls_loss(step):
            cand = jnp.clip(m - step * grad, 0.0, 1.0)
            return reg_loss(cand, l1c) + masked_score(cand)

        def cond(state):
            step, _ = state
            return jnp.logical_and(
                ls_loss(step) > loss_ori - alpha * step * gnorm2, step >= 1e-5
            )

        def body(state):
            step, _ = state
            return (step * beta, 0)

        step, _ = jax.lax.while_loop(cond, body, (200.0, 0))
        m = jnp.clip(m - step * grad, 0.0, 1.0)

        # l1 annealing when the score curve stalls (:482-494); the reference
        # only anneals at all when max_iterations > 3 (IGOS.py:478) — without
        # the guard, tiny runs would hit both anneal points in one step
        score0 = jnp.where(t == 0, score_ori, score0)
        if max_iterations > 3:
            l1c = jnp.where(
                jnp.logical_and(t == max_iterations // 2,
                                jnp.abs(score0 - score_ori) <= 0.001),
                l1c / 10.0, l1c,
            )
            l1c = jnp.where(
                jnp.logical_and(t == int(max_iterations / 1.25),
                                jnp.abs(score0 - score_ori) <= 0.01),
                l1c / 5.0, l1c,
            )
        return (m, l1c, score0), (reg_loss(m, l1c), masked_score(m))

    m0 = jnp.ones((size_init, size_init), jnp.float32)
    keys = jax.random.split(key, max_iterations)
    ts = jnp.arange(max_iterations)
    (m, _, _), (curve_reg, curve_score) = jax.lax.scan(
        outer, (m0, jnp.asarray(l1_coeff), jnp.zeros(())), (ts, keys)
    )
    return IgosResult(m, upsample(m)[0, :, :, 0], curve_reg, curve_score)


def deletion_insertion_curve(
    forward: Callable,
    img: jnp.ndarray,
    blurred: jnp.ndarray,
    mask: jnp.ndarray,
    category: int,
    num_points: int = 20,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deletion & insertion probability curves (Deletion_Insertion capability).

    Pixels are removed/inserted in order of mask importance (ascending mask
    value = most important first, topmaxPixel :33-44).
    """
    h, w = mask.shape
    order = jnp.argsort(mask.reshape(-1))  # ascending: smallest (most important) first
    n = h * w
    fractions = jnp.linspace(0.0, 1.0, num_points)

    def eval_point(frac):
        kcount = (frac * n).astype(jnp.int32)
        ranks = jnp.zeros(n).at[order].set(jnp.arange(n))
        removed = (ranks < kcount).astype(jnp.float32).reshape(h, w)
        keep = 1.0 - removed
        ih, iw = img.shape[1:3]
        um = _resize_bilinear_align_corners(keep, ih, iw)[None, :, :, None]
        deletion = jax.nn.softmax(forward(img * um + blurred * (1 - um)), axis=1)[0, category]
        um_ins = _resize_bilinear_align_corners(removed, ih, iw)[None, :, :, None]
        insertion = jax.nn.softmax(forward(img * um_ins + blurred * (1 - um_ins)), axis=1)[0, category]
        return deletion, insertion

    dels, ins = jax.lax.map(eval_point, fractions)
    return dels, ins


def write_video(inputpath: str, outputname: str, img_num: int, fps: int = 10) -> str:
    """Mask-optimization video export (``torchcam/IGOS.py:755-775`` capability).

    The reference reads ``video{i}.jpg`` frames from ``inputpath`` and writes
    an MJPG video via cv2. cv2 is not available here; the same frame sequence
    is written as an animated GIF (PIL), which every viewer handles. If
    ``outputname`` does not end in ``.gif`` the extension is replaced.

    Returns the path written.
    """
    import os

    from PIL import Image

    frames = []
    for i in range(img_num):
        path = os.path.join(inputpath, f"video{i + 1}.jpg")
        if not os.path.exists(path):  # reference also accepts .png frames here
            path = os.path.join(inputpath, f"video{i + 1}.png")
        frames.append(Image.open(path).convert("RGB"))
    if not frames:
        raise ValueError(f"no video*.jpg frames under {inputpath!r}")
    out = os.path.splitext(outputname)[0] + ".gif"
    frames[0].save(out, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
    return out
