"""Device-side batched preprocessing — the XLA-compiled replacement for the
reference's per-image host transform stack (``dataset/transform_func.py:19-125``).

Pipeline parity:
- train: Resize(img_size, bilinear) -> [Aug] -> /255 -> Normalize(mean, std)
- val:   Resize(img_size, bilinear) -> /255 -> Normalize(mean, std)
- per-dataset normalization constants (``transform_func.py:102-105``)

TPU-first: images ship to device as uint8 (4x less PCIe/HBM traffic than f32),
then the whole batch is resized/normalized/augmented in one fused XLA program
inside the train step's donor buffers.

Augmentation mirrors ``tools/image_aug.py:44-69`` semantics: independent coin
flips for {fliplr, flipud, affine(scale 0.8-1, translate ±10%/0-10%, rotate
±10°), gaussian blur σ∈[0,3]} applied in a per-image random order
(``iaa.Sequential(random_order=True)``) via a permuted ``lax.switch`` chain.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["NORMALIZE_VALUES", "preprocess_batch", "augment_batch"]

# dataset -> (mean, std), transform_func.py:102-105
NORMALIZE_VALUES: Dict[str, Tuple[Tuple[float, ...], Tuple[float, ...]]] = {
    "MNIST": ((0.1307,), (0.3081,)),
    "CUB200": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "ConText": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "ImageNet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
}


def resize_bilinear(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """Batched bilinear resize to (size, size); antialiased on downscale like PIL."""
    b, h, w, c = images.shape
    if (h, w) == (size, size):
        return images.astype(jnp.float32)
    return jax.image.resize(
        images.astype(jnp.float32), (b, size, size, c), method="bilinear", antialias=True
    )


def _affine_sample(img: jnp.ndarray, scale_xy, translate_xy, rotate_deg) -> jnp.ndarray:
    """imgaug-style affine: scale about center, translate by fraction, rotate.

    img: (H, W, C) float. Bilinear sampling, zero padding (imgaug default cval=0).
    """
    h, w, c = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = rotate_deg * math.pi / 180.0
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    sx, sy = scale_xy
    tx = translate_xy[0] * w
    ty = translate_xy[1] * h

    # output (y, x) -> input coords: inverse of (scale -> rotate -> translate)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x0 = xx - cx - tx
    y0 = yy - cy - ty
    xr = cos_t * x0 + sin_t * y0
    yr = -sin_t * x0 + cos_t * y0
    xs = xr / sx + cx
    ys = yr / sy + cy

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, [ys, xs], order=1, mode="constant", cval=0.0)

    return jnp.stack([sample_channel(img[..., i]) for i in range(c)], axis=-1)


def _gaussian_blur(img: jnp.ndarray, sigma: jnp.ndarray, max_radius: int = 9) -> jnp.ndarray:
    """Separable gaussian blur with traced sigma (radius fixed, weights masked).

    radius 9 ≈ 3·sigma_max (sigma is sampled in [0, 3], image_aug.py:24) so
    the tails are not truncated; borders reflect (cv2 BORDER_REFLECT_101, the
    imgaug GaussianBlur default) instead of zero-padding, which darkened an
    r-pixel frame around every blurred image."""
    r = max_radius
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    sigma = jnp.maximum(sigma, 1e-3)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    img = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="reflect")
    # (H, W, C): blur H then W via depthwise conv
    img_t = img.transpose(2, 0, 1)[:, None]  # (C, 1, H+2r, W+2r)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    out = jax.lax.conv_general_dilated(img_t, kh, (1, 1), [(0, 0), (0, 0)])
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), [(0, 0), (0, 0)])
    return out[:, 0].transpose(1, 2, 0)


def _augment_one(img: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Per-image augmentation with imgaug's parameter ranges (image_aug.py:14-24).

    Matches ``iaa.Sequential(sequence, random_order=True)`` (image_aug.py:41):
    each of the four augmenters is gated by an independent coin flip
    (image_aug.py:46-59), parameters are sampled once per image, and the gated
    ops are applied in a per-image random order — a permutation of the four op
    slots executed as a chain of ``lax.switch``es (skipped ops are identity,
    which is order-invariant, so permuting all four slots equals permuting the
    included subset).
    """
    keys = jax.random.split(key, 11)
    do_fliplr = jax.random.bernoulli(keys[0])
    do_flipud = jax.random.bernoulli(keys[1])
    do_affine = jax.random.bernoulli(keys[2])
    do_blur = jax.random.bernoulli(keys[3])

    sx = jax.random.uniform(keys[4], minval=0.8, maxval=1.0)
    sy = jax.random.uniform(keys[5], minval=0.8, maxval=1.0)
    # the x-translation really is one-sided and y symmetric — the reference
    # samples translate_x = uniform(0, 0.1), translate_y = uniform(-0.1, 0.1)
    # (image_aug.py:17-18; its "+-10 percent" comment describes imgaug's
    # generic capability, not the values it passes)
    tx = jax.random.uniform(keys[6], minval=0.0, maxval=0.1)
    ty = jax.random.uniform(keys[7], minval=-0.1, maxval=0.1)
    # rotate is INTEGER degrees in [-10, 9]: np.random.randint(-10, 10)
    # (image_aug.py:14)
    rot = jax.random.randint(keys[8], (), -10, 10).astype(jnp.float32)
    sigma = jax.random.uniform(keys[9], minval=0.0, maxval=3.0)

    order = jax.random.permutation(keys[10], 4)
    gates = (do_fliplr, do_flipud, do_affine, do_blur)
    return _apply_augs(img, gates, (sx, sy, tx, ty, rot, sigma), order)


def _apply_augs(img, gates, params, order):
    """Apply the four gated augmenters in ``order`` (a permutation of 0..3)."""
    do_fliplr, do_flipud, do_affine, do_blur = gates
    sx, sy, tx, ty, rot, sigma = params
    branches = [
        lambda im: jnp.where(do_fliplr, im[:, ::-1], im),
        lambda im: jnp.where(do_flipud, im[::-1], im),
        lambda im: jnp.where(do_affine,
                             _affine_sample(im, (sx, sy), (tx, ty), rot), im),
        lambda im: jnp.where(do_blur, _gaussian_blur(im, sigma), im),
    ]
    order = jnp.asarray(order)
    for slot in range(4):
        img = jax.lax.switch(order[slot], branches, img)
    return img


def augment_batch(images: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """vmapped per-image augmentation. images: (B, H, W, C) float [0, 255]."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(_augment_one)(images, keys)


@functools.partial(jax.jit, static_argnames=("dataset", "img_size", "train", "aug"))
def preprocess_batch(
    images_u8: jnp.ndarray,
    *,
    dataset: str,
    img_size: int,
    train: bool = False,
    aug: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """uint8 (B,H,W,C) -> normalized float32 (B,img_size,img_size,C)."""
    x = resize_bilinear(images_u8, img_size)
    if train and aug and key is not None:
        x = augment_batch(x, key)
    mean, std = NORMALIZE_VALUES[dataset]
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    return (x - mean) / std
