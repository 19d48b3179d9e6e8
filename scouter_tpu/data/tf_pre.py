"""TF/MnasNet-style preprocessing — ``timm/data/tf_preprocessing.py`` parity.

The reference vendors TensorFlow's ImageNet preprocessing (Inception-style
random crop + CROP_PADDING center crop, bicubic resize) behind timm's
``use_tf_preprocessing`` loader flag. It is dead code in the reference's own
recipes (TF isn't even in its requirements), but the behavioral contract is
small and portable, so this build closes the row natively:

- train (``preprocess_for_train`` :135-152): sample a crop via
  ``tf.image.sample_distorted_bounding_box`` with a whole-image bbox
  (``_decode_and_random_crop`` :86-105): aspect ratio uniform in [3/4, 4/3],
  crop HEIGHT uniform between the bounds the area range [0.08, 1.0] implies
  (the TF kernel samples height, not area), min_object_covered=0.1 (with the
  whole-image bbox this floors the crop at 10% of image area), 10 attempts;
  on failure OR when the sampled crop equals the whole image
  (``_at_least_x_are_equal`` :80-103), fall back to the padded CENTER crop.
  Then resize to (size, size) bicubic/bilinear + random horizontal flip.
- eval (``preprocess_for_eval`` :156-173): center crop of
  ``size/(size+CROP_PADDING) * min(h, w)`` pixels (CROP_PADDING=32, :24),
  resize to (size, size).
- output: ``TfPreprocessTransform.__call__`` (:219-226) rounds, clips to
  [0, 255] and casts to uint8. DEVIATION (documented): the reference then
  rolls to CHW for torch consumers; this NHWC framework returns HWC by
  default — pass ``chw=True`` for the reference's exact layout.

No TF dependency: decoding/resampling through PIL (bicubic matches TF's
``ResizeMethod.BICUBIC`` to interpolation tolerance), RNG through numpy
(TF's per-op RNG is unseeded by default, so ``seed=None`` draws a fresh
stream per instance; pass an int for reproducibility).
"""

from __future__ import annotations

import io
from typing import Optional, Tuple

import numpy as np

__all__ = ["TfPreprocessTransform", "random_crop_box", "center_crop_box",
           "CROP_PADDING"]

CROP_PADDING = 32  # tf_preprocessing.py:24


def center_crop_box(height: int, width: int, image_size: int) -> Tuple[int, int, int, int]:
    """(top, left, crop_h, crop_w) of the padded center crop (:108-126)."""
    crop = int((image_size / (image_size + CROP_PADDING)) * min(height, width))
    top = ((height - crop) + 1) // 2
    left = ((width - crop) + 1) // 2
    return top, left, crop, crop


def random_crop_box(
    height: int,
    width: int,
    rng: np.random.RandomState,
    *,
    min_object_covered: float = 0.1,
    area_range: Tuple[float, float] = (0.08, 1.0),
    aspect_ratio_range: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    max_attempts: int = 10,
) -> Optional[Tuple[int, int, int, int]]:
    """Sample a crop with ``tf.image.sample_distorted_bounding_box`` kernel
    semantics (GenerateRandomCrop): aspect uniform, HEIGHT uniform between
    the area-range bounds, width = round(height * aspect) with the kernel's
    +-1 area adjustment, and the min_object_covered constraint against the
    whole-image bbox (crop area >= covered * image area).

    Returns (top, left, crop_h, crop_w), or None after ``max_attempts``
    failures — the caller then falls back to the center crop (the TF op
    returns the whole image, which ``_at_least_x_are_equal`` :98-103 routes
    to the center-crop branch).
    """
    total = float(height) * float(width)
    min_area = area_range[0] * total
    max_area = area_range[1] * total
    for _ in range(max_attempts):
        aspect = rng.uniform(*aspect_ratio_range)
        min_h = int(np.ceil(np.sqrt(min_area / aspect)))
        max_h = int(np.floor(np.sqrt(max_area / aspect)))
        # kernel clamps so the derived width/height fit the image
        if int(round(max_h * aspect)) > width:
            max_h = int((width + 0.5 - 1e-7) / aspect)
        if max_h > height:
            max_h = height
        if min_h > max_h:
            continue
        crop_h = rng.randint(min_h, max_h + 1) if min_h < max_h else min_h
        crop_w = int(round(crop_h * aspect))
        area = crop_h * crop_w
        # kernel nudges height by one to pull the rounded area into range
        if area < min_area:
            crop_h += 1
            crop_w = int(round(crop_h * aspect))
            area = crop_h * crop_w
        if area > max_area:
            crop_h -= 1
            crop_w = int(round(crop_h * aspect))
            area = crop_h * crop_w
        if (area < min_area or area > max_area or crop_w > width
                or crop_h > height or crop_w <= 0 or crop_h <= 0):
            continue
        # min_object_covered vs the whole-image bbox: intersection is the
        # crop itself, bbox area is the image
        if area < min_object_covered * total:
            continue
        top = rng.randint(0, height - crop_h + 1)
        left = rng.randint(0, width - crop_w + 1)
        if crop_h == height and crop_w == width:
            # whole-image "crop": _at_least_x_are_equal sends this to the
            # padded center crop (:98-103)
            return None
        return top, left, crop_h, crop_w
    return None


class TfPreprocessTransform:
    """``TfPreprocessTransform`` (:199-226) equivalent, TF-free.

    Accepts JPEG/PNG bytes or a PIL image; returns uint8 (size, size, 3)
    (reference rounds/clips/casts, :223-225). ``chw=True`` additionally rolls
    to the reference's torch-facing CHW layout (:226).
    """

    def __init__(self, is_training: bool = False, size: int = 224,
                 interpolation: str = "bicubic", seed: Optional[int] = None,
                 chw: bool = False):
        self.is_training = is_training
        self.size = size
        self.interpolation = interpolation
        self.chw = chw
        self.rng = np.random.RandomState(seed)

    def _resample(self):
        from PIL import Image

        return Image.BICUBIC if self.interpolation == "bicubic" else Image.BILINEAR

    def __call__(self, image) -> np.ndarray:
        from PIL import Image

        if isinstance(image, (bytes, bytearray)):
            image = Image.open(io.BytesIO(image))
        image = image.convert("RGB")
        w, h = image.size
        size = self.size

        if self.is_training:
            box = random_crop_box(h, w, self.rng)
            if box is None:
                box = center_crop_box(h, w, size)
        else:
            box = center_crop_box(h, w, size)
        top, left, ch, cw = box
        image = image.crop((left, top, left + cw, top + ch))
        image = image.resize((size, size), self._resample())
        out = np.asarray(image, np.float32)
        if self.is_training and self.rng.rand() < 0.5:
            out = out[:, ::-1]  # random_flip_left_right (:129-132)
        out = np.clip(np.round(out), 0.0, 255.0).astype(np.uint8)  # :223-225
        if self.chw:
            out = np.rollaxis(out, 2)  # :226
        return out
