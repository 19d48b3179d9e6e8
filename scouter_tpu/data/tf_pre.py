"""TF/MnasNet-style preprocessing — ``timm/data/tf_preprocessing.py`` parity.

The reference vendors TensorFlow's ImageNet preprocessing (Inception-style
random crop + CROP_PADDING center crop, bicubic resize) behind timm's
``use_tf_preprocessing`` loader flag. It is dead code in the reference's own
recipes (TF isn't even in its requirements), but the behavioral contract is
small and portable, so this build closes the row natively:

- train (``preprocess_for_train`` :135-152): sample a crop with aspect ratio
  in [3/4, 4/3] and area fraction in [0.08, 1.0] (``_decode_and_random_crop``
  :86-105, ``sample_distorted_bounding_box`` semantics with a whole-image
  bbox, 10 attempts, center-crop fallback), resize to (size, size)
  bicubic/bilinear, random horizontal flip.
- eval (``preprocess_for_eval`` :156-173): center crop of
  ``size/(size+CROP_PADDING) * min(h, w)`` pixels (CROP_PADDING=32, :24),
  resize to (size, size).
- output float32 in [0, 255] HWC (``TfPreprocessTransform.__call__``
  :219-226 returns the uint8-range array).

No TF dependency: decoding/resampling through PIL (bicubic matches TF's
``ResizeMethod.BICUBIC`` to interpolation tolerance), RNG through numpy.
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
    area_range: Tuple[float, float] = (0.08, 1.0),
    aspect_ratio_range: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    max_attempts: int = 10,
) -> Optional[Tuple[int, int, int, int]]:
    """Sample a distorted-bounding-box crop (:27-76 semantics).

    Returns (top, left, crop_h, crop_w), or None after ``max_attempts``
    failures — the caller then falls back to the center crop, mirroring the
    ``_at_least_x_are_equal`` whole-image check (:98-103).
    """
    area = float(height) * width
    for _ in range(max_attempts):
        aspect = rng.uniform(*aspect_ratio_range)
        target_area = rng.uniform(*area_range) * area
        crop_w = int(round(np.sqrt(target_area * aspect)))
        crop_h = int(round(np.sqrt(target_area / aspect)))
        if crop_w <= width and crop_h <= height and crop_w > 0 and crop_h > 0:
            top = rng.randint(0, height - crop_h + 1)
            left = rng.randint(0, width - crop_w + 1)
            return top, left, crop_h, crop_w
    return None


class TfPreprocessTransform:
    """``TfPreprocessTransform`` (:199-226) equivalent, TF-free.

    Accepts JPEG/PNG bytes or a PIL image; returns float32 (size, size, 3)
    in [0, 255].
    """

    def __init__(self, is_training: bool = False, size: int = 224,
                 interpolation: str = "bicubic", seed: int = 0):
        self.is_training = is_training
        self.size = size
        self.interpolation = interpolation
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
            out = out[:, ::-1].copy()  # random_flip_left_right (:129-132)
        return out
