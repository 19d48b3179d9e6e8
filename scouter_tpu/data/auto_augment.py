"""AutoAugment / RandAugment — capability of ``timm/data/auto_augment.py``.

Host-side PIL-op policies applied before staging (like timm, which runs them in
the DataLoader workers). Ops cover the standard search space: shear/translate,
rotate, color/contrast/brightness/sharpness, posterize, solarize (+add),
autocontrast, equalize, invert. Magnitudes follow the timm _LEVEL_TO_ARG
conventions (max level 10 scaling, signed magnitudes via random negation).

- :func:`auto_augment_policy` returns the 'v0' / 'original' ImageNet policies
  as (op, prob, magnitude) pairs.
- :class:`AutoAugment` applies one random sub-policy per image.
- :class:`RandAugment` applies N random ops at magnitude M.
"""

from __future__ import annotations

import random
from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

__all__ = ["AutoAugment", "RandAugment", "auto_augment_policy", "rand_augment_ops"]

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)


def _randomly_negate(v, rng=random):
    # rng is threaded from the transform instance so AutoAugment(seed=...)
    # is actually deterministic (the global module RNG is the default only
    # for direct _OPS use)
    return -v if rng.random() > 0.5 else v


# ---- op implementations ------------------------------------------------------

def _shear_x(img, factor):
    return img.transform(img.size, Image.AFFINE, (1, factor, 0, 0, 1, 0),
                         resample=Image.BILINEAR, fillcolor=_FILL)


def _shear_y(img, factor):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, factor, 1, 0),
                         resample=Image.BILINEAR, fillcolor=_FILL)


def _translate_x_rel(img, pct):
    pixels = pct * img.size[0]
    return img.transform(img.size, Image.AFFINE, (1, 0, pixels, 0, 1, 0),
                         resample=Image.BILINEAR, fillcolor=_FILL)


def _translate_y_rel(img, pct):
    pixels = pct * img.size[1]
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, pixels),
                         resample=Image.BILINEAR, fillcolor=_FILL)


def _translate_x_abs(img, pixels):
    return img.transform(img.size, Image.AFFINE, (1, 0, pixels, 0, 1, 0),
                         resample=Image.BILINEAR, fillcolor=_FILL)


def _translate_y_abs(img, pixels):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, pixels),
                         resample=Image.BILINEAR, fillcolor=_FILL)


def _rotate(img, degrees):
    return img.rotate(degrees, resample=Image.BILINEAR, fillcolor=_FILL)


def _posterize(img, bits):
    # bits 0 deliberately blacks the image (timm auto_augment.py:153-156,373
    # "This results in black image with Tpu posterize")
    if bits >= 8:
        return img
    return ImageOps.posterize(img, int(bits))


def _solarize(img, thresh):
    return ImageOps.solarize(img, int(thresh))


def _solarize_add(img, add, thresh=128):
    arr = np.asarray(img).astype(np.int64)
    arr = np.where(arr < thresh, np.clip(arr + int(add), 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


def _enhance(cls):
    def op(img, factor):
        return cls(img).enhance(factor)

    return op


_TRANSLATE_CONST = 250.0  # timm _HPARAMS_DEFAULT translate_const


def _enhance_arg(l):
    """plain enhance magnitude (timm _enhance_level_to_arg): unsigned."""
    return (l / _MAX_LEVEL) * 1.8 + 0.1


def _enhance_increasing_arg(l, rng=random):
    return 1.0 + _randomly_negate((l / _MAX_LEVEL) * 0.9, rng)


# (op_fn, level->arg) — names and magnitude rules mirror timm LEVEL_TO_ARG
# (auto_augment.py:180-286): plain / Increasing / Original variants are
# distinct ops with distinct scalings.
_OPS = {
    "AutoContrast": (lambda img, _: ImageOps.autocontrast(img), lambda l: None),
    "Equalize": (lambda img, _: ImageOps.equalize(img), lambda l: None),
    "Invert": (lambda img, _: ImageOps.invert(img), lambda l: None),
    "Rotate": (_rotate, lambda l, rng=random: _randomly_negate(l / _MAX_LEVEL * 30.0, rng)),
    "Posterize": (_posterize, lambda l: int(l / _MAX_LEVEL * 4)),
    "PosterizeIncreasing": (_posterize, lambda l: 4 - int(l / _MAX_LEVEL * 4)),
    "PosterizeOriginal": (_posterize, lambda l: int(l / _MAX_LEVEL * 4) + 4),
    "Solarize": (_solarize, lambda l: int(l / _MAX_LEVEL * 256)),
    "SolarizeIncreasing": (_solarize, lambda l: 256 - int(l / _MAX_LEVEL * 256)),
    "SolarizeAdd": (_solarize_add, lambda l: int(l / _MAX_LEVEL * 110)),
    "Color": (_enhance(ImageEnhance.Color), _enhance_arg),
    "ColorIncreasing": (_enhance(ImageEnhance.Color), _enhance_increasing_arg),
    "Contrast": (_enhance(ImageEnhance.Contrast), _enhance_arg),
    "ContrastIncreasing": (_enhance(ImageEnhance.Contrast), _enhance_increasing_arg),
    "Brightness": (_enhance(ImageEnhance.Brightness), _enhance_arg),
    "BrightnessIncreasing": (_enhance(ImageEnhance.Brightness), _enhance_increasing_arg),
    "Sharpness": (_enhance(ImageEnhance.Sharpness), _enhance_arg),
    "SharpnessIncreasing": (_enhance(ImageEnhance.Sharpness), _enhance_increasing_arg),
    "ShearX": (_shear_x, lambda l, rng=random: _randomly_negate(l / _MAX_LEVEL * 0.3, rng)),
    "ShearY": (_shear_y, lambda l, rng=random: _randomly_negate(l / _MAX_LEVEL * 0.3, rng)),
    "TranslateX": (_translate_x_abs, lambda l, rng=random: _randomly_negate(l / _MAX_LEVEL * _TRANSLATE_CONST, rng)),
    "TranslateY": (_translate_y_abs, lambda l, rng=random: _randomly_negate(l / _MAX_LEVEL * _TRANSLATE_CONST, rng)),
    "TranslateXRel": (_translate_x_rel, lambda l, rng=random: _randomly_negate(l / _MAX_LEVEL * 0.45, rng)),
    "TranslateYRel": (_translate_y_rel, lambda l, rng=random: _randomly_negate(l / _MAX_LEVEL * 0.45, rng)),
}


def _apply(img, name, level, rng=random):
    fn, to_arg = _OPS[name]
    try:
        arg = to_arg(level, rng)
    except TypeError:  # unsigned-magnitude ops take no rng
        arg = to_arg(level)
    return fn(img, arg)


def auto_augment_policy(name: str = "v0") -> List[List[Tuple[str, float, float]]]:
    """ImageNet sub-policies (timm auto_augment policy tables)."""
    if name == "v0":
        return [
            [("Equalize", 0.8, 1), ("ShearY", 0.8, 4)],
            [("Color", 0.4, 9), ("Equalize", 0.6, 3)],
            [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
            [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
            [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
            [("Color", 0.2, 0), ("Equalize", 0.8, 8)],
            [("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)],
            [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
            [("Color", 0.6, 1), ("Equalize", 1.0, 2)],
            [("Invert", 0.4, 9), ("Rotate", 0.6, 0)],
            [("Equalize", 1.0, 9), ("ShearY", 0.6, 3)],
            [("Color", 0.4, 7), ("Equalize", 0.6, 0)],
            [("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)],
            [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
            [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
            [("Rotate", 1.0, 7), ("TranslateYRel", 0.8, 9)],
            [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
            [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
            [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
            [("Equalize", 0.8, 4), ("Equalize", 0.0, 8)],
            [("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)],
            [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
            [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
            [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
            [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
        ]
    if name == "original":
        return [
            [("PosterizeOriginal", 0.4, 8), ("Rotate", 0.6, 9)],
            [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
            [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
            [("PosterizeOriginal", 0.6, 7), ("PosterizeOriginal", 0.6, 6)],
            [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
            [("Equalize", 0.4, 4), ("Rotate", 0.8, 8)],
            [("Solarize", 0.6, 3), ("Equalize", 0.6, 7)],
            [("PosterizeOriginal", 0.8, 5), ("Equalize", 1.0, 2)],
            [("Rotate", 0.2, 3), ("Solarize", 0.6, 8)],
            [("Equalize", 0.6, 8), ("PosterizeOriginal", 0.4, 6)],
            [("Rotate", 0.8, 8), ("Color", 0.4, 0)],
            [("Rotate", 0.4, 9), ("Equalize", 0.6, 2)],
            [("Equalize", 0.0, 7), ("Equalize", 0.8, 8)],
            [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
            [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
            [("Rotate", 0.8, 8), ("Color", 1.0, 2)],
            [("Color", 0.8, 8), ("Solarize", 0.8, 7)],
            [("Sharpness", 0.4, 7), ("Invert", 0.6, 8)],
            [("ShearX", 0.6, 5), ("Equalize", 1.0, 9)],
            [("Color", 0.4, 0), ("Equalize", 0.6, 3)],
            [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
            [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
            [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
            [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
            [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
        ]
    raise ValueError(f"unknown policy {name!r}")


class AutoAugment:
    def __init__(self, policy: str = "v0", seed: int | None = None):
        self.policy = auto_augment_policy(policy)
        self.rng = random.Random(seed)

    def __call__(self, img: Image.Image) -> Image.Image:
        sub = self.rng.choice(self.policy)
        for name, prob, magnitude in sub:
            if self.rng.random() <= prob:
                img = _apply(img, name, magnitude, self.rng)
        return img


def rand_augment_ops() -> Sequence[str]:
    """timm _RAND_TRANSFORMS (auto_augment.py:538-555)."""
    return ("AutoContrast", "Equalize", "Invert", "Rotate", "Posterize",
            "Solarize", "SolarizeAdd", "Color", "Contrast", "Brightness",
            "Sharpness", "ShearX", "ShearY", "TranslateXRel", "TranslateYRel")


class RandAugment:
    def __init__(self, num_layers: int = 2, magnitude: float = 9,
                 ops: Sequence[str] | None = None, seed: int | None = None):
        self.num_layers = num_layers
        self.magnitude = magnitude
        self.ops = list(ops or rand_augment_ops())
        self.rng = random.Random(seed)

    def __call__(self, img: Image.Image) -> Image.Image:
        for _ in range(self.num_layers):
            img = _apply(img, self.rng.choice(self.ops), self.magnitude, self.rng)
        return img
