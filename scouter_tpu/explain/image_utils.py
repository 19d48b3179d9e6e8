"""Image utilities — torchray/utils.py capability (imread/imsc/imsmooth/resample)
plus the ~/.torchrayrc-style JSON config reader (``torchray/utils.py:42-80``).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from .extremal import imsmooth  # noqa: F401  (re-export; torchray/utils.py:344-409)

__all__ = ["imread", "imsc", "resample", "imsmooth", "read_rc_config"]

_RC_DEFAULTS = {
    "benchmark": {
        "store": "data/benchmark.db",  # sqlite ExperimentStore (MongoDB replacement)
        "imagenet_folder": "data/imagenet",
        "voc_dir": "data/voc",
        "coco_dir": "data/coco",
    },
}


def imread(path: str, resize: Optional[Tuple[int, int]] = None,
           to_rgb: bool = True) -> np.ndarray:
    """Read an image as float32 (H, W, C) in [0, 1] (torchray imread capability)."""
    from PIL import Image

    with Image.open(path) as im:
        if to_rgb:
            im = im.convert("RGB")
        if resize is not None:
            im = im.resize(resize, Image.BILINEAR)
        return np.asarray(im, np.float32) / 255.0


def imsc(img: np.ndarray, lim: Optional[Tuple[float, float]] = None) -> np.ndarray:
    """Rescale an image to [0, 1] for display (torchray imsc semantics)."""
    img = np.asarray(img, np.float32)
    lo, hi = (img.min(), img.max()) if lim is None else lim
    denom = (hi - lo) if hi > lo else 1.0
    return np.clip((img - lo) / denom, 0.0, 1.0)


def resample(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resample of a (H, W) or (H, W, C) array to `size` (h, w)."""
    import jax
    import jax.numpy as jnp

    arr = jnp.asarray(img, jnp.float32)
    out_shape = size if arr.ndim == 2 else (*size, arr.shape[-1])
    return np.asarray(jax.image.resize(arr, out_shape, method="bilinear"))


def read_rc_config(path: str = "~/.scouter_tpu_rc") -> dict:
    """JSON config with defaults (torchrayrc capability; missing file -> defaults)."""
    cfg = json.loads(json.dumps(_RC_DEFAULTS))  # deep copy
    full = os.path.expanduser(path)
    if os.path.exists(full):
        with open(full) as f:
            user = json.load(f)
        for k, v in user.items():
            if isinstance(v, dict) and isinstance(cfg.get(k), dict):
                cfg[k].update(v)
            else:
                cfg[k] = v
    return cfg
