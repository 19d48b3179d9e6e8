"""ctypes bindings for the native host staging library (native/stager.cpp).

Builds the shared library on first use if needed (g++, no pybind11 required)
and falls back to pure numpy/PIL when a compiler is unavailable. The device
pipeline (transforms.preprocess_batch) remains the numeric parity path; this is
the fast host path for large folder datasets (ConText/CUB/ImageNet staging).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["resize_batch", "gather_items", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libstager.so"))
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_NATIVE_DIR, "stager.cpp")
    if not os.path.exists(_SO_PATH) and os.path.exists(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _SO_PATH, src, "-lpthread"],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.resize_batch_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.gather_items_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def resize_batch(images: np.ndarray, size: Tuple[int, int],
                 nthreads: int = 0) -> np.ndarray:
    """Batched bilinear uint8 resize (half-pixel centers). images: (N,H,W,C).

    Raises on non-uint8 input: a silent uint8 cast would truncate normalized
    float images to black (the same guard serve.engine enforces)."""
    images = np.asarray(images)
    if images.dtype != np.uint8:
        raise TypeError(f"resize_batch expects uint8 pixels, got {images.dtype}")
    images = np.ascontiguousarray(images)
    n, h, w, c = images.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return images
    nthreads = nthreads or min(os.cpu_count() or 1, 16)
    lib = _load()
    out = np.empty((n, oh, ow, c), np.uint8)
    if lib is not None:
        lib.resize_batch_u8(
            images.ctypes.data_as(ctypes.c_void_p), n, h, w, c,
            out.ctypes.data_as(ctypes.c_void_p), oh, ow, nthreads,
        )
        return out
    # numpy fallback: same half-pixel bilinear
    ys = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
    xs = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(int); y1 = np.minimum(y0 + 1, h - 1)
    x0 = np.floor(xs).astype(int); x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    f = images.astype(np.float32)
    top = f[:, y0][:, :, x0] * (1 - wx) + f[:, y0][:, :, x1] * wx
    bot = f[:, y1][:, :, x0] * (1 - wx) + f[:, y1][:, :, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy + 0.5, 0, 255).astype(np.uint8)


def gather_items(items: np.ndarray, indices: np.ndarray,
                 nthreads: int = 0) -> np.ndarray:
    """dst[i] = items[indices[i]] — batch assembly gather (Loader hot path)."""
    items = np.ascontiguousarray(items)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    # validate BEFORE the native path: the C gather is a raw memcpy and an
    # out-of-range/negative index would read out of bounds instead of raising
    # the IndexError the numpy fallback gives
    if len(indices) and (indices.min() < 0 or indices.max() >= len(items)):
        raise IndexError(
            f"gather_items: indices out of range [0, {len(items)}): "
            f"min={indices.min()}, max={indices.max()}")
    lib = _load()
    if lib is None or items.dtype != np.uint8:
        return items[indices]
    nthreads = nthreads or min(os.cpu_count() or 1, 16)
    item_bytes = int(np.prod(items.shape[1:]) * items.itemsize)
    out = np.empty((len(indices),) + items.shape[1:], items.dtype)
    lib.gather_items_u8(
        items.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        len(indices), item_bytes,
        out.ctypes.data_as(ctypes.c_void_p), nthreads,
    )
    return out
