"""Streaming folder dataset: lazy per-batch decode in a worker pool.

Replaces the eager whole-dataset decode (``folders.load_image_list``) for
directory datasets: the reference's DataLoader decodes per item in worker
processes (``train.py:159-160``; ``dataset/ConText.py:69-89`` opens PIL images
in ``__getitem__``), so host memory is O(batch), not O(dataset). This is the
TPU-side equivalent: a thread pool decodes just the indices the Loader asks
for (PIL decode releases the GIL), staged to a fixed uint8 size; the exact
model input is still produced on device (transforms.preprocess_batch), so the
numeric path is unchanged from the eager loader.

A byte-capped decoded cache keeps small datasets (MNIST-scale, ImageNet-10)
fully resident after the first epoch while guaranteeing bounded RAM on
CUB/ImageNet-scale trees; determinism holds either way because decoding is a
pure function of the file path.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence, Tuple

import numpy as np

from .folders import PathLabel

__all__ = ["FolderDataset"]

_POOL: ThreadPoolExecutor = None
_POOL_LOCK = threading.Lock()


def _shared_pool(workers: int) -> ThreadPoolExecutor:
    global _POOL
    with _POOL_LOCK:
        if _POOL is None:
            _POOL = ThreadPoolExecutor(max_workers=workers,
                                       thread_name_prefix="folder-decode")
        return _POOL


class _LazyImageView:
    """Indexable view over a FolderDataset's decoded images.

    Gives FolderDataset the same ``.images[idx]`` surface as ArrayDataset
    (used by the explanation CLIs and parity_report to fetch one vis image)
    while keeping decode lazy: each access decodes (or serves from cache)
    exactly the requested indices via ``FolderDataset.gather``.
    """

    def __init__(self, ds: "FolderDataset"):
        self._ds = ds

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, index):
        if isinstance(index, (int, np.integer)):
            return self._ds.gather([int(index)])[0]
        if isinstance(index, slice):
            indices = np.arange(len(self._ds))[index]
            return self._ds.gather(indices)
        return self._ds.gather(np.asarray(index))


class FolderDataset:
    """Lazy directory-backed dataset with a bounded decoded-image cache."""

    def __init__(self, items: Sequence[PathLabel], staging_size: int,
                 dataset_name: str, cache_bytes: int = 2 << 30,
                 workers: int = 8):
        self.items = list(items)
        self.labels = np.asarray([label for _, label in self.items], np.int32)
        self.staging_size = staging_size
        self.dataset_name = dataset_name
        self.cache_bytes = cache_bytes
        self._item_bytes = staging_size * staging_size * 3
        self._cache: dict = {}
        self._cache_lock = threading.Lock()
        # one process-wide decode pool: a per-instance pool leaked its workers
        # for the process lifetime (no shutdown path), and CLIs construct
        # several FolderDatasets per run
        self._pool = _shared_pool(workers)

    def __len__(self) -> int:
        return len(self.items)

    @property
    def images(self) -> _LazyImageView:
        """ArrayDataset-compatible lazy image accessor (decodes on access)."""
        return _LazyImageView(self)

    @property
    def cached_bytes(self) -> int:
        return len(self._cache) * self._item_bytes

    def _decode(self, index: int) -> np.ndarray:
        from PIL import Image

        path, _ = self.items[index]
        s = self.staging_size
        with Image.open(path) as im:
            # staging resize matches load_image_list (PIL bilinear)
            im = im.convert("RGB").resize((s, s), Image.BILINEAR)
            return np.asarray(im, np.uint8)

    def gather(self, indices) -> np.ndarray:
        """Decode (or fetch cached) images for ``indices`` -> (B, s, s, 3) u8."""
        indices = np.asarray(indices)
        out = np.empty((len(indices), self.staging_size, self.staging_size, 3),
                       np.uint8)
        pending = []
        with self._cache_lock:
            for pos, idx in enumerate(indices):
                hit = self._cache.get(int(idx))
                if hit is not None:
                    out[pos] = hit
                else:
                    pending.append((pos, int(idx)))
        if pending:
            decoded = self._pool.map(lambda p: (p[0], p[1], self._decode(p[1])),
                                     pending)
            with self._cache_lock:
                for pos, idx, img in decoded:
                    out[pos] = img
                    if (idx not in self._cache
                            and self.cached_bytes + self._item_bytes <= self.cache_bytes):
                        self._cache[idx] = img
        return out
