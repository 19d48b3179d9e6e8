"""Micro-batching inference engine.

Single-image request streams waste the chip: the measured serving table
(PARITY.md) shows bs=1 costs 1.64 ms/img while bs=16 costs 0.24 ms/img on
the CUB-200-scale head — a 6.8x throughput gap that belongs to whoever does
the batching. This engine does it in-process:

- requests enter a queue (``submit`` returns a Future);
- a dispatcher thread drains up to the largest bucket, waiting at most
  ``max_wait_ms`` to let a batch form;
- the batch is padded to the smallest compiled bucket that fits (one jitted
  program per bucket, compiled lazily on first use and cached thereafter);
- results are sliced back out and futures resolved.

Everything is standard-library threading — no external serving framework —
and the compute path is the same ``make_serving_fn`` program the AOT export
uses, so engine results are export-artifact results.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .export import make_serving_fn

__all__ = ["InferenceEngine"]


class InferenceEngine:
    def __init__(
        self,
        cfg,
        variables,
        *,
        buckets: Sequence[int] = (1, 4, 16),
        max_wait_ms: float = 2.0,
        compute_dtype=None,
        include_maps: bool = True,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh — serve data-parallel over its
        'data' axis (each bucket batch is sharded across the mesh; every
        bucket size must divide evenly by the mesh size)."""
        import jax

        self.cfg = cfg
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        if not self.buckets or self.buckets[0] < 1:
            raise ValueError("buckets must be positive ints")
        self.max_wait_s = max_wait_ms / 1e3
        fn = make_serving_fn(
            cfg, variables, compute_dtype=compute_dtype, include_maps=include_maps
        )
        if mesh is None:
            self._fn = jax.jit(fn)
        else:
            from ..parallel.mesh import batch_sharding

            n = int(mesh.devices.size)
            bad = [b for b in self.buckets if b % n]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by the {n}-device mesh")
            self._fn = jax.jit(fn, in_shardings=batch_sharding(mesh))
        self._queue: "queue.Queue" = queue.Queue()
        self._stats = {"requests": 0, "batches": 0, "padded": 0}
        self._lock = threading.Lock()
        self._closed = threading.Event()
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._thread.start()

    # -- public API ---------------------------------------------------------

    def submit(self, image_u8: np.ndarray) -> Future:
        """Enqueue one (img_size, img_size, C) uint8 image; resolves to a dict
        with 'logits' (num_classes,) and, if enabled, 'slot_maps'."""
        if self._closed.is_set():
            raise RuntimeError("engine is closed")
        fut: Future = Future()
        self._queue.put((np.asarray(image_u8, np.uint8), fut))
        return fut

    def infer_batch(self, images_u8: np.ndarray) -> Dict[str, np.ndarray]:
        """Synchronous whole-batch path (bypasses the queue), padded to the
        smallest bucket that fits."""
        images_u8 = np.asarray(images_u8, np.uint8)
        n = images_u8.shape[0]
        out = self._run_padded(images_u8)
        return {k: v[:n] for k, v in out.items()}

    def stats(self) -> Dict[str, int]:
        with self._lock:
            return dict(self._stats)

    def close(self):
        self._closed.set()
        self._queue.put(None)  # wake the dispatcher
        self._thread.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- internals ----------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _run_padded(self, images_u8: np.ndarray) -> Dict[str, np.ndarray]:
        n = images_u8.shape[0]
        bucket = self._bucket_for(n)
        if n < bucket:
            pad = np.zeros((bucket - n,) + images_u8.shape[1:], np.uint8)
            images_u8 = np.concatenate([images_u8, pad], axis=0)
        out = self._fn(images_u8)
        with self._lock:
            self._stats["batches"] += 1
            self._stats["padded"] += bucket - n
        return {k: np.asarray(v) for k, v in out.items()}

    def _dispatch_loop(self):
        max_bucket = self.buckets[-1]
        while True:
            try:
                item = self._queue.get(timeout=0.1)
            except queue.Empty:
                if self._closed.is_set():
                    return
                continue
            if item is None:
                # drain remaining real items before exiting
                if self._queue.empty():
                    return
                continue
            batch = [item]
            deadline = _now() + self.max_wait_s
            while len(batch) < max_bucket:
                remaining = deadline - _now()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            images = np.stack([b[0] for b in batch])
            with self._lock:
                self._stats["requests"] += len(batch)
            try:
                out = self._run_padded(images)
                for i, (_, fut) in enumerate(batch):
                    fut.set_result({k: v[i] for k, v in out.items()})
            except Exception as exc:  # resolve, never hang callers
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(exc)


def _now() -> float:
    import time

    return time.monotonic()
