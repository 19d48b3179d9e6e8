"""Host data pipeline: shuffling, batching, host sharding, device prefetch.

Replaces the reference's DataLoader stack (``train.py:152-160``:
DistributedSampler + BatchSampler(drop_last=True) + DataLoaderX thread
prefetch, ``tools/prepare_things.py:140-142``):

- per-epoch shuffling keyed by (seed, epoch) — ``set_epoch`` parity
  (``train.py:176-177``)
- train batches drop the remainder (BatchSampler drop_last, ``train.py:158``);
  val keeps it — the trailing partial batch is padded to the static batch size
  with a validity mask so shapes stay constant and divide the mesh
- multi-host: each host reads a contiguous shard (parallel/mesh.py
  host_shard_bounds) — DistributedSampler equivalent
- device transfer: uint8 batches go to device where preprocess_batch resizes/
  normalizes/augments inside XLA; a one-batch lookahead overlaps H2D with step
  execution (DataLoaderX BackgroundGenerator equivalent).
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from ..parallel.mesh import host_shard_bounds
from .transforms import preprocess_batch

__all__ = ["ArrayDataset", "Loader"]


class ArrayDataset:
    """In-memory (or memory-mapped) array-backed dataset."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, dataset_name: str):
        assert len(images) == len(labels)
        self.images = images
        self.labels = np.asarray(labels, np.int32)
        self.dataset_name = dataset_name

    def __len__(self):
        return len(self.images)


class Loader:
    """Batched loader with per-epoch deterministic shuffling + device preprocessing."""

    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        *,
        img_size: int,
        train: bool,
        aug: bool = False,
        seed: int = 0,
        shard_by_host: bool = True,
        mesh=None,
        prefetch: int = 2,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.img_size = img_size
        self.train = train
        self.aug = aug
        self.seed = seed
        self.mesh = mesh
        self.prefetch = prefetch
        if shard_by_host:
            start, stop = host_shard_bounds(len(dataset))
            self._indices = np.arange(start, stop)
            self._shard_bounds = (start, stop)
        else:
            self._indices = np.arange(len(dataset))
            self._shard_bounds = None
        self._global_n = len(dataset)
        # Multi-process: every process MUST iterate the same number of batches
        # (the jitted step contains collectives; mismatched counts deadlock).
        # Train: truncate to the smallest host shard's full batches. Val: pad
        # the smaller shards with fully-masked batches up to the largest.
        pc = jax.process_count()
        if shard_by_host and pc > 1:
            n = len(dataset)
            base, rem = divmod(n, pc)
            self._train_steps = base // batch_size
            self._val_steps = -(-(base + (1 if rem else 0)) // batch_size)
        else:
            self._train_steps = self._val_steps = None

    def steps_per_epoch(self) -> int:
        if self.train and self._train_steps is not None:
            return self._train_steps
        if not self.train and self._val_steps is not None:
            return self._val_steps
        n = len(self._indices)
        return n // self.batch_size if self.train else -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = self._indices
        if self.train:
            rng = np.random.RandomState((self.seed * 100003 + epoch) % (2**31))
            if self._shard_bounds is not None and jax.process_count() > 1:
                # DistributedSampler semantics (train.py:152-154): one GLOBAL
                # per-epoch permutation (identical on every host — the rng is
                # seed+epoch derived), each host takes its disjoint slice. A
                # within-shard shuffle of a class-sorted item list would pin
                # each host to the same class-skewed subset every epoch.
                perm = rng.permutation(self._global_n)
                start, stop = self._shard_bounds
                idx = perm[start:stop]
            else:
                idx = idx.copy()
                rng.shuffle(idx)
            n_full = (len(idx) // self.batch_size) * self.batch_size
            idx = idx[:n_full]
        return idx

    def _host_batches(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        from .native_stager import gather_items

        idx = self._epoch_indices(epoch)
        n_steps = self.steps_per_epoch()
        for step_i in range(n_steps):
            i = step_i * self.batch_size
            chunk = idx[i: i + self.batch_size]
            valid = len(chunk)
            # pad source: this shard's first item, or dataset item 0 when the
            # shard itself is empty (more processes than items)
            fill = idx[:1] if len(idx) else np.zeros(1, np.int64)
            if valid == 0:
                # cross-host step-count padding (multi-process val): a fully
                # masked batch keeps collectives in lockstep
                chunk = fill.repeat(self.batch_size)
            elif valid < self.batch_size:
                # pad the trailing eval batch to the full (static) batch size so
                # the jitted step keeps one shape and the batch divides the mesh;
                # metrics mask the padding out. (elif: the valid==0 branch above
                # already built a full-size chunk — falling through here used to
                # emit a DOUBLE-size batch with a mismatched mask)
                chunk = np.concatenate([chunk, fill.repeat(self.batch_size - valid)])
            mask = np.zeros(self.batch_size, np.float32)
            mask[:valid] = 1.0
            if hasattr(self.ds, "gather"):
                # streaming folder dataset: lazy per-batch decode (O(batch) RAM)
                image = self.ds.gather(chunk)
            else:
                # multithreaded native gather for uint8 stores (numpy otherwise)
                image = gather_items(self.ds.images, chunk)
            yield {
                "image": image,
                "label": self.ds.labels[chunk],
                "mask": mask,
            }

    def epoch(self, epoch: int) -> Iterator[Dict[str, jax.Array]]:
        """Yield preprocessed device batches for one epoch, with lookahead."""
        key = jax.random.PRNGKey((self.seed * 7919 + epoch) % (2**31))

        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding

            sh = batch_sharding(self.mesh)
            if jax.process_count() > 1:
                # each host contributes its LOCAL batch; the global array is
                # assembled across processes (global batch = pc * batch_size,
                # matching the reference's per-rank DataLoader batch_size)
                put = lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x))
            else:
                put = lambda x: jax.device_put(x, sh)
        else:
            put = jax.device_put

        def produce(host_batch, batch_key):
            images = put(host_batch["image"])
            labels = put(host_batch["label"])
            mask = put(host_batch["mask"])
            images = preprocess_batch(
                images,
                dataset=self.ds.dataset_name,
                img_size=self.img_size,
                train=self.train,
                aug=self.aug,
                key=batch_key if (self.train and self.aug) else None,
            )
            return {"image": images, "label": labels, "mask": mask}

        if jax.default_backend() == "cpu" and jax.device_count() > 1:
            # XLA:CPU executes an N-device program on a thread pool sized to
            # the device count; a SECOND host thread dispatching any device
            # program while the train step's collective rendezvous holds N-1
            # pool threads starves the pool and hard-deadlocks (all workers
            # futex-blocked — reproduced round 4 on the 8-virtual-device mesh
            # at img_size>=64). The lookahead thread buys nothing on a CPU
            # mesh anyway (no H2D to overlap), so produce synchronously there
            # and keep the threaded overlap for real accelerators.
            for bi, hb in enumerate(self._host_batches(epoch)):
                yield produce(hb, jax.random.fold_in(key, bi))
            return

        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()

        def qput(item) -> bool:
            # bounded put that gives up when the consumer abandons the epoch
            # (early break / exception): a plain q.put would block the worker
            # forever and pin its queued device batches
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def worker():
            try:
                for bi, hb in enumerate(self._host_batches(epoch)):
                    bk = jax.random.fold_in(key, bi)
                    if not qput(produce(hb, bk)):
                        return
            except BaseException as exc:  # surface errors, never hang q.get
                qput(exc)
                return
            qput(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            cancel.set()
            while not q.empty():  # release any queued device batches
                try:
                    q.get_nowait()
                except queue_mod.Empty:
                    break
