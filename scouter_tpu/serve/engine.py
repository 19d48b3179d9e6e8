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

Dispatch is PIPELINED: jax dispatch is asynchronous, so the dispatcher hands
the (device outputs, futures) pair to a resolver thread and immediately forms
the next batch; the resolver does the blocking device->host fetch and sets
the futures. A bounded in-flight queue (``max_inflight``) applies
backpressure so at most K batches queue on the device. The round-4 load run
(docs/SERVE_LOAD_r4.md) motivated this: the previous loop blocked on the
host fetch between batches, so every batch paid fetch latency (30+ ms over
a remote-attached runtime) in the critical path.

Everything is standard-library threading — no external serving framework —
and the compute path is the same ``make_serving_fn`` program the AOT export
uses, so engine results are export-artifact results.
"""

from __future__ import annotations

import collections
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
        max_inflight: int = 8,
        quant=None,
        resolvers: int = 4,
    ):
        """mesh: optional jax.sharding.Mesh — serve data-parallel over its
        'data' axis (each bucket batch is sharded across the mesh; every
        bucket size must divide evenly by the mesh size).

        max_inflight: device batches allowed in flight before the dispatcher
        blocks (pipelining depth; 1 = the old fully-serial behavior).

        resolvers: concurrent device->host fetch threads. Over a
        remote-attached runtime each blocking fetch pays the tunnel RTT
        (~30-55 ms measured, docs/SERVE_LOAD_r5.md); a single resolver
        serializes those RTTs and caps the engine at ~1/RTT batches/s
        regardless of device speed. N resolvers overlap N fetches; futures
        carry their own batch context so completion order is irrelevant."""
        import jax

        self.cfg = cfg
        channels = 1 if cfg.dataset == "MNIST" else 3
        self._img_shape = (cfg.img_size, cfg.img_size, channels)
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        if not self.buckets or self.buckets[0] < 1:
            raise ValueError("buckets must be positive ints")
        self.max_wait_s = max_wait_ms / 1e3
        fn = make_serving_fn(
            cfg, variables, compute_dtype=compute_dtype, include_maps=include_maps,
            quant=quant,
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
        # bucket_fill["b/n"] counts device batches that ran bucket b carrying
        # n live images — the padding histogram the load bench reports
        self._stats = {"requests": 0, "batches": 0, "padded": 0,
                       "bucket_fill": {}}
        # per-request stage samples (seconds), recorded by the resolver:
        # queue_wait (submit -> batch formed), dispatch (the async _fn call),
        # inflight_wait (dispatched -> resolver pickup), fetch (device
        # execute+transfer, the blocking np.asarray). Bounded ring buffer —
        # the serving-gap decomposition (docs/SERVE_LOAD_r5.md) reads these.
        self._samples: "collections.deque" = collections.deque(maxlen=8192)
        self._lock = threading.Lock()
        self._closed = threading.Event()
        # pipelining: dispatched-but-unfetched batches; bounded so at most
        # max_inflight device batches queue behind the executing one
        self._inflight: "queue.Queue" = queue.Queue(maxsize=max(1, max_inflight))
        self._resolvers = [
            threading.Thread(target=self._resolve_loop, daemon=True)
            for _ in range(max(1, resolvers))
        ]
        for t in self._resolvers:
            t.start()
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._thread.start()

    # -- public API ---------------------------------------------------------

    def submit(self, image_u8: np.ndarray) -> Future:
        """Enqueue one (img_size, img_size, C) uint8 image; resolves to a dict
        with 'logits' (num_classes,) and, if enabled, 'slot_maps'."""
        if self._closed.is_set():
            raise RuntimeError("engine is closed")
        image_u8 = self._validate(np.asarray(image_u8), batched=False)
        fut: Future = Future()
        self._queue.put((image_u8, fut, _now()))
        if self._closed.is_set():
            # close() raced us past the is_set check above; make sure this
            # item cannot be stranded in a dead queue
            self._drain_failed()
        return fut

    def infer_batch(self, images_u8: np.ndarray) -> Dict[str, np.ndarray]:
        """Synchronous whole-batch path (bypasses the queue); batches larger
        than the biggest bucket are split into bucket-sized chunks."""
        images_u8 = self._validate(np.asarray(images_u8), batched=True)
        n = images_u8.shape[0]
        max_b = self.buckets[-1]
        outs = [self._run_padded(images_u8[s:s + max_b])
                for s in range(0, n, max_b)]
        return {k: np.concatenate([o[k] for o in outs])[:n] for k in outs[0]}

    def stats(self) -> Dict:
        with self._lock:
            out = dict(self._stats)
            out["bucket_fill"] = dict(self._stats["bucket_fill"])
            return out

    def stage_samples(self):
        """Per-request engine stage timings (see ``_samples`` above)."""
        with self._lock:  # a concurrent resolver append would break iteration
            return list(self._samples)

    def close(self):
        self._closed.set()
        self._queue.put(None)  # wake the dispatcher
        # generous join: a cold first-use bucket compile can take minutes, and
        # the sentinel below must be enqueued AFTER the dispatcher's last
        # batch or that batch's futures would strand behind an exited resolver
        self._thread.join(timeout=600)
        for _ in self._resolvers:  # one sentinel per resolver thread
            self._inflight.put(None)
        for t in self._resolvers:
            t.join(timeout=60)
        self._drain_failed()
        if self._thread.is_alive():
            # the dispatcher join above timed out mid-dispatch; its final
            # in-flight put would land AFTER the drain, stranding that batch's
            # futures behind the exited resolvers — keep one daemon around to
            # resolve it whenever the dispatcher finally returns
            threading.Thread(target=self._late_drain, daemon=True).start()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- internals ----------------------------------------------------------

    def _validate(self, arr: np.ndarray, *, batched: bool) -> np.ndarray:
        """Require raw uint8 pixels of the configured geometry: a silent
        np.uint8 cast would truncate normalized float images to garbage."""
        if arr.dtype != np.uint8:
            raise TypeError(
                f"expected uint8 raw pixels (normalization happens inside the "
                f"compiled program), got dtype {arr.dtype}")
        want = self._img_shape
        got = arr.shape[1:] if batched else arr.shape
        if got != want:
            raise ValueError(f"expected image shape {want}, got {got}")
        return arr

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise AssertionError(
            f"internal: batch {n} exceeds largest bucket {self.buckets[-1]}")

    def _dispatch_padded(self, images_u8: np.ndarray):
        """Pad to the bucket and dispatch; returns DEVICE outputs (async —
        jax returns before execution completes). Stats counted at dispatch."""
        n = images_u8.shape[0]
        bucket = self._bucket_for(n)
        if n < bucket:
            pad = np.zeros((bucket - n,) + images_u8.shape[1:], np.uint8)
            images_u8 = np.concatenate([images_u8, pad], axis=0)
        out = self._fn(images_u8)
        with self._lock:
            self._stats["batches"] += 1
            self._stats["padded"] += bucket - n
            key = f"{bucket}/{n}"
            self._stats["bucket_fill"][key] = (
                self._stats["bucket_fill"].get(key, 0) + 1)
        return out

    def _run_padded(self, images_u8: np.ndarray) -> Dict[str, np.ndarray]:
        out = self._dispatch_padded(images_u8)
        return {k: np.asarray(v) for k, v in out.items()}

    def _drain_failed(self):
        """Resolve or fail anything stranded after shutdown: un-dispatched
        requests in the queue, and dispatched batches left in the in-flight
        pipe (possible if a join above timed out — their results exist on
        device, so resolve them rather than hang the callers)."""
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                fut = item[1]
                if fut.set_running_or_notify_cancel():
                    fut.set_exception(RuntimeError("engine is closed"))
        while True:
            try:
                inflight = self._inflight.get_nowait()
            except queue.Empty:
                return
            if inflight is None:
                continue
            out, live = inflight[0], inflight[1]
            try:
                host = {k: np.asarray(v) for k, v in out.items()}
                for i, item in enumerate(live):
                    fut = item[1]
                    if not fut.done():
                        fut.set_result({k: v[i] for k, v in host.items()})
            except Exception as exc:
                for item in live:
                    fut = item[1]
                    if not fut.done():
                        fut.set_exception(exc)

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
                if remaining <= 0 and not self._inflight.full():
                    break  # window elapsed and the device has room: dispatch
                try:
                    # while the in-flight pipe is full the device is saturated
                    # and waiting to fill the bucket costs nothing — dispatching
                    # a partial batch would only burn a dispatch on padding
                    # (measured: naive pipelining shrank mean fill 6.8 -> 3.0
                    # and LOST 35% throughput before this adaptive wait)
                    nxt = self._queue.get(
                        timeout=remaining if remaining > 0 else self.max_wait_s)
                except queue.Empty:
                    if self._inflight.full():
                        continue
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            # drop client-cancelled requests; mark the rest running so a
            # late cancel() can no longer make set_result raise
            live = [b for b in batch if b[1].set_running_or_notify_cancel()]
            if not live:
                continue
            with self._lock:
                self._stats["requests"] += len(live)
            try:
                t_formed = _now()
                images = np.stack([b[0] for b in live])
                # async dispatch: hand the device outputs to the resolver and
                # immediately form the next batch; the bounded put blocks when
                # max_inflight batches are already queued on the device
                out = self._dispatch_padded(images)
                self._inflight.put((out, live, (t_formed, _now())))
            except Exception as exc:  # resolve, never hang callers
                for _, fut, _t in live:
                    if not fut.done():
                        fut.set_exception(exc)

    def _resolve_loop(self):
        """Fetch dispatched batches to host (the blocking step) and resolve
        futures — off the dispatcher's critical path."""
        while True:
            item = self._inflight.get()
            if item is None:
                return
            out, live, (t_formed, t_disp) = item
            t_pick = _now()
            try:
                host = {k: np.asarray(v) for k, v in out.items()}
                t_done = _now()
                # record BEFORE resolving: a caller woken by the final
                # set_result may snapshot stage_samples() immediately
                with self._lock:
                    for _, _fut, t_sub in live:
                        self._samples.append({
                            "queue_wait": t_formed - t_sub,
                            "dispatch": t_disp - t_formed,
                            "inflight_wait": t_pick - t_disp,
                            "fetch": t_done - t_pick,
                            "live": len(live),
                            "bucket": int(host["logits"].shape[0]),
                        })
                for i, (_, fut, _t) in enumerate(live):
                    # done() race: infer() may have already failed this future
                    # when close() raced the submit — don't let one resolved
                    # future's InvalidStateError rob its batchmates of results
                    if not fut.done():
                        fut.set_result({k: v[i] for k, v in host.items()})
            except Exception as exc:
                for _, fut, _t in live:
                    if not fut.done():
                        fut.set_exception(exc)

    def _late_drain(self):
        """close()-spawned guard for a dispatcher that outlived its join
        timeout (see close); daemon thread, exits with the process."""
        self._thread.join()
        self._drain_failed()


def _now() -> float:
    import time

    return time.monotonic()
