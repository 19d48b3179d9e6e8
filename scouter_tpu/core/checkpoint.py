"""Checkpoint I/O with the reference's naming convention.

Format parity (``train.py:181-196``): one 'latest' checkpoint per config name,
overwritten each epoch, plus archival copies every 10 epochs and at the lr-drop
epoch; the name encodes dataset/slot-mode/loss-sign/area-size config
(core/config.py checkpoint_name) and is re-derived by the test CLI — a de-facto
API. Rank-0-only writes (``tools/prepare_things.py:73-75``) map to
``jax.process_index() == 0``.

Contents: {'state': TrainState pytree, 'epoch': int, 'config': dataclass dict}
serialized with flax msgpack (single file, fast for these model sizes).
Multi-host/async checkpointing can swap in Orbax behind the same interface.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization as fser
import jax
import msgpack
import numpy as np

from .config import ScouterConfig, checkpoint_name

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "checkpoint_path",
    "save_on_master",
    "AsyncCheckpointWriter",
]


def checkpoint_path(output_dir: str, cfg: ScouterConfig, epoch: Optional[int] = None) -> str:
    return os.path.join(output_dir, checkpoint_name(cfg, epoch) + ".msgpack")


def _to_host(tree):
    """Device->host copy of every leaf, multi-host safe.

    Under TP/ZeRO-1 in a real multi-host run, process 0 does not hold all
    shards of a sharded leaf (``np.asarray`` raises on non-fully-addressable
    arrays), so those leaves are allgathered across processes first. This is a
    COLLECTIVE when any leaf is non-fully-addressable: every process must call
    it (save_checkpoint does, gating the write afterwards)."""

    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(leaf, tree)


def save_on_master(blob: bytes, path: str) -> None:
    """Write only from process 0 (save_on_master parity)."""
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _config_dict(cfg: ScouterConfig) -> Dict[str, Any]:
    d = dataclasses.asdict(cfg)
    # msgpack-safe: tuples -> lists, None preserved
    return {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}


class AsyncCheckpointWriter:
    """Single-worker background writer for epoch-boundary checkpoints.

    The device->host snapshot (:func:`_to_host`) stays SYNCHRONOUS on the
    caller's thread — it is a collective under multi-host TP/ZeRO-1, and the
    donated train step invalidates the old state's device buffers, so the copy
    must land before the next step. What overlaps with subsequent compute is
    the CPU-heavy part: msgpack/flax serialization plus the disk write.

    Writes are FIFO on one daemon thread; a failed write is re-raised at the
    next :meth:`drain` (and the loop calls drain at end-of-fit and before a
    preemption exit, so errors cannot pass silently)."""

    def __init__(self):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                return
            try:
                fn()
            except BaseException as e:  # surfaced at drain()
                if self._err is None:  # first error wins (docstring contract)
                    self._err = e
            finally:
                self._q.task_done()

    def submit(self, fn) -> None:
        self._q.put(fn)

    def drain(self) -> None:
        """Block until every submitted write finished; re-raise the first error."""
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self) -> None:
        # sentinel + join must happen even when drain() re-raises, or the
        # daemon thread stays parked on the queue forever
        try:
            self.drain()
        finally:
            self._q.put(None)
            self._thread.join(timeout=10.0)


def save_checkpoint(
    output_dir: str,
    cfg: ScouterConfig,
    state: Any,
    epoch: int,
    batch: Optional[int] = None,
    writer: Optional[AsyncCheckpointWriter] = None,
    metric_sums: Optional[Dict[str, Any]] = None,
) -> Tuple[str, ...]:
    """Save latest (+ archival per the reference cadence). Returns paths written.

    ``batch``: when not None, this is a mid-epoch preemption snapshot — the
    payload records the number of completed train batches of ``epoch`` so
    resume can skip exactly that prefix (the epoch-seeded loader is
    deterministic per (seed, epoch, batch index)). Preemption snapshots only
    overwrite the 'latest' path, never the archival copies.

    ``metric_sums``: a ``{"sums": {name: float}, "n": int}`` dict of the
    interrupted train epoch's running metric sums, carried so the resumed
    epoch's logged average covers ALL its batches — not just the post-resume
    suffix (the reference's per-epoch MetricLog semantics,
    ``tools/calculate_tool.py:18-31``, would otherwise drift on resume even
    though params are bit-identical).

    ``writer``: an :class:`AsyncCheckpointWriter`; serialization + disk write
    are deferred to its thread (the host snapshot still happens here — see the
    writer's docstring for why)."""
    # _to_host is a collective when leaves are non-fully-addressable (multi-host
    # TP/ZeRO-1): ALL processes must run it; only rank 0 serializes + writes.
    host_state = _to_host(state)
    if jax.process_index() != 0:
        return tuple()
    paths = [checkpoint_path(output_dir, cfg)]
    if batch is None and ((epoch + 1) % cfg.lr_drop == 0 or (epoch + 1) % 10 == 0):
        # train.py:185-188 archival cadence
        paths.append(checkpoint_path(output_dir, cfg, epoch))

    def _serialize_and_write():
        payload = {
            "state": fser.to_bytes(host_state),
            "epoch": epoch,
            "config": _config_dict(cfg),
        }
        if batch is not None:
            payload["batch"] = int(batch)
        if metric_sums is not None:
            payload["metric_sums"] = {
                "sums": {k: float(v) for k, v in metric_sums["sums"].items()},
                "n": int(metric_sums["n"]),
            }
        blob = msgpack.packb(payload, use_bin_type=True)
        for p in paths:
            save_on_master(blob, p)

    if writer is not None:
        writer.submit(_serialize_and_write)
    else:
        _serialize_and_write()
    return tuple(paths)


def restore_checkpoint(
    path: str, state_template: Any, shardings: Any = None,
    return_batch: bool = False, return_extras: bool = False,
) -> Tuple[Any, ...]:
    """Restore onto a template TrainState (shapes/types must match).

    ``shardings``: a NamedSharding pytree matching the state (the TP/ZeRO-1
    layout from :func:`scouter_tpu.parallel.shard_train_state`). flax
    ``from_bytes`` yields host numpy leaves with no placement; re-entering a
    donated GSPMD step whose out_shardings pin the TP layout would then trip
    XLA's donation-aliasing check (replicated input aliased to sharded output).
    Passing the layout re-places the restored state before it is returned —
    the resume-under-mesh contract of ``train.py:163-169``.

    ``return_batch=True`` appends a 4th element: the completed-batch count of
    a mid-epoch preemption snapshot (None for a normal epoch-boundary save).

    ``return_extras=True`` appends a dict of optional payload extras
    (currently ``metric_sums`` — see :func:`save_checkpoint`)."""
    with open(path, "rb") as f:
        payload = msgpack.unpackb(f.read(), raw=False)
    restored = fser.from_bytes(state_template, payload["state"])
    if shardings is not None:
        restored = jax.device_put(restored, shardings)
    out = (restored, int(payload["epoch"]), payload["config"])
    if return_batch:
        b = payload.get("batch")
        out = out + (int(b) if b is not None else None,)
    if return_extras:
        out = out + ({k: payload[k] for k in ("metric_sums",) if k in payload},)
    return out


# ---- Orbax backend -----------------------------------------------------------
# For large-scale / multi-host deployments: sharded, async-capable checkpoints.
# Same naming convention, directory per checkpoint instead of a single file.


def orbax_save(output_dir: str, cfg: ScouterConfig, state: Any, epoch: int) -> str:
    """Array state via Orbax (sharded/async-capable); epoch+config as JSON sidecar."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, checkpoint_name(cfg, epoch) + ".orbax"))
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, {"state": state})
    ckptr.wait_until_finished()
    with open(path + ".meta.json", "w") as f:
        json.dump({"epoch": epoch, "config": _config_dict(cfg)}, f)
    return path


def orbax_restore(path: str, state_template: Any) -> Tuple[Any, int, Dict]:
    import json

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path), {"state": state_template})
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    return payload["state"], int(meta["epoch"]), meta["config"]
