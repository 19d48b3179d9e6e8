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

__all__ = ["save_checkpoint", "restore_checkpoint", "checkpoint_path", "save_on_master"]


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


def save_checkpoint(
    output_dir: str,
    cfg: ScouterConfig,
    state: Any,
    epoch: int,
) -> Tuple[str, ...]:
    """Save latest (+ archival per the reference cadence). Returns paths written."""
    # _to_host is a collective when leaves are non-fully-addressable (multi-host
    # TP/ZeRO-1): ALL processes must run it; only rank 0 serializes + writes.
    host_state = _to_host(state)
    if jax.process_index() != 0:
        return tuple()
    blob = msgpack.packb(
        {
            "state": fser.to_bytes(host_state),
            "epoch": epoch,
            "config": _config_dict(cfg),
        },
        use_bin_type=True,
    )
    paths = [checkpoint_path(output_dir, cfg)]
    if (epoch + 1) % cfg.lr_drop == 0 or (epoch + 1) % 10 == 0:  # train.py:185-188
        paths.append(checkpoint_path(output_dir, cfg, epoch))
    for p in paths:
        save_on_master(blob, p)
    return tuple(paths)


def restore_checkpoint(
    path: str, state_template: Any, shardings: Any = None
) -> Tuple[Any, int, Dict]:
    """Restore onto a template TrainState (shapes/types must match).

    ``shardings``: a NamedSharding pytree matching the state (the TP/ZeRO-1
    layout from :func:`scouter_tpu.parallel.shard_train_state`). flax
    ``from_bytes`` yields host numpy leaves with no placement; re-entering a
    donated GSPMD step whose out_shardings pin the TP layout would then trip
    XLA's donation-aliasing check (replicated input aliased to sharded output).
    Passing the layout re-places the restored state before it is returned —
    the resume-under-mesh contract of ``train.py:163-169``."""
    with open(path, "rb") as f:
        payload = msgpack.unpackb(f.read(), raw=False)
    restored = fser.from_bytes(state_template, payload["state"])
    if shardings is not None:
        restored = jax.device_put(restored, shardings)
    return restored, int(payload["epoch"]), payload["config"]


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
