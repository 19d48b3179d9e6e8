"""Device mesh + sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "is_main_process",
    "host_shard_bounds",
]


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh. Default: 1-D ``data`` axis over all devices.

    A trailing ``model`` axis can be requested via shape=(d, m),
    axis_names=('data', 'model') — the sharding rules below only shard the batch,
    so a model axis is ready for tensor-parallel rules without breaking DP.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    names = tuple(axis_names)[: dev_array.ndim]
    if len(names) < dev_array.ndim:
        # '--mesh_shape 4,2' with the default 1-axis name list: the trailing
        # axis is the tensor-parallel 'model' axis (parallel/tp.py rules).
        # Only ONE axis may be padded — padding two would duplicate the name
        # and Mesh would silently collapse axes (cryptic XLA failure later).
        if dev_array.ndim - len(names) > 1 or "model" in names:
            raise ValueError(
                f"mesh shape {tuple(shape)} needs {dev_array.ndim} axis names "
                f"but only {names!r} given; the documented contract is "
                "'data[,model]' — pass explicit axis_names for 3-D+ meshes")
        names = names + ("model",)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Shard a host batch's leading axis over 'data'.

    Multi-process: each host passes its LOCAL batch and the global array is
    assembled across processes (``jax.device_put`` with a global sharding
    would raise on non-addressable devices — or scramble per-host data).
    Mirrors the Loader's put path (data/pipeline.py)."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def is_main_process() -> bool:
    """Rank-0 check (replaces tools/prepare_things.py:49-75 helpers)."""
    return jax.process_index() == 0


def host_shard_bounds(num_examples: int, *, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> Tuple[int, int]:
    """Per-host contiguous shard of a dataset — replaces DistributedSampler.

    Returns [start, stop) such that all hosts cover the dataset with near-equal
    contiguous shards (remainder spread over the first hosts).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(num_examples, pc)
    start = pi * base + min(pi, rem)
    stop = start + base + (1 if pi < rem else 0)
    return start, stop
