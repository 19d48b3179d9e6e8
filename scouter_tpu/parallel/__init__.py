"""Mesh construction and sharding rules — the TPU replacement for torch DDP.

The reference's distributed stack (``tools/prepare_things.py:9-31``: NCCL
process group, env-var/SLURM rank discovery, DDP bucketed all-reduce in
``loss.backward()``) maps to:

- a :class:`jax.sharding.Mesh` over all devices with a leading ``data`` axis
  (optionally a trailing ``model`` axis for future tensor parallelism),
- batch sharded over ``data`` via NamedSharding; params/stats replicated,
- gradient reduction done *by the compiler* as psum over the mesh inside the
  jitted train step (no backward hooks),
- ``is_main_process``/``save_on_master`` -> ``jax.process_index() == 0``,
- multi-host bootstrap -> ``jax.distributed.initialize()`` (DCN between hosts,
  ICI inside a slice).
"""

from .mesh import (
    batch_sharding,
    host_shard_bounds,
    is_main_process,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from .tp import (
    param_partition_spec,
    shard_train_state,
    tp_enabled,
    train_state_shardings,
)

__all__ = [
    "batch_sharding",
    "host_shard_bounds",
    "is_main_process",
    "make_mesh",
    "param_partition_spec",
    "replicated_sharding",
    "shard_batch",
    "shard_train_state",
    "tp_enabled",
    "train_state_shardings",
]
