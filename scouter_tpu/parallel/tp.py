"""Tensor-parallel + ZeRO-1 sharding rules over a 2-D (data, model) mesh.

The reference is data-parallel only (SURVEY §2e: DDP over NCCL is the single
strategy, ``train.py:139-141``), but the brief asks the TPU rebuild to design
for scale. This module is the GSPMD realization: instead of a hand-written
collective schedule, every parameter (and optimizer-state) leaf is annotated
with a :class:`~jax.sharding.NamedSharding` and XLA inserts the collectives
(scaling-book recipe: pick a mesh, annotate, let the compiler schedule).

Two orthogonal capabilities:

- **Tensor parallelism** (``model`` mesh axis): Megatron-style channel
  sharding. Conv kernels (HWIO) shard the output-channel axis; the xSlot
  head's ``initial_slots (1, S, d)`` shards the slot axis S — the dimension
  that actually grows with the task (CUB-200 × spc=5 → S=1000,
  ``sloter/utils/slot_attention.py:20-25`` is the reference's replicated
  equivalent). 1-D channel vectors (BN scale/bias, conv bias) shard with
  their producing conv so the channel-parallel activations never gather for
  the affine.
- **ZeRO-1** (``data`` mesh axis): AdamW's mu/nu leaves are stored sharded
  over the data axis (largest divisible axis not already taken by ``model``);
  XLA gathers for the update and reduce-scatters back, so persistent
  optimizer memory per device drops toward 1/N while step math is unchanged.

Both paths require global-batch BN (``sync_bn=True``, the plain-jit GSPMD
step); the per-replica shard_map path is data-axis-only by construction.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "tp_enabled",
    "param_partition_spec",
    "train_state_shardings",
    "shard_train_state",
]


def tp_enabled(mesh: Optional[Mesh]) -> bool:
    """True when the mesh carries a non-trivial ``model`` axis."""
    return (
        mesh is not None
        and "model" in mesh.axis_names
        and int(mesh.shape["model"]) > 1
    )


def _divisible(dim: int, n: int) -> bool:
    return n > 1 and dim % n == 0


def _in_backbone(path) -> bool:
    """True when a tree path passes through a 'backbone' mapping key."""
    for k in path:
        key = getattr(k, "key", None)
        if key is None:
            key = getattr(k, "name", None)
        if key == "backbone":
            return True
    return False


def param_partition_spec(shape, tp: int, path=None) -> P:
    """TP spec for one parameter/statistic leaf, by shape (+ tree path).

    - 4-D (conv HWIO): shard output channels — ``P(None, None, None, 'model')``
    - 3-D (the slot bank ``(1, S, d)``): shard the slot axis S
    - 1-D **backbone** leaves (BN scale/bias, conv bias, channel stats): shard
      the channel axis so affines stay local to the channel-parallel
      activations their producing conv emits
    - everything else (slot-head matrices AND their 1-D biases, scalars):
      replicated. The slot head's 2-D weights (GRU kernels, the to_k/to_q
      stacks, d=64) replicate, so sharding their 1-D biases (e.g. the 192-wide
      GRU bias) over 'model' would force an all-gather of the bias against
      replicated activations every step — pure collective overhead with zero
      memory win. ``path=None`` (shape-only call) treats the leaf as backbone
      for backward compatibility.
    """
    if len(shape) == 4 and _divisible(shape[3], tp):
        return P(None, None, None, "model")
    if len(shape) == 3 and _divisible(shape[1], tp):
        return P(None, "model", None)
    if len(shape) == 1 and _divisible(shape[0], tp) and (
        path is None or _in_backbone(path)
    ):
        return P("model")
    return P()


def _zero1_spec(shape, base: P, dp: int) -> P:
    """Extend ``base`` by sharding the largest free axis over ``data``."""
    spec = list(base) + [None] * (len(shape) - len(base))
    free = [i for i, s in enumerate(spec) if s is None]
    free.sort(key=lambda i: shape[i], reverse=True)
    for i in free:
        if _divisible(shape[i], dp):
            spec[i] = "data"
            return P(*spec)
    return base


def train_state_shardings(state: Any, mesh: Mesh, zero1: bool = False) -> Any:
    """NamedSharding pytree matching a :class:`~scouter_tpu.train.TrainState`.

    Params and batch_stats get TP specs; optimizer-state leaves get the TP
    spec of their shape plus (with ``zero1``) a data-axis shard on the largest
    remaining axis. Scalars (step counter, injected lr, Adam count) replicate.
    """
    tp = int(mesh.shape.get("model", 1))
    dp = int(mesh.shape.get("data", 1))

    def ndsh(spec: P) -> NamedSharding:
        return NamedSharding(mesh, spec)

    def param_leaf(path, x) -> NamedSharding:
        return ndsh(param_partition_spec(np.shape(x), tp, path))

    def opt_leaf(path, x) -> NamedSharding:
        shape = np.shape(x)
        base = param_partition_spec(shape, tp, path)
        if zero1 and len(shape) >= 1:
            base = _zero1_spec(shape, base, dp)
        return ndsh(base)

    # tree_map_with_path: optimizer-state leaves nest the params dict inside
    # optax state tuples, so their paths still pass through 'backbone'/'slot'
    # mapping keys — the same path rule applies to both trees
    return state.replace(
        params=jax.tree_util.tree_map_with_path(param_leaf, state.params),
        batch_stats=(
            None
            if state.batch_stats is None
            else jax.tree_util.tree_map_with_path(param_leaf, state.batch_stats)
        ),
        opt_state=jax.tree_util.tree_map_with_path(opt_leaf, state.opt_state),
        step=ndsh(P()),
    )


def shard_train_state(state: Any, mesh: Mesh, zero1: bool = False):
    """Place a TrainState onto the mesh per the TP/ZeRO-1 rules.

    Returns ``(sharded_state, sharding_pytree)``; feed the sharding pytree to
    :func:`scouter_tpu.train.make_train_step` as ``state_shardings`` so the
    step's output keeps the same placement (stable across steps, donation-safe,
    no second-call recompile).
    """
    shardings = train_state_shardings(state, mesh, zero1=zero1)
    return jax.device_put(state, shardings), shardings
