"""Multi-host bootstrap — the TPU replacement for init_distributed_mode.

The reference (``tools/prepare_things.py:9-46``) discovers ranks from env vars
or SLURM, initializes a NCCL process group, barriers, and monkeypatches print to
rank-0 only. The jax equivalent:

- single-host: nothing to do — devices just exist.
- multi-host: ``jax.distributed.initialize()`` (coordinator discovery via env),
  after which ``jax.devices()`` spans hosts and collectives ride ICI/DCN as
  scheduled by the compiler.
- rank helpers map to ``jax.process_index()`` / ``jax.process_count()``.
"""

from __future__ import annotations

import builtins
import functools
import os
from typing import Optional

import jax

__all__ = [
    "init_distributed_mode",
    "is_dist_avail_and_initialized",
    "get_world_size",
    "get_rank",
    "is_main_process",
    "setup_for_distributed",
]

_initialized = False


def init_distributed_mode(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host jax if the environment calls for it.

    Args are optional — with none given, jax.distributed.initialize() reads the
    standard env (JAX_COORDINATOR_ADDRESS etc. / TPU metadata). On single-host
    (no coordinator configured) this is a no-op, matching the reference's
    'Not using distributed mode' branch (prepare_things.py:17-21).
    """
    global _initialized
    if _initialized:
        return
    has_env = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not has_env:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    setup_for_distributed(is_main_process())


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_for_distributed(is_master: bool) -> None:
    """Rank-0-only print (prepare_things.py:34-46 semantics): non-master prints
    are suppressed unless force=True is passed."""
    builtin_print = builtins.print

    @functools.wraps(builtin_print)
    def print_fn(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_fn
