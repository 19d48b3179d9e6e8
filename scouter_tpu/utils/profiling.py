"""Tracing / profiling — the TPU-native upgrade over the reference's
thop/time.time() instrumentation (SURVEY.md §5).

- :func:`trace`: context manager around ``jax.profiler`` producing a TensorBoard
  trace directory.
- :class:`Timer`: wall-clock timing with ``block_until_ready`` barriers.
- :func:`model_cost_analysis`: FLOPs/bytes via XLA cost analysis — replaces the
  thop profile path (``train.py:126-137``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax

__all__ = ["trace", "Timer", "model_cost_analysis"]


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@jax.jit
def _barrier():
    import jax.numpy as jnp

    return jnp.zeros(())


class Timer:
    """Accurate device timing: blocks on the result before reading the clock."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_getter: Optional[Callable[[], Any]] = None):
        # drain previously dispatched async work before starting the clock —
        # otherwise an un-awaited prior step is charged to this region. A
        # trivial jitted program enqueues after all pending work on the
        # default device's (single) execution stream, so blocking on it is a
        # device barrier.
        jax.block_until_ready(_barrier())
        t0 = time.perf_counter()
        yield
        if result_getter is not None:
            jax.block_until_ready(result_getter())
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def model_cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """{'flops': ..., 'bytes accessed': ...} for a jitted callable."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    return dict(cost) if cost else {}
