"""Production serving for SCOUTER models.

Two complementary pieces, both absent from the reference (its deployment
story ends at ``test.py``'s one-image loop, ``/root/reference/test.py:18-44``):

- ``serve.export``: ahead-of-time export of the full inference program
  (uint8 image -> logits + rendered per-class slot maps) as a serialized,
  versioned StableHLO artifact via ``jax.export`` — loadable without any
  model-building Python, portable across jax processes, optionally
  multi-platform (tpu+cpu) and batch-polymorphic.
- ``serve.engine``: an in-process micro-batching inference engine — request
  queue, bucketed batch compilation, pad-to-bucket dispatch — the piece that
  turns the 0.24 ms/img @ bs=16 device latency (PARITY.md serving table)
  into realized throughput for single-image request streams.
"""

from .engine import InferenceEngine
from .export import (
    export_serving,
    load_artifact,
    make_serving_fn,
    save_artifact,
)

__all__ = [
    "InferenceEngine",
    "export_serving",
    "load_artifact",
    "make_serving_fn",
    "save_artifact",
]
