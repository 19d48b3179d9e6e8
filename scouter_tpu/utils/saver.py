"""Top-k checkpoint saver — timm ``CheckpointSaver`` (``timm/utils.py:35-151``)
capability: keep the N best checkpoints by a metric, maintain a ``best`` link,
and batch-level recovery shards (save_recovery/find_recovery)."""

from __future__ import annotations

import glob
import operator
import os
from typing import Any, List, Optional, Tuple

import jax

from ..core.checkpoint import save_on_master

__all__ = ["CheckpointSaver"]


class CheckpointSaver:
    def __init__(
        self,
        checkpoint_dir: str,
        *,
        max_history: int = 10,
        decreasing: bool = False,
        recovery_dir: Optional[str] = None,
    ):
        self.checkpoint_dir = checkpoint_dir
        self.recovery_dir = recovery_dir or checkpoint_dir
        self.max_history = max(1, max_history)
        self.decreasing = decreasing
        self.cmp = operator.lt if decreasing else operator.gt
        self.checkpoint_files: List[Tuple[str, float]] = []  # (path, metric), sorted best-first
        self.best_metric: Optional[float] = None
        self.best_epoch: Optional[int] = None
        os.makedirs(checkpoint_dir, exist_ok=True)

    def _worst(self) -> Optional[float]:
        return self.checkpoint_files[-1][1] if self.checkpoint_files else None

    def save_checkpoint(self, blob: bytes, epoch: int, metric: float) -> Optional[float]:
        """Store if it ranks in the top max_history. Returns new best metric.

        Filesystem mutations (evictions) are rank-0 gated like the writes —
        a non-master rank must not delete checkpoints it never replaces."""
        worst = self._worst()
        if len(self.checkpoint_files) < self.max_history or worst is None or self.cmp(metric, worst):
            if len(self.checkpoint_files) >= self.max_history:
                path, _ = self.checkpoint_files.pop()
                if jax.process_index() == 0 and os.path.exists(path):
                    os.remove(path)
            path = os.path.join(self.checkpoint_dir, f"checkpoint-{epoch}.msgpack")
            save_on_master(blob, path)
            self.checkpoint_files.append((path, metric))
            self.checkpoint_files.sort(key=lambda x: x[1], reverse=not self.decreasing)
            if self.best_metric is None or self.cmp(metric, self.best_metric):
                self.best_metric, self.best_epoch = metric, epoch
                save_on_master(blob, os.path.join(self.checkpoint_dir, "model_best.msgpack"))
        return self.best_metric

    def save_recovery(self, blob: bytes, epoch: int, batch_idx: int) -> str:
        """Batch-level recovery shard (timm/utils.py:130-140).

        Write-then-clean, rank-0 only: deleting the old shard first would
        leave a crash window with ZERO recovery points (the exact loss the
        shard exists to prevent), and non-master ranks must not delete files
        they never replace."""
        path = os.path.join(self.recovery_dir, f"recovery-{epoch}-{batch_idx}.msgpack")
        if jax.process_index() != 0:
            return path
        save_on_master(blob, path)
        for old in glob.glob(os.path.join(self.recovery_dir, "recovery-*.msgpack")):
            if old != path:
                os.remove(old)
        return path

    def find_recovery(self) -> Optional[str]:
        files = sorted(glob.glob(os.path.join(self.recovery_dir, "recovery-*.msgpack")),
                       key=os.path.getmtime)
        return files[-1] if files else None
