"""Pointing-game benchmark — explanation-accuracy metric
(``torchray/benchmark/pointing_game.py:35-127`` capability).

A predicted point hits if a disc of radius ``tolerance`` around it intersects
the ground-truth occupancy mask; per-class accuracies average hits over
hits+misses. The vendored difficult-set machinery (VOC07/COCO14 lists) is
dataset plumbing the SCOUTER scripts never call; the core metric is here and
list support can layer on top.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["PointingGame", "saliency_point"]


def saliency_point(saliency: np.ndarray) -> Tuple[int, int]:
    """argmax location of a (H, W) saliency map as (u, v) = (x, y)."""
    idx = int(np.argmax(saliency))
    h, w = saliency.shape
    return idx % w, idx // w


class PointingGame:
    def __init__(self, num_classes: int, tolerance: int = 15):
        self.num_classes = num_classes
        self.tolerance = tolerance
        self.hits = np.zeros(num_classes, np.float64)
        self.misses = np.zeros(num_classes, np.float64)

    def evaluate(self, mask: np.ndarray, point: Tuple[int, int]) -> int:
        """mask: {0,1} (H, W); point: (u, v). Returns +1 hit / -1 miss."""
        h, w = mask.shape
        yy = (np.arange(h, dtype=np.float32) - point[1]) ** 2
        xx = (np.arange(w, dtype=np.float32) - point[0]) ** 2
        accept = (yy[:, None] + xx[None, :]) < self.tolerance**2
        hit = bool(np.any(np.logical_and(mask.astype(bool), accept)))
        return 1 if hit else -1

    def aggregate(self, hit: int, class_id: int) -> None:
        if hit == 1:
            self.hits[class_id] += 1
        elif hit == -1:
            self.misses[class_id] += 1

    def reset(self) -> None:
        self.hits[:] = 0
        self.misses[:] = 0

    @property
    def class_accuracies(self) -> np.ndarray:
        return self.hits / np.clip(self.hits + self.misses, 1, None)

    @property
    def accuracy(self) -> float:
        return float(self.class_accuracies.mean())

    def __str__(self) -> str:
        accs = self.class_accuracies
        per = " ".join(f"{c}:{100 * a:4.1f}%" for c, a in enumerate(accs))
        return f"{100 * accs.mean():4.1f}% [{per}]"
