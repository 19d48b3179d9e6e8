"""LR schedule factory — timm ``create_scheduler``
(``timm/scheduler/scheduler_factory.py:7``) capability on plain python/optax
schedules. All schedules are epoch-indexed callables ``epoch -> lr`` so they
compose with the per-epoch lr injection (train/steps.set_learning_rate).

Supported: step (the reference's StepLR), multistep, cosine (+cycles),
tanh, plateau (metric-driven), all with linear warmup and optional noise.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import numpy as np

__all__ = ["create_scheduler", "PlateauScheduler"]

Schedule = Callable[[int], float]


def _with_warmup(fn: Schedule, warmup_epochs: int, warmup_lr_init: float,
                 base_lr: float) -> Schedule:
    if warmup_epochs <= 0:
        return fn

    def sched(epoch: int) -> float:
        if epoch < warmup_epochs:
            t = epoch / max(warmup_epochs, 1)
            return warmup_lr_init + t * (base_lr - warmup_lr_init)
        return fn(epoch - warmup_epochs)

    return sched


def create_scheduler(
    sched: str,
    base_lr: float,
    epochs: int,
    *,
    decay_epochs: int = 30,
    decay_rate: float = 0.1,
    decay_milestones: Optional[Sequence[int]] = None,
    min_lr: float = 1e-5,
    warmup_epochs: int = 0,
    warmup_lr_init: float = 1e-6,
    cycle_limit: int = 1,
    noise_pct: float = 0.0,
    noise_seed: int = 42,
) -> Schedule:
    sched = sched.lower()
    if sched == "step":
        def base(e):
            return base_lr * (decay_rate ** (e // decay_epochs))
    elif sched == "multistep":
        milestones = sorted(decay_milestones or [])

        def base(e):
            k = sum(1 for m in milestones if e >= m)
            return base_lr * (decay_rate**k)
    elif sched == "cosine":
        t_max = max(epochs - warmup_epochs, 1)

        def base(e):
            e_c = e % t_max if cycle_limit != 1 else min(e, t_max)
            return min_lr + 0.5 * (base_lr - min_lr) * (1 + math.cos(math.pi * e_c / t_max))
    elif sched == "tanh":
        t_max = max(epochs - warmup_epochs, 1)
        lb, ub = -6.0, 4.0

        def base(e):
            t = min(e, t_max) / t_max
            return min_lr + 0.5 * (base_lr - min_lr) * (1 - math.tanh(lb + t * (ub - lb)))
    else:
        raise ValueError(f"unknown scheduler {sched!r} (plateau uses PlateauScheduler)")

    fn = _with_warmup(base, warmup_epochs, warmup_lr_init, base_lr)
    if noise_pct > 0:
        rng = np.random.RandomState(noise_seed)
        noise = {e: 1.0 + noise_pct * (2 * rng.rand() - 1) for e in range(epochs + 1)}

        def noisy(e):
            return fn(e) * noise.get(e, 1.0)

        return noisy
    return fn


class PlateauScheduler:
    """ReduceLROnPlateau semantics: decay when the metric stops improving."""

    def __init__(self, base_lr: float, *, decay_rate: float = 0.1, patience: int = 10,
                 min_lr: float = 1e-6, mode: str = "max", threshold: float = 1e-4):
        self.lr = base_lr
        self.decay_rate = decay_rate
        self.patience = patience
        self.min_lr = min_lr
        self.mode = mode
        self.threshold = threshold
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        improved = (
            self.best is None
            or (self.mode == "max" and metric > self.best + self.threshold)
            or (self.mode == "min" and metric < self.best - self.threshold)
        )
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.decay_rate, self.min_lr)
                self.bad_epochs = 0
        return self.lr
