"""Graceful-preemption support for long training runs.

Production TPU pools (and most cluster schedulers) deliver SIGTERM with a
grace window before killing a worker. The reference has no handling for this —
a preempted run loses everything since the last epoch-boundary checkpoint
(``/root/reference/train.py:181-196`` saves once per epoch and resume is
epoch-granular, ``train.py:163-169``). Here the epoch-seeded, batch-indexed
data pipeline (``data/pipeline.py::Loader``) is deterministic per
(seed, epoch, batch index), so a mid-epoch snapshot that records the number of
completed batches resumes EXACTLY: skip the prefix, continue, and the final
parameters are bit-identical to an uninterrupted run
(``tests/test_resilience.py``).

Usage: the ``--preempt_save true`` CLI flag makes the Trainer install a
:class:`PreemptionGuard`; on SIGTERM the current train step finishes, a
checkpoint with the batch cursor is written synchronously, and ``fit``
returns. ``--resume true`` picks the cursor up.
"""

from __future__ import annotations

import signal
import threading
from typing import Optional, Sequence

__all__ = ["PreemptionGuard"]


class PreemptionGuard:
    """Converts termination signals into a cooperative flag.

    The handler only sets an event — no I/O, no JAX calls — so it is
    async-signal-safe in the practical Python sense. The training loop polls
    :attr:`triggered` after every completed train step. A second signal while
    the flag is already set falls through to the PREVIOUS handler (normally
    the default action, i.e. terminate), so a scheduler that loses patience
    can still kill the process."""

    def __init__(self, signals: Sequence[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._event = threading.Event()
        self._prev: dict = {}
        self._installed = False

    def install(self) -> "PreemptionGuard":
        """Install handlers (main thread only; no-op with a warning elsewhere)."""
        try:
            for sig in self._signals:
                self._prev[sig] = signal.signal(sig, self._handle)
            self._installed = True
        except ValueError:
            # signal.signal outside the main thread — run unguarded rather
            # than crash (e.g. a Trainer constructed inside a worker thread)
            import warnings

            warnings.warn("PreemptionGuard: not on the main thread; "
                          "signals will not be caught", RuntimeWarning)
        return self

    def uninstall(self) -> None:
        if not self._installed:
            return
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()
        self._installed = False

    def _handle(self, signum, frame) -> None:
        if self._event.is_set():
            # second signal: escalate to the previous disposition
            prev = self._prev.get(signum)
            if callable(prev):
                prev(signum, frame)
            elif prev == signal.SIG_DFL:
                signal.signal(signum, signal.SIG_DFL)
                signal.raise_signal(signum)
            return
        self._event.set()
        print(f"[preempt] caught signal {signum}: will checkpoint after the "
              "current step and exit")

    def trigger(self) -> None:
        """Programmatic trigger (tests / external schedulers)."""
        self._event.set()

    @property
    def triggered(self) -> bool:
        return self._event.is_set()
