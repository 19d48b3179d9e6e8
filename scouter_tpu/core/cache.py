"""Persistent XLA compilation cache setup, shared by every entry point.

First compile of a large backbone on the TPU is slow (cold resnet18
compile+run was measured at ~12 min in round 2's zoo smoke); a persistent
cache makes every subsequent process start in seconds. Round 2 set this up
only in bench/example scripts — this module centralizes it so the user CLIs
(train/cli.py, explain/cli.py, explain/compare_cli.py) and the benches share
one cache directory.
"""

from __future__ import annotations

import hashlib
import os
import platform

__all__ = ["setup_compilation_cache"]

_DEFAULT_DIR = os.path.expanduser("~/.jax_cache")
_done = False


def _host_fingerprint() -> str:
    """Short hash of the host's ISA surface.

    XLA:CPU persists AOT-compiled machine code whose cache key does NOT
    include the compile machine's CPU features; loading an artifact compiled
    on a wider-ISA host (e.g. avx512 + prefer-no-gather) on a narrower one
    only logs `cpu_aot_loader` errors and then executes anyway — observed on
    this fleet as silently-NaN training losses (round 4). Keying the cache
    directory by an ISA fingerprint makes a foreign host miss instead of
    miscompute; cost is one cold compile per new machine type.
    """
    bits = [platform.machine(), platform.processor()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent, best-effort).

    Also honors an explicit ``JAX_PLATFORMS`` environment variable: the
    environment's TPU plugin overrides the env var at interpreter startup in
    plain scripts, so ``JAX_PLATFORMS=cpu python train.py`` would silently
    land on the TPU; re-asserting it through jax.config before backends
    initialize makes the env var mean what the user said (same workaround as
    tests/conftest.py and examples/parity_report.py).
    """
    global _done
    if _done:
        return
    import jax

    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms:
        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass
    try:
        base = cache_dir or os.environ.get("SCOUTER_JAX_CACHE", _DEFAULT_DIR)
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(base, _host_fingerprint()),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _done = True
    except Exception:
        pass
