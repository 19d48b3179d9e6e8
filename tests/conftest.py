"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake distributed backend — the reference has
none (SURVEY.md §4); we validate sharding semantics on host CPU devices.

On-chip tests: ``pytest -m tpu tests/test_tpu.py`` skips the CPU forcing and
runs a small suite against the real TPU (kernel compiled-mode parity, one jitted
train step, one recipe batch, render path). Selecting ``-m tpu`` is detected
here BEFORE jax import so the platform pin doesn't shadow the chip.
"""

import os
import sys

_TPU_REQUESTED = any(a.endswith("test_tpu.py") for a in sys.argv) or (
    "-m" in sys.argv and "tpu" in sys.argv
)

# Must be set before jax is imported anywhere in the test process.
if not _TPU_REQUESTED:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _TPU_REQUESTED:
    # The environment's TPU plugin may force jax_platforms to itself at import
    # time (overriding JAX_PLATFORMS); the config update below wins over both.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Parity tests compare fp32 math against torch; keep matmuls in true fp32.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU chip (run as `pytest -m tpu tests/test_tpu.py`)"
    )
    config.addinivalue_line("markers", "slow: multi-minute test")


def pytest_collection_modifyitems(config, items):
    import pytest

    if config.getoption("-m") == "tpu":
        return
    skip = pytest.mark.skip(reason="TPU-marked; run `pytest -m tpu tests/test_tpu.py`")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
