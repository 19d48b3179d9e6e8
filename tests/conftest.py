"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake distributed backend — the reference has
none (SURVEY.md §4); we validate sharding semantics on host CPU devices.
"""

import os

# Must be set before jax is imported anywhere in the test process.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's TPU plugin may force jax_platforms to itself at import time
# (overriding JAX_PLATFORMS); the config update below wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Parity tests compare fp32 math against torch; keep matmuls in true fp32.
jax.config.update("jax_default_matmul_precision", "highest")
