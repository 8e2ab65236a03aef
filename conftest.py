"""Root conftest: force an 8-device virtual CPU mesh for all tests.

Multi-chip sharding tests run on fake CPU devices (the JAX idiom for testing
collectives without hardware); bench.py and real runs use the TPU backend.

Note: this environment pre-imports jax at interpreter startup, so the
platform must be forced via jax.config (env vars are captured too late).
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
