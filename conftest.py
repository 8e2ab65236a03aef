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

# TRUE-fp32 convolutions for the parity suite: on AMX-BF16 hosts XLA:CPU
# lowers DEFAULT-precision convs/matmuls through the bf16 fastpath —
# measured conv error vs float64 is ~0.1 (bf16 input rounding at dB-scale
# activations) vs 3.6e-6 under float32 precision, while torch-CPU stays
# fp32-exact. The train-dynamics parity gates compare BatchNorm batch
# statistics and gradients leaf-for-leaf against torch; a bf16 conv on one
# side only is a ~1e-3-relative systematic error that BN's batch
# normalization hides from posterior-level tests but not from the
# stats/gradient-level ones (discovered round 4 via a block0 running-var
# divergence). Production TPU runs are untouched (this file is test-only).
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache: the suite is compile-bound (dozens of
# jitted programs), so cross-process caching cuts reruns from ~18 min to the
# pure execution time. Keyed by HLO + backend, so CPU test caches never
# collide with TPU ones.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/bsed_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
