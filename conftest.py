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

# NOTE on matmul precision: on AMX-BF16 hosts XLA:CPU lowers DEFAULT-
# precision convs through the bf16 fastpath (measured conv error vs
# float64 ~0.1 at dB-scale activations vs 3.6e-6 under float32, while
# torch-CPU stays fp32-exact) — and the fp32 path is ~200× SLOWER on this
# hardware (scalar vs AMX). The flag is therefore scoped to the one
# module whose assertions need torch-exact convs
# (tests/test_reference_train_parity.py, module fixture) instead of
# being set suite-wide here; every other module's tolerances were
# calibrated under the bf16 fastpath and stay green.

# Persistent XLA compilation cache: the suite is compile-bound (dozens of
# jitted programs), so cross-process caching cuts reruns from ~18 min to the
# pure execution time. Keyed by HLO + backend, so CPU test caches never
# collide with TPU ones. The directory name additionally carries a HOST
# CPU-FEATURE fingerprint: XLA:CPU caches AOT machine code compiled with
# the build host's feature set (+amx, +prefer-no-scatter, ...), and
# loading such an entry on a host with different features SEGFAULTS
# inside get_executable_and_time (observed killing a full-suite run when
# reusing a cache seeded on a different VM shape; the cpu_aot_loader
# "machine type ... doesn't match" warnings are the tell).
# DISABLED (round 5): two full-suite runs SEGFAULTED inside
# jax.compilation_cache.get_executable_and_time deserializing a cached
# XLA:CPU AOT executable — once with a cache seeded on a different VM
# shape, once with a host-fingerprinted fresh directory (entry written
# and re-read on the SAME host, with concurrent pytest processes sharing
# the directory). The cpu_aot_loader "compile machine features ... don't
# match the host" warnings fire on every load on this stack, and XLA:CPU
# AOT reload is evidently unsafe for at least one of the suite's
# programs. Correctness over rerun speed: no persistent cache. (The
# fingerprinted-directory scheme below is kept for reference; re-enable
# only after the upstream loader is fixed.)
if os.environ.get("BSED_ENABLE_JAX_CACHE"):
    try:
        import hashlib
        try:
            with open("/proc/cpuinfo") as _fh:
                _flags = next(
                    (ln for ln in _fh if ln.startswith("flags")), "")
        except OSError:
            _flags = ""
        _fp = hashlib.sha1(_flags.encode()).hexdigest()[:8]
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser(f"~/.cache/bsed_jax_cache_{_fp}"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
