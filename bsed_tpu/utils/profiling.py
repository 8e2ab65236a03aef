"""Tracing / profiling hooks.

The reference's observability is a wall-clock line per epoch
(/root/reference/src/main_baseline.py:190,596-597). TPU-native equivalent:
``jax.profiler`` traces viewable in TensorBoard/Perfetto plus lightweight
step timers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('stored_data/run/trace'): ...``"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Blocking step timer with simple percentile summaries."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np
        a = np.asarray(self.times)
        return {"mean_s": float(a.mean()),
                "p50_s": float(np.percentile(a, 50)),
                "p90_s": float(np.percentile(a, 90)),
                "max_s": float(a.max()),
                "steps": len(a)}
