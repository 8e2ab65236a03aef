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


def plot_grad_flow(metrics: Dict[str, float], path: str) -> bool:
    """Render the reference's gradient-flow diagnostic
    (/root/reference/src/main_baseline.py:108-123): average |grad| per
    non-bias parameter, bar-free line plot saved as a PNG. Consumes the
    ``grad_abs/<param>`` entries that ``make_train_step(grad_flow=True)``
    adds to its metrics dict. Returns False when matplotlib is absent."""
    items = sorted((k[len("grad_abs/"):], float(v))
                   for k, v in metrics.items() if k.startswith("grad_abs/"))
    if not items:
        return False
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    layers = [k for k, _ in items]
    ave_grads = [v for _, v in items]
    fig, ax = plt.subplots(figsize=(max(6, len(layers) * 0.3), 4))
    ax.plot(ave_grads, alpha=0.3, color="b")
    ax.hlines(0, 0, len(ave_grads) + 1, linewidth=1, color="k")
    ax.set_xticks(range(len(layers)))
    ax.set_xticklabels(layers, rotation="vertical", fontsize=5)
    ax.set_xlim(0, len(ave_grads))
    ax.set_xlabel("Layers")
    ax.set_ylabel("average gradient")
    ax.set_title("Gradient flow")
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return True
