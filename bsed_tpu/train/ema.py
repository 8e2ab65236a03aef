"""Mean-teacher EMA as a pure param-tree map.

Reference: /root/reference/src/main_baseline.py:91-105 — state-dict-level
EMA with α = min(1 − 1/(step+1), 0.999). Because the reference EMAs the
*state dict*, BatchNorm running statistics are averaged too; we therefore
apply the same update to both ``params`` and ``batch_stats`` trees.
Replicated under data parallelism → no communication.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_tree, student_tree, step, alpha: float = 0.999):
    """ema ← α·ema + (1−α)·student with the true-average warm-up."""
    a = jnp.minimum(1.0 - 1.0 / (jnp.asarray(step, jnp.float32) + 1.0), alpha)
    return jax.tree.map(lambda e, s: a * e + (1.0 - a) * s,
                        ema_tree, student_tree)
