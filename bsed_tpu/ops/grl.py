"""Gradient reversal as a JAX custom_vjp + warm-start coefficient schedule.

Reference: /root/reference/src/DA/grl.py —
  * GradientReverseFunction (:12-22): identity forward, −coeff·grad backward.
  * WarmStartGradientReverseLayer (:33-74):
        λ(i) = 2(hi−lo) / (1 + e^(−α·i/N)) − (hi−lo) + lo
    auto-stepping per forward call. Here the step counter lives in train
    state (functional), and λ is computed by ``warm_start_lambda``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def grad_reverse(x, coeff=1.0):
    return x


def _fwd(x, coeff):
    return x, coeff


def _bwd(coeff, g):
    return (-coeff * g, None)


grad_reverse.defvjp(_fwd, _bwd)


def warm_start_lambda(step, alpha: float = 1.0, lo: float = 0.0,
                      hi: float = 1.0, max_iters: int = 1000):
    """λ schedule of WarmStartGradientReverseLayer (grl.py:58-63)."""
    step = jnp.asarray(step, jnp.float32)
    return (2.0 * (hi - lo) / (1.0 + jnp.exp(-alpha * step / max_iters))
            - (hi - lo) + lo)
