"""Loss primitives with torch-matching numerics.

  * ``bce``: torch nn.BCELoss on probabilities — mean of
    −[y·log p + (1−y)·log(1−p)] with each log term clamped at −100.
  * ``mse``: torch nn.MSELoss (mean).
  * ``entropy``: /root/reference/src/DA/entropy.py:8-30 —
    H(p) = −Σ_c p·log(p + 1e-5).
"""
from __future__ import annotations

import jax.numpy as jnp

_LOG_CLAMP = -100.0


def bce(probs: jnp.ndarray, targets: jnp.ndarray,
        weight: jnp.ndarray = None) -> jnp.ndarray:
    log_p = jnp.maximum(jnp.log(jnp.maximum(probs, 0.0) + 1e-45), _LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - probs, 0.0) + 1e-45),
                         _LOG_CLAMP)
    loss = -(targets * log_p + (1.0 - targets) * log_1p)
    if weight is not None:
        loss = loss * weight
    return loss.mean()


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a - b))


def entropy(p: jnp.ndarray, reduction: str = "none") -> jnp.ndarray:
    h = -jnp.sum(p * jnp.log(p + 1e-5), axis=-1)
    if reduction == "mean":
        return h.mean()
    return h
