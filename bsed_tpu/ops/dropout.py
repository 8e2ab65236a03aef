"""Fast iid dropout for the train-mode hot path.

The reference applies torch ``nn.Dropout(0.5)`` after every conv block and
GRU layer (/root/reference/src/models/CNN.py:60, RNN.py:12, CRNN_GRL.py:434)
— at the rebuild's train shapes that is ~4×10⁸ Bernoulli draws per step.
``jax.random.bernoulli`` draws a full 32-bit uniform per element; on v5e
the mask generation alone costs ~2 ms per 10⁸ elements even with the
hardware RNG (docs/PERF.md "Honest barriers" attribution: 11.6 ms/step).

When the keep probability is expressible as k/256 (it always is here —
every dropout in the model family is 0.5 = 128/256), one uint8 draw per
element is an EXACT Bernoulli(k/256) sample via ``bits < k``: 4× less RNG
work and a cheaper compare. Measured on v5e at the three folded-stem
shapes (324 M elements): 8.9 ms (bernoulli f32) → 5.3 ms (uint8 compare),
below even the no-dropout elementwise floor thanks to tighter fusion.
Rates not on the 1/256 grid fall back to ``jax.random.bernoulli``.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _u8_threshold(keep_prob: float):
    """k if keep_prob == k/256 exactly (1 ≤ k ≤ 255), else None."""
    t = keep_prob * 256.0
    k = int(round(t))
    if abs(t - k) < 1e-9 and 1 <= k <= 255:
        return k
    return None


def keep_mask(rng, shape, rate: float):
    """Boolean keep mask, P(keep) = 1 - rate, iid."""
    keep_prob = 1.0 - rate
    k = _u8_threshold(keep_prob)
    if k is not None:
        return jax.random.bits(rng, shape, dtype=jnp.uint8) < jnp.uint8(k)
    return jax.random.bernoulli(rng, keep_prob, shape)


def dropout(rng, x, rate: float, deterministic: bool = False):
    """Inverted dropout: keep → x/(1-rate), drop → 0 (torch semantics)."""
    if deterministic or rate == 0.0:
        return x
    if rate >= 1.0:
        return jnp.zeros_like(x)
    keep = keep_mask(rng, x.shape, rate)
    return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype),
                     jnp.zeros((), x.dtype))


class FastDropout(nn.Module):
    """Drop-in replacement for ``flax.linen.Dropout`` (no broadcast_dims)
    using the uint8 fast path; draws from the same 'dropout' rng stream, so
    swapping it in changes which masks are drawn but not the rng plumbing."""
    rate: float
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool | None = None):
        det = self.deterministic if deterministic is None else deterministic
        if det or self.rate == 0.0:
            return x
        return dropout(self.make_rng("dropout"), x, self.rate)
