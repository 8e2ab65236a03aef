"""On-device data augmentation.

Replaces the reference's host-side numpy/torch augmentation with vmapped
jax.random ops that live inside the jitted train step:

  * SNR-targeted Gaussian noise (teacher input),
    /root/reference/src/data/Transforms.py:142-197: per-frequency-bin std
    computed over time: std_f = sqrt(mean_t(x² · 10^(−snr/10))).
  * ISP time/freq rolls, /root/reference/src/main_baseline.py:229-277: the
    reference's per-sample python loop of torch.roll + cat becomes one
    vmapped roll over the batch.
  * ICT mixup, main_baseline.py:132-164.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_snr_noise(rng: jax.Array, features: jnp.ndarray,
                       snr: float) -> jnp.ndarray:
    """features: (..., T, F) linear mel; returns features + noise at the
    target SNR, with the noise std computed per frequency bin over time.
    ``snr=None`` disables the noise entirely (the reference's eval
    transforms omit AugmentGaussianNoise, Transforms.py:317-330; also used
    by the training-dynamics parity tests to make teacher inputs
    deterministic)."""
    if snr is None:
        return features
    std = jnp.sqrt(jnp.mean(jnp.square(features) * (10.0 ** (-snr / 10.0)),
                            axis=-2, keepdims=True))
    noise = jax.random.normal(rng, features.shape, features.dtype) * std
    return features + noise


def sample_isp_shifts(rng: jax.Array, batch_size: int,
                      time_shift_max: int = 64, freq_shift_max: int = 4,
                      pooling_time_ratio: int = 4):
    """Per-sample shifts matching random.randint semantics (inclusive):
    time ∈ [-64, 64] pooled frames (×ptr input frames), freq ∈ [-4, 4]."""
    k1, k2 = jax.random.split(rng)
    pool_shift = jax.random.randint(k1, (batch_size,), -time_shift_max,
                                    time_shift_max + 1)
    freq_shift = jax.random.randint(k2, (batch_size,), -freq_shift_max,
                                    freq_shift_max + 1)
    return pool_shift * pooling_time_ratio, pool_shift, freq_shift


def roll_batch(x: jnp.ndarray, shifts: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Per-sample circular shift along ``axis`` (axis counted including the
    leading batch dim). Vectorized replacement for the reference's
    per-sample torch.roll loop."""
    return jax.vmap(lambda xi, s: jnp.roll(xi, s, axis=axis - 1))(x, shifts)


def mixup(rng: jax.Array, x: jnp.ndarray, *targets, alpha: float = 1.0):
    """ICT mixup (main_baseline.py:148-164): one beta-sampled λ per batch,
    one shared permutation; mixes inputs and every target tensor."""
    k1, k2 = jax.random.split(rng)
    lam = jax.random.beta(k1, alpha, alpha) if alpha > 0 else 1.0
    perm = jax.random.permutation(k2, x.shape[0])
    mixed_x = lam * x + (1.0 - lam) * x[perm]
    mixed_targets = tuple(lam * t + (1.0 - lam) * t[perm] for t in targets)
    return (mixed_x, *mixed_targets, lam)
