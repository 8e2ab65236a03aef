"""Ramp schedules (/root/reference/src/utilities/ramps.py:4-31).

Pure jnp so they can live inside jitted train steps; accept python or traced
scalars.
"""
from __future__ import annotations

import jax.numpy as jnp


def exp_rampup(current, rampup_length):
    """exp(-5 (1-t)^2) ramp-up (Laine & Aila 2016)."""
    if rampup_length == 0:
        return jnp.asarray(1.0)
    current = jnp.clip(jnp.asarray(current, jnp.float32), 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def sigmoid_rampdown(current, rampup_length):
    """exp(-12.5 (1-t)^2): despite the reference's name this ramps UP toward
    1 at ``rampup_length`` — used as both lr warm-up and consistency-cost
    schedule (main_baseline.py:285)."""
    if rampup_length == 0:
        return jnp.asarray(1.0)
    current = jnp.clip(jnp.asarray(current, jnp.float32), 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return jnp.exp(-12.5 * phase * phase)


def sigmoid_rampup(current, rampup_length):
    """Standard mean-teacher sigmoid ramp-up (used by get_current_consistency
    _weight, main_baseline.py:126-130)."""
    if rampup_length == 0:
        return jnp.asarray(1.0)
    current = jnp.clip(jnp.asarray(current, jnp.float32), 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def cosine_rampdown(current, rampdown_length):
    current = jnp.asarray(current, jnp.float32)
    return 0.5 * (jnp.cos(jnp.pi * current / rampdown_length) + 1.0)
