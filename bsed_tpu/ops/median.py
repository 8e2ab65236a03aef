"""On-device binary median filtering for event decoding.

Replaces the reference's per-clip, per-threshold host loop over
``scipy.ndimage.median_filter`` (/root/reference/src/evaluation_measures.py:
188-201) with a vectorized XLA formulation that runs batched on TPU for all
clips / classes / thresholds at once.

Key identity: the median of a 0/1 window of width w equals
``count_of_ones >= w - w//2`` (the sorted window's element at index w//2).
With scipy's default 'reflect' boundary (= np.pad 'symmetric') and window
span [i - w//2, i + (w-1-w//2)], a median filter over binary data is a
windowed moving count — one cumulative sum and one subtraction instead of a
rank filter. Exactness vs scipy is covered by tests/test_decode_metrics.py.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _moving_count(x: jnp.ndarray, window: int, axis: int) -> jnp.ndarray:
    """Windowed sum with scipy-compatible symmetric padding along ``axis``."""
    left = window // 2
    right = window - 1 - left
    pad = [(0, 0)] * x.ndim
    pad[axis] = (left, right)
    xp = jnp.pad(x, pad, mode="symmetric")
    c = jnp.cumsum(xp, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
    c = jnp.concatenate([zero, c], axis=axis)
    n = x.shape[axis]
    upper = jax.lax.slice_in_dim(c, window, window + n, axis=axis)
    lower = jax.lax.slice_in_dim(c, 0, n, axis=axis)
    return upper - lower


def binary_median_filter(x: jnp.ndarray, window: int,
                         axis: int = -2) -> jnp.ndarray:
    """Median-filter binary data along ``axis`` (default: time axis of a
    (..., T, C) posterior). Returns the same dtype as the input."""
    if window <= 1:
        return x
    axis = axis % x.ndim
    count = _moving_count(x, window, axis)
    need = window - window // 2
    return (count >= need).astype(x.dtype)


def classwise_median_filter(x: jnp.ndarray, windows: Sequence[int],
                            time_axis: int = -2) -> jnp.ndarray:
    """Per-class median windows (cfg.median_window, config.py:62-63): class c
    of the last axis is filtered with windows[c]. Distinct window sizes are
    each filtered once over the full tensor and blended with a class mask —
    fully vectorized, no per-class host loop."""
    windows = tuple(int(w) for w in windows)
    assert x.shape[-1] == len(windows)
    out = x
    for w in sorted(set(windows)):
        if w <= 1:
            continue
        filtered = binary_median_filter(x, w, axis=time_axis)
        mask = jnp.asarray([wi == w for wi in windows], dtype=bool)
        out = jnp.where(mask, filtered, out)
    return out


@functools.partial(jax.jit, static_argnames=("window", "windows"))
def threshold_and_filter(probs: jnp.ndarray, thresholds: jnp.ndarray,
                         window: int = 1,
                         windows: Tuple[int, ...] = None) -> jnp.ndarray:
    """(B, T, C) posteriors × (K,) thresholds → (K, B, T, C) binary events,
    binarized then median-filtered on device. ``windows`` (per class)
    overrides the fixed ``window`` when given (learned_post mode,
    evaluation_measures.py:193-201)."""
    binary = (probs[None] > thresholds[:, None, None, None]).astype(jnp.float32)
    if windows is not None:
        return classwise_median_filter(binary, windows)
    return binary_median_filter(binary, window)
