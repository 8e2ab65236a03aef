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
"""
from __future__ import annotations

import flax.linen as nn
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


def fast_avg_pool(x, window):
    """Mean pool over (time, freq) = axes (1, 2) of an NHWC tensor with
    stride == window and VALID padding — ``nn.avg_pool`` semantics."""
    kt, kf = int(window[0]), int(window[1])
    if kt <= 1 and kf <= 1:
        return x
    y = x
    if kt > 1:
        y = _pool_axis(y, 1, kt)
    if kf > 1:
        y = _pool_axis(y, 2, kf)
    return y / jnp.asarray(kt * kf, y.dtype)


def avg_pool(x, window):
    """fast_avg_pool when every extent is 1 or a power of two (bit-exact
    and faster), flax nn.avg_pool otherwise."""
    if all(k >= 1 and (k & (k - 1)) == 0 for k in window):
        return fast_avg_pool(x, window)
    return nn.avg_pool(x, window_shape=tuple(window),
                       strides=tuple(window), padding="VALID")
