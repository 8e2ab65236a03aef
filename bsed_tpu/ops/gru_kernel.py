"""Pallas TPU kernel for the bidirectional GRU recurrence.

Reference model: /root/reference/src/models/RNN.py:7-16 (2-layer bi-GRU,
H=128, T=313). The XLA path (models/rnn.py) hoists the input projections
into one MXU matmul and scans the recurrence with ``lax.scan``; measured
honestly that scan costs ~12.6 µs per sequential step (~7.9 ms for the
whole 2-layer recurrence at B=72) — dominated by per-iteration fixed
overhead, not math: the per-step recurrent matmul is only (B,128)@(128,384)
per direction.

This kernel runs the entire recurrence for BOTH directions of one layer in
a single pallas_call: the grid walks time-tiles sequentially (TPU grid
iterations execute in order on one core), the carried hidden state (2,B,H)
lives in a VMEM scratch that persists across grid steps, and each step is
two MXU dots + VPU gate math on operands already resident in VMEM. The
reverse direction's inputs arrive pre-time-flipped (same trick as
``_gru_scan_bidir``), so one forward walk advances both directions.

Numerics: matmuls accumulate in float32 (``preferred_element_type``), gate
math in float32, state carried in float32, outputs cast to the input dtype
— at least as accurate as the XLA scan path at the same compute dtype
(bit-identical to _gru_scan_bidir in float32, pinned by
tests/test_gru_kernel.py). Gate order and linear-before-reset semantics
are torch/cuDNN-exact (r, z, n; hn inside the reset gate).

MEASURED RESULT (v5e, B=64, T=313, bf16): **1.84 ms vs the scan's
1.99 ms per layer — only ~8% faster, NOT wired as the default.** The
recurrence is latency-bound on its serial gate chain, not on scan
overhead: a VPU-only ablation (dots removed) still costs 6.6 µs/step, so
neither implementation can beat ~6 µs/step without changing the math.
Sweep notes: TILE_T 16/32 equivalent, ≥64 fails to lower (Mosaic),
bf16 gate math hits a Mosaic vector.broadcast verification bug,
value-carried h (vs per-step scratch round-trip) saves ~1 µs/step —
kept. The kernel stays as the proof-of-floor and for future shapes where
the balance differs (e.g. much larger B).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 32


def _gru_kernel(xp_ref, w_ref, b_ref, y_ref, h_ref, *, tile_t: int):
    """One time-tile: xp_ref (tile_t, 2, B, 3H), w_ref (2, H, 3H),
    b_ref (2, 1, 3H) f32, y_ref (tile_t, 2, B, H), h_ref scratch (2, B, H)
    f32 persisting across the sequential grid."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    w0 = w_ref[0]
    w1 = w_ref[1]
    b = b_ref[...].astype(jnp.float32)

    def body(i, h):
        # h rides the loop carry (vector registers), not the scratch ref —
        # measured ~1 µs/step cheaper than a per-step scratch round-trip
        x_t = xp_ref[i].astype(jnp.float32)              # (2, B, 3H)
        hc = h.astype(w0.dtype)
        hp0 = jnp.dot(hc[0], w0, preferred_element_type=jnp.float32)
        hp1 = jnp.dot(hc[1], w1, preferred_element_type=jnp.float32)
        hp = jnp.stack([hp0, hp1]) + b                   # (2, B, 3H)
        n3 = x_t.shape[-1] // 3
        xr, xz, xn = (x_t[..., :n3], x_t[..., n3:2 * n3], x_t[..., 2 * n3:])
        hr, hz, hn = (hp[..., :n3], hp[..., n3:2 * n3], hp[..., 2 * n3:])
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        y_ref[i] = h_new.astype(y_ref.dtype)
        return h_new

    h_last = jax.lax.fori_loop(0, tile_t, body, h_ref[...], unroll=True)
    h_ref[...] = h_last


def gru_bidir_recurrence(xp2: jnp.ndarray, w_hh2: jnp.ndarray,
                         b_hh2: jnp.ndarray,
                         tile_t: int = TILE_T) -> jnp.ndarray:
    """Drop-in replacement for models.rnn._gru_scan_bidir's recurrence.

    xp2: (2, B, T, 3H) input projections (+ b_ih), direction 1 ALREADY
    time-flipped; w_hh2: (2, 3H, H); b_hh2: (2, 3H). Returns (2, B, T, H)
    with out[1] still in flipped time order (caller un-flips) — identical
    contract to _gru_scan_bidir.
    """
    _, b_sz, t, g3 = xp2.shape
    h_dim = w_hh2.shape[2]
    w_t2 = jnp.swapaxes(w_hh2, 1, 2).astype(xp2.dtype)    # (2, H, 3H)
    b2 = b_hh2.astype(jnp.float32)[:, None, :]            # (2, 1, 3H)

    xs = jnp.moveaxis(xp2, 2, 0)                          # (T, 2, B, 3H)
    nt = -(-t // tile_t)
    if nt * tile_t != t:
        # zero-pad the tail tile: the padded steps still evolve the carried
        # state, but nothing after them reads it and their outputs are
        # sliced away below
        xs = jnp.pad(xs, ((0, nt * tile_t - t), (0, 0), (0, 0), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_gru_kernel, tile_t=tile_t)
    ys = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tile_t, 2, b_sz, g3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h_dim, g3), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, g3), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, 2, b_sz, h_dim),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt * tile_t, 2, b_sz, h_dim),
                                       xp2.dtype),
        scratch_shapes=[pltpu.VMEM((2, b_sz, h_dim), jnp.float32)],
        interpret=interpret,
    )(xs, w_t2, b2)
    return jnp.moveaxis(ys[:t], 0, 2)                     # (2, B, T, H)
