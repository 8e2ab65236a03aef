"""Fused block-STFT mel front end: the ENTIRE audio → linear-mel pipeline
in one Pallas kernel with zero HBM intermediates.

Motivation (measured, v5e, B=64×10 s, docs/PERF.md): the dense windowed-DFT
front end costs ~25 ms at 'high' precision and is the serving roofline; the
overlap-reusing block DFT (ops/mel.py block_stft_magnitude) cuts the MXU
MACs 2.7× but its stage-2 stencil re-reads the (B, M, 6, 1025) stage-1
tensor 9× from HBM, measuring 69 ms under XLA — the classic fusion-boundary
failure. Here stage 1, the frame recombination, the magnitude, and the mel
projection all happen on a VMEM-resident time tile:

    HBM traffic = one read of the hop blocks (~82 MB/batch-64)
                + one write of the (B, T, 128) mel (~41 MB)   — that's all.

Math (see ops/mel.py block_dft_bases): with N=2048, H=255, the Hamming
window separates as w[jH+r] = Σ_{p<3} u_p[j] v_p[r], so

    X_t[k] = Σ_{j<8} Σ_p u_p[j]·T_j[k]·(E_p x_{t+j})[k] + tail_t[k]

where x_m are NON-overlapping hop blocks. A first kernel generation
evaluated the j-sum as a k-dependent 8-tap stencil on the VPU — 96
full-plane fmas per tile, which measurement showed was the new roofline
(the MXU work is only ~5 ms/batch at 'high' but the kernel measured 16 ms).
This version moves the recombination onto the MXU via a phase-twist
identity: with P[m,k] = e^{-2πi·mHk/N},

    T_j[k] = P[t+j,k] · conj(P[t,k]),   |conj(P[t,k])| = 1,

so twisting the stage-1 planes once, z_p[m] = P[m] ⊙ Y_p[m], turns the
tap coefficients k-INDEPENDENT:

    |X_t[k]| = | Σ_{j,p} u_p[j]·z_p[t+j,k] + z_tail[t+8,k] |

(the conj(P[t]) un-twist vanishes under the magnitude, and the remainder
term folds in as a row shift because P[t]·e^{-2πi·8Hk/N} = P[t+8]). The
j-sum is now a tiny banded matmul A_p[t, t+j] = u_p[j] per plane — MXU
work instead of 96 VPU planes — and, because only phase DIFFERENCES inside
the tap window matter, P reduces to one tile-independent (win, F) constant
P_L[r,k] = e^{-2πi·rHk/N}: no per-tile phase planes, no extra DMA.

Per (batch, time-tile) grid step the kernel:
  1. DMAs the (TILE+16, 256) block window HBM → VMEM;
  2. computes Y = blocks @ E for all 3 complex bases in ONE MXU matmul
     (bases packed [p0re|p0im|...] at 128-aligned lane offsets sized to
     the filterbank's live support — 1024 lanes for the parity config),
     plus the (rem → F) tail transform;
  3. twists each plane by P_L (one complex VPU multiply per plane);
  4. recombines frames with the banded (TILE, TILE+16) matmuls (f32 MXU);
  5. takes |X| and projects through the (padded) Slaney mel filterbank.

float32 accuracy on the bf16 MXU uses the explicit 3-product split
(a_hi@b_hi + a_hi@b_lo + a_lo@b_hi == jax.lax.Precision.HIGH); the 'fast'
tier keeps only a_hi@b_hi for the two big matmuls. The twist and banded
recombination run in true f32 either way. Exactness vs the XLA block path
is pinned by tests/test_mel.py (CPU interpret mode); the float64 golden
bound is the same ≤1e-3 dB gate as the dense path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsed_tpu.ops.mel import num_frames

TILE_T = 96              # output frames per grid step (v5e sweep knee:
                         # 64/96/128 → 12.6/12.5/13.6 ms 'high',
                         # 7.1/6.8/7.3 ms 'fast' at B=64)
_J = 8                   # full-block taps (N // H)


class MelKernelBases(NamedTuple):
    """lane_pad = filterbank live support rounded up to 128 lanes."""
    e_hi: jnp.ndarray       # (256, 6·lane_pad) bf16  stage-1 basis (hi)
    e_lo: jnp.ndarray       # (256, 6·lane_pad) bf16  stage-1 basis (lo)
    e8_hi: jnp.ndarray      # (8, 2·lane_pad) bf16    remainder basis (hi)
    e8_lo: jnp.ndarray      # (8, 2·lane_pad) bf16    remainder basis (lo)
    fb_hi: jnp.ndarray      # (lane_pad, n_mels) bf16 mel filterbank (hi)
    fb_lo: jnp.ndarray      # (lane_pad, n_mels) bf16 mel filterbank (lo)


def _split(a: np.ndarray):
    hi = a.astype(jnp.bfloat16)
    lo = (a - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)


def _rank3_u(n_window: int, hop_size: int) -> np.ndarray:
    """The Hamming rank-3 split's j-coefficients u_p[j] (3, J)."""
    j = np.arange(_J, dtype=np.float64)
    return np.stack([
        np.full_like(j, 0.54),
        -0.46 * np.cos(2 * np.pi * j * hop_size / (n_window - 1)),
        0.46 * np.sin(2 * np.pi * j * hop_size / (n_window - 1))])


def build_mel_kernel_bases(n_window: int, hop_size: int,
                           mel_fb: np.ndarray) -> MelKernelBases:
    """Pack the stage-1 block-DFT bases + filterbank into the kernel's
    padded layouts.

    Only frequency bins the filterbank actually reads are computed: for the
    parity config (N=2048, f_max=Nyquist) the Slaney triangles end BEFORE
    the Nyquist bin (fb[1024] ≡ 0), so the live support is exactly
    1024 = 8×128 lanes — dropping the pad-to-1152 saves ~11% of every MXU
    and VPU op in the kernel with bitwise-identical mel output."""
    if n_window // hop_size != _J:
        raise ValueError("mel kernel is specialized to N//H == 8")
    if n_window % hop_size == 0:
        raise ValueError(
            "mel kernel needs a non-empty tail block (n_window % hop_size "
            "!= 0); use the dense front end for exact-multiple hops")
    if hop_size >= 256:
        raise ValueError("mel kernel packs hop_size+1 basis rows into a "
                         "256-row plane; hop_size must be < 256")
    nf_full = 1 + n_window // 2
    used = np.nonzero(np.abs(mel_fb).sum(axis=1))[0]
    nf = int(used[-1]) + 1 if used.size else nf_full
    lane_pad = -(-nf // 128) * 128
    nf = min(nf_full, lane_pad)      # keep any real bins inside the pad
    rem = n_window - _J * hop_size
    k = np.arange(nf, dtype=np.float64)

    # stage-1 basis: the rank-3 split's r-factors times the r-twiddle
    # (block_dft_bases' e_basis, re-derived here at the packed layout)
    r = np.arange(hop_size, dtype=np.float64)
    v = np.stack([np.ones_like(r),
                  np.cos(2 * np.pi * r / (n_window - 1)),
                  np.sin(2 * np.pi * r / (n_window - 1))])
    ang_r = 2 * np.pi * np.outer(r, k) / n_window                # (H, nf)
    e = np.zeros((hop_size + 1, 6 * lane_pad))       # row 255 stays zero
    for p in range(3):
        e[:hop_size, 2 * p * lane_pad:2 * p * lane_pad + nf] = \
            v[p][:, None] * np.cos(ang_r)
        e[:hop_size, (2 * p + 1) * lane_pad:(2 * p + 1) * lane_pad + nf] = \
            v[p][:, None] * -np.sin(ang_r)
    e = np.pad(e, ((0, 256 - e.shape[0]), (0, 0)))

    # remainder basis WITHOUT the j=8 block phase (supplied by the twist
    # plane at row t+8): E8'[r,k] = w[8H+r]·e^{-2πi·rk/N}
    w_tail = np.hamming(n_window)[_J * hop_size:]
    ang_t = 2 * np.pi * np.outer(np.arange(rem, dtype=np.float64), k) \
        / n_window
    e8 = np.zeros((rem, 2 * lane_pad))
    e8[:, :nf] = w_tail[:, None] * np.cos(ang_t)
    e8[:, lane_pad:lane_pad + nf] = w_tail[:, None] * -np.sin(ang_t)

    fb = np.zeros((lane_pad, mel_fb.shape[1]))
    fb[:nf] = mel_fb[:nf]

    e_hi, e_lo = _split(e)
    e8_hi, e8_lo = _split(e8)
    fb_hi, fb_lo = _split(fb)
    return MelKernelBases(e_hi, e_lo, e8_hi, e8_lo, fb_hi, fb_lo)


@functools.lru_cache(maxsize=8)
def _twist_and_band(n_window: int, hop_size: int, tile_t: int,
                    lane_pad: int):
    """Tile-local twist planes P_L[r,k] = e^{-2πi·rHk/N} (win, lane_pad)
    and banded recombination matrices A_p[t, t+j] = u_p[j] (3, tile, win).

    Only phase differences within a tap window enter |X|, so P_L needs no
    absolute-frame term — one constant pair of planes serves every tile."""
    win = tile_t + 16
    nf = min(lane_pad, 1 + n_window // 2)
    ang = 2 * np.pi * np.outer(
        np.arange(win, dtype=np.float64) * hop_size,
        np.arange(nf, dtype=np.float64)) / n_window
    p_re = np.zeros((win, lane_pad), np.float32)
    p_im = np.zeros((win, lane_pad), np.float32)
    p_re[:, :nf] = np.cos(ang)
    p_im[:, :nf] = -np.sin(ang)

    u = _rank3_u(n_window, hop_size)
    a = np.zeros((3, tile_t, win), np.float32)
    for p in range(3):
        for j in range(_J):
            a[p, np.arange(tile_t), np.arange(tile_t) + j] = u[p, j]
    # numpy (not jnp): this cache outlives jit traces, and device conversion
    # inside a trace would capture a tracer
    return p_re, p_im, a


def _dot3(a: jnp.ndarray, b_hi, b_lo, fast: bool) -> jnp.ndarray:
    """f32 @ f32 on the bf16 MXU: explicit 3-product split (== HIGH), or
    single product for the fast tier."""
    a_hi = a.astype(jnp.bfloat16)
    out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    if fast:
        return out
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = out + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    out = out + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return out


def _mel_kernel(blocks_hbm, e_hi, e_lo, e8_hi, e8_lo, p_re, p_im, a_band,
                fb_hi, fb_lo, out_ref, x_vmem, sem, *, rem: int,
                fast: bool, tile_t: int, lane_pad: int, nt: int, nb: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    win = tile_t + 16

    # double-buffered input DMA: while this step computes on slot s, the
    # next grid step's block window streams into slot 1-s (grid iterates j
    # innermost). Without this the ~1300 per-tile copies serialize with
    # compute — measured ~4 ms/batch-64 of pure DMA stall.
    step = i * nt + j
    slot = jax.lax.rem(step, 2)

    def dma(ii, jj, s):
        return pltpu.make_async_copy(
            blocks_hbm.at[ii, pl.ds(jj * tile_t, win), :],
            x_vmem.at[s], sem.at[s])

    @pl.when(step == 0)
    def _():
        dma(i, j, slot).start()

    wrap = j == nt - 1
    i_next = jnp.where(wrap, i + 1, i)
    j_next = jnp.where(wrap, 0, j + 1)

    @pl.when(step < nb * nt - 1)
    def _():
        dma(i_next, j_next, 1 - slot).start()

    dma(i, j, slot).wait()
    xv = x_vmem[slot]                                   # (win, 256) f32
    pr = p_re[...]
    pi = p_im[...]
    # remainder term: frame t's last 8 samples = head of block t+8;
    # twist by P_L and take rows t+8 as the accumulator seed
    x8 = _dot3(xv[:, :rem], e8_hi[...], e8_lo[...], fast)   # (win, 2·LP)
    x8r = x8[:, :lane_pad]
    x8i = x8[:, lane_pad:]
    acc_re = (x8r * pr - x8i * pi)[_J:_J + tile_t]
    acc_im = (x8r * pi + x8i * pr)[_J:_J + tile_t]
    # per rank-plane: stage-1 block transform (MXU), twist (VPU), banded
    # tap matmul (MXU; the same 3-product split as the big matmuls —
    # HIGHEST would be 6 passes). One plane at a time keeps the peak VMEM
    # stack under the 16 MB scoped limit.
    for p in range(3):
        ep = _dot3(xv, e_hi[:, 2 * p * lane_pad:(2 * p + 2) * lane_pad],
                   e_lo[:, 2 * p * lane_pad:(2 * p + 2) * lane_pad], fast)
        yr = ep[:, :lane_pad]
        yi = ep[:, lane_pad:]
        zr = yr * pr - yi * pi
        zi = yr * pi + yi * pr
        a = a_band[p]                                   # (tile, win) f32
        if fast:
            acc_re = acc_re + jnp.dot(
                a.astype(jnp.bfloat16), zr.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
            acc_im = acc_im + jnp.dot(
                a.astype(jnp.bfloat16), zi.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        else:
            zr_hi = zr.astype(jnp.bfloat16)
            zr_lo = (zr - zr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            zi_hi = zi.astype(jnp.bfloat16)
            zi_lo = (zi - zi_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            acc_re = acc_re + _dot3(a, zr_hi, zr_lo, False)
            acc_im = acc_im + _dot3(a, zi_hi, zi_lo, False)

    mag = jnp.sqrt(acc_re * acc_re + acc_im * acc_im)   # (TILE, LP)
    out_ref[0] = _dot3(mag, fb_hi[...], fb_lo[...], fast)


def fused_block_mel(audio: jnp.ndarray, bases: MelKernelBases,
                    n_window: int, hop_size: int, n_mels: int,
                    fast: bool = False,
                    tile_t: int = TILE_T) -> jnp.ndarray:
    """(..., n_samples) → (..., T, n_mels) linear mel, one pallas kernel."""
    from bsed_tpu.ops.mel import _padded_signal

    p, t, lead = _padded_signal(audio.astype(jnp.float32), n_window,
                                hop_size)
    b = p.shape[0]
    nt = -(-t // tile_t)
    tp = nt * tile_t
    mp = tp + 16
    need = mp * hop_size
    if p.shape[1] < need:
        p = jnp.pad(p, ((0, 0), (0, need - p.shape[1])))
    blocks = p[:, :need].reshape(b, mp, hop_size)
    blocks = jnp.pad(blocks, ((0, 0), (0, 0), (0, 256 - hop_size)))

    rem = n_window - _J * hop_size
    lane_pad = bases.e_hi.shape[1] // 6
    p_re, p_im, a_band = _twist_and_band(n_window, hop_size, tile_t,
                                         lane_pad)
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_mel_kernel, rem=rem, fast=fast,
                               tile_t=tile_t, lane_pad=lane_pad,
                               nt=nt, nb=b)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vm] * 9,
        out_specs=pl.BlockSpec((1, tile_t, bases.fb_hi.shape[1]),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, bases.fb_hi.shape[1]),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_t + 16, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(blocks, bases.e_hi, bases.e_lo, bases.e8_hi, bases.e8_lo,
      p_re, p_im, a_band, bases.fb_hi, bases.fb_lo)
    return out[:, :t, :n_mels].reshape(lead + (t, n_mels))
