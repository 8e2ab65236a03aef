"""Fused block-STFT mel front end: the ENTIRE audio → linear-mel pipeline
in one Pallas kernel with zero HBM intermediates.

Motivation (measured, v5e, B=64×10 s, docs/PERF.md): the dense windowed-DFT
front end costs ~25 ms at 'high' precision and is the serving roofline; the
overlap-reusing block DFT (ops/mel.py block_stft_magnitude) cuts the MXU
MACs 2.7× but its stage-2 stencil re-reads the (B, M, 6, 1025) stage-1
tensor 9× from HBM, measuring 69 ms under XLA — the classic fusion-boundary
failure. Here stage 1, the stencil, the magnitude, and the mel projection
all happen on a VMEM-resident time tile:

    HBM traffic = one read of the hop blocks (~82 MB/batch-64)
                + one write of the (B, T, 128) mel (~41 MB)   — that's all.

Math (see ops/mel.py block_dft_bases): with N=2048, H=255, the Hamming
window separates as w[jH+r] = Σ_{p<3} u_p[j] v_p[r], so

    X_t[k] = Σ_{j<8} Σ_p u_p[j]·T_j[k]·(E_p x_{t+j})[k] + (E_tail s_t)[k]

where x_m are NON-overlapping hop blocks and s_t the 8 remainder samples.
Per (batch, time-tile) grid step the kernel:
  1. DMAs the (TILE+16, 256) block window HBM → VMEM;
  2. computes Y = blocks @ E for all 3 complex bases in ONE MXU matmul
     (bases packed [p0re|p0im|...] at 128-aligned lane offsets sized to
     the filterbank's live support — 1024 lanes for the parity config);
  3. accumulates the 8-tap k-dependent complex stencil plus the remainder
     term with VPU fmas on 128-lane-aligned plane chunks;
  4. takes |X| and projects through the (padded) Slaney mel filterbank.

float32 accuracy on the bf16 MXU uses the explicit 3-product split
(a_hi@b_hi + a_hi@b_lo + a_lo@b_hi == jax.lax.Precision.HIGH); the 'fast'
tier keeps only a_hi@b_hi. The stencil runs in true f32 on the VPU either
way. Exactness vs the XLA block path is pinned by tests/test_mel.py (CPU
interpret mode); the float64 golden bound is the same ≤1e-3 dB gate as the
dense path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bsed_tpu.ops.mel import block_dft_bases, num_frames

TILE_T = 64              # output frames per grid step
_J = 8                   # full-block stencil taps (N // H)


class MelKernelBases(NamedTuple):
    """lane_pad = filterbank live support rounded up to 128 lanes."""
    e_hi: jnp.ndarray       # (256, 6·lane_pad) bf16  stage-1 basis (hi)
    e_lo: jnp.ndarray       # (256, 6·lane_pad) bf16  stage-1 basis (lo)
    d_re: jnp.ndarray       # (8, 6·lane_pad) f32     stencil coeffs (re out)
    d_im: jnp.ndarray       # (8, 6·lane_pad) f32     stencil coeffs (im out)
    e8_hi: jnp.ndarray      # (8, 2·lane_pad) bf16    remainder basis (hi)
    e8_lo: jnp.ndarray      # (8, 2·lane_pad) bf16    remainder basis (lo)
    fb_hi: jnp.ndarray      # (lane_pad, n_mels) bf16 mel filterbank (hi)
    fb_lo: jnp.ndarray      # (lane_pad, n_mels) bf16 mel filterbank (lo)


def _split(a: np.ndarray):
    hi = a.astype(jnp.bfloat16)
    lo = (a - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)


def build_mel_kernel_bases(n_window: int, hop_size: int,
                           mel_fb: np.ndarray) -> MelKernelBases:
    """Pack block_dft_bases + filterbank into the kernel's padded layouts.

    Only frequency bins the filterbank actually reads are computed: for the
    parity config (N=2048, f_max=Nyquist) the Slaney triangles end BEFORE
    the Nyquist bin (fb[1024] ≡ 0), so the live support is exactly
    1024 = 8×128 lanes — dropping the pad-to-1152 saves ~11% of every MXU
    and VPU op in the kernel with bitwise-identical mel output."""
    if n_window // hop_size != _J:
        raise ValueError("mel kernel is specialized to N//H == 8")
    e_basis, d_re, d_im, e_tail = block_dft_bases(n_window, hop_size,
                                                  dtype=np.float64)
    nf_full = e_basis.shape[-1]
    used = np.nonzero(np.abs(mel_fb).sum(axis=1))[0]
    nf = int(used[-1]) + 1 if used.size else nf_full
    lane_pad = -(-nf // 128) * 128
    nf = min(nf_full, lane_pad)      # keep any real bins inside the pad
    rem = n_window - _J * hop_size

    e = np.zeros((hop_size + 1, 6 * lane_pad))       # row 255 stays zero
    dr = np.zeros((_J, 6 * lane_pad), np.float32)
    di = np.zeros((_J, 6 * lane_pad), np.float32)
    for p in range(3):
        for c in range(2):
            s = (2 * p + c) * lane_pad
            e[:hop_size, s:s + nf] = e_basis[:, p, c, :nf]
            dr[:, s:s + nf] = d_re[:, p, c, :nf]
            di[:, s:s + nf] = d_im[:, p, c, :nf]
    e = np.pad(e, ((0, 256 - e.shape[0]), (0, 0)))

    e8 = np.zeros((rem, 2 * lane_pad))
    e8[:, :nf] = e_tail[:, 0, :nf]
    e8[:, lane_pad:lane_pad + nf] = e_tail[:, 1, :nf]

    fb = np.zeros((lane_pad, mel_fb.shape[1]))
    fb[:nf] = mel_fb[:nf]

    e_hi, e_lo = _split(e)
    e8_hi, e8_lo = _split(e8)
    fb_hi, fb_lo = _split(fb)
    return MelKernelBases(e_hi, e_lo, jnp.asarray(dr), jnp.asarray(di),
                          e8_hi, e8_lo, fb_hi, fb_lo)


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


def _mel_kernel(blocks_hbm, e_hi, e_lo, d_re, d_im, e8_hi, e8_lo,
                fb_hi, fb_lo, out_ref, x_vmem, sem, *, rem: int,
                fast: bool, tile_t: int, lane_pad: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    win = tile_t + 16
    dma = pltpu.make_async_copy(
        blocks_hbm.at[i, pl.ds(j * tile_t, win), :], x_vmem, sem)
    dma.start()
    dma.wait()

    xv = x_vmem[...]                                    # (win, 256) f32
    # stage 1: all 3 complex hop-block transforms in one MXU matmul
    y = _dot3(xv, e_hi[...], e_lo[...], fast)           # (win, 6·LP) f32

    # remainder term: frame t's last 8 samples = head of block t+8
    tail = xv[_J:_J + tile_t, :rem]                     # (TILE, rem)
    x8 = _dot3(tail, e8_hi[...], e8_lo[...], fast)      # (TILE, 2·LP)
    x_re = x8[:, :lane_pad]
    x_im = x8[:, lane_pad:]

    # stage 2: 8-tap k-dependent complex stencil, plane chunks lane-aligned
    for jj in range(_J):
        for q in range(6):
            s = q * lane_pad
            yjq = y[jj:jj + tile_t, s:s + lane_pad]
            x_re = x_re + yjq * d_re[jj, s:s + lane_pad][None, :]
            x_im = x_im + yjq * d_im[jj, s:s + lane_pad][None, :]

    mag = jnp.sqrt(x_re * x_re + x_im * x_im)           # (TILE, LP)
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
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_mel_kernel, rem=rem, fast=fast,
                               tile_t=tile_t,
                               lane_pad=bases.e_hi.shape[1] // 6)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vm] * 8,
        out_specs=pl.BlockSpec((1, tile_t, bases.fb_hi.shape[1]),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, bases.fb_hi.shape[1]),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_t + 16, 256), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(blocks, *bases)
    return out[:, :t, :n_mels].reshape(lead + (t, n_mels))
