"""Pallas-fused inference stem: conv3×3(1→16) + BatchNorm + GLU + avgpool
in ONE kernel.

The CRNN's first block dominates CNN inference cost (~13 ms of ~20 ms at
batch 32 on v5e): with one input channel and 16 output channels both the
conv and the GLU dense sit far below the MXU's 128-lane tile, and XLA
materializes four (B, 1255, 128, 16) intermediates between HBM round trips.

Two observations make a fused kernel possible and cheap:

1. **Eval-mode folding.** With running statistics, BatchNorm is affine, so

       GLU(BN(conv(x))) = lin ⊙ σ(gate),
       gate = conv_g(x) + b_g          (BN folded into conv weights)
       lin  = conv_l(x) + b_l          (BN *and* the GLU dense folded in:
                                        w_l[·,·,o'] = Σ_o w_g[·,·,o]·G[o,o'])

   i.e. the whole block is TWO 3×3 single-input-channel convolutions plus
   elementwise ops — no cross-channel matmul at runtime.

2. **Single-channel 3×3 conv is 9 shifted fused multiply-adds** on a
   (time, freq) tile — pure VPU work on a VMEM-resident tile, with the
   (8, 128) register tiling matching the mel layout (freq = 128 lanes).

The kernel computes both convs, the sigmoid gating, and the 2×2 average
pool without leaving VMEM; HBM traffic is one read of x and one write of
the 4×-smaller pooled output. Train mode keeps the standard flax path
(batch statistics + dropout need the unfused graph).

Reference for block semantics: /root/reference/src/models/CNN.py:43-67.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 128          # input rows per grid step (output rows = 64)
N_CH = 16


def fold_block0_params(block_params: Dict, block_stats: Dict,
                       eps: float = 1e-3) -> Dict[str, jnp.ndarray]:
    """Fold conv bias + BN (eval affine) + GLU dense into two conv kernels.

    block_params/block_stats: the 'block0' entries of the CNN param tree
    (conv.kernel (3,3,1,16), conv.bias (16,), bn.scale/bias,
    GLU_0.linear.kernel (16,16), GLU_0.linear.bias (16,)).
    """
    w = block_params["conv"]["kernel"][:, :, 0, :]        # (3, 3, 16)
    b = block_params["conv"]["bias"]                      # (16,)
    scale = block_params["bn"]["scale"]
    bias = block_params["bn"]["bias"]
    mean = block_stats["bn"]["mean"]
    var = block_stats["bn"]["var"]
    g_kernel = block_params["GLU_0"]["linear"]["kernel"]  # (16, 16)
    g_bias = block_params["GLU_0"]["linear"]["bias"]      # (16,)

    s = scale / jnp.sqrt(var + eps)
    t = bias - mean * s
    w_gate = w * s                                        # (3,3,16)
    b_gate = b * s + t                                    # (16,)
    w_lin = jnp.einsum("hwo,op->hwp", w_gate, g_kernel)
    b_lin = b_gate @ g_kernel + g_bias
    return {"w_gate": w_gate, "b_gate": b_gate,
            "w_lin": w_lin, "b_lin": b_lin}


def _stem_kernel(x_hbm, wg_ref, bg_ref, wl_ref, bl_ref, pf_ref, out_ref,
                 x_vmem, sem):
    """One (TILE_T+2, F+2) halo tile → (TILE_T//2, F//2, 16) pooled output.

    The input stays in HBM; each grid step DMAs its halo window (overlap of
    2 rows with the neighbor tile) into VMEM scratch — halos can't be
    expressed with disjoint BlockSpec indexing. Tiling keeps Mosaic's
    vector shapes at (TILE_T, 128) so the unrolled 16-channel × 9-shift
    loop stays compact. Pooling avoids gathers/strided slices (unsupported
    by Mosaic): time pairs via the row-major (T, F) → (T/2, 2F) reshape,
    freq pairs via a small (F, F/2) averaging matmul on the MXU."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    # DMA slice sizes must be 8-aligned on the sublane dim → fetch
    # TILE_T+8 rows (the kernel uses rows 0..TILE_T+2) of the 128-lane
    # unpadded freq axis; the freq halo is zero-padded in VMEM.
    dma = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * TILE_T, TILE_T + 8), :], x_vmem, sem)
    dma.start()
    dma.wait()
    x = jnp.pad(x_vmem[...], ((0, 0), (1, 1)))    # (TILE_T+8, F+2)
    t_out = out_ref.shape[1] * 2                  # TILE_T
    f_out = out_ref.shape[2] * 2                  # F

    for o in range(N_CH):
        gate = None
        lin = None
        for dt in range(3):
            for df in range(3):
                win = x[dt:dt + t_out, df:df + f_out]
                g = win * wg_ref[dt, df, o]
                l = win * wl_ref[dt, df, o]
                gate = g if gate is None else gate + g
                lin = l if lin is None else lin + l
        act = (lin + bl_ref[0, o]) * jax.nn.sigmoid(gate + bg_ref[0, o])
        pairs = act.reshape(t_out // 2, 2 * f_out)
        tsum = pairs[:, :f_out] + pairs[:, f_out:]     # (TILE_T/2, F)
        out_ref[0, :, :, o] = jnp.dot(tsum, pf_ref[:],
                                      preferred_element_type=jnp.float32)


def fused_stem_block(x: jnp.ndarray, folded: Dict[str, jnp.ndarray]
                     ) -> jnp.ndarray:
    """(B, T, F, 1) log-mel → (B, T//2, F//2, 16) block-0 output (eval).

    T is padded up to a TILE_T multiple on device; tail rows are zeros
    exactly like the conv's zero padding, and pooled rows beyond T//2 are
    sliced off (torch AvgPool floor semantics).
    """
    b, t, f, _ = x.shape
    assert f == 128, "stem kernel is specialized to the 128-mel layout"
    t_tiles = -(-t // TILE_T)
    t_pad = t_tiles * TILE_T
    # time halo of 1 before, plus tail padding so every 8-aligned
    # (TILE_T+8)-row DMA window stays in bounds; freq halo added in-kernel
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 7 + (t_pad - t)), (0, 0)))

    # freq-pair averaging matrix (F, F/2): 0.25 weights fold the full 2x2
    # mean (time pairs are pre-summed in the kernel)
    pf = np.zeros((f, f // 2), np.float32)
    pf[np.arange(f), np.arange(f) // 2] = 0.25

    interpret = jax.default_backend() != "tpu"   # CPU tests run interpreted
    out = pl.pallas_call(
        _stem_kernel,
        grid=(b, t_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # stays in HBM, DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T // 2, f // 2, N_CH),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad // 2, f // 2, N_CH),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE_T + 8, f), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, folded["w_gate"], folded["b_gate"].reshape(1, N_CH),
      folded["w_lin"], folded["b_lin"].reshape(1, N_CH), jnp.asarray(pf))
    return out[:, : t // 2]


def reference_stem_block(x: jnp.ndarray, folded: Dict[str, jnp.ndarray]
                         ) -> jnp.ndarray:
    """Pure-XLA reference of the same folded computation (used in tests and
    as fallback on backends without Pallas support)."""
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)))
    t, f = x.shape[1], x.shape[2]
    gate = None
    lin = None
    for dt in range(3):
        for df in range(3):
            win = xp[:, dt:dt + t, df:df + f]
            g = win[..., None] * folded["w_gate"][dt, df]
            l = win[..., None] * folded["w_lin"][dt, df]
            gate = g if gate is None else gate + g
            lin = l if lin is None else lin + l
    act = (lin + folded["b_lin"]) * jax.nn.sigmoid(gate + folded["b_gate"])
    t2, f2 = (t // 2) * 2, (f // 2) * 2
    act = act[:, :t2, :f2]
    return 0.25 * (act[:, 0::2, 0::2] + act[:, 0::2, 1::2]
                   + act[:, 1::2, 0::2] + act[:, 1::2, 1::2])
