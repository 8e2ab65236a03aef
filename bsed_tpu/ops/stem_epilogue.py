"""Fused folded-stem epilogue: BN-affine → GLU/CG → dropout → time pool →
frequency-pool matmul as ONE Pallas kernel (forward and custom backward).

Why: the round-4 device profile of the 51 ms MT+ISP train step
(docs/PERF.md) attributes its dominant terms to exactly this op chain on
the folded layout — GLU block-diagonal matmul chain 13.6 ms, folded
bias/BN/σ elementwise 2.9 ms, fast_avg_pool fwd+bwd 4.1 ms, freq-pool
matmul 3.5 ms — all HBM-bound streams over the same (B, T, 16, 128)
activations that XLA fuses only partially (each matmul is a fusion
barrier, and the backward re-reads the saved BN output and GLU linear).
Hand-scheduling the chain reads the conv output ONCE per direction and
keeps every intermediate (BN output, σ, GLU linear, dropout mask) in
VMEM; the backward recomputes them from the same tile instead of loading
saved copies.

The reference runs this chain as separate cuDNN/eltwise torch ops
(/root/reference/src/models/CNN.py:43-67: Conv2d → BatchNorm2d → GLU →
Dropout → AvgPool2d); there is no reference kernel to port — this is the
TPU-native fusion of that block.

Design notes:

* BatchNorm enters the kernel as a PER-LANE AFFINE ``y = h·inv + c`` with
  ``inv = γ·rsqrt(var+ε)`` (tiled over fold copies) and
  ``c = (bias − mean)·inv + β``: the batch mean/var are computed OUTSIDE
  by XLA (a cheap grouped reduction fused into the conv epilogue), and
  because ``inv``/``c`` are differentiable custom_vjp INPUTS, the whole
  BN-statistics backward (the −Σdy/N and xhat·Σ(dy·xhat)/N correction
  terms, plus the running-stat bookkeeping) falls out of XLA autodiff of
  the surrounding (co,)-vector algebra — the kernel only produces the
  per-lane reductions Σdy and Σdy·h it already has in registers.
* Dropout consumes PRE-DRAWN uint8 bits (``keep = bits < k`` — the exact
  Bernoulli(k/256) scheme of ops/dropout.py) instead of the in-kernel
  pltpu PRNG: jax 0.9 cannot lower ``prng_seed`` in interpret mode, and
  the forward and backward kernels must see the SAME mask. The bits
  tensor adds one uint8 stream per direction (~¼ of one activation
  re-read) and keeps the kernel bit-reproducible and CPU-testable. Bits
  are passed as (B, T·G, L): the uint8 min-tile is (32, 128) sublanes ×
  lanes, which the collapsed row-panel layout satisfies while the 4-D
  (…, G=16, L) layout would not.
* Grid = (B, time tiles); the tile's time rows × 16 groups collapse to a
  (rows, 128) panel so the GLU/CG dense and the freq-pool matmul run as
  full 128-lane MXU ops. Out-of-range rows of the final partial tile are
  zero-masked in the backward — both the upstream cotangent rows (so the
  parameter reductions skip them) and the h rows themselves (padding
  garbage could be non-finite; 0·NaN would poison the dW panel matmul).
* ``pool_w`` (the constant frequency-averaging matrix) is a kernel input
  but NOT a ``custom_vjp`` argument: it is not a parameter and needs no
  cotangent (Pallas kernels cannot close over array constants).

Equality with the unfused folded path is pinned by
tests/test_stem_epilogue.py (interpret mode on CPU; forward, all five
gradients, dropout masks, odd-T edge).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(h_ref, inv_ref, c_ref, w_ref, b_ref, pool_ref,
                bits_ref, out_ref, *, act: str, pt: int, pg: int,
                keep_k: int):
    # Elementwise math runs in f32 REGISTERS regardless of the block
    # dtype (loads/stores keep the caller's dtype, so HBM traffic is
    # unchanged); only the matmul operands drop to the input dtype for
    # the MXU. Mosaic mis-verifies f32-scalar → bf16-vector broadcasts
    # (the GRU-kernel bug again, docs/PERF.md), and f32 register math
    # sidesteps the whole class.
    f32 = jnp.float32
    h = h_ref[0]                            # (tile_in, G, L)
    tt, g, l = h.shape
    dt = h.dtype
    ht = h.reshape(tt * g, l).astype(f32)
    y = ht * inv_ref[...] + c_ref[...]
    lin = jnp.dot(y.astype(dt), w_ref[...],
                  preferred_element_type=f32) + b_ref[...]
    if act == "glu":
        z = lin * jax.nn.sigmoid(y)
    else:                                   # cg
        z = y * jax.nn.sigmoid(lin)
    if keep_k > 0:
        # Mosaic cannot lower a u8 vector compare; zero-extend to i32
        keep = bits_ref[0].astype(jnp.int32) < keep_k
        z = jnp.where(keep, z * (256.0 / keep_k), 0.0)
    if pt > 1:
        z = z.reshape(tt // pt, pt, g, l).sum(axis=1) * (1.0 / pt)
    if pg > 1:
        # frequency pooling on the GROUP axis (unfolded blocks: G is the
        # spatial frequency axis, lanes are channels)
        z = z.reshape(tt // pt, g // pg, pg, l).sum(axis=2) * (1.0 / pg)
    if pool_ref is None:
        out_ref[0] = z.reshape(tt // pt, g // pg, l).astype(dt)
    else:
        zp = jnp.dot(z.reshape((tt // pt) * g, l).astype(dt),
                     pool_ref[...].astype(dt), preferred_element_type=f32)
        out_ref[0] = zp.reshape(tt // pt, g, pool_ref.shape[1]).astype(dt)


def _bwd_kernel(g_ref, h_ref, inv_ref, c_ref, w_ref, b_ref, pool_ref,
                bits_ref, dh_ref, dinv_ref, dc_ref, dw_ref, db_ref,
                *, act: str, pt: int, pg: int, keep_k: int,
                t_in: int, tile_in: int):
    # All elementwise math in f32 registers (see _fwd_kernel note);
    # matmul operands drop to the block dtype for the MXU.
    f32 = jnp.float32
    j = pl.program_id(1)
    h = h_ref[0]
    tt, g, l = h.shape
    tt_out = tt // pt
    dt = h.dtype

    # zero-mask h rows beyond the array (final partial tile): the pad is
    # unspecified and a non-finite value would poison dW via 0·NaN
    row_in = j * tile_in + jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
    ht = h.reshape(tt * g, l).astype(f32)
    ht = jnp.where(row_in.reshape(tt * g, l) < t_in, ht, 0.0)

    # recompute the forward intermediates for this tile (VMEM-resident)
    y = ht * inv_ref[...] + c_ref[...]
    ydt = y.astype(dt)
    lin = jnp.dot(ydt, w_ref[...], preferred_element_type=f32) \
        + b_ref[...]

    # upstream cotangent, masked to valid output rows
    gz = g_ref[0].astype(f32)               # (tt_out, G, L2)
    t0 = j * tt_out
    valid = (t0 + jax.lax.broadcasted_iota(jnp.int32, gz.shape, 0)) \
        < (t_in // pt)
    gz = jnp.where(valid, gz, 0.0)

    # freq-pool backward: one matmul by pool_wᵀ (folded blocks), or
    # broadcast over the pooled group pairs (unfolded blocks)
    if pool_ref is not None:
        gf = jnp.dot(gz.reshape(tt_out * g, gz.shape[2]).astype(dt),
                     pool_ref[...].T.astype(dt), preferred_element_type=f32)
    else:
        gf = gz.reshape(tt_out, g // pg, gz.shape[2])
        if pg > 1:
            gf = gf.reshape(tt_out, g // pg, 1, l) * (1.0 / pg)
            gf = jnp.broadcast_to(gf, (tt_out, g // pg, pg, l))
        gf = gf.reshape(tt_out * g, l)
    # time-pool backward: broadcast g/pt over the pooled pairs
    if pt > 1:
        gf = gf.reshape(tt_out, 1, g, l) * (1.0 / pt)
        gf = jnp.broadcast_to(gf, (tt_out, pt, g, l)).reshape(tt * g, l)
    # dropout backward: same mask, same scale
    if keep_k > 0:
        # Mosaic cannot lower a u8 vector compare; zero-extend to i32
        keep = bits_ref[0].astype(jnp.int32) < keep_k
        gd = jnp.where(keep, gf * (256.0 / keep_k), 0.0)
    else:
        gd = gf

    sig_y = jax.nn.sigmoid(y)
    if act == "glu":
        # z = lin · σ(y)
        dlin = gd * sig_y
        dy = gd * lin * sig_y * (1.0 - sig_y) \
            + jnp.dot(dlin.astype(dt), w_ref[...].T,
                      preferred_element_type=f32)
    else:
        # z = y · σ(lin)
        sig_l = jax.nn.sigmoid(lin)
        dlin = gd * y * sig_l * (1.0 - sig_l)
        dy = gd * sig_l \
            + jnp.dot(dlin.astype(dt), w_ref[...].T,
                      preferred_element_type=f32)

    dh_ref[0] = (dy * inv_ref[...]).astype(dt).reshape(tt, g, l)

    # parameter reductions, accumulated across the sequential grid.
    # dW keeps f32 operands: the bf16-operand variant measured no win
    # (39.2 vs 39.0 ms/step — the panel is too small to matter) and f32
    # operands accumulate the more accurate gradient.
    dw_t = jnp.dot(y.T, dlin, preferred_element_type=f32)
    db_t = jnp.sum(dlin, axis=0, keepdims=True)
    dinv_t = jnp.sum(dy * ht, axis=0, keepdims=True)
    dc_t = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when((pl.program_id(0) == 0) & (j == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dinv_ref[...] = jnp.zeros_like(dinv_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    dw_ref[...] += dw_t
    db_ref[...] += db_t
    dinv_ref[...] += dinv_t
    dc_ref[...] += dc_t


def _pick_tile(pt: int, target: int = 256) -> int:
    """Input-rows-per-tile: a multiple of pt near ``target``; the final
    partial tile is handled by masking, so no divisibility demands."""
    return max(pt, (target // pt) * pt)


def make_fused_epilogue(act: str, pt: int, rate: float, pool_w=None,
                        pg: int = 1, interpret: Optional[bool] = None,
                        tile_target: int = 256):
    """Build ``ep(h, inv, c, w, b, bits) -> out`` for one conv-block
    epilogue (folded or standard layout).

    h: (B, T, G, L) conv output WITHOUT bias; inv/c: (L,) per-lane BN
    affine (conv bias folded into c); w/b: (L, L)/(L,) GLU or CG dense
    (block-diagonal for folded blocks, the plain channel Dense for
    standard-layout blocks); bits: (B, T·G, L) uint8 dropout bits or
    None (keep = bits < round(256·(1−rate))).

    Frequency pooling comes in exactly one of two forms:
      * ``pool_w`` (L, L2): the folded blocks' constant lane-averaging
        matrix (the fold shrinks) — requires ``pg == 1``;
      * ``pg > 1``: standard-layout blocks pool the GROUP axis (G is the
        spatial frequency axis there) — requires ``pool_w is None``.
    Output: (B, T//pt, G//pg, L2) with L2 = pool_w.shape[1] or L.
    """
    if act not in ("glu", "cg"):
        raise ValueError(f"fused epilogue supports glu/cg, got {act}")
    if pt not in (1, 2):
        raise ValueError(f"fused epilogue supports time pool 1/2, got {pt}")
    if pool_w is not None and pg != 1:
        raise ValueError("pool_w (lane pooling) and pg (group pooling) "
                         "are mutually exclusive")
    from bsed_tpu.ops.dropout import _u8_threshold
    if rate > 0:
        k = _u8_threshold(1.0 - rate)
        if k is None:
            raise ValueError(f"dropout rate {rate} not on the k/256 grid")
        keep_k = k
    else:
        keep_k = 0
    pool_wt = (None if pool_w is None
               else jnp.asarray(pool_w, jnp.float32))

    def _interp():
        return (jax.default_backend() != "tpu" if interpret is None
                else interpret)

    def _build(kern_fn, static, h, inv, c, w, b, bits, extra_outs=None,
               g_in=None):
        """Assemble (kernel, specs, args) with the optional pool/bits
        inputs mapped onto the full kernel signature."""
        bsz, t, g, l = h.shape
        l_out = l if pool_wt is None else pool_wt.shape[1]
        tile_in = _pick_tile(pt, tile_target)
        nt = -(-(t // pt) // (tile_in // pt))
        vec = pl.BlockSpec((1, l), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
        big = pl.BlockSpec((1, tile_in, g, l), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        out_blk = pl.BlockSpec((1, tile_in // pt, g // pg, l_out),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
        specs = [big, vec, vec,
                 pl.BlockSpec((l, l), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM), vec]
        args = [h, inv.reshape(1, l), c.reshape(1, l), w,
                b.reshape(1, l)]
        have_pool = pool_wt is not None
        if have_pool:
            specs.append(pl.BlockSpec((l, l_out), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM))
            args.append(pool_wt)
        have_bits = keep_k > 0
        if have_bits:
            specs.append(pl.BlockSpec((1, tile_in * g, l),
                                      lambda i, j: (i, j, 0),
                                      memory_space=pltpu.VMEM))
            args.append(bits)
        n_lead = static.get("_n_lead", 0)
        inner = functools.partial(kern_fn, act=act, pt=pt, pg=pg,
                                  keep_k=keep_k,
                                  **{k: v for k, v in static.items()
                                     if not k.startswith("_")})

        def kern(*refs):
            # [lead refs (bwd: gz)] + 5 named + [pool] + [bits] + outputs
            n_named = n_lead + 5 + (1 if have_pool else 0) \
                + (1 if have_bits else 0)
            ins, outs = refs[:n_named], refs[n_named:]
            base = list(ins[:n_lead + 5])
            k = n_lead + 5
            if have_pool:
                base.append(ins[k]); k += 1
            else:
                base.append(None)
            if have_bits:
                base.append(ins[k]); k += 1
            else:
                base.append(None)
            return inner(*base, *outs)

        return kern, specs, args, (bsz, t, g, l, l_out, tile_in, nt,
                                   out_blk)

    def _run_fwd(h, inv, c, w, b, bits):
        kern, specs, args, (bsz, t, g, l, l_out, tile_in, nt, out_blk) = \
            _build(_fwd_kernel, {}, h, inv, c, w, b, bits)
        return pl.pallas_call(
            kern, grid=(bsz, nt), in_specs=specs, out_specs=out_blk,
            out_shape=jax.ShapeDtypeStruct(
                (bsz, t // pt, g // pg, l_out), h.dtype),
            interpret=_interp(),
        )(*args)

    def _run_bwd(gz, h, inv, c, w, b, bits):
        bsz, t, g, l = h.shape
        tile_in = _pick_tile(pt, tile_target)
        kern, specs, args, (bsz, t, g, l, l_out, tile_in, nt, out_blk) = \
            _build(_bwd_kernel, {"t_in": t, "tile_in": tile_in,
                                 "_n_lead": 1},
                   h, inv, c, w, b, bits)
        specs = [out_blk] + specs
        args = [gz] + args
        acc = pl.BlockSpec((1, l), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
        dh, dinv, dc, dw, db = pl.pallas_call(
            kern,
            grid=(bsz, nt),
            in_specs=specs,
            out_specs=[
                pl.BlockSpec((1, tile_in, g, l),
                             lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                acc, acc,
                pl.BlockSpec((l, l), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                acc,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bsz, t, g, l), h.dtype),
                jax.ShapeDtypeStruct((1, l), jnp.float32),
                jax.ShapeDtypeStruct((1, l), jnp.float32),
                jax.ShapeDtypeStruct((l, l), jnp.float32),
                jax.ShapeDtypeStruct((1, l), jnp.float32),
            ],
            interpret=_interp(),
        )(*args)
        return dh, dinv, dc, dw, db

    @jax.custom_vjp
    def ep(h, inv, c, w, b, bits):
        return _run_fwd(h, inv, c, w, b, bits)

    def ep_fwd(h, inv, c, w, b, bits):
        return _run_fwd(h, inv, c, w, b, bits), (h, inv, c, w, b, bits)

    def ep_bwd(res, gz):
        h, inv, c, w, b, bits = res
        dh, dinv, dc, dw, db = _run_bwd(gz, h, inv, c, w, b, bits)
        dbits = (None if bits is None
                 else np.zeros(bits.shape, jax.dtypes.float0))
        return (dh, dinv.reshape(inv.shape).astype(inv.dtype),
                dc.reshape(c.shape).astype(c.dtype),
                dw.astype(w.dtype),
                db.reshape(b.shape).astype(b.dtype), dbits)

    ep.defvjp(ep_fwd, ep_bwd)
    return ep
