"""Folded-frequency stem: exact reparametrization of the early conv blocks
with frequency bins packed into the channel (lane) dimension.

Why: TPU HBM layouts tile the two minor dimensions as (8 sublanes, 128
lanes). The CRNN stem's activations are NHWC with C = 1/16/32 on the lane
dim (config.py nb_filters), so block-0/1/2 intermediates are padded up to
128 lanes — an up-to-8x HBM traffic blowup on the largest tensors of the
whole serving pipeline ((B, 1255, 128, 16) is the biggest activation the
model produces). The reference never faces this: its torch/cuDNN NCHW path
has no lane padding (/root/reference/src/models/CNN.py:43-67 runs the same
stack on GPU).

The fix is algebraic, not approximate. Pack ``f`` adjacent mel bins into
channels — x[b,t,g*f+r,c] -> xf[b,t,g,r*C+c] — and rewrite each block:

* conv3x3 (pad 1): a 3x3 conv over (T, group) whose folded kernel
  (3, 3, f*cin, f*cout) embeds K[:, d+1, c, o] at input sub r_in =
  (r_out+d) mod f of group tap 1 + floor((r_out+d)/f). The zero group
  padding supplies exactly the original F-boundary zeros.
* BatchNorm (eval): per-channel affine, folded into the conv kernel/bias
  (stats tiled per sub-position).
* GLU / ContextGating (CNN.py:5-30): the Dense mixes channels per
  frequency, so folded it is a block-diagonal (f*C, f*C) matmul — a full
  128-lane MXU op instead of a padded 16-lane one.
* avg-pool (pt, pf): time pooling stays spatial; frequency pooling becomes
  a (f*C, (f/pf)*C) averaging matmul, shrinking the fold.

Fold factors for the default config (filters 16/32/64, pooling
(2,2)/(2,2)/(1,2)): 8 -> 4 -> 2 -> 1, so every folded activation carries
64-128 real channels on the lane dim and the layout padding disappears.
After the last folded block the tensor unfolds back to (B, T', F', C') and
the remaining blocks run unchanged. Equality with the standard flax stack
is pinned by tests/test_folded_stem.py.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bsed_tpu.ops.dropout import dropout as fast_dropout
from bsed_tpu.ops.pooling import fast_avg_pool


def fold_conv_kernel(kernel: np.ndarray, f: int) -> np.ndarray:
    """(kt, 3, cin, cout) 3-tap-frequency kernel -> (kt, 3, f*cin, f*cout)
    group-axis kernel computing the identical map on the folded layout."""
    kt, kf, cin, cout = kernel.shape
    if kf != 3:
        raise ValueError("folded stem supports 3-tap frequency kernels")
    out = np.zeros((kt, 3, f * cin, f * cout), kernel.dtype)
    for r_out in range(f):
        for d in (-1, 0, 1):
            s = r_out + d                       # input sub-position
            g = (s // f) + 1                    # group tap 0/1/2
            r_in = s % f
            out[:, g, r_in * cin:(r_in + 1) * cin,
                r_out * cout:(r_out + 1) * cout] = kernel[:, d + 1]
    return out


def _block_diag(mat: np.ndarray, f: int) -> np.ndarray:
    """(C, C') dense -> (f*C, f*C') block-diagonal (per sub-position)."""
    c_in, c_out = mat.shape
    out = np.zeros((f * c_in, f * c_out), mat.dtype)
    for r in range(f):
        out[r * c_in:(r + 1) * c_in, r * c_out:(r + 1) * c_out] = mat
    return out


def _freq_pool_matrix(f: int, pf: int, c: int) -> np.ndarray:
    """((f*C), (f/pf)*C) matrix averaging pf adjacent sub-positions."""
    out = np.zeros((f * c, (f // pf) * c), np.float32)
    for r in range(f):
        q = r // pf
        for ch in range(c):
            out[r * c + ch, q * c + ch] = 1.0 / pf
    return out


def build_folded_stem(cnn_params: Dict, cnn_stats: Dict,
                      nb_filters: Sequence[int],
                      pooling: Sequence[Tuple[int, int]],
                      activation: str = "glu",
                      n_mels: int = 128, fold0: int = 8,
                      bn_eps: float = 1e-3,
                      dtype=None,
                      fused_epilogue: bool = False) -> Tuple[Callable, int]:
    """Derive folded parameters for the leading blocks and return
    ``(stem(mel (B,T,F,1)) -> (B,T',F',C'), n_blocks_folded)``.

    Folds blocks while the running fold factor exceeds 1 (each block's
    frequency pooling divides it down); ``fold0=8`` covers blocks 0-2 of
    the default config. BatchNorm runs in eval mode (running stats), so the
    result is serving-only; dropout is the eval identity.
    """
    if activation not in ("glu", "cg", "relu", "leakyrelu"):
        raise ValueError(f"unsupported activation {activation}")

    blocks: List[Dict] = []
    f = fold0
    cin = 1
    for i, (cout, (pt, pf)) in enumerate(zip(nb_filters, pooling)):
        if f == 1:
            break
        if f % pf != 0:
            raise ValueError(f"block{i}: pool {pf} does not divide fold {f}")
        p = cnn_params[f"block{i}"]
        s = cnn_stats[f"block{i}"]
        kernel = np.asarray(p["conv"]["kernel"], np.float32)
        bias = np.asarray(p["conv"]["bias"], np.float32)
        # eval-mode BN folded into the conv: y*scale + shift
        scale = (np.asarray(p["bn"]["scale"], np.float32)
                 / np.sqrt(np.asarray(s["bn"]["var"], np.float32) + bn_eps))
        shift = (np.asarray(p["bn"]["bias"], np.float32)
                 - np.asarray(s["bn"]["mean"], np.float32) * scale)
        kernel = kernel * scale[None, None, None, :]
        bias = bias * scale + shift

        blk = {
            "kernel": jnp.asarray(fold_conv_kernel(kernel, f)),
            "bias": jnp.asarray(np.tile(bias, f)),
            "pt": pt,
        }
        if activation in ("glu", "cg"):
            act_key = "GLU_0" if activation == "glu" else "ContextGating_0"
            w = np.asarray(p[act_key]["linear"]["kernel"], np.float32)
            b = np.asarray(p[act_key]["linear"]["bias"], np.float32)
            blk["act_w"] = jnp.asarray(_block_diag(w, f))
            blk["act_b"] = jnp.asarray(np.tile(b, f))
        if pf > 1:
            blk["pool_w"] = jnp.asarray(_freq_pool_matrix(f, pf, cout))
        if (fused_epilogue and activation in ("glu", "cg")
                and pf > 1 and pt in (1, 2)):
            # serving-side fused Pallas epilogue: the eval-mode BN is
            # already folded into the conv, so the kernel's per-lane
            # affine degenerates to inv=1, c=bias (ops/stem_epilogue.py)
            from bsed_tpu.ops.stem_epilogue import make_fused_epilogue
            blk["ep"] = make_fused_epilogue(activation, pt, 0.0,
                                            blk["pool_w"])
            blk["ones"] = jnp.ones_like(blk["bias"])
        blocks.append(blk)
        f //= pf
        cin = cout

    n_folded = len(blocks)
    f_rem = f
    c_last = nb_filters[n_folded - 1]

    def stem(mel: jnp.ndarray) -> jnp.ndarray:
        b, t, n_f, _ = mel.shape
        x = mel.reshape(b, t, n_f // fold0, fold0)
        if dtype is not None:
            x = x.astype(dtype)
        for blk in blocks:
            k = blk["kernel"]
            if dtype is not None:
                k = k.astype(dtype)
            x = jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if "ep" in blk:
                x = blk["ep"](x, blk["ones"], blk["bias"],
                              blk["act_w"].astype(x.dtype),
                              blk["act_b"], None)
                continue
            x = x + blk["bias"].astype(x.dtype)
            if activation == "glu":
                lin = x @ blk["act_w"].astype(x.dtype) \
                    + blk["act_b"].astype(x.dtype)
                x = lin * jax.nn.sigmoid(x)
            elif activation == "cg":
                lin = x @ blk["act_w"].astype(x.dtype) \
                    + blk["act_b"].astype(x.dtype)
                x = x * jax.nn.sigmoid(lin)
            elif activation == "relu":
                x = jax.nn.relu(x)
            else:
                x = jax.nn.leaky_relu(x, negative_slope=0.2)
            if blk["pt"] > 1:
                x = fast_avg_pool(x, (blk["pt"], 1))
            if "pool_w" in blk:
                x = x @ blk["pool_w"].astype(x.dtype)
        # unfold (B, T', G, f_rem*C) -> (B, T', G*f_rem, C)
        b2, t2, g, _ = x.shape
        x = x.reshape(b2, t2, g, f_rem, c_last).reshape(
            b2, t2, g * f_rem, c_last)
        return x

    return stem, n_folded


# ---------------------------------------------------------------------------
# TRAIN-mode folded stem: the same algebraic re-layout, but differentiable
# and consuming the standard flax parameter tree directly — BatchNorm runs
# in batch-stats mode with the per-ORIGINAL-channel reduction grouped over
# the fold copies, and dropout draws iid masks on the folded layout. Opt-in
# perf configuration (ModelConfig.folded_train_stem), like fused_streams:
# exact math up to fp reassociation (pinned by tests/test_folded_stem.py),
# but not bit-identical to the unfolded path, so OFF for parity training.

import functools as _functools


@_functools.lru_cache(maxsize=None)
def _fold_gather_idx(f: int, cin: int, cout: int):
    """Constant index map realizing fold_conv_kernel as ONE gather:
    idx[g, fi, fo] selects from kernel[:, :, :, :].reshape(kt, -1) padded
    with a trailing zero slot. 3·f² dynamic-update-slices per block per
    step (and their 24-op slice+add transpose) showed up in the round-5
    device profile's data-formatting bucket; a single constant-index
    take lowers as one gather forward / one scatter-add backward."""
    idx = np.full((3, f * cin, f * cout), 3 * cin * cout, np.int32)
    for r_out in range(f):
        for d in (-1, 0, 1):
            s = r_out + d
            g = (s // f) + 1
            r_in = s % f
            for ci in range(cin):
                for co in range(cout):
                    idx[g, r_in * cin + ci, r_out * cout + co] = \
                        (d + 1) * cin * cout + ci * cout + co
    # cache the NUMPY constant (a jnp array created inside a jit trace
    # would leak the tracer); jnp.asarray at use-site constant-folds
    return idx.reshape(-1)


def _fold_kernel_jnp(kernel: jnp.ndarray, f: int) -> jnp.ndarray:
    """Differentiable fold_conv_kernel: (kt, 3, cin, cout) →
    (kt, 3, f·cin, f·cout) as one constant-index gather (gradients flow
    back to the original kernel through a single scatter-add)."""
    kt, kf, cin, cout = kernel.shape
    idx = jnp.asarray(_fold_gather_idx(f, cin, cout))
    flat = jnp.concatenate(
        [kernel.reshape(kt, 3 * cin * cout),
         jnp.zeros((kt, 1), kernel.dtype)], axis=1)
    return jnp.take(flat, idx, axis=1).reshape(kt, 3, f * cin, f * cout)


def _block_diag_jnp(mat: jnp.ndarray, f: int) -> jnp.ndarray:
    c_in, c_out = mat.shape
    out = jnp.zeros((f * c_in, f * c_out), mat.dtype)
    for r in range(f):
        out = out.at[r * c_in:(r + 1) * c_in,
                     r * c_out:(r + 1) * c_out].set(mat)
    return out


def folded_train_eligible(model_cfg, n_mels: int, fold0: int = 8) -> bool:
    """Same gate as the serving auto-selection (serve._fold_divides plus
    topology constraints), evaluated for the train-mode stem."""
    if (model_cfg.use_fpn or model_cfg.kernel_size != 3
            or model_cfg.activation not in ("glu", "cg", "relu", "leakyrelu")
            or n_mels % fold0 != 0):
        return False
    f = fold0
    for _, pf in (tuple(p) for p in model_cfg.pooling):
        if f == 1:
            break
        if pf == 0 or f % pf != 0:
            return False
        f //= pf
    return True


def make_folded_train_stem(model_cfg, n_mels: int, fold0: int = 8,
                           bn_eps: float = 1e-3, bn_momentum: float = 0.01,
                           mesh=None):
    """(apply, n_folded) where
    ``apply(cnn_params, cnn_stats, x, train, dropout_rng) -> (h, new_stats)``
    runs the leading foldable blocks on the folded layout using the
    STANDARD parameter tree (cnn_params['block{i}'] with conv/bn/GLU_0
    leaves — the kernels/Dense maps are folded on the fly, so gradients
    land on the original parameters).

    BatchNorm semantics match flax exactly: batch stats are the biased
    mean/var per original channel over (batch, time, freq) — on the folded
    layout that is a grouped reduction over the fold copies — with running
    averages ra = momentum·ra + (1−momentum)·batch (ConvBlock uses flax
    momentum 0.01 ≡ torch 0.99). Dropout draws iid bernoulli masks on the
    folded tensor (statistically identical to the unfolded layout, not
    bit-identical)."""
    from bsed_tpu.ops.dropout import _u8_threshold
    from bsed_tpu.ops.stem_epilogue import make_fused_epilogue

    def _ep_ok(pt):
        return (model_cfg.fused_stem_epilogue
                and model_cfg.activation in ("glu", "cg")
                and pt in (1, 2)
                and (model_cfg.dropout == 0
                     or _u8_threshold(1.0 - model_cfg.dropout)))

    def _make_eps(pt, pool_w, pg):
        """(train_ep, eval_ep) — fused Pallas epilogue pair
        (ops/stem_epilogue.py), shard_map-wrapped when a mesh is active
        (Mosaic kernels are opaque to the GSPMD partitioner the
        mesh-sharded train step relies on: batch rows sharded,
        parameters replicated, psums inserted by shard_map's
        transpose)."""
        eps = (make_fused_epilogue(model_cfg.activation, pt,
                                   model_cfg.dropout, pool_w, pg=pg),
               make_fused_epilogue(model_cfg.activation, pt, 0.0,
                                   pool_w, pg=pg))
        if mesh is None:
            return eps
        from jax.sharding import PartitionSpec as P
        shard_map = jax.shard_map

        def _wrap(ep, with_bits, _mesh=mesh):
            data, rep = P("data"), P()
            if with_bits:
                f = shard_map(
                    lambda h, iv, cv, w, b, bi: ep(h, iv, cv, w, b, bi),
                    mesh=_mesh,
                    in_specs=(data, rep, rep, rep, rep, data),
                    out_specs=data, check_vma=False)
                return lambda h, iv, cv, w, b, bi: f(h, iv, cv, w, b, bi)
            g = shard_map(
                lambda h, iv, cv, w, b: ep(h, iv, cv, w, b, None),
                mesh=_mesh, in_specs=(data, rep, rep, rep, rep),
                out_specs=data, check_vma=False)
            return lambda h, iv, cv, w, b, bi: g(h, iv, cv, w, b)
        return (_wrap(eps[0], model_cfg.dropout > 0),
                _wrap(eps[1], False))

    plan: List[Tuple] = []
    f = fold0
    cin = 1
    g_groups = n_mels // fold0
    for i, (cout, (pt, pf)) in enumerate(zip(model_cfg.nb_filters,
                                             model_cfg.pooling)):
        if f > 1:
            # folded block: frequency pooling shrinks the FOLD via the
            # constant lane-averaging matmul (``_freq_pool_matrix``):
            # profiled on v5e, the reshape(..., fi//pf, pf, co).mean form
            # cost ~10 ms/step (half pure layout copies in the backward);
            # the 128-lane matmul fuses cleanly fwd AND bwd.
            if f % pf != 0:
                raise ValueError(
                    f"block{i}: pool {pf} does not divide fold {f}")
            pool_w = (jnp.asarray(_freq_pool_matrix(f, pf, cout))
                      if pf > 1 else None)
            eps = (_make_eps(pt, pool_w, 1)
                   if _ep_ok(pt) and pool_w is not None else None)
            plan.append((i, cin, cout, pt, pf, f, pool_w, eps))
            f //= pf
            cin = cout
            continue
        # f == 1: the "folded" layout IS standard NHWC, and the SAME
        # Pallas epilogue could keep fusing blocks 3+ (pg pools the
        # group axis; built and equality-tested, tests/test_stem_epilogue
        # ::test_group_pool_*). MEASURED AS A LOSER on v5e and therefore
        # not wired: blocks 3-4 fused = 40.7 ms/step, block 3 only =
        # 39.9, folded-only = 39.6 — at these 16x-smaller activations
        # XLA already fuses the chain into the convs, and the extra
        # pallas_call boundaries (dispatch + layout copies at entry/exit)
        # cost more than the fusion saves (docs/PERF.md round 5).
        break
    n_folded = len(plan)
    f_rem = f
    c_last = model_cfg.nb_filters[n_folded - 1]
    act = model_cfg.activation
    rate = model_cfg.dropout
    dtype = (jnp.bfloat16 if model_cfg.compute_dtype == "bfloat16"
             else jnp.float32)

    def apply(cnn_params, cnn_stats, x, train: bool, dropout_rng):
        b, t, n_f, _ = x.shape
        h = x.reshape(b, t, n_f // fold0, fold0).astype(dtype)
        new_stats = {}
        rng = dropout_rng
        for (i, ci, co, pt, pf, fi, pool_w, eps) in plan:
            p = cnn_params[f"block{i}"]
            s = cnn_stats[f"block{i}"]
            k = _fold_kernel_jnp(p["conv"]["kernel"].astype(dtype), fi)
            h = jax.lax.conv_general_dilated(
                h, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

            if eps is not None:
                # fused-epilogue path: bias stays OUT of the conv output
                # (it folds into the kernel's per-lane affine `c`); batch
                # stats come from the pre-bias activations (the mean just
                # shifts by the bias, the variance is shift-invariant),
                # so the running-stat numbers match the unfused path.
                bias = p["conv"]["bias"]
                if train:
                    hf = h.astype(jnp.float32).reshape(*h.shape[:-1],
                                                       fi, co)
                    mean_h = hf.mean(axis=(0, 1, 2, 3))
                    var = (jnp.square(hf).mean(axis=(0, 1, 2, 3))
                           - mean_h ** 2)
                    mean = mean_h + bias
                    n = (hf.shape[0] * hf.shape[1] * hf.shape[2]
                         * hf.shape[3])
                    corr = n / (n - 1) if n > 1 else 1.0
                    new_stats[f"block{i}"] = {"bn": {
                        "mean": (bn_momentum * s["bn"]["mean"]
                                 + (1.0 - bn_momentum) * mean),
                        "var": (bn_momentum * s["bn"]["var"]
                                + (1.0 - bn_momentum) * (var * corr))}}
                else:
                    mean, var = s["bn"]["mean"], s["bn"]["var"]
                    new_stats[f"block{i}"] = {
                        "bn": {"mean": mean, "var": var}}
                inv = p["bn"]["scale"] * jax.lax.rsqrt(var + bn_eps)
                cvec = (bias - mean) * inv + p["bn"]["bias"]
                akey = ("GLU_0" if act == "glu" else "ContextGating_0")
                w = _block_diag_jnp(
                    p[akey]["linear"]["kernel"].astype(dtype), fi)
                b_t = jnp.tile(p[akey]["linear"]["bias"], fi)
                if train and rate > 0:
                    rng, sub = jax.random.split(rng)
                    bits = jax.random.bits(
                        sub, (h.shape[0], h.shape[1] * h.shape[2],
                              h.shape[3]), jnp.uint8)
                    h = eps[0](h, jnp.tile(inv, fi), jnp.tile(cvec, fi),
                               w, b_t, bits)
                else:
                    h = eps[1](h, jnp.tile(inv, fi), jnp.tile(cvec, fi),
                               w, b_t, None)
                continue

            h = h + jnp.tile(p["conv"]["bias"], fi).astype(h.dtype)

            if train:
                hf = h.astype(jnp.float32).reshape(*h.shape[:-1], fi, co)
                mean = hf.mean(axis=(0, 1, 2, 3))
                var = jnp.square(hf).mean(axis=(0, 1, 2, 3)) - mean ** 2
                # torch accumulates the UNBIASED batch variance into the
                # running stat (× n/(n−1)) while normalizing with the biased
                # one — mirrors models/layers.TorchBatchNorm
                n = hf.shape[0] * hf.shape[1] * hf.shape[2] * hf.shape[3]
                corr = n / (n - 1) if n > 1 else 1.0
                new_stats[f"block{i}"] = {"bn": {
                    "mean": (bn_momentum * s["bn"]["mean"]
                             + (1.0 - bn_momentum) * mean),
                    "var": (bn_momentum * s["bn"]["var"]
                            + (1.0 - bn_momentum) * (var * corr))}}
            else:
                mean, var = s["bn"]["mean"], s["bn"]["var"]
                new_stats[f"block{i}"] = {
                    "bn": {"mean": mean, "var": var}}
            inv = (p["bn"]["scale"] * jax.lax.rsqrt(var + bn_eps))
            h = ((h - jnp.tile(mean, fi).astype(h.dtype))
                 * jnp.tile(inv, fi).astype(h.dtype)
                 + jnp.tile(p["bn"]["bias"], fi).astype(h.dtype))

            if act in ("glu", "cg"):
                # the (fi·co, fi·co) block-diagonal 128-lane matmul is the
                # measured optimum (round-4 profile: 13.6 ms/step fwd+bwd,
                # the largest single train-step term — and two attacks on
                # it LOST: a per-fold-copy (…,fi,co)@(co,co) einsum hit
                # 69 ms/step because a 16-wide contraction can't tile the
                # MXU, the round-2 factored-DFT lesson again; and
                # jax.checkpoint rematerialization hit 56 ms/step — XLA's
                # fusion was already streaming lin/σ without materializing
                # them, so remat only added the recompute pass). See
                # docs/PERF.md round-4 ladder.
                key = "GLU_0" if act == "glu" else "ContextGating_0"
                w = _block_diag_jnp(
                    p[key]["linear"]["kernel"].astype(dtype), fi)
                lin = h @ w + jnp.tile(p[key]["linear"]["bias"],
                                       fi).astype(h.dtype)
                h = lin * jax.nn.sigmoid(h) if act == "glu" \
                    else h * jax.nn.sigmoid(lin)
            elif act == "relu":
                h = jax.nn.relu(h)
            else:
                h = jax.nn.leaky_relu(h, negative_slope=0.2)

            if train and rate > 0:
                rng, sub = jax.random.split(rng)
                h = fast_dropout(sub, h, rate)

            if pt > 1:
                h = fast_avg_pool(h, (pt, 1))
            if pool_w is not None:
                h = h @ pool_w.astype(h.dtype)

        # unfold (B, T', G, f_rem·C) → (B, T', G·f_rem, C)
        b2, t2, g2, _ = h.shape
        h = h.reshape(b2, t2, g2, f_rem, c_last).reshape(
            b2, t2, g2 * f_rem, c_last)
        return h, new_stats

    return apply, n_folded
