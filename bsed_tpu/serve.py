"""Optimized serving path: fused audio→posterior inference.

Builds a single jitted program: DFT mel front end (ops/mel.py) → Pallas
fused stem block (ops/stem_kernel.py) → remaining conv blocks → BiGRU →
predictor, all eval-mode. Numerically equivalent to the standard flax path
(the fused stem is an algebraic refactoring of conv+BN+GLU+pool; tests
assert ≤1e-4 agreement) — it is the same model, scheduled better.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from bsed_tpu.config import Config
from bsed_tpu.models.layers import ConvBlock
from bsed_tpu.ops.mel import MelFrontEnd
from bsed_tpu.ops.stem_kernel import fold_block0_params, fused_stem_block
from bsed_tpu.train.steps import TrainModules


class _RestCNN(nn.Module):
    """Blocks ``start``..N-1 of the CNN stack (the leading blocks are served
    by a fused/folded stem)."""
    cfg: Config
    start: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        m = self.cfg.model
        for i in range(self.start, len(m.nb_filters)):
            x = ConvBlock(m.nb_filters[i], tuple(m.pooling[i]),
                          m.activation, m.dropout, m.kernel_size,
                          dtype=self.dtype, name=f"block{i}")(x, train=False)
        return x.astype(jnp.float32)


def _fold_divides(pooling, fold0: int = 8) -> bool:
    """build_folded_stem unfolds by each leading block's frequency-pooling
    factor; it raises if a block's pool does not divide the running fold
    (ops/folded_stem.py:104). Gate auto-selection on the same walk so
    ineligible pooling layouts fall back to the standard path instead of
    crashing construction."""
    f = fold0
    for _, pf in (tuple(p) for p in pooling):
        if f == 1:
            break
        if pf == 0 or f % pf != 0:
            return False
        f //= pf
    return True


def make_fast_forward(cfg: Config, modules: TrainModules, params: Dict,
                      batch_stats: Dict, use_fused_stem: bool = False,
                      stem_impl: str = "pallas",
                      use_folded_stem: Optional[bool] = None,
                      precision: str = "highest",
                      mel_algorithm: Optional[str] = None,
                      use_fused_epilogue: Optional[bool] = None) -> Callable:
    """Returns jittable ``forward(audio) -> (strong, weak)`` on raw audio.

    ``use_fused_stem`` selects the algebraically-folded conv+BN+GLU+pool
    stem (exact: max |Δ| = 0 vs the standard path). Measured end-to-end at
    batch 32 on v5e it does NOT pay off — XLA's native conv lowering plus
    its own fusion wins (standard 36.9 ms vs pallas-stem 50.4 ms /
    xla-folded-stem 66.8 ms) — so the default is the standard flax apply;
    the fused options are kept for smaller-batch/streaming regimes and as
    the exactness-tested Pallas reference. Only the non-FPN GLU CRNN has
    the specialization; other encoders use the standard apply."""
    from bsed_tpu.ops.stem_kernel import reference_stem_block

    if mel_algorithm is None:
        # Auto front end: the fused single-pallas-kernel block STFT
        # (ops/mel_kernel.py — hop-block DFT + phase-twisted banded-matmul
        # recombination + |·| + mel, all VMEM-resident with double-buffered
        # DMA) measures 12.5 ms/batch-64 at 'high' vs the dense DFT's
        # 22.3 ms on v5e ('fast': 6.8 vs 15.4) and sits inside the same
        # ≤1e-3 dB golden gate. Its 3-product split IS Precision.HIGH
        # arithmetic, so 'highest' keeps the dense path; off TPU the kernel
        # would run in interpret mode, so keep dense there.
        a = cfg.audio
        mel_algorithm = (
            "block_pallas"
            if (precision in ("high", "fast")
                and jax.default_backend() == "tpu"
                and a.n_window // a.hop_size == 8
                # kernel layout constraints: the stage-1 basis packs
                # hop_size+1 rows into a 256-row plane, and the tail
                # recombination needs a non-empty remainder block
                # (rem = n_window − 8·hop_size ≥ 1; rem == 0 would make
                # build_mel_kernel_bases pad by a negative width)
                and a.hop_size < 256
                and a.n_window % a.hop_size != 0)
            else "dense")
    fe = MelFrontEnd(cfg.audio, precision=precision,
                     algorithm=mel_algorithm)
    enc_params = params["encoder"]
    enc_stats = batch_stats["encoder"]
    # the CRNN_pred conv head carries BatchNorm (predictor_head="crnn") —
    # thread its stats like make_predict_fn (steps.py) does
    pred_vars = {"params": params["predictor"]}
    if "predictor" in batch_stats:
        pred_vars["batch_stats"] = batch_stats["predictor"]

    # Folded-frequency stem is the DEFAULT for eligible topologies
    # (use_folded_stem=None → auto): measured 36.7 → 31.6 ms at B=64/'high'
    # on v5e (1745 → 2026 clips/s) with BIT-IDENTICAL bf16 posteriors
    # (max |Δ| = 0.0); the f32 path agrees to ≤1e-5 (test_folded_stem.py).
    folded = (use_folded_stem is not False and not use_fused_stem
              and not cfg.model.use_fpn
              and cfg.model.kernel_size == 3
              and cfg.model.activation in ("glu", "cg", "relu", "leakyrelu")
              and cfg.audio.n_mels % 8 == 0
              and cfg.model.predictor_head != "crnn"
              and _fold_divides(cfg.model.pooling))
    fused = (use_fused_stem and not folded and not cfg.model.use_fpn
             and cfg.model.activation == "glu"
             and cfg.audio.n_mels == 128)
    if folded:
        # Folded-frequency stem (ops/folded_stem.py): blocks 0..k-1 run with
        # mel bins packed into the lane dim — same math, no small-channel
        # layout padding. Exactness pinned by tests/test_folded_stem.py.
        from bsed_tpu.models.rnn import BidirectionalGRU
        from bsed_tpu.ops.folded_stem import build_folded_stem

        m = cfg.model
        dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else None
        # Fused Pallas stem epilogue (ops/stem_epilogue.py) — the
        # serving-side (eval, fwd-only) form of the train-step kernel:
        # measured 3013 -> 3303 clips/s at B=64/'high' on v5e. Auto on
        # TPU only (None): the numerics differ from the unfused folded
        # path at bf16 resolution (f32 register math inside the kernel),
        # and off-TPU the interpret-mode kernel would be pure overhead.
        if use_fused_epilogue is None:
            use_fused_epilogue = jax.default_backend() == "tpu"
        stem, n_folded = build_folded_stem(
            enc_params["cnn"], enc_stats["cnn"], m.nb_filters,
            tuple(tuple(p) for p in m.pooling), activation=m.activation,
            n_mels=cfg.audio.n_mels, dtype=dtype,
            fused_epilogue=use_fused_epilogue)
        rest = _RestCNN(cfg, start=n_folded, dtype=dtype)
        rest_params = {k: v for k, v in enc_params["cnn"].items()
                       if int(k.replace("block", "")) >= n_folded}
        rest_stats = {k: v for k, v in enc_stats["cnn"].items()
                      if int(k.replace("block", "")) >= n_folded}
        rnn = BidirectionalGRU(m.n_rnn_cell, m.n_layers_rnn,
                               m.dropout_recurrent, unroll=m.rnn_unroll,
                               dtype=dtype)

        def forward(audio):
            mel = fe._forward(audio, log=True)[..., None]
            h = stem(mel)
            h = rest.apply({"params": rest_params,
                            "batch_stats": rest_stats}, h)
            h = jnp.squeeze(h, axis=2)
            h = rnn.apply({"params": enc_params["rnn"]}, h)
            strong, weak = modules.predictor.apply(pred_vars, h,
                                                   train=False)
            return strong, weak

        return forward
    if fused:
        stem_fn = (fused_stem_block if stem_impl == "pallas"
                   else reference_stem_block)
        folded = fold_block0_params(enc_params["cnn"]["block0"],
                                    enc_stats["cnn"]["block0"])
        rest = _RestCNN(cfg)
        rest_params = {k: v for k, v in enc_params["cnn"].items()
                       if k != "block0"}
        rest_stats = {k: v for k, v in enc_stats["cnn"].items()
                      if k != "block0"}

        from bsed_tpu.models.rnn import BidirectionalGRU
        rnn = BidirectionalGRU(cfg.model.n_rnn_cell, cfg.model.n_layers_rnn,
                               cfg.model.dropout_recurrent,
                               unroll=cfg.model.rnn_unroll)

        def forward(audio):
            mel = fe._forward(audio, log=True)[..., None]
            h = stem_fn(mel, folded)
            h = rest.apply({"params": rest_params,
                            "batch_stats": rest_stats}, h)
            h = jnp.squeeze(h, axis=2)
            h = rnn.apply({"params": enc_params["rnn"]}, h)
            strong, weak = modules.predictor.apply(pred_vars, h,
                                                   train=False)
            return strong, weak
    else:
        def forward(audio):
            mel = fe._forward(audio, log=True)[..., None]
            enc, _ = modules.encoder.apply(
                {"params": enc_params, "batch_stats": enc_stats}, mel,
                train=False)
            strong, weak = modules.predictor.apply(pred_vars, enc,
                                                   train=False)
            return strong, weak

    return forward


def predict_long_recording(forward: Callable, audio, cfg: Config,
                           batch_size: int = 32, hop_seconds: float = None):
    """Sound-event inference over an arbitrarily long recording.

    The reference handles long ENA field recordings offline by chopping
    into fixed 10 s windows (preprocess.py:196) — here the same windowing
    runs at inference time: the recording is segmented into clip windows
    (optionally overlapping), batched through the jitted ``forward``, and
    the frame posteriors are re-assembled on a global timeline (overlaps
    averaged). Returns (strong (T_total, C), frame_seconds).
    """
    import numpy as np

    sr = cfg.audio.sr
    clip = cfg.audio.n_samples
    hop = int((hop_seconds or cfg.audio.max_len_seconds) * sr)
    audio = np.asarray(audio, np.float32)
    if len(audio) < clip:
        audio = np.pad(audio, (0, clip - len(audio)))
    starts = list(range(0, max(len(audio) - clip, 0) + 1, hop))
    if starts[-1] + clip < len(audio):
        starts.append(len(audio) - clip)
    windows = np.stack([audio[s:s + clip] for s in starts])

    frames_per_clip = cfg.n_frames
    sec_per_frame = cfg.model.pooling_time_ratio / (sr / cfg.audio.hop_size)
    total_frames = int(np.ceil(
        (starts[-1] / sr) / sec_per_frame)) + frames_per_clip
    acc = np.zeros((total_frames, cfg.nclass), np.float64)
    cnt = np.zeros((total_frames, 1), np.float64)

    for i in range(0, len(windows), batch_size):
        chunk = windows[i:i + batch_size]
        pad = 0
        if len(chunk) < batch_size and len(windows) > batch_size:
            pad = batch_size - len(chunk)
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        strong, _ = forward(jnp.asarray(chunk))
        strong = np.asarray(strong)
        if pad:
            strong = strong[:-pad]
        for j, s in enumerate(starts[i:i + len(strong)]):
            f0 = int(round((s / sr) / sec_per_frame))
            acc[f0:f0 + frames_per_clip] += strong[j]
            cnt[f0:f0 + frames_per_clip] += 1.0
    covered = cnt[:, 0] > 0
    last = int(np.nonzero(covered)[0][-1]) + 1
    acc, cnt, covered = acc[:last], cnt[:last], covered[:last]
    acc[covered] /= cnt[covered]
    # frame index == global time index: interior frames no window covered
    # (hop_seconds > clip length) stay ZERO posteriors — compacting them
    # out would shift every later event's reported time earlier
    return acc.astype(np.float32), sec_per_frame


def make_sharded_forward(cfg: Config, modules: TrainModules, params: Dict,
                         batch_stats: Dict, mesh,
                         precision: str = "high") -> Callable:
    """Data-parallel serving over a device mesh.

    The reference serves on one GPU (SURVEY.md §2.3); here the whole
    audio→mel→CRNN→posterior program runs SPMD over ``mesh`` via
    ``shard_map``: the batch is sharded on the data axis, parameters are
    replicated, and the body needs ZERO collectives — the pipeline is
    embarrassingly parallel over clips, so throughput scales linearly over
    ICI with no cross-chip traffic. shard_map (not bare GSPMD sharding
    constraints) is deliberate: each device runs the full per-shard
    program — including the fused Pallas mel kernel, which partitions by
    construction under shard_map instead of relying on the partitioner's
    treatment of custom calls.

    Returns ``forward(audio (B, n_samples)) -> (strong, weak)`` with B
    divisible by the mesh size; shard the input with
    ``parallel.mesh.shard_batch`` (or hand it host-local shards under
    multi-host via ``host_local_batch``).
    """
    from jax.sharding import PartitionSpec as P

    from bsed_tpu.parallel.mesh import batch_sharding, replicate

    params = replicate(mesh, params)
    batch_stats = replicate(mesh, batch_stats)
    fwd = make_fast_forward(cfg, modules, params, batch_stats,
                            precision=precision)
    # check_vma off: the body is collective-free by design, and the GRU
    # scan's carry starts replicated (zeros from closed-over params) before
    # turning device-varying — the VMA checker would demand a pcast
    sharded = jax.shard_map(fwd, mesh=mesh, in_specs=P("data"),
                            out_specs=P("data"), check_vma=False)
    shard = batch_sharding(mesh)
    return jax.jit(sharded, in_shardings=shard, out_shardings=shard)
