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
    """Blocks 1..N-1 of the CNN stack (block0 is served by the fused
    kernel)."""
    cfg: Config

    @nn.compact
    def __call__(self, x):
        m = self.cfg.model
        for i in range(1, len(m.nb_filters)):
            x = ConvBlock(m.nb_filters[i], tuple(m.pooling[i]),
                          m.activation, m.dropout, m.kernel_size,
                          name=f"block{i}")(x, train=False)
        return x


def make_fast_forward(cfg: Config, modules: TrainModules, params: Dict,
                      batch_stats: Dict, use_fused_stem: bool = False,
                      stem_impl: str = "pallas",
                      precision: str = "highest") -> Callable:
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

    fe = MelFrontEnd(cfg.audio, precision=precision)
    enc_params = params["encoder"]
    enc_stats = batch_stats["encoder"]

    fused = (use_fused_stem and not cfg.model.use_fpn
             and cfg.model.activation == "glu"
             and cfg.audio.n_mels == 128)
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
                               cfg.model.dropout_recurrent)

        def forward(audio):
            mel = fe._forward(audio, log=True)[..., None]
            h = stem_fn(mel, folded)
            h = rest.apply({"params": rest_params,
                            "batch_stats": rest_stats}, h)
            h = jnp.squeeze(h, axis=2)
            h = rnn.apply({"params": enc_params["rnn"]}, h)
            strong, weak = modules.predictor.apply(
                {"params": params["predictor"]}, h, train=False)
            return strong, weak
    else:
        def forward(audio):
            mel = fe._forward(audio, log=True)[..., None]
            enc, _ = modules.encoder.apply(
                {"params": enc_params, "batch_stats": enc_stats}, mel,
                train=False)
            strong, weak = modules.predictor.apply(
                {"params": params["predictor"]}, enc, train=False)
            return strong, weak

    return forward
