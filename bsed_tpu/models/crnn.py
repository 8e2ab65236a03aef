"""CRNN encoder family.

References:
  * CRNN:      /root/reference/src/models/CRNN.py:178-240
               (twin /root/reference/src/models/CRNN_GRL.py:142-204)
  * CRNN_fpn:  /root/reference/src/models/CRNN.py:243-337
               (twin CRNN_GRL.py:293-389)
  * CRNN_pred: /root/reference/src/models/CRNN_GRL.py:206-290 (the second
               model of the dual-CRNN self-training experiment — conv stack
               output sigmoided directly, RNN bypassed)
  * CRNN_DA:   /root/reference/src/models/CRNN.py:113-174 (CRNN with a
               built-in GRL frame discriminator)

All encoders take NHWC input (B, T=1255, F=128, C=1) and return
``(encoded, d_input)`` where encoded == d_input == (B, 313, 256), matching
the reference's forward contract.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from bsed_tpu.config import ModelConfig
from bsed_tpu.models.cnn import CNN, CNNFPN
from bsed_tpu.models.init import normal_init
from bsed_tpu.models.layers import time_interp_matrix
from bsed_tpu.models.rnn import BidirectionalGRU
from bsed_tpu.ops.dropout import FastDropout


def _cnn_kwargs(cfg: ModelConfig) -> dict:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    return dict(nb_filters=tuple(cfg.nb_filters),
                pooling=tuple(tuple(p) for p in cfg.pooling),
                activation=cfg.activation, dropout=cfg.dropout,
                kernel=cfg.kernel_size, dtype=dtype)


class CRNN(nn.Module):
    """CNN → squeeze freq → BiGRU → dropout; returns (x, d_input)."""
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = CNN(**_cnn_kwargs(self.cfg), name="cnn")(x, train=train)
        # (B, T', 1, C) → (B, T', C)
        x = jnp.squeeze(x, axis=2)
        x = BidirectionalGRU(self.cfg.n_rnn_cell, self.cfg.n_layers_rnn,
                             self.cfg.dropout_recurrent,
                             unroll=self.cfg.rnn_unroll,
                             dtype=_cnn_kwargs(self.cfg)["dtype"],
                             name="rnn")(x, train=train)
        x = FastDropout(self.cfg.dropout, deterministic=not train)(x)
        return x, x


class CRNNFPN(nn.Module):
    """Feature-pyramid CRNN: three parallel BiGRUs over 313/156/78-frame
    maps, coarse paths bilinearly upsampled (align_corners=True, realized as
    precomputed interpolation matmuls) and fused by 1×1 convs."""
    cfg: ModelConfig = ModelConfig()
    n_frames: int = 313

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        x, x_2, x_4 = CNNFPN(**_cnn_kwargs(cfg), name="cnn")(x, train=train)
        t_full = x.shape[1]
        t_2, t_4 = x_2.shape[1], x_4.shape[1]

        def run_rnn(h, name):
            h = jnp.squeeze(h, axis=2)
            h = BidirectionalGRU(cfg.n_rnn_cell, cfg.n_layers_rnn,
                                 cfg.dropout_recurrent,
                                 unroll=cfg.rnn_unroll,
                                 dtype=_cnn_kwargs(cfg)["dtype"],
                                 name=name)(h, train=train)
            return FastDropout(cfg.dropout, deterministic=not train)(h)

        x = run_rnn(x, "rnn")        # (B, 313, 256)
        x_2 = run_rnn(x_2, "rnn_2")  # (B, 156, 256)
        x_4 = run_rnn(x_4, "rnn_4")  # (B, 78, 256)

        up_4 = time_interp_matrix(t_4, t_2)      # (156, 78)
        up_2 = time_interp_matrix(t_2, t_full)   # (313, 156)

        x_4_up = jnp.einsum("st,btc->bsc", up_4, x_4,
                            preferred_element_type=jnp.float32)
        x_2 = nn.Dense(2 * cfg.n_rnn_cell, kernel_init=normal_init(0.01),
                       name="fuse_2")(jnp.concatenate([x_2, x_4_up], axis=-1))
        x_2_up = jnp.einsum("st,btc->bsc", up_2, x_2,
                            preferred_element_type=jnp.float32)
        x = nn.Dense(2 * cfg.n_rnn_cell, kernel_init=normal_init(0.01),
                     name="fuse_4")(jnp.concatenate([x, x_2_up], axis=-1))
        return x, x


class CRNNPred(nn.Module):
    """Dual-CRNN second model (CRNN_GRL.py:206-290): the conv-stack features
    are sigmoided directly as strong predictions; attention head pools them
    to a weak prediction. Note the conv output width must equal nclass*…:
    the reference sigmoids the full 128-d feature as 'strong' — we preserve
    that contract (strong has cnn-channel width, not nclass)."""
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x, train: bool = False, inference: bool = False):
        cfg = self.cfg
        x = CNN(**_cnn_kwargs(cfg), name="cnn")(x, train=train)
        if x.shape[2] != 1:
            # freq axis not fully pooled: flatten chan·freq per frame, the
            # torch forward's `freq != 1` branch (CRNN_GRL.py:256-258)
            x = x.reshape(x.shape[0], x.shape[1], -1)
        else:
            x = jnp.squeeze(x, axis=2)                  # (B, T', C)
        strong = nn.sigmoid(x)
        sof = nn.Dense(cfg.nclass, kernel_init=normal_init(0.01),
                       name="dense_softmax")(x)
        sof = nn.softmax(sof, axis=-1)
        sof = jnp.clip(sof, 1e-7, 1.0)
        weak = (strong[..., :cfg.nclass] * sof).sum(axis=1) / sof.sum(axis=1)
        if inference:
            gate = (weak > 0.5).astype(strong.dtype)[:, None, :]
            strong = strong[..., :cfg.nclass] * gate
        return strong, weak


class EncodedCRNNPred(nn.Module):
    """CRNN_pred used as a prediction HEAD over the first CRNN's (B, T, 256)
    encoding — the dual-CRNN experiment's second model
    (main_scmt_ada_weak_seperate_2_crnn.py:673-687,819). The reference's own
    alternate wiring is commented out and shape-broken (its dense_softmax
    expects a 20-d input that the conv stack never produces); this realizes
    the design with a conv stack whose pooling fully reduces the 256-wide
    feature axis and whose last filter bank equals nclass."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, train: bool = False, inference: bool = False):
        return CRNNPred(self.cfg, name="crnn_pred")(x[..., None], train=train,
                                                    inference=inference)


class CRNNDA(nn.Module):
    """CRNN with a built-in gradient-reversed frame discriminator
    (/root/reference/src/models/CRNN.py:113-174): forward returns
    ``(encoded, d_input, domain_pred)``."""
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x, train: bool = False, grl_coeff: float = 1.0):
        from bsed_tpu.models.discriminators import FrameDiscriminatorGRL

        x, d_input = CRNN(self.cfg, name="crnn")(x, train=train)
        domain_pred = FrameDiscriminatorGRL(dropout=0.5,
                                            name="discriminator")(
            d_input, train=train, grl_coeff=grl_coeff)
        return x, d_input, domain_pred


def make_encoder(cfg: ModelConfig, n_frames: int = 313) -> nn.Module:
    return CRNNFPN(cfg, n_frames=n_frames) if cfg.use_fpn else CRNN(cfg)
