"""Prediction heads over the (B, 313, 256) encoder output.

References:
  * Predictor:   /root/reference/src/models/CRNN_GRL.py:430-460
                 (twin /root/reference/src/models/CRNN.py:548-577)
  * Predictor_2: /root/reference/src/models/CRNN_GRL.py:391-428

``strong`` is a sigmoid frame posterior (B, T, nclass); ``weak`` is the
attention-pooled clip posterior: softmax over the CLASS axis of a second
dense head, clamped to [1e-7, 1], then sum(strong·sof)/sum(sof) over time.
With ``inference=True`` the strong posterior is gated by (weak > 0.5),
broadcast over frames (CRNN_GRL.py:452-457).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from bsed_tpu.models.init import normal_init


def _attention_pool(strong, sof_logits):
    sof = nn.softmax(sof_logits, axis=-1)     # over class axis (dim=-1)
    sof = jnp.clip(sof, 1e-7, 1.0)
    return (strong * sof).sum(axis=1) / sof.sum(axis=1)


def _inference_gate(strong, weak):
    gate = (weak > 0.5).astype(strong.dtype)[:, None, :]
    return strong * gate


class Predictor(nn.Module):
    nclass: int = 20
    attention: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, inference: bool = False):
        strong = nn.sigmoid(
            nn.Dense(self.nclass, kernel_init=normal_init(0.01),
                     name="dense")(x))
        if self.attention:
            sof_logits = nn.Dense(self.nclass, kernel_init=normal_init(0.01),
                                  name="dense_softmax")(x)
            weak = _attention_pool(strong, sof_logits)
        else:
            weak = strong.mean(axis=1)
        if inference:
            strong = _inference_gate(strong, weak)
        return strong, weak


class Predictor2(nn.Module):
    """4-layer MLP variant (no inter-layer nonlinearity in the reference —
    faithfully reproduced: dense1..dense4 are chained linearly)."""
    nclass: int = 20
    attention: bool = True
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, inference: bool = False):
        h = nn.Dense(64, kernel_init=normal_init(0.01), name="dense1")(x)
        h = nn.Dense(128, kernel_init=normal_init(0.01), name="dense2")(h)
        h = nn.Dense(64, kernel_init=normal_init(0.01), name="dense3")(h)
        strong = nn.sigmoid(
            nn.Dense(self.nclass, kernel_init=normal_init(0.01),
                     name="dense4")(h))
        if self.attention:
            sof_logits = nn.Dense(self.nclass, kernel_init=normal_init(0.01),
                                  name="dense_softmax")(x)
            weak = _attention_pool(strong, sof_logits)
        else:
            weak = strong.mean(axis=1)
        if inference:
            strong = _inference_gate(strong, weak)
        return strong, weak
