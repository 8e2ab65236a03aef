"""CNN backbones (NHWC).

Reference: /root/reference/src/models/CNN.py:33-84 (7-block stack) and
/root/reference/src/models/CNN_FPN.py:82-100 (same + two extra time-pooling
stages returning a 313/156/78-frame pyramid).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from bsed_tpu.models.layers import ConvBlock


class CNN(nn.Module):
    """Input (B, T, F, C_in) → (B, T/4, 1, 128) for the default config:
    filters (16,32,64,128,128,128,128), pooling (2,2),(2,2),(1,2)×5."""
    nb_filters: Tuple[int, ...] = (16, 32, 64, 128, 128, 128, 128)
    pooling: Tuple[Tuple[int, int], ...] = (
        (2, 2), (2, 2), (1, 2), (1, 2), (1, 2), (1, 2), (1, 2))
    activation: str = "glu"
    dropout: float = 0.5
    kernel: int = 3
    dtype: object = None     # bf16 opt-in, see ConvBlock

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (f, p) in enumerate(zip(self.nb_filters, self.pooling)):
            x = ConvBlock(f, tuple(p), self.activation, self.dropout,
                          self.kernel, dtype=self.dtype,
                          name=f"block{i}")(x, train=train)
        return x.astype(jnp.float32)


class CNNFPN(nn.Module):
    """CNN plus two extra conv→BN→act→dropout→pool(2,1) stages; returns the
    (full, /2, /4) time-resolution maps (CNN_FPN.py:82-100).

    The reference applies ONE shared conv/BN/GLU block twice (``cnn_fcn`` /
    ``bn_fcn`` / ``glu`` reused at CNN_FPN.py:87-97) — the two pyramid
    stages are weight-tied, which we reproduce by calling a single ConvBlock
    instance twice (its BatchNorm running stats also update twice per
    forward, as in torch)."""
    nb_filters: Tuple[int, ...] = (16, 32, 64, 128, 128, 128, 128)
    pooling: Tuple[Tuple[int, int], ...] = (
        (2, 2), (2, 2), (1, 2), (1, 2), (1, 2), (1, 2), (1, 2))
    activation: str = "glu"
    dropout: float = 0.5
    kernel: int = 3
    dtype: object = None     # bf16 opt-in, see ConvBlock

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (f, p) in enumerate(zip(self.nb_filters, self.pooling)):
            x = ConvBlock(f, tuple(p), self.activation, self.dropout,
                          self.kernel, dtype=self.dtype,
                          name=f"block{i}")(x, train=train)
        down = ConvBlock(self.nb_filters[-1], (2, 1), self.activation,
                         self.dropout, self.kernel, dtype=self.dtype,
                         name="block_down")
        x_2 = down(x, train=train)
        x_4 = down(x_2, train=train)
        return (x.astype(jnp.float32), x_2.astype(jnp.float32),
                x_4.astype(jnp.float32))
