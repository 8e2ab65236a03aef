"""Building-block layers for the CRNN family (NHWC, TPU-native layout).

Reference topology: /root/reference/src/models/CNN.py. The reference works in
NCHW (torch); here everything is NHWC so channels sit on the TPU lane
dimension and convolutions/denses map directly onto the MXU without
transposes.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from bsed_tpu.models.init import bn_scale_init, normal_init, xavier_uniform_gain


class GLU(nn.Module):
    """Gated linear unit variant used by the reference (CNN.py:5-16):
    ``Linear(x) * sigmoid(x)`` with the linear map over the channel axis."""
    features: int

    @nn.compact
    def __call__(self, x):
        lin = nn.Dense(self.features, kernel_init=normal_init(0.01),
                       name="linear")(x)
        return lin * nn.sigmoid(x)


class ContextGating(nn.Module):
    """CNN.py:19-30: ``x * sigmoid(Linear(x))``."""
    features: int

    @nn.compact
    def __call__(self, x):
        lin = nn.Dense(self.features, kernel_init=normal_init(0.01),
                       name="linear")(x)
        return x * nn.sigmoid(lin)


def activation_layer(name: str, features: int):
    name = name.lower()
    if name == "glu":
        return GLU(features)
    if name == "cg":
        return ContextGating(features)
    if name == "relu":
        return nn.relu
    if name == "leakyrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"unknown activation {name}")


class ConvBlock(nn.Module):
    """conv3x3(s1,p1) → BatchNorm(eps 1e-3, torch momentum 0.99) → activation
    → dropout → avg-pool, one block of the 7-block stack (CNN.py:43-67)."""
    features: int
    pooling: Tuple[int, int]
    activation: str = "glu"
    dropout: float = 0.5
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=(1, 1),
                    padding=((1, 1), (1, 1)),
                    kernel_init=xavier_uniform_gain(),
                    name="conv")(x)
        # torch momentum 0.99 → flax momentum 0.01 (flax: ra = m*ra + (1-m)*b)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.01,
                         epsilon=1e-3, scale_init=bn_scale_init,
                         name="bn")(x)
        act = activation_layer(self.activation, self.features)
        x = act(x) if not isinstance(act, nn.Module) else act(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.pooling != (1, 1):
            x = nn.avg_pool(x, window_shape=self.pooling,
                            strides=self.pooling, padding="VALID")
        return x


def time_interp_matrix(in_len: int, out_len: int, dtype=jnp.float32):
    """Precomputed 1-D linear interpolation matrix with align_corners=True,
    matching torch ``nn.Upsample(mode='bilinear', align_corners=True)`` on a
    (T, 1) map (CRNN.py:280-281). Upsampling becomes a single (out, in) @
    (in, C) matmul — MXU work instead of a gather."""
    import numpy as np
    w = np.zeros((out_len, in_len), dtype=np.float64)
    if out_len == 1:
        w[0, 0] = 1.0
    else:
        scale = (in_len - 1) / (out_len - 1)
        for j in range(out_len):
            pos = j * scale
            i0 = int(np.floor(pos))
            i1 = min(i0 + 1, in_len - 1)
            frac = pos - i0
            w[j, i0] += 1.0 - frac
            w[j, i1] += frac
    return jnp.asarray(w, dtype=dtype)
