"""Building-block layers for the CRNN family (NHWC, TPU-native layout).

Reference topology: /root/reference/src/models/CNN.py. The reference works in
NCHW (torch); here everything is NHWC so channels sit on the TPU lane
dimension and convolutions/denses map directly onto the MXU without
transposes.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bsed_tpu.models.init import bn_scale_init, normal_init, xavier_uniform_gain
from bsed_tpu.ops.dropout import FastDropout
from bsed_tpu.ops.pooling import avg_pool as pool_avg


class GLU(nn.Module):
    """Gated linear unit variant used by the reference (CNN.py:5-16):
    ``Linear(x) * sigmoid(x)`` with the linear map over the channel axis."""
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        lin = nn.Dense(self.features, kernel_init=normal_init(0.01),
                       dtype=self.dtype, name="linear")(x)
        return lin * nn.sigmoid(x)


class ContextGating(nn.Module):
    """CNN.py:19-30: ``x * sigmoid(Linear(x))``."""
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        lin = nn.Dense(self.features, kernel_init=normal_init(0.01),
                       dtype=self.dtype, name="linear")(x)
        return x * nn.sigmoid(lin)


def activation_layer(name: str, features: int, dtype=None):
    name = name.lower()
    if name == "glu":
        return GLU(features, dtype=dtype)
    if name == "cg":
        return ContextGating(features, dtype=dtype)
    if name == "relu":
        return nn.relu
    if name == "leakyrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"unknown activation {name}")


class SmallChannelConv3x3(nn.Module):
    """3×3 same-padding conv computed as 9 shifted channel-matmul
    accumulations instead of lax.conv.

    Measured in ISOLATION this beats XLA's conv lowering for ≤16 input
    channels (6.7 ms → 2.9 ms for the 1→16 stem at (32,1255,128); 2e-6 max
    abs difference). Measured in the FUSED end-to-end program it is ~10%
    slower (XLA fuses conv+BN+GLU better around the native conv), so
    ConvBlock keeps the native conv by default — this module stays for
    standalone small-channel conv uses. Parameter names and shapes are
    identical to nn.Conv ('kernel' (3,3,in,out), 'bias') so checkpoints are
    interchangeable."""
    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", xavier_uniform_gain(),
                       (3, 3, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, wdt = x.shape[1], x.shape[2]
        out = None
        for dt in range(3):
            for df in range(3):
                xs = jax.lax.slice(
                    xp, (0, dt, df, 0),
                    (x.shape[0], dt + h, df + wdt, cin))
                contrib = jnp.einsum(
                    "bhwc,co->bhwo", xs, w[dt, df],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                out = contrib if out is None else out + contrib
        return out + b


class TorchBatchNorm(nn.Module):
    """Batch normalization with torch-exact running-stat semantics.

    flax's ``nn.BatchNorm`` accumulates the running variance with the BIASED
    batch variance; torch normalizes with the biased variance but accumulates
    the UNBIASED one (× n/(n−1) — torch ``_BatchNorm.forward`` →
    ``F.batch_norm`` with ``training=True``). At the small per-channel element
    counts of the late conv blocks ((B, T', 1, C) → n = B·T' = 256 at the
    flagship shapes) the factor is ~0.4% — a systematic running-var error in
    every exported checkpoint relative to the reference
    (/root/reference/src/models/CNN.py:43-67 BatchNorm2d). This module
    reproduces torch's update rule exactly; batch statistics are always
    computed in float32 regardless of the compute dtype.

    Interface and tree layout match ``nn.BatchNorm`` ('scale'/'bias' params,
    'mean'/'var' in the ``batch_stats`` collection; ``momentum`` uses the
    FLAX convention ra = m·ra + (1−m)·batch, so torch momentum 0.99 ≡ 0.01
    here), making it a drop-in replacement — checkpoints and torch_compat
    are unchanged."""
    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: object = None
    scale_init: object = nn.initializers.ones

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", self.scale_init, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                corr = n / (n - 1) if n > 1 else 1.0
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * corr)
        dt = self.dtype or x.dtype
        inv = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(dt)
        return (x.astype(dt) - mean.astype(dt)) * inv + bias.astype(dt)


class ConvBlock(nn.Module):
    """conv3x3(s1,p1) → BatchNorm(eps 1e-3, torch momentum 0.99) → activation
    → dropout → avg-pool, one block of the 7-block stack (CNN.py:43-67)."""
    features: int
    pooling: Tuple[int, int]
    activation: str = "glu"
    dropout: float = 0.5
    kernel: int = 3
    # computation dtype (params stay fp32): jnp.bfloat16 roughly halves the
    # conv stack's time on v5e (measured 20.2 -> 12.4 ms at batch 32) at the
    # cost of ~1e-2-level activation error — opt-in for serving/training
    # throughput, NOT for the reference-parity path
    dtype: object = None

    use_shift_conv: bool = False   # see SmallChannelConv3x3 docstring

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_shift_conv and self.kernel == 3 and x.shape[-1] <= 16:
            x = SmallChannelConv3x3(self.features, name="conv")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(1, 1), padding=((1, 1), (1, 1)),
                        kernel_init=xavier_uniform_gain(),
                        dtype=self.dtype, name="conv")(x)
        # torch momentum 0.99 → flax momentum 0.01 (flax: ra = m*ra + (1-m)*b)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.01,
                           epsilon=1e-3, scale_init=bn_scale_init,
                           dtype=self.dtype, name="bn")(x)
        act = activation_layer(self.activation, self.features, self.dtype)
        x = act(x) if not isinstance(act, nn.Module) else act(x)
        x = FastDropout(self.dropout, deterministic=not train)(x)
        if self.pooling != (1, 1):
            x = pool_avg(x, self.pooling)
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
