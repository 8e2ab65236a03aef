"""Domain discriminators for adversarial adaptation.

References:
  * Frame_Discriminator (GRL flavor, 2-way sigmoid MLP with built-in
    gradient reversal):      /root/reference/src/models/CRNN.py:91-112
  * Frame_Discriminator (plain 1-way sigmoid MLP, LeakyReLU):
                             /root/reference/src/models/CRNN_GRL.py:116-140
  * Clip_Discriminator (softmax 2-way): /root/reference/src/models/CRNN.py:16-51
  * Clip_Discriminator (sigmoid 1-way): /root/reference/src/models/CRNN_GRL.py:16-53

The clip discriminators treat the (B, 313, 256) encoding as a 1-channel
image (B, 256, 313, 1 in torch NCHW; here NHWC (B, 256, 313, 1)→conv stack)
with five stride-2 valid convs + BN + LeakyReLU(0.2), adaptive-avg-pooled to
(2, 1) and flattened to 16 features.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from bsed_tpu.models.init import bn_scale_init, normal_init
from bsed_tpu.models.layers import TorchBatchNorm
from bsed_tpu.ops.grl import grad_reverse
from bsed_tpu.ops.dropout import FastDropout


class FrameDiscriminatorGRL(nn.Module):
    """input_dim → 1024 → 1024 → n_out, ReLU+dropout, sigmoid output,
    optional gradient reversal at the input (CRNN.py:91-112).

    ``apply_grl=False`` when the surrounding loss applies its own
    grad_reverse (DANN/CDAN) or uses explicit alternating updates (ADDA) —
    stacking two reversals would cancel and invert the adversarial
    objective."""
    dropout: float = 0.5
    n_out: int = 2
    apply_grl: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, grl_coeff: float = 1.0):
        if self.apply_grl:
            x = grad_reverse(x, grl_coeff)
        x = nn.relu(nn.Dense(1024, kernel_init=normal_init(0.01),
                             name="dense_d_1")(x))
        x = FastDropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(1024, kernel_init=normal_init(0.01),
                             name="dense_d_2")(x))
        x = FastDropout(self.dropout, deterministic=not train)(x)
        return nn.sigmoid(nn.Dense(self.n_out, kernel_init=normal_init(0.01),
                                   name="dense_d_3")(x))


class FrameDiscriminator(nn.Module):
    """256 → 128 → 32 → 1 sigmoid, LeakyReLU(0.2) (CRNN_GRL.py:116-140).
    No gradient reversal — used with explicit alternating updates."""
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.leaky_relu(nn.Dense(128, kernel_init=normal_init(0.01),
                                   name="dense_d_1")(x), 0.2)
        x = FastDropout(self.dropout, deterministic=not train)(x)
        x = nn.leaky_relu(nn.Dense(32, kernel_init=normal_init(0.01),
                                   name="dense_d_2")(x), 0.2)
        x = FastDropout(self.dropout, deterministic=not train)(x)
        return nn.sigmoid(nn.Dense(1, kernel_init=normal_init(0.01),
                                   name="dense_d_3")(x))


class _ClipConvStack(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, C_feat) → treat features as image rows: (B, C_feat, T, 1)
        x = jnp.swapaxes(x, 1, 2)[..., None]
        for i, feats in enumerate((128, 64, 32, 16, 8)):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), padding="VALID",
                        kernel_init=normal_init(0.01),
                        name=f"conv_{i + 1}")(x)
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, scale_init=bn_scale_init,
                             name=f"bn_{i + 1}")(x)
            x = nn.leaky_relu(x, 0.2)
        # adaptive avg-pool to (2, 1): torch AdaptiveAvgPool2d segments are
        # rows [floor(i*h/2), ceil((i+1)*h/2)) — they overlap for odd h
        # (the real operating shape ends at h=7)
        b, h, w, c = x.shape
        rows = []
        for i in range(2):
            a = (i * h) // 2
            z = -(-((i + 1) * h) // 2)
            rows.append(x[:, a:z].mean(axis=(1, 2)))          # (B, C)
        x = jnp.stack(rows, axis=1)                           # (B, 2, C)
        return x.reshape(b, 2 * c)                            # (B, 16)


class ClipDiscriminatorSoftmax(nn.Module):
    """Two-way softmax flavor (CRNN.py:16-51)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _ClipConvStack(name="convs")(x, train=train)
        return nn.softmax(nn.Dense(2, kernel_init=normal_init(0.01),
                                   name="dense_d")(h), axis=-1)


class ClipDiscriminator(nn.Module):
    """One-way sigmoid flavor (CRNN_GRL.py:16-53)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _ClipConvStack(name="convs")(x, train=train)
        return nn.sigmoid(nn.Dense(1, kernel_init=normal_init(0.01),
                                   name="dense_d")(h))
