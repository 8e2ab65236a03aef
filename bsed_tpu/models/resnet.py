"""Weak audio-tagging CNNs: ResNet-18 and VGG-ish tagger.

Reference: /root/reference/src/audio_tagging_system_cnn.py:50-79 —
``Net_resnet`` (torchvision resnet18 with the first conv rebuilt for
1-channel input, fc → 20, sigmoid) and ``Net_vgg`` (vgg11-bn features,
1-channel stem, classifier → 20, sigmoid). Implemented natively in flax
(NHWC); the ImageNet-pretrained weights the reference loads are not
available offline, so both start from standard inits (capability parity:
same topology, same training recipe).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from bsed_tpu.models.layers import TorchBatchNorm
from bsed_tpu.ops.dropout import FastDropout


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), self.strides, padding=1,
                    use_bias=False, name="conv1")(x)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (1, 1), padding=1,
                    use_bias=False, name="conv2")(y)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), self.strides,
                               use_bias=False, name="downsample_conv")(x)
            residual = TorchBatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18Tagger(nn.Module):
    """(B, T, F, 1) log-mel → (B, nclass) sigmoid weak posteriors."""
    nclass: int = 20
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="stem_conv")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for s, (n_blocks, feats) in enumerate(
                zip(self.stage_sizes, self.stage_features)):
            for b in range(n_blocks):
                strides = (2, 2) if (b == 0 and s > 0) else (1, 1)
                x = BasicBlock(feats, strides,
                               name=f"layer{s + 1}_block{b}")(x, train=train)
        x = x.mean(axis=(1, 2))                      # global average pool
        x = nn.Dense(self.nclass, name="fc")(x)
        return nn.sigmoid(x)


class VGGTagger(nn.Module):
    """vgg11-bn-style feature stack with a 1-channel stem
    (audio_tagging_system_cnn.py:66-79)."""
    nclass: int = 20
    plan: Sequence = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M",
                      512, 512, "M")

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, spec in enumerate(self.plan):
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(spec, (3, 3), padding=1, name=f"conv{i}")(x)
                x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"bn{i}")(x)
                x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = FastDropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.nclass, name="fc2")(x)
        return nn.sigmoid(x)
