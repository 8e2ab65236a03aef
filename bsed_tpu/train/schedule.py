"""Learning-rate schedule.

Reference: /root/reference/src/main_baseline.py:53-88 —
  lr = rampup_value · rampdown_value · max_lr, with
  rampup_value = sigmoid_rampdown(epoch, 30) and an extra halving
  0.5^(1 + (epoch−100)//20) past epoch 100; discriminator/crnn aux
  optimizers run at lr × 0.1. With cfg.adjust_lr=False (the default,
  config.py:97) the lr is simply the constant default_learning_rate.
"""
from __future__ import annotations

import jax.numpy as jnp

from bsed_tpu.train.ramps import sigmoid_rampdown


def learning_rate(epoch, max_lr: float = 5e-4, adjust: bool = False,
                  rampdown_epochs: int = 30):
    if not adjust:
        return jnp.asarray(max_lr, jnp.float32)
    epoch = jnp.asarray(epoch, jnp.float32)
    lr = sigmoid_rampdown(epoch, rampdown_epochs) * max_lr
    halvings = 1.0 + jnp.floor((epoch - 100.0) / 20.0)
    decay = jnp.where(epoch > 100, 0.5 ** halvings, 1.0)
    return lr * decay
