"""Learning-rate schedule.

Reference: /root/reference/src/main_baseline.py:53-88 —
  lr = rampup_value · rampdown_value · max_lr, with
  rampup_value = sigmoid_rampdown(epoch, 30) and an extra halving
  0.5^(1 + (epoch−100)//20) past epoch 100. With cfg.adjust_lr=False (the
  default, config.py:97) the lr is simply the constant
  default_learning_rate.

The reference's "aux optimizers at lr × 0.1" block (main_baseline.py:80-88)
is DEAD in every live path and is intentionally NOT reproduced here:
main_baseline.py:292 calls adjust_learning_rate with optimizer_d=None, and
the scmt/origin/ada family imports data/config.py with adjust_lr=False
(config.py:97) so the call never fires — aux optimizers keep their constant
construction lr (see config.py DAConfig.aux_lr_factor provenance note).
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
