"""Functional train state: everything the reference keeps as mutable module
/optimizer/EMA objects (main_baseline.py:895-971 checkpoint dict) expressed
as one pytree that flows through the jitted step and checkpoints via orbax.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any                      # {'encoder': ..., 'predictor': ...}
    batch_stats: Any                 # {'encoder': ...}
    opt_state: Any                   # main optimizer (encoder + predictor)
    # mean-teacher twins (state-dict EMA incl. batch stats)
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None
    # adversarial adaptation
    disc_params: Optional[Any] = None
    disc_batch_stats: Optional[Any] = None
    disc_opt_state: Optional[Any] = None
    enc_opt_state: Optional[Any] = None   # aux encoder-only optimizer
