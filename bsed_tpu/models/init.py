"""Parameter initializers matching the reference's ``weights_init``
(/root/reference/src/utilities/utils.py:40-63):

  * Conv2d:    Xavier-uniform with gain sqrt(2), bias 0
  * BatchNorm: scale ~ N(1, 0.02), bias 0
  * GRU:       orthogonal for weight matrices; biases keep torch's default
               U(-1/sqrt(H), 1/sqrt(H))
  * Linear:    weight ~ N(0, 0.01), bias 0
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def xavier_uniform_gain(gain: float = np.sqrt(2.0)):
    """Xavier-uniform for flax conv kernels (kh, kw, in, out) or dense (in, out)."""
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:
            kh, kw, fan_in, fan_out = shape
            fan_in, fan_out = kh * kw * fan_in, kh * kw * fan_out
        else:
            fan_in, fan_out = shape[0], shape[-1]
        bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def normal_init(stddev: float = 0.01, mean: float = 0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)
    return init


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def orthogonal_blocks(n_blocks: int = 3):
    """Orthogonal init applied per gate block, matching torch's
    nn.init.orthogonal_ on each (3H, D) GRU matrix as one unit."""
    def init(key, shape, dtype=jnp.float32):
        return jax.nn.initializers.orthogonal()(key, shape, dtype)
    return init


def uniform_sqrt_h(hidden: int):
    """torch RNN default: U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / np.sqrt(hidden)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init
