"""ops/pooling.py: strided-slice average pooling must reproduce
flax nn.avg_pool (stride=window, VALID) on every window the model family
uses (reference AvgPool2d configs: [2,2], [1,2], [2,1] — CNN.py:62-66)."""
import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

from bsed_tpu.ops.pooling import avg_pool, fast_avg_pool


@pytest.mark.parametrize("window", [(2, 2), (1, 2), (2, 1), (4, 2), (1, 1)])
@pytest.mark.parametrize("shape", [(3, 10, 8, 5), (2, 1255, 128, 1),
                                   (1, 7, 9, 4)])  # odd extents → VALID trim
def test_matches_flax_avg_pool(window, shape):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                    jnp.float32)
    got = avg_pool(x, window)
    want = nn.avg_pool(x, window_shape=window, strides=window,
                       padding="VALID") if window != (1, 1) else x
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("window", [(2, 1), (1, 2)])
def test_single_axis_window2_bit_exact(window):
    # one axis, two taps: (a+b)/2 has a single possible association and
    # /2 is an exact exponent shift → bit-identical to reduce_window.
    # (2-D windows like (2,2) differ from reduce_window in accumulation
    # ORDER and may be off by an ulp — covered by the allclose test.)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 64, 32, 8)),
                    jnp.float32)
    got = fast_avg_pool(x, window)
    want = nn.avg_pool(x, window_shape=window, strides=window,
                       padding="VALID")
    assert (np.asarray(got) == np.asarray(want)).all()


def test_non_pow2_falls_back():
    x = jnp.ones((2, 9, 9, 3))
    got = avg_pool(x, (3, 3))
    want = nn.avg_pool(x, window_shape=(3, 3), strides=(3, 3),
                       padding="VALID")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_bf16_dtype_preserved():
    x = jnp.ones((2, 8, 8, 4), jnp.bfloat16)
    assert fast_avg_pool(x, (2, 2)).dtype == jnp.bfloat16
