"""ops/dropout.py: the uint8 fast path must be an EXACT Bernoulli(1-rate)
sampler (reference semantics: torch nn.Dropout, CNN.py:60), identical in
expectation and scaling to flax's dropout."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsed_tpu.ops.dropout import FastDropout, _u8_threshold, dropout, keep_mask


def test_u8_threshold_grid():
    assert _u8_threshold(0.5) == 128
    assert _u8_threshold(0.75) == 192
    assert _u8_threshold(1 / 256) == 1
    assert _u8_threshold(0.3) is None       # not on the 1/256 grid
    assert _u8_threshold(1.0) is None       # handled by early-outs
    assert _u8_threshold(0.0) is None


@pytest.mark.parametrize("rate", [0.5, 0.25, 0.3])
def test_keep_rate_statistics(rate):
    # 1e6 draws: empirical keep rate within 4 sigma of (1-rate)
    m = keep_mask(jax.random.key(0), (1000, 1000), rate)
    p = float(jnp.mean(m.astype(jnp.float32)))
    sigma = np.sqrt(rate * (1 - rate) / 1e6)
    assert abs(p - (1.0 - rate)) < 4 * sigma


def test_scaling_and_zeros():
    x = jnp.full((64, 64), 2.0, jnp.float32)
    y = dropout(jax.random.key(1), x, 0.5)
    vals = np.unique(np.asarray(y))
    assert set(vals.tolist()) <= {0.0, 4.0}   # inverted scaling by 1/0.5


def test_deterministic_and_rate0_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    assert (dropout(jax.random.key(0), x, 0.5, deterministic=True) == x).all()
    assert (dropout(jax.random.key(0), x, 0.0) == x).all()


def test_same_key_same_mask():
    x = jnp.ones((128, 128))
    a = dropout(jax.random.key(7), x, 0.5)
    b = dropout(jax.random.key(7), x, 0.5)
    assert (a == b).all()


def test_module_matches_functional():
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return FastDropout(0.5, deterministic=False)(x)

    x = jnp.ones((32, 32))
    key = jax.random.key(3)
    out = M().apply({}, x, rngs={"dropout": key})
    # flax folds the stream; reproduce via the same make_rng derivation
    ref = M().apply({}, x, rngs={"dropout": key})
    assert (out == ref).all()
    assert float(jnp.mean((out > 0).astype(jnp.float32))) == pytest.approx(
        0.5, abs=0.1)


def test_bf16_dtype_preserved():
    x = jnp.ones((16, 16), jnp.bfloat16)
    y = dropout(jax.random.key(0), x, 0.5)
    assert y.dtype == jnp.bfloat16


def test_rbg_impl_supported():
    # the train stream uses the TPU hardware RNG (TrainConfig.prng_impl)
    key = jax.random.key(0, impl="rbg")
    m = keep_mask(key, (256, 256), 0.5)
    p = float(jnp.mean(m.astype(jnp.float32)))
    assert abs(p - 0.5) < 0.02
