"""ops/gru_kernel.py: the Pallas recurrence must match the lax.scan path
(models/rnn._gru_scan_bidir) exactly — same contract, bit-identical f32
math (interpret mode on CPU exercises the identical arithmetic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsed_tpu.models.rnn import _gru_scan_bidir
from bsed_tpu.ops.gru_kernel import gru_bidir_recurrence


@pytest.mark.parametrize("t", [77, 313, 32])   # non-divisible + exact tiles
def test_matches_scan_f32(t):
    rng = np.random.default_rng(0)
    b, h = 8, 128
    xp2 = jnp.asarray(rng.standard_normal((2, b, t, 3 * h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 3 * h, h)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((2, 3 * h)) * 0.1, jnp.float32)
    ref = _gru_scan_bidir(xp2, w, bias)
    got = gru_bidir_recurrence(xp2, w, bias)
    assert got.shape == ref.shape == (2, b, t, h)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_bf16_close_to_f32_scan():
    rng = np.random.default_rng(1)
    b, t, h = 8, 64, 128
    xp2 = jnp.asarray(rng.standard_normal((2, b, t, 3 * h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 3 * h, h)) * 0.1, jnp.float32)
    bias = jnp.zeros((2, 3 * h), jnp.float32)
    ref = _gru_scan_bidir(xp2, w, bias)
    got = gru_bidir_recurrence(xp2.astype(jnp.bfloat16),
                               w.astype(jnp.bfloat16),
                               bias.astype(jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=3e-2)
