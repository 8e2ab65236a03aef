"""Fused inference stem: folding algebra + Pallas kernel parity vs the
standard flax block, and serve.make_fast_forward parity vs the standard
predict path."""
import numpy as np

import jax
import jax.numpy as jnp

from bsed_tpu.config import AudioConfig, get_config
from bsed_tpu.models.cnn import CNN
from bsed_tpu.ops.stem_kernel import (fold_block0_params, fused_stem_block,
                                      reference_stem_block)
from bsed_tpu.train.steps import build_modules, create_train_state


def _block0_reference(x, params, stats):
    """Standard flax ConvBlock block0 in eval mode."""
    cnn = CNN()
    sub = {"params": {"block0": params}, "batch_stats": {"block0": stats}}

    import flax.linen as nn
    from bsed_tpu.models.layers import ConvBlock

    class OnlyBlock0(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ConvBlock(16, (2, 2), "glu", 0.5, 3, name="block0")(
                x, train=False)

    return OnlyBlock0().apply(sub, x)


def test_folded_stem_matches_flax_block():
    cfg = get_config("baseline")
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    p0 = state.params["encoder"]["cnn"]["block0"]
    s0 = state.batch_stats["encoder"]["cnn"]["block0"]
    # give running stats non-trivial values
    s0 = {"bn": {"mean": 0.1 * jnp.arange(16, dtype=jnp.float32),
                 "var": 1.0 + 0.05 * jnp.arange(16, dtype=jnp.float32)}}

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 100, 128, 1)).astype(np.float32))

    ref = _block0_reference(x, p0, s0)
    folded = fold_block0_params(p0, s0)
    xla = reference_stem_block(x, folded)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(ref), atol=2e-5)

    pallas_out = fused_stem_block(x, folded)
    assert pallas_out.shape == ref.shape == (2, 50, 64, 16)
    np.testing.assert_allclose(np.asarray(pallas_out), np.asarray(ref),
                               atol=2e-5)


def test_fast_forward_matches_standard_path():
    from bsed_tpu.ops.mel import MelFrontEnd
    from bsed_tpu.serve import make_fast_forward

    cfg = get_config("baseline")
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))

    rng = np.random.default_rng(1)
    audio = jnp.asarray(
        rng.standard_normal((2, cfg.audio.n_samples)).astype(np.float32)
        * 0.1)

    fast = make_fast_forward(cfg, modules, state.params, state.batch_stats)
    s_fast, w_fast = fast(audio)

    fe = MelFrontEnd(cfg.audio)
    mel = fe(audio, log=True)[..., None]
    enc, _ = modules.encoder.apply(
        {"params": state.params["encoder"],
         "batch_stats": state.batch_stats["encoder"]}, mel, train=False)
    s_ref, w_ref = modules.predictor.apply(
        {"params": state.params["predictor"]}, enc, train=False)

    np.testing.assert_allclose(np.asarray(s_fast), np.asarray(s_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(w_fast), np.asarray(w_ref),
                               atol=1e-4)
