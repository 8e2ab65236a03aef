"""Train-step tests across the preset flag matrix: finite losses, parameter
motion, EMA tracking, DA branches compile and run."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast core

import jax
import jax.numpy as jnp

from bsed_tpu.config import AudioConfig, get_config
from bsed_tpu.train.steps import (build_modules, create_train_state,
                                  make_predict_fn, make_train_step)

SMALL_AUDIO = AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0)


def small_cfg(preset="baseline", **over):
    cfg = get_config(preset, **over)
    return cfg.replace(audio=SMALL_AUDIO)


def make_batch(cfg, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    bs, br = 4, 4
    t_in, f = cfg.audio.max_frames, cfg.audio.n_mels
    tf, c = cfg.n_frames, cfg.nclass
    batch = {
        "syn": jnp.asarray(np.abs(rng.standard_normal((bs, t_in, f))) + 0.1,
                           jnp.float32),
        "syn_strong": jnp.asarray(
            (rng.random((bs, tf, c)) > 0.9).astype(np.float32)),
        "real": jnp.asarray(np.abs(rng.standard_normal((br, t_in, f))) + 0.1,
                            jnp.float32),
        "real_weak": jnp.asarray(
            (rng.random((br, c)) > 0.8).astype(np.float32)),
    }
    return batch


def _leaf_delta(a, b):
    return max(float(jnp.abs(x - y).max())
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def run_steps(cfg, n=2, batch_extra=None, steps_per_epoch=10):
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    step = make_train_step(modules, steps_per_epoch=steps_per_epoch)
    batch = make_batch(cfg)
    if batch_extra:
        batch.update(batch_extra)
    metrics = None
    for i in range(n):
        state, metrics = step(state, batch, jax.random.key(i + 1),
                              jnp.asarray(i, jnp.float32))
    return state, metrics


def test_supervised_baseline_step():
    cfg = small_cfg("baseline")
    modules = build_modules(cfg)
    state0 = create_train_state(cfg, modules, jax.random.key(0))
    p0 = jax.tree.map(lambda x: x.copy(), state0.params)
    step = make_train_step(modules)
    batch = make_batch(cfg)
    state, metrics = step(state0, batch, jax.random.key(1),
                          jnp.asarray(0.0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) > 0
    assert int(state.step) == 1
    assert _leaf_delta(p0, state.params) > 0
    # supervised-on-SYN: no consistency terms
    assert "consistency_strong" not in metrics


def test_supervised_loss_decreases():
    # epoch 30: the baseline lineage's lr ramp is at its 1e-3 max there
    # (epoch 0 would be ~4e-9 — parameter motion far below dropout noise;
    # the step folds state.step into the key, so masks differ per step)
    cfg = small_cfg("baseline")
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    step = make_train_step(modules)
    batch = make_batch(cfg)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(42),
                              jnp.asarray(30.0))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_mt_isp_step_has_all_terms_and_updates_ema():
    cfg = small_cfg("baseline_mt_isp")
    modules = build_modules(cfg)
    state0 = create_train_state(cfg, modules, jax.random.key(0))
    ema0 = jax.tree.map(lambda x: x.copy(), state0.ema_params)
    step = make_train_step(modules)
    batch = make_batch(cfg)
    state, metrics = step(state0, batch, jax.random.key(1), jnp.asarray(5.0))
    for key in ("weak_class_loss", "strong_class_loss", "consistency_strong",
                "consistency_weak", "weak_freq_shift_class_loss",
                "strong_shift_class_loss", "strong_freq_shift_class_loss",
                "consistency_shift", "consistency_strong_shift",
                "consistency_strong_freq_shift"):
        assert np.isfinite(float(metrics[key])), key
    assert _leaf_delta(ema0, state.ema_params) > 0


def test_adaptation_grl_pre_step_runs():
    cfg = small_cfg("baseline_adaptation")
    state, metrics = run_steps(cfg, n=2)
    assert np.isfinite(float(metrics["domain_loss"]))
    assert float(metrics["domain_loss"]) > 0


def test_adda_alternating_runs():
    import dataclasses
    cfg = small_cfg("scmt")
    # ADDA (like all DA) is active only in the adaptation stage
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                stage="adaptation"))
    state, metrics = run_steps(cfg, n=2)
    assert "domain_loss" in metrics
    assert np.isfinite(float(metrics["loss"]))


def test_adda_inactive_in_pretrain():
    cfg = small_cfg("scmt")
    assert cfg.train.stage == "pretrain"
    state, metrics = run_steps(cfg, n=1)
    assert "domain_loss" not in metrics


def test_cdan_entropy_conditioning_runs():
    import dataclasses
    cfg = small_cfg("pseudo_labeling")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                stage="adaptation"))
    assert cfg.da.entropy_conditioning
    state, metrics = run_steps(cfg, n=1)
    assert np.isfinite(float(metrics["domain_loss"]))


def test_grl_single_reversal_in_dann():
    """The encoder gradient through dann_loss must be REVERSED exactly once
    (a second internal discriminator GRL would cancel it and invert the
    adversarial objective)."""
    import jax
    from bsed_tpu.models.discriminators import FrameDiscriminatorGRL
    from bsed_tpu.train.da import dann_loss

    disc = FrameDiscriminatorGRL(n_out=1, apply_grl=False)
    f = jnp.ones((2, 8))
    params = disc.init({"params": jax.random.key(0)}, f, train=False)

    def apply(h):
        return disc.apply(params, h, train=False)

    def loss_rev(fs, ft):
        return dann_loss(apply, fs, ft, grl_coeff=1.0)

    def loss_fwd(fs, ft):
        # same BCE without the GRL
        import jax.numpy as jnp2
        from bsed_tpu.train.losses import bce
        d = apply(jnp2.concatenate([fs, ft], 0))
        labels = jnp2.concatenate([jnp2.ones((2, 1)), jnp2.zeros((2, 1))])
        return bce(d, labels)

    fs = jnp.ones((2, 8)) * 0.3
    ft = jnp.ones((2, 8)) * 0.7
    g_rev = jax.grad(loss_rev)(fs, ft)
    g_fwd = jax.grad(loss_fwd)(fs, ft)
    np.testing.assert_allclose(np.asarray(g_rev), -np.asarray(g_fwd),
                               atol=1e-7)


def test_sgd_preset_and_pseudo_labels():
    cfg = small_cfg("scmt_ada_weak")
    state, metrics = run_steps(cfg, n=1)
    assert np.isfinite(float(metrics["loss"]))


def test_supervise_on_real():
    cfg = small_cfg("baseline_ena")
    rng = np.random.default_rng(5)
    extra = {"real_strong": jnp.asarray(
        (rng.random((4, cfg.n_frames, cfg.nclass)) > 0.9).astype(np.float32))}
    state, metrics = run_steps(cfg, n=1, batch_extra=extra)
    assert np.isfinite(float(metrics["loss"]))


def test_predict_fn_shapes_and_determinism():
    cfg = small_cfg("baseline")
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    predict = make_predict_fn(modules)
    batch = make_batch(cfg)
    s1, w1 = predict(state.params, state.batch_stats, batch["syn"])
    s2, w2 = predict(state.params, state.batch_stats, batch["syn"])
    assert s1.shape == (4, cfg.n_frames, cfg.nclass)
    assert w1.shape == (4, cfg.nclass)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert ((np.asarray(s1) >= 0) & (np.asarray(s1) <= 1)).all()


def test_frame_cdan_requires_randomized_dim():
    """Frame-level CDAN with randomized_dim=0 must fail at build time with
    a clear error (the un-randomized multilinear map over flattened frame
    features would be ~3.2M dims; the reference always randomizes —
    main_baseline.py:794-796)."""
    import dataclasses

    import pytest
    from bsed_tpu.config import get_config
    from bsed_tpu.train.steps import build_modules

    cfg = get_config("baseline_adaptation")
    assert cfg.da.mode == "cdan_frame" or cfg.da.mode == "cdan"
    cfg = cfg.replace(da=dataclasses.replace(cfg.da, mode="cdan",
                                             level="frame",
                                             randomized_dim=0))
    with pytest.raises(ValueError, match="randomized_dim"):
        build_modules(cfg)


def test_isp_without_real_streams_raises_clearly():
    """An ISP/MT preset stepped on a syn-only batch (no weak/unlabeled
    datasets) must raise a clear ValueError at trace time, not an
    AttributeError inside vmap."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import pytest
    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    cfg = get_config("baseline_mt_isp").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    step = make_train_step(modules, steps_per_epoch=2)
    batch = {"syn": jnp.zeros((4, cfg.audio.max_frames, cfg.audio.n_mels)),
             "syn_strong": jnp.zeros((4, cfg.n_frames, cfg.nclass))}
    with pytest.raises(ValueError, match="real streams"):
        step(state, batch, jax.random.key(1), jnp.asarray(0.0))
