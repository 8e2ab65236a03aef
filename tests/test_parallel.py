"""Multi-device tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_executes():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    strong, weak = jax.jit(fn)(*args)
    assert strong.shape == (2, 313, 20)
    assert weak.shape == (2, 20)
    assert np.isfinite(np.asarray(strong)).all()


def test_sharded_batch_matches_single_device():
    """The sharded supervised step must produce the same loss as the
    unsharded one (global-batch BN semantics under GSPMD)."""
    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    modules = build_modules(cfg)
    rng = np.random.default_rng(0)
    b, t_in, f = 8, cfg.audio.max_frames, cfg.audio.n_mels
    batch = {
        "syn": np.abs(rng.standard_normal((b, t_in, f))).astype(np.float32),
        "syn_strong": (rng.random((b, cfg.n_frames, cfg.nclass)) > 0.9
                       ).astype(np.float32),
        "real": np.abs(rng.standard_normal((b, t_in, f))).astype(np.float32),
        "real_weak": (rng.random((b, cfg.nclass)) > 0.8).astype(np.float32),
    }

    state1 = create_train_state(cfg, modules, jax.random.key(0))
    step = make_train_step(modules)
    _, m1 = step(state1, batch, jax.random.key(1), jnp.asarray(0.0))

    mesh = make_mesh()
    state8 = create_train_state(cfg, modules, jax.random.key(0))
    state8 = replicate(mesh, state8)
    sharded = shard_batch(mesh, batch)
    _, m8 = step(state8, sharded, jax.random.key(1), jnp.asarray(0.0))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
