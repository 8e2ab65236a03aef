"""Joint-backward domain adaptation (main_scmt_ada_weak wiring): domain
loss added to the main loss, one backward updating model + discriminator."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast core

import jax
import jax.numpy as jnp

from bsed_tpu.config import AudioConfig, get_config
from bsed_tpu.train.steps import (build_modules, create_train_state,
                                  make_train_step)
from tests.test_train_step import make_batch

# the clip discriminator's 5 stride-2 convs need ~100 post-CNN frames to
# keep spatial dims positive, so this test uses longer (20 s) tiny-rate clips
SMALL_AUDIO = AudioConfig(sr=3200, hop_size=160, max_len_seconds=20.0)


def _delta(a, b):
    return max(float(jnp.abs(x - y).max())
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_joint_da_updates_discriminator_and_adds_loss():
    cfg = get_config("scmt_ada_weak").replace(audio=SMALL_AUDIO)
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "stage": "adaptation"}))
    assert cfg.da.joint_backward and cfg.da.mode == "cdan"
    modules = build_modules(cfg)
    state0 = create_train_state(cfg, modules, jax.random.key(0))
    d0 = jax.tree.map(lambda x: x.copy(), state0.disc_params)
    step = make_train_step(modules)
    batch = make_batch(cfg)
    state, metrics = step(state0, batch, jax.random.key(1), jnp.asarray(0.0))
    assert "domain_loss" in metrics
    assert np.isfinite(float(metrics["domain_loss"]))
    assert float(metrics["domain_loss"]) > 0
    # joint backward: loss includes the domain term; discriminator moved
    assert float(metrics["loss"]) > float(metrics["weak_class_loss"]) \
        + float(metrics["strong_class_loss"])
    assert _delta(d0, state.disc_params) > 0


def test_pretrain_stage_gates_da_off():
    cfg = get_config("scmt_ada_weak").replace(audio=SMALL_AUDIO)
    assert cfg.train.stage == "pretrain"
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    step = make_train_step(modules)
    state, metrics = step(state, make_batch(cfg), jax.random.key(1),
                          jnp.asarray(0.0))
    assert "domain_loss" not in metrics
