"""Consistency-cost ramp lineage split (VERDICT r2 item 2).

The reference has TWO consistency-cost schedules:
  * main_baseline lineage — rampup_value = sigmoid_rampdown(c_epoch, 30)
    (/root/reference/src/main_baseline.py:285)
  * scmt/origin/ada lineage — rampup_value = exp_rampup(global_step,
    n_epoch_rampup * len(syn_loader)) with global_step =
    c_epoch * len(syn_loader) + i (/root/reference/src/main_scmt.py:261,
    cost applied at :515; same in main.py:222, main_origin.py:196,
    main_scmt_ada.py:275, main_scmt_ada_origin.py:273,
    main_sct_ada_weak.py:282)
At epoch 10 (of a 300-epoch run, rampup 50 epochs) they differ ~10×.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bsed_tpu.config import PRESETS, get_config
from bsed_tpu.train.steps import (build_modules, create_train_state,
                                  make_train_step)

from tests.test_train_step import make_batch, small_cfg

EXP_STEP_PRESETS = {"scmt", "origin", "scmt_ada", "scmt_ada_origin",
                    "sct_ada_weak"}


def test_preset_ramp_lineage_assignment():
    """Each preset carries its reference script's schedule."""
    for name, cfg in PRESETS.items():
        expected = "exp_step" if name in EXP_STEP_PRESETS else "sigmoid_epoch"
        assert cfg.train.cost_ramp == expected, name


def test_exp_step_requires_steps_per_epoch():
    cfg = small_cfg("scmt")
    modules = build_modules(cfg)
    with pytest.raises(ValueError, match="steps_per_epoch"):
        make_train_step(modules)


def _ref_sigmoid_epoch(epoch, rampdown_epochs=30):
    phase = 1.0 - min(max(epoch, 0.0), rampdown_epochs) / rampdown_epochs
    return math.exp(-12.5 * phase * phase)


def _ref_exp_step(global_step, rampup_len):
    phase = 1.0 - min(max(global_step, 0.0), rampup_len) / rampup_len
    return math.exp(-5.0 * phase * phase)


@pytest.mark.slow
def test_step_cost_matches_reference_formula_both_lineages():
    """Run the real jitted step at (epoch 10, mid-epoch step) and pin
    metrics['consistency_cost'] to the hand-computed reference value for
    BOTH lineages — where the two formulas differ by ~10×."""
    steps_per_epoch = 5
    epoch = 10
    step_in_epoch = 2
    global_step = epoch * steps_per_epoch + step_in_epoch

    # --- scmt lineage: step-based exp ramp
    cfg = small_cfg("scmt")
    assert cfg.train.cost_ramp == "exp_step"
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    state = state.replace(step=jnp.asarray(global_step, jnp.int32))
    step = make_train_step(modules, steps_per_epoch=steps_per_epoch)
    _, m = step(state, make_batch(cfg), jax.random.key(1),
                jnp.asarray(float(epoch)))
    want = cfg.train.max_consistency_cost * _ref_exp_step(
        global_step, cfg.train.n_epoch_rampup * steps_per_epoch)
    np.testing.assert_allclose(float(m["consistency_cost"]), want, rtol=1e-5)

    # --- baseline lineage: epoch-based sigmoid-shaped ramp
    cfg_b = small_cfg("baseline_mt")
    assert cfg_b.train.cost_ramp == "sigmoid_epoch"
    modules_b = build_modules(cfg_b)
    state_b = create_train_state(cfg_b, modules_b, jax.random.key(0))
    state_b = state_b.replace(step=jnp.asarray(global_step, jnp.int32))
    step_b = make_train_step(modules_b, steps_per_epoch=steps_per_epoch)
    _, m_b = step_b(state_b, make_batch(cfg_b), jax.random.key(1),
                    jnp.asarray(float(epoch)))
    want_b = cfg_b.train.max_consistency_cost * _ref_sigmoid_epoch(
        float(epoch), cfg_b.train.rampdown_epochs)
    np.testing.assert_allclose(float(m_b["consistency_cost"]), want_b,
                               rtol=1e-5)

    # the lineages genuinely diverge at this point (~10×: step-based exp
    # ramp is already at ~0.04 of max while the epoch sigmoid sits at ~0.004)
    assert want / want_b > 5.0


def test_isp_time_shift_lineage_split():
    """The SCT time-roll magnitude also splits by lineage — and NOT along
    the cost_ramp split: randint(-64,64)·ptr for main_baseline.py:232,
    main_scmt_ada_weak.py:232, main_sct_ada_weak.py:230 and
    pseudo_labeling_main.py:232, but randint(-32,32)·ptr for main.py:203,
    main_origin.py:177, main_scmt.py:205, main_scmt_ada.py:208 and
    main_scmt_ada_origin.py:206 (main_sct_ada_weak has the exp_step ramp
    but the 64-frame shift)."""
    from bsed_tpu.config import get_config

    for preset, want in [("baseline", 64), ("baseline_mt_isp", 64),
                         ("baseline_fpn_mt_isp", 64),
                         ("baseline_adaptation", 64),
                         ("scmt_ada_weak", 64), ("sct_ada_weak", 64),
                         ("scmt_ada_weak_separate", 64),
                         ("scmt_ada_weak_separate_2crnn", 64),
                         ("pseudo_labeling", 64),
                         ("scmt", 32), ("origin", 32),
                         ("scmt_ada", 32), ("scmt_ada_origin", 32)]:
        cfg = get_config(preset)
        assert cfg.train.time_shift_max == want, (
            preset, cfg.train.time_shift_max, want)
        assert cfg.train.freq_shift_max == 4, preset   # ±4 in every script


def test_sampled_shifts_respect_range():
    import jax
    import numpy as np

    from bsed_tpu.ops.augment import sample_isp_shifts

    in_shift, pool_shift, freq_shift = sample_isp_shifts(
        jax.random.key(0), 2000, 32, 4, 4)
    ps = np.asarray(pool_shift)
    assert ps.min() >= -32 and ps.max() <= 32
    assert ps.min() == -32 and ps.max() == 32          # inclusive randint
    assert (np.asarray(in_shift) == ps * 4).all()
    fs = np.asarray(freq_shift)
    assert fs.min() == -4 and fs.max() == 4
