"""Dataset-level normalization (TrainConfig.normalize — the main.py
lineage's LIVE scaler, main.py:681-699; see utils/scaler.py for the full
lineage split)."""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsed_tpu.config import AudioConfig, get_config
from bsed_tpu.ops.mel import amplitude_to_db
from bsed_tpu.utils.scaler import fit_log_mel_stats

SMALL_AUDIO = AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0)


class _ListDataset:
    """Minimal dataset: per-item (feature, target) without as_arrays."""

    def __init__(self, feats):
        self.feats = feats

    def __len__(self):
        return len(self.feats)

    def __getitem__(self, i):
        return self.feats[i], np.zeros((4,))


def test_fit_log_mel_stats_matches_reference_formula():
    """Scaler.means (Scaler.py:48-80): mean_ = average over SAMPLES of the
    per-sample per-bin mean of the LOG features; std from mean-of-squares."""
    rng = np.random.default_rng(0)
    feats = [np.abs(rng.standard_normal((40, 16))).astype(np.float32)
             for _ in range(7)]
    mean, std = fit_log_mel_stats([_ListDataset(feats)])

    logs = [np.asarray(amplitude_to_db(jnp.asarray(f)), np.float64)
            for f in feats]
    want_mean = np.mean([lg.mean(axis=0) for lg in logs], axis=0)
    want_msq = np.mean([(lg ** 2).mean(axis=0) for lg in logs], axis=0)
    want_std = np.sqrt(want_msq - want_mean ** 2)
    np.testing.assert_allclose(mean, want_mean, rtol=1e-5)
    np.testing.assert_allclose(std, want_std, rtol=1e-4)


def test_fit_union_of_datasets_weighted_per_sample():
    rng = np.random.default_rng(1)
    a = [np.abs(rng.standard_normal((10, 8))).astype(np.float32)
         for _ in range(3)]
    b = [np.abs(rng.standard_normal((10, 8))).astype(np.float32)
         for _ in range(5)]
    m_union, _ = fit_log_mel_stats([_ListDataset(a), None, _ListDataset(b)])
    m_all, _ = fit_log_mel_stats([_ListDataset(a + b)])
    np.testing.assert_allclose(m_union, m_all, rtol=1e-6)


def test_preset_lineage():
    """Only main.py has live normalization; every other script passes
    scaler=None, crashes on cfg.syn_or_not, or fits-and-ignores."""
    assert get_config("origin").train.normalize is True
    for p in ("baseline", "baseline_mt_isp", "baseline_ena", "scmt",
              "scmt_ada", "scmt_ada_origin", "scmt_ada_weak",
              "sct_ada_weak", "pseudo_labeling"):
        assert get_config(p).train.normalize is False, p


@pytest.mark.slow
def test_step_normalization_changes_and_identity():
    """norm_stats=(0, 1) must be a no-op; real stats must change the loss
    and equal a manually pre-normalized forward."""
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    cfg = get_config("baseline").replace(audio=SMALL_AUDIO)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=4))
    f = cfg.audio.n_mels
    rng = np.random.default_rng(0)
    batch = {
        "syn": jnp.asarray(np.abs(rng.standard_normal(
            (4, cfg.audio.max_frames, f))).astype(np.float32)),
        "syn_strong": jnp.asarray((rng.random(
            (4, cfg.n_frames, cfg.nclass)) > 0.9).astype(np.float32)),
    }
    key = jax.random.key(0)

    def loss_with(stats):
        modules = build_modules(cfg, norm_stats=stats)
        state = create_train_state(cfg, modules, jax.random.key(0))
        step = make_train_step(modules)
        _, m = step(state, batch, key, jnp.asarray(0.0))
        return float(m["loss"])

    base = loss_with(None)
    ident = loss_with((np.zeros(f, np.float32), np.ones(f, np.float32)))
    assert base == pytest.approx(ident, rel=1e-6)
    # per-bin VARYING stats: a constant affine transform would be absorbed
    # exactly by the first BatchNorm (batch stats re-standardize), so vary
    # the scale across bins to make the conv's bin mixing see it
    shifted = loss_with((np.linspace(-20, 20, f).astype(np.float32),
                         np.linspace(0.5, 8.0, f).astype(np.float32)))
    # at random init the BCE sits near log(2)·2 whatever the input, so the
    # absolute shift is small — but it must clear the fp-noise floor that
    # the identity run establishes by a wide margin
    assert abs(shifted - base) > 20 * max(abs(ident - base), 1e-9)


@pytest.mark.slow
def test_trainer_origin_fits_and_records_scaler(tmp_path):
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import EvalLoader, ThreeStreamLoader
    from bsed_tpu.train.trainer import Trainer

    cfg = get_config("origin").replace(audio=SMALL_AUDIO)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, batch_size=4, n_epoch=1))
    syn = SyntheticDataSource(cfg, n_items=8, seed=1)
    weak = SyntheticDataSource(cfg, n_items=4, seed=2)
    unlab = SyntheticDataSource(cfg, n_items=4, seed=3)
    val = SyntheticDataSource(cfg, n_items=4, seed=4)
    loader = ThreeStreamLoader(syn, weak, unlab, batch_size=4,
                               seed=cfg.train.seed, layout="origin")
    trainer = Trainer(cfg, loader, val_loader=EvalLoader(val, batch_size=4),
                      store_dir=str(tmp_path / "run"), mesh="off",
                      scan_epoch="off")
    # train scaler = union(weak, unlab, syn); val scaler separate
    want_train = fit_log_mel_stats([weak, unlab, syn])
    np.testing.assert_allclose(trainer.norm_stats[0], want_train[0],
                               rtol=1e-6)
    want_val = fit_log_mel_stats([val])
    np.testing.assert_allclose(trainer.val_norm_stats[0], want_val[0],
                               rtol=1e-6)
    assert not np.allclose(want_train[0], want_val[0])
    assert trainer.predict_val is not trainer.predict
    # meta.json records the train stats (self-description; cli eval stays
    # TestModel-faithful and does not normalize)
    meta = json.load(open(os.path.join(trainer.store_dir, "model",
                                       "meta.json")))
    np.testing.assert_allclose(np.asarray(meta["scaler"]["mean"]),
                               want_train[0], rtol=1e-6)
    # one epoch end to end with normalization live
    trainer.fit(n_epochs=1)
    assert trainer.history and np.isfinite(trainer.history[0]["loss"])
