"""Parity + perf harness (SURVEY.md §7.8): load a reference-format torch
checkpoint and assert our posteriors match the torch model's to <=1e-3 —
the BASELINE.md numerics gate — plus long-recording streaming inference."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast core
import torch

import jax
import jax.numpy as jnp

from bsed_tpu.config import AudioConfig, get_config
from tests.torch_ref import TorchCRNN, TorchPredictor


def _save_reference_checkpoint(path):
    """Write a torch pickle in the reference's checkpoint format
    (main_baseline.py:895-971 layout)."""
    torch.manual_seed(7)
    crnn = TorchCRNN().eval()
    predictor = TorchPredictor().eval()
    state = {
        "model": {"name": "CRNN", "args": "", "kwargs": {},
                  "state_dict": crnn.state_dict()},
        "model_p": {"name": "Predictor", "args": "", "kwargs": {},
                    "state_dict": predictor.state_dict()},
        "pooling_time_ratio": 4,
        "median_window": 14,
        "epoch": 42,
    }
    torch.save(state, path)
    return crnn, predictor


def test_torch_checkpoint_posterior_parity(tmp_path):
    from bsed_tpu.eval.test_model import load_torch_checkpoint
    from bsed_tpu.train.steps import build_modules, make_predict_fn

    ckpt = str(tmp_path / "baseline_best")
    crnn, predictor = _save_reference_checkpoint(ckpt)

    cfg = get_config("baseline")
    modules = build_modules(cfg)
    params, stats = load_torch_checkpoint(ckpt, cfg)
    predict = make_predict_fn(modules)

    rng = np.random.default_rng(3)
    # log-mel domain input (predict applies amplitude_to_db when
    # apply_log=True; feed log directly for exactness vs torch)
    logmel = rng.standard_normal((2, 1255, 128)).astype(np.float32)
    strong, weak = predict(params, stats, jnp.asarray(logmel),
                           apply_log=False)

    with torch.no_grad():
        x = torch.from_numpy(logmel).unsqueeze(1)    # (B, 1, T, F)
        enc, _ = crnn(x)
        ref_strong, ref_weak = predictor(enc)

    # BASELINE.md gate: frame posteriors within 1e-3 of the reference
    assert np.max(np.abs(np.asarray(strong) - ref_strong.numpy())) <= 1e-3
    assert np.max(np.abs(np.asarray(weak) - ref_weak.numpy())) <= 1e-3


def test_long_recording_inference():
    from bsed_tpu.serve import make_fast_forward, predict_long_recording
    from bsed_tpu.train.steps import build_modules, create_train_state

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    forward = jax.jit(make_fast_forward(cfg, modules, state.params,
                                        state.batch_stats))

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(7 * cfg.audio.sr).astype(np.float32)  # 7 s
    strong, sec_per_frame = predict_long_recording(forward, audio, cfg,
                                                   batch_size=4)
    # ~7 s of frames at the pooled rate
    assert strong.shape[1] == cfg.nclass
    expected = int(np.ceil(7.0 / sec_per_frame))
    assert abs(strong.shape[0] - expected) <= cfg.n_frames
    assert np.isfinite(strong).all()
    assert (strong >= 0).all() and (strong <= 1).all()

    # overlapping windows also work
    strong2, _ = predict_long_recording(forward, audio, cfg, batch_size=4,
                                        hop_seconds=1.0)
    assert np.isfinite(strong2).all()


def test_long_recording_gaps_preserve_timeline():
    """predict_long_recording with hop_seconds > clip length leaves
    uncovered spans as ZERO posteriors instead of compacting them out —
    compaction would shift every later event's reported time earlier."""
    import numpy as np

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.serve import predict_long_recording

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    sr, clip_s = cfg.audio.sr, cfg.audio.max_len_seconds

    def fake_forward(batch):
        # per-clip posterior = that clip's mean |amplitude| on every frame
        x = np.asarray(batch)
        lvl = np.abs(x).mean(axis=1)
        strong = np.tile(lvl[:, None, None], (1, cfg.n_frames, cfg.nclass))
        return strong, strong.max(axis=1)

    audio = np.zeros(int(12 * sr), np.float32)       # 12 s of silence...
    audio[int(5.0 * sr):int(5.5 * sr)] = 1.0         # ...burst at t=5 s
    # hop 4 s > 2 s clips: windows [0,2),[4,6),[8,10),[10,12) — gaps at
    # [2,4) and [6,8)
    strong, sec = predict_long_recording(fake_forward, audio, cfg,
                                         hop_seconds=4.0)
    t = lambda s: int(round(s / sec))
    assert strong.shape[0] >= t(11.9)                # full timeline kept
    assert strong[t(5.0), 0] > 0.1                   # burst at its TRUE time
    assert strong[t(3.0), 0] == 0.0                  # gap frames zero
    assert strong[t(7.0), 0] == 0.0
    assert strong[t(1.0), 0] == 0.0                  # silent covered span
