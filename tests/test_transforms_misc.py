"""Tests for host-side transforms, CRNN_DA, audio utils, PCA/ICA probes."""
import os

import numpy as np
import pytest

from bsed_tpu.config import AudioConfig, get_config

SMALL_AUDIO = AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0)


def test_transform_pipeline_matches_reference_semantics():
    from bsed_tpu.data.transforms import (ApplyLog, AugmentGaussianNoise,
                                          Compose, MinMaxNormalization,
                                          PadOrTrunc, get_transforms)

    rng = np.random.default_rng(0)
    data = np.abs(rng.standard_normal((37, 16))).astype(np.float32)
    label = np.zeros((9, 4), np.float32)

    pipeline = get_transforms(40, noise_snr=30.0,
                              rng=np.random.default_rng(1))
    (clean, noisy), out_label = pipeline((data, label))
    # noise → (clean, noisy) tuple; ApplyLog + PadOrTrunc applied to both
    assert clean.shape == (40, 16) and noisy.shape == (40, 16)
    assert not np.allclose(clean, noisy)
    # ApplyLog: dB domain, clamped at max-80
    assert clean.max() <= 10 * np.log10(np.maximum(1e-10, data.max()**2)) + 1e-4
    assert clean.min() >= clean.max() - 80 - 1e-4
    np.testing.assert_array_equal(out_label, label)

    mm = MinMaxNormalization()
    x, _ = mm((data, label))
    assert x.min() == pytest.approx(0) and x.max() == pytest.approx(1)


def test_crnn_da_returns_domain_pred():
    import jax
    import jax.numpy as jnp
    from bsed_tpu.config import ModelConfig
    from bsed_tpu.models.crnn import CRNNDA

    model = CRNNDA(ModelConfig())
    x = jnp.zeros((2, 80, 128, 1))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, x, train=False)
    enc, d_input, domain = model.apply(variables, x, train=False)
    assert enc.shape == (2, 20, 256)
    assert domain.shape == (2, 20, 2)
    assert ((np.asarray(domain) >= 0) & (np.asarray(domain) <= 1)).all()


def test_generate_tsv_wav_durations(tmp_path):
    from scipy.io import wavfile
    from bsed_tpu.utils.audio import generate_tsv_wav_durations, mp3_to_wav

    for i, dur in enumerate((1.0, 2.5)):
        sr = 8000
        wavfile.write(str(tmp_path / f"x{i}.wav"), sr,
                      np.zeros(int(sr * dur), np.int16))
    df = generate_tsv_wav_durations(str(tmp_path), str(tmp_path / "d.tsv"))
    assert len(df) == 2
    assert sorted(df.duration.tolist()) == [1.0, 2.5]
    with pytest.raises(NotImplementedError):
        mp3_to_wav("a.mp3", "a.wav")


def test_pca_ica_projections():
    from bsed_tpu.eval.visualize import project_embeddings

    emb = np.random.default_rng(0).standard_normal((10, 5, 8))
    for method in ("pca", "ica"):
        pts = project_embeddings(emb, method=method)
        assert pts.shape == (10, 2)


def test_scalers():
    from bsed_tpu.utils.scaler import Scaler, ScalerPerAudio

    rng = np.random.default_rng(0)
    items = [(rng.standard_normal((20, 4)).astype(np.float32) * 3 + 1,)
             for _ in range(5)]
    s = Scaler()
    s.calculate_scaler(items)
    assert s.mean_.shape == (4,)
    normed = s.normalize(items[0][0])
    assert abs(np.concatenate([s.normalize(i[0]) for i in items]).mean()) < 0.2

    for mode in ("standard", "max", "min-max"):
        out = ScalerPerAudio(mode).normalize(items[0][0])
        assert np.isfinite(out).all()


def test_scaler_json_roundtrip(tmp_path):
    from bsed_tpu.utils.scaler import Scaler

    s = Scaler()
    s.mean_ = np.array([1.0, 2.0])
    s.std_ = np.array([0.5, 1.5])
    path = str(tmp_path / "scaler.json")
    s.save(path)
    s2 = Scaler().load(path)
    np.testing.assert_allclose(s2.mean_, s.mean_)
    np.testing.assert_allclose(s2.std_, s.std_)


def test_prefetch_order_exceptions_and_bound():
    import threading
    import time as _time

    from bsed_tpu.data.prefetch import prefetch

    # order + completeness
    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))
    assert list(prefetch(iter([]), depth=2)) == []

    # producer exceptions re-raise at the consumer
    def boom():
        yield 1
        raise ValueError("producer failed")
    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer failed"):
        list(it)

    # bounded lookahead: with depth=2 the producer can run at most
    # depth + 1 items ahead of the consumer (queue + the put in flight)
    produced = []
    def tracked():
        for i in range(50):
            produced.append(i)
            yield i
    it = prefetch(tracked(), depth=2)
    next(it)
    _time.sleep(0.2)
    assert len(produced) <= 1 + 2 + 1
