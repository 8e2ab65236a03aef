"""Tests for the auxiliary subsystems: weak tagger + pseudo-label cycle,
embedding dump + domain probes, soundscape synthesis, preprocess IO,
dataset analysis, CLI parsing."""
import json
import os

import jax
import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast core

from bsed_tpu.config import AudioConfig, get_config

SMALL_AUDIO = AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0)


def small_cfg(preset="baseline"):
    return get_config(preset).replace(audio=SMALL_AUDIO)


# ---------------------------------------------------------------- tagging
def test_tagging_trainer_and_pseudo_label_cycle(tmp_path):
    from bsed_tpu.data.codec import ManyHotEncoder
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import EvalLoader, ThreeStreamLoader
    from bsed_tpu.data.datasets import PseudoLabeledDataset
    from bsed_tpu.train.tagging_trainer import (TaggingTrainer,
                                                write_pseudo_labels)

    cfg = small_cfg()
    syn = SyntheticDataSource(cfg, n_items=8, seed=1)
    weak = SyntheticDataSource(cfg, n_items=4, seed=2)
    unlab = SyntheticDataSource(cfg, n_items=4, seed=3)
    loader = ThreeStreamLoader(syn, weak, unlab, batch_size=4)
    trainer = TaggingTrainer(cfg, arch="resnet")
    loss0 = trainer.train_epoch(loader.epoch(0), 0)
    assert np.isfinite(loss0)
    f1 = trainer.evaluate(EvalLoader(SyntheticDataSource(cfg, 4, seed=4),
                                     batch_size=4))
    assert 0.0 <= f1 <= 1.0

    # pseudo-label TSV write → read-back through PseudoLabeledDataset
    codec = ManyHotEncoder(cfg.bird_list, n_frames=cfg.n_frames)
    out_tsv = str(tmp_path / "pl.tsv")
    df = write_pseudo_labels(trainer.predict_weak, unlab, out_tsv, codec)
    assert len(df) == 4 and list(df.columns) == ["filename", "event_labels"]
    assert os.path.exists(out_tsv)


def test_vgg_tagger_forward():
    import jax
    import jax.numpy as jnp
    from bsed_tpu.models.resnet import VGGTagger

    cfg = small_cfg()
    model = VGGTagger(nclass=cfg.nclass)
    x = jnp.zeros((2, 64, 128, 1))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, x, train=True)
    out = model.apply({"params": variables["params"],
                       "batch_stats": variables["batch_stats"]}, x,
                      train=False)
    assert out.shape == (2, cfg.nclass)
    assert ((np.asarray(out) >= 0) & (np.asarray(out) <= 1)).all()


# ------------------------------------------------------- features + probes
def test_feature_dump_and_domain_probes(tmp_path):
    import jax
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import EvalLoader
    from bsed_tpu.eval.features import (dump_features, load_feature_dir,
                                        make_encode_fn)
    from bsed_tpu.eval.visualize import svm_domain_accuracy, tsne_domain_audit
    from bsed_tpu.train.steps import build_modules, create_train_state

    cfg = small_cfg()
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    encode = make_encode_fn(modules, state.params, state.batch_stats)
    loader = EvalLoader(SyntheticDataSource(cfg, 6, seed=7), batch_size=4)
    out_dir = str(tmp_path / "feats")
    paths = dump_features(encode, loader, out_dir)
    assert len(paths) == 2
    emb = load_feature_dir(out_dir)
    assert emb.shape == (6, cfg.n_frames, 2 * cfg.model.n_rnn_cell)

    # probes on small random embeddings (subsample time to keep fast)
    syn_emb = emb[:3, :4]
    real_emb = emb[3:, :4] + 5.0   # clearly separated domains
    acc = svm_domain_accuracy(syn_emb, real_emb, folds=3)
    assert acc >= 0.5
    pts, y, sil = tsne_domain_audit(syn_emb, real_emb, perplexity=2)
    assert pts.shape == (6, 2) and len(y) == 6


# ----------------------------------------------------------- synthesizer
def test_soundscape_generation(tmp_path):
    from bsed_tpu.data.synthesizer import (SoundscapeConfig,
                                           generate_dataset, polyphony,
                                           syn_preprocess)

    cfg = small_cfg()
    co = {
        "EATO": {"proba": 0.6, "co-occurences": {
            "max_events": 3, "mean_events": 2,
            "classes": ["WOTH"], "probas": [1.0]}},
        "WOTH": {"proba": 0.4, "co-occurences": {
            "max_events": 2, "mean_events": 1,
            "classes": ["EATO"], "probas": [1.0]}},
    }
    co_path = str(tmp_path / "co.json")
    with open(co_path, "w") as f:
        json.dump(co, f)
    out = str(tmp_path / "generated")
    tsv = generate_dataset(out, co_path, 5, cfg, seed=0,
                           sc=SoundscapeConfig(sr=cfg.audio.sr,
                                               duration=2.0))
    assert len(tsv) >= 5
    assert set(tsv.event_label) <= {"EATO", "WOTH"}
    wavs = [f for f in os.listdir(out) if f.endswith(".wav")]
    assert len(wavs) == 5
    # events respect the polyphony cap
    for name, grp in tsv.groupby("filename"):
        ev = [(r.event_label, r.onset, r.offset) for r in grp.itertuples()]
        assert polyphony(ev) <= 4

    feat_out = str(tmp_path / "features")
    names = syn_preprocess(out, feat_out, cfg)
    assert len(names) == 5
    mel = np.load(os.path.join(feat_out, "wav", names[0] + ".npy"))
    assert mel.shape == (cfg.audio.max_frames, cfg.audio.n_mels)


def test_wav_roundtrip_and_resample(tmp_path):
    from scipy.io import wavfile
    from bsed_tpu.data.preprocess import read_wav

    sr = 16000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    wavfile.write(path, sr, (sig * 32767).astype(np.int16))
    out = read_wav(path, 32000)
    assert abs(len(out) - 32000) <= 1
    assert np.abs(out).max() == pytest.approx(0.5, abs=0.05)


def test_preprocess_recording_end_to_end(tmp_path):
    from scipy.io import wavfile
    from bsed_tpu.data.preprocess import preprocess_recording

    cfg = small_cfg()
    sr = cfg.audio.sr
    audio = (0.1 * np.random.default_rng(0).standard_normal(sr * 5)
             ).astype(np.float32)   # 5 s → two 2 s segments
    wav = str(tmp_path / "rec.wav")
    wavfile.write(wav, sr, (audio * 32767).astype(np.int16))
    ann = str(tmp_path / "rec.txt")
    pd.DataFrame({
        "Begin Time (s)": [0.5, 2.5],
        "End Time (s)": [1.5, 3.0],
        "Species": ["EATO", "WOTH"],
    }).to_csv(ann, sep="\t", index=False)

    names = preprocess_recording(wav, ann, cfg, str(tmp_path / "mel"),
                                 str(tmp_path / "ann"))
    assert names == ["rec_0", "rec_1"]
    mel = np.load(tmp_path / "mel" / "rec_0.npy")
    assert mel.shape == (cfg.audio.max_frames, cfg.audio.n_mels)
    seg1 = pd.read_csv(tmp_path / "ann" / "rec_1.txt", sep="\t")
    # event (2.5, 3.0) is segment-relative (0.5, 1.0) in segment 1
    assert len(seg1) == 1 and seg1.iloc[0].event_label == "WOTH"
    assert seg1.iloc[0].onset == pytest.approx(0.5)


# -------------------------------------------------------------- analysis
def test_analysis_outputs(tmp_path):
    from bsed_tpu.data.analysis import (collect_annotations,
                                        cooccurrence_matrix, duration_stats)

    cfg = small_cfg()
    ann_dir = tmp_path / "annotation"
    ann_dir.mkdir()
    pd.DataFrame({"onset": [0.0, 1.0], "offset": [0.5, 2.0],
                  "event_label": ["EATO", "WOTH"]}).to_csv(
        ann_dir / "clip_0.txt", sep="\t", index=False)
    pd.DataFrame({"onset": [0.0], "offset": [1.0],
                  "event_label": ["EATO"]}).to_csv(
        ann_dir / "clip_1.txt", sep="\t", index=False)
    events = collect_annotations(str(ann_dir), cfg.bird_list)
    assert len(events) == 3
    mat = cooccurrence_matrix(events, cfg.bird_list,
                              str(tmp_path / "cooc.csv"))
    assert mat.loc["EATO", "WOTH"] == 1 and mat.loc["EATO", "EATO"] == 2
    stats = duration_stats(events, cfg.bird_list,
                           str(tmp_path / "durs.csv"))
    eato = stats[stats.event_label == "EATO"].iloc[0]
    assert eato["count"] == 2 and eato["total_s"] == pytest.approx(1.5)
    assert os.path.exists(tmp_path / "cooc.csv")


# ------------------------------------------------------------------- CLI
def test_cli_parser_covers_reference_flags():
    from bsed_tpu.cli import build_parser

    p = build_parser()
    args = p.parse_args(["train", "--preset", "baseline", "-fpn", "-mt",
                         "-ISP", "-stage", "adaptation", "-level", "frame",
                         "--epochs", "1"])
    assert args.use_fpn and args.meanteacher and args.isp
    assert args.stage == "adaptation" and args.level == "frame"
    args = p.parse_args(["synthesize", "--co-occur", "x.json", "--out", "y"])
    assert args.n_soundscapes == 100


def test_tagging_trainer_mean_teacher_variant():
    """audio_tagging_system.py capability: MT scaffold for the weak tagger."""
    import numpy as np
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import ThreeStreamLoader
    from bsed_tpu.train.tagging_trainer import TaggingTrainer

    cfg = small_cfg()
    syn = SyntheticDataSource(cfg, n_items=8, seed=1)
    weak = SyntheticDataSource(cfg, n_items=4, seed=2)
    unlab = SyntheticDataSource(cfg, n_items=4, seed=3)
    loader = ThreeStreamLoader(syn, weak, unlab, batch_size=4)
    trainer = TaggingTrainer(cfg, arch="resnet", mean_teacher=True)
    import jax
    ema0 = jax.tree.map(lambda x: x.copy(), trainer.ema_params)
    loss = trainer.train_epoch(loader.epoch(0), 0)
    assert np.isfinite(loss)
    moved = max(float(abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(ema0), jax.tree.leaves(trainer.ema_params)))
    assert moved > 0


@pytest.mark.slow
def test_pretrained_resnet18_identical_forward():
    """VERDICT r2 item 7: loading a (randomly initialized) torch resnet18
    state_dict with the reference's surgery (1-ch conv1, nclass fc,
    audio_tagging_system_cnn.py:50-59) must give an IDENTICAL flax forward."""
    import torch

    import jax.numpy as jnp

    from bsed_tpu.ops.mel import amplitude_to_db
    from bsed_tpu.train.tagging_trainer import TaggingTrainer
    from tests.torch_ref import TorchResNet18

    cfg = small_cfg()
    oracle = TorchResNet18(nclass=cfg.nclass, in_ch=1).eval()
    trainer = TaggingTrainer(cfg, arch="resnet")
    skipped = trainer.load_pretrained_torch(oracle.state_dict())
    assert skipped == []

    rng = np.random.default_rng(0)
    mel = np.abs(rng.standard_normal(
        (2, cfg.audio.max_frames, cfg.audio.n_mels))).astype(np.float32)
    ours = np.asarray(trainer._infer(trainer.params, trainer.batch_stats,
                                     jnp.asarray(mel)))
    x = np.asarray(amplitude_to_db(jnp.asarray(mel)))[:, None, :, :]
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_pretrained_resnet18_skips_rebuilt_layers():
    """An ImageNet-shaped state_dict (3-ch stem, 1000-class fc) loads every
    block EXCEPT the parts the reference rebuilds — which keep fresh init."""
    from bsed_tpu.train.tagging_trainer import TaggingTrainer
    from tests.torch_ref import TorchResNet18

    cfg = small_cfg()
    imagenet = TorchResNet18(nclass=1000, in_ch=3)
    trainer = TaggingTrainer(cfg, arch="resnet")
    before = jax.tree.map(np.asarray, trainer.params)
    skipped = trainer.load_pretrained_torch(imagenet.state_dict())
    assert any("stem_conv" in s for s in skipped)
    assert any("fc" in s for s in skipped)
    # rebuilt layers keep their fresh init
    np.testing.assert_array_equal(np.asarray(trainer.params["fc"]["kernel"]),
                                  before["fc"]["kernel"])
    # a deep block actually took the torch weights
    w = imagenet.state_dict()["layer3.0.conv1.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(trainer.params["layer3_block0"]["conv1"]["kernel"]),
        w.transpose(2, 3, 1, 0), atol=0)


def test_grad_flow_metrics_and_plot(tmp_path):
    """make_train_step(grad_flow=True) emits per-parameter mean-|grad|
    metrics (plot_grad_flow parity, main_baseline.py:108-123) and the
    profiling helper renders the PNG."""
    import jax.numpy as jnp

    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)
    from bsed_tpu.utils.profiling import plot_grad_flow
    from tests.test_train_step import make_batch

    cfg = small_cfg()
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    step = make_train_step(modules, grad_flow=True)
    _, metrics = step(state, make_batch(cfg), jax.random.key(1),
                      jnp.asarray(0.0))
    grad_keys = [k for k in metrics if k.startswith("grad_abs/")]
    assert grad_keys, "no grad_abs metrics emitted"
    assert all("bias" not in k for k in grad_keys)
    assert any("encoder" in k for k in grad_keys)
    assert any("predictor" in k for k in grad_keys)
    assert all(np.isfinite(float(metrics[k])) for k in grad_keys)
    out = str(tmp_path / "gradient_flow.png")
    wrote = plot_grad_flow({k: float(v) for k, v in metrics.items()}, out)
    assert wrote and os.path.getsize(out) > 0


def test_mix_audio_files(tmp_path):
    """Equal-weight wav mixer (dataset/SYN_test/generated_mix/mix.py)."""
    from scipy.io import wavfile

    from bsed_tpu.data.analysis import mix_audio_files

    sr = 32000
    a = (np.sin(np.linspace(0, 100, sr)) * 0.5).astype(np.float32)
    b = np.ones(sr // 2, dtype=np.float32) * 0.25
    pa, pb = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    wavfile.write(pa, sr, a)
    wavfile.write(pb, sr, b)
    out = mix_audio_files([pa, pb], str(tmp_path / "mix.wav"), sr=sr)
    got_sr, mix = wavfile.read(out)
    assert got_sr == sr and len(mix) == sr
    np.testing.assert_allclose(mix[:sr // 2], 0.5 * (a[:sr // 2] + b),
                               atol=1e-5)
    np.testing.assert_allclose(mix[sr // 2:], 0.5 * a[sr // 2:], atol=1e-5)
