"""End-to-end CLI test of the pseudo-labeling cycle (SURVEY.md §3.4) plus
the PSDS operating-point sweep — the reference's cross-script flow
(audio_tagging_system_cnn.py → audio_tagging_inference.py:288-313 →
main_scmt_ada_weak.py) as three shell commands on an on-disk fixture.
"""
import os

import numpy as np
import pandas as pd
import pytest

from bsed_tpu.cli import main
from bsed_tpu.config import AudioConfig, get_config

TINY = AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0)


def _write_split(root, sub, n, seed, cfg, with_annotations=True):
    wav = os.path.join(root, sub, "wav")
    ann = os.path.join(root, sub, "annotation")
    os.makedirs(wav, exist_ok=True)
    os.makedirs(ann, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        name = f"clip_{seed}_{i}"
        feats = np.abs(rng.standard_normal(
            (cfg.audio.max_frames, cfg.audio.n_mels))).astype(np.float32)
        np.save(os.path.join(wav, name + ".npy"), feats)
        if with_annotations:
            k = int(rng.integers(1, 3))
            rows = []
            for _ in range(k):
                onset = float(rng.uniform(0, cfg.audio.max_len_seconds * .6))
                offset = onset + float(rng.uniform(0.2, 0.8))
                label = cfg.bird_list[int(rng.integers(cfg.nclass))]
                rows.append((label, onset,
                             min(offset, cfg.audio.max_len_seconds)))
            pd.DataFrame(rows, columns=["event_label", "onset",
                                        "offset"]).to_csv(
                os.path.join(ann, name + ".txt"), sep="\t", index=False)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cycle_root"))
    cfg = get_config("baseline").replace(audio=TINY)
    d = cfg.data
    _write_split(root, os.path.join(d.synth_root, d.synth_feature_subdir),
                 24, 1, cfg)
    _write_split(root, os.path.join(d.dataset_root, d.train_weak_subdir),
                 12, 2, cfg)
    _write_split(root, os.path.join(d.dataset_root,
                                    d.train_unlabeled_subdir),
                 12, 3, cfg, with_annotations=False)
    _write_split(root, os.path.join(d.dataset_root, d.val_subdir), 8, 4, cfg)
    return root


@pytest.mark.slow
def test_pseudo_labeling_cycle_via_cli(data_root):
    weights = os.path.join(data_root, "tagger.msgpack")
    pl_tsv = os.path.join(data_root, "pl.tsv")
    run_dir = os.path.join(data_root, "run")

    # (1) train the weak tagger
    main(["tag-train", "--tiny-audio", "--data-root", data_root,
          "--epochs", "1", "--save", weights])
    assert os.path.exists(weights)

    # (2) write the pseudo-label TSV over the unlabeled set
    main(["pseudo-label", "--tiny-audio", "--data-root", data_root,
          "--weights", weights, "--out-tsv", pl_tsv])
    df = pd.read_csv(pl_tsv, sep="\t")
    assert list(df.columns) == ["filename", "event_labels"]
    assert len(df) == 12

    # (3) consume the TSV in a training preset
    main(["train", "--tiny-audio", "--data-root", data_root,
          "--preset", "scmt_ada_weak", "--epochs", "1",
          "--pseudo-labels", pl_tsv, "--store-dir", run_dir])
    assert os.path.exists(os.path.join(run_dir, "results.tsv"))

    # (4) PSDS operating-point sweep + ROC dumps from the run's checkpoint
    roc_dir = os.path.join(data_root, "roc")
    main(["eval", "--tiny-audio", "--data-root", data_root,
          "--preset", "scmt_ada_weak", "--store-dir", run_dir,
          "--psds-sweep", "--n-thresholds", "5", "--roc-out", roc_dir])
    for name in ("psds_ct0_st0", "psds_ct1_st0", "psds_ct0_st1"):
        assert os.path.exists(os.path.join(roc_dir, f"roc_{name}.csv")), name
        # matplotlib ships in this image → the ROC plot files
        # (evaluation_measures.py:304-311) must be emitted too
        assert os.path.exists(os.path.join(roc_dir, f"roc_{name}.png")), name


@pytest.mark.slow
def test_features_and_visualize_cli(data_root, tmp_path):
    run_dir = os.path.join(data_root, "run")
    if not os.path.exists(run_dir):
        pytest.skip("cycle test must run first (module-scoped fixture)")
    syn_dir = str(tmp_path / "emb_syn")
    val_dir = str(tmp_path / "emb_val")
    main(["features", "--tiny-audio", "--data-root", data_root,
          "--preset", "scmt_ada_weak", "--store-dir", run_dir,
          "--split", "syn", "--out-dir", syn_dir])
    main(["features", "--tiny-audio", "--data-root", data_root,
          "--preset", "scmt_ada_weak", "--store-dir", run_dir,
          "--split", "val", "--out-dir", val_dir])
    assert len(os.listdir(syn_dir)) > 0 and len(os.listdir(val_dir)) > 0
    out = str(tmp_path / "viz")
    main(["visualize", "--syn-features", syn_dir,
          "--real-features", val_dir, "--out-dir", out])
    assert os.path.exists(os.path.join(out, "tsne_points.npy"))


@pytest.mark.slow
def test_predict_cli_on_raw_audio(data_root, tmp_path):
    """`predict`: raw audio (longer than one clip) -> event TSV through the
    fused serving path + overlap windowing + vectorized decode."""
    run_dir = os.path.join(data_root, "pred_run")
    main(["train", "--tiny-audio", "--data-root", data_root,
          "--preset", "baseline", "--epochs", "1", "--store-dir", run_dir])

    cfg = get_config("baseline").replace(audio=TINY)
    rng = np.random.default_rng(11)
    audio = rng.standard_normal(int(2.5 * cfg.audio.n_samples)
                                ).astype(np.float32) * 0.1
    wav_npy = str(tmp_path / "long_recording.npy")
    np.save(wav_npy, audio)

    out_tsv = str(tmp_path / "events.tsv")
    main(["predict", "--tiny-audio", "--data-root", data_root,
          "--preset", "baseline", "--store-dir", run_dir,
          "--audio", wav_npy, "--out-tsv", out_tsv,
          "--threshold", "0.1"])
    df = pd.read_csv(out_tsv, sep="\t")
    assert list(df.columns) == ["filename", "event_label", "onset", "offset"]
    if len(df):
        assert (df["offset"] > df["onset"]).all()
        assert df["onset"].min() >= 0.0
        # events may land anywhere on the 2.5-clip timeline
        assert df["offset"].max() <= 2.5 * cfg.audio.max_len_seconds + 1.0
        assert set(df["event_label"]) <= set(cfg.bird_list)


@pytest.mark.slow
def test_export_cli_round_trip(data_root, tmp_path):
    """`export` writes a reference-format pickle whose converted-back
    params are bit-identical to the orbax checkpoint (transposes only)."""
    import jax

    from bsed_tpu.eval.test_model import load_torch_checkpoint
    from bsed_tpu.train.steps import build_modules, create_train_state
    from bsed_tpu.utils.checkpoint import CheckpointManager

    run_dir = os.path.join(data_root, "pred_run")
    if not os.path.exists(run_dir):
        pytest.skip("predict test must run first (module-scoped fixture)")
    out = str(tmp_path / "exported_best")
    main(["export", "--tiny-audio", "--data-root", data_root,
          "--preset", "baseline", "--store-dir", run_dir, "--out", out])

    cfg = get_config("baseline").replace(audio=TINY)
    params, stats = load_torch_checkpoint(out, cfg)
    template = create_train_state(cfg, build_modules(cfg), jax.random.key(0))
    orig = CheckpointManager(run_dir).restore("best", template)

    flat_rt = jax.tree_util.tree_leaves_with_path(params)
    flat_orig = {jax.tree_util.keystr(p): np.asarray(v)
                 for p, v in jax.tree_util.tree_leaves_with_path(
                     {"encoder": orig.params["encoder"],
                      "predictor": orig.params["predictor"]})}
    assert len(flat_rt) == len(flat_orig)
    for p, v in flat_rt:
        np.testing.assert_array_equal(np.asarray(v),
                                      flat_orig[jax.tree_util.keystr(p)])


def test_missing_pseudo_label_tsv_errors(data_root):
    """An explicitly requested --pseudo-labels TSV that does not exist must
    error out instead of silently training with all-empty weak targets."""
    with pytest.raises(SystemExit, match="pseudo-label TSV not found"):
        main(["train", "--tiny-audio", "--data-root", data_root,
              "--preset", "scmt_ada_weak", "--epochs", "1",
              "--pseudo-labels", os.path.join(data_root, "nope.tsv")])


def test_config_dict_round_trip():
    """config_to_dict → JSON → config_from_dict is exact for every preset
    (tuples restored from JSON lists, nested dataclasses rebuilt)."""
    import json

    from bsed_tpu.config import PRESETS, config_from_dict, config_to_dict

    for preset, cfg in PRESETS.items():
        d = json.loads(json.dumps(config_to_dict(cfg)))
        assert config_from_dict(d) == cfg, preset


@pytest.mark.slow
def test_eval_self_describing_no_preset(data_root, capsys):
    """VERDICT r2 item 5: train with a NON-default preset, then eval with no
    --preset (and no --tiny-audio): the store-dir's meta.json config must
    rebuild the exact training-time Config (TestModel.py:34-120 reads model
    kwargs from the checkpoint) and produce identical scores."""
    run_dir = os.path.join(data_root, "run_sd")
    main(["train", "--tiny-audio", "--data-root", data_root,
          "--preset", "baseline_mt", "--epochs", "1",
          "--store-dir", run_dir])
    capsys.readouterr()

    main(["eval", "--data-root", data_root, "--store-dir", run_dir])
    out_no_preset = capsys.readouterr().out.strip().splitlines()[-1]
    main(["eval", "--tiny-audio", "--data-root", data_root,
          "--preset", "baseline_mt", "--store-dir", run_dir])
    out_preset = capsys.readouterr().out.strip().splitlines()[-1]
    assert out_no_preset == out_preset
    assert "event_f1" in out_no_preset


@pytest.mark.slow
def test_train_auto_resume_flag(data_root, tmp_path, capsys):
    """``cli train --resume`` continues after the newest epoch checkpoint
    (the productionized form of the reference's manual start_epoch edit,
    main_baseline.py:649): a fresh store trains from epoch 0; rerunning
    with --resume picks up at latest+1 and appends to the history."""
    store = str(tmp_path / "resume_run")
    main(["train", "--tiny-audio", "--data-root", data_root,
          "--preset", "baseline", "--epochs", "2", "-s", "8",
          "--store-dir", store])
    assert os.path.isdir(os.path.join(store, "model", "epoch_1"))

    main(["train", "--tiny-audio", "--data-root", data_root,
          "--epochs", "3", "-s", "8", "--store-dir", store, "--resume"])
    out = capsys.readouterr().out
    assert "continuing from epoch 2" in out
    # the resumed epoch ran and produced its checkpoint
    assert os.path.isdir(os.path.join(store, "model", "epoch_2"))


def test_train_perf_flag(tmp_path):
    """`cli train --perf` applies the throughput configuration (bf16 +
    folded train stem + fused Pallas stem epilogue + fused streams) and
    trains end to end; the checkpoint meta must record the perf config so
    `eval --store-dir` rebuilds the same model."""
    import json

    run_dir = str(tmp_path / "run_perf")
    main(["train", "--tiny-audio", "--preset", "baseline_mt_isp", "-s", "8",
          "--perf", "--epochs", "1", "--store-dir", run_dir])
    assert os.path.exists(os.path.join(run_dir, "results.tsv"))
    with open(os.path.join(run_dir, "model", "meta.json")) as fh:
        meta = json.load(fh)
    assert meta["config"]["model"]["folded_train_stem"] is True
    assert meta["config"]["model"]["fused_stem_epilogue"] is True
    assert meta["config"]["model"]["compute_dtype"] == "bfloat16"
    assert meta["config"]["train"]["fused_streams"] is True
