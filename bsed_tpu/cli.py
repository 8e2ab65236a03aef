"""Unified CLI — one entry point replacing the reference's shell-level API
of 14 ``python main_X.py``/``TestModel.py``/tagging scripts
(SURVEY.md §1 L4/L5).

    python -m bsed_tpu.cli train --preset baseline_mt_isp --data-root ...
    python -m bsed_tpu.cli eval --store-dir stored_data/<name> [--psds-sweep]
    python -m bsed_tpu.cli preprocess --dataset-root dataset/ENA
    python -m bsed_tpu.cli synthesize --co-occur ... --out ...
    python -m bsed_tpu.cli tag-train --save tagger.msgpack        # cycle (1)
    python -m bsed_tpu.cli pseudo-label --weights ... --out-tsv … # cycle (2)
    python -m bsed_tpu.cli train --preset scmt_ada_weak \
        --pseudo-labels <tsv>                                     # cycle (3)
    python -m bsed_tpu.cli features / visualize / analyze
    python -m bsed_tpu.cli predict --audio long.wav --out-tsv events.tsv

Flags mirror the reference argparse surface (main_baseline.py:609-632):
``-fpn``/``--use-fpn``, ``-mt``/``--meanteacher``, ``-ISP``, ``-stage``,
``-level``, ``-s/--subpart-data``.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def _resolve_config(args, allow_store: bool = True):
    """Config resolution order (checkpoint-self-describing eval,
    TestModel.py:34-120 semantics):
      1. an explicit --preset always wins;
      2. else, when ``allow_store``, a --store-dir whose meta.json carries
         the full saved config rebuilds the training-time Config exactly
         (incl. audio geometry and model topology) — no flags needed;
      3. else, the default preset.
    ``cmd_train`` passes allow_store only when RESUMING: a fresh train into
    a reused store-dir must not silently inherit the previous run's
    experiment config from its stale meta.json."""
    from bsed_tpu.config import config_from_dict, get_config

    if getattr(args, "preset", None):
        return get_config(args.preset)
    store = getattr(args, "store_dir", None)
    if store and allow_store and os.path.isdir(store):
        from bsed_tpu.utils.checkpoint import CheckpointManager
        try:
            meta = CheckpointManager(store).load_meta()
        except FileNotFoundError:
            meta = {}
        if "config" in meta:
            return config_from_dict(meta["config"])
    return get_config("baseline")


def _apply_flags(cfg, args):
    if getattr(args, "tiny_audio", False):
        # smoke-test scale: 2 s clips at a reduced rate (CI / fixtures)
        from bsed_tpu.config import AudioConfig
        cfg = dataclasses.replace(cfg, audio=AudioConfig(
            sr=3200, hop_size=160, max_len_seconds=2.0))
    model = dataclasses.replace(cfg.model, use_fpn=args.use_fpn
                                if args.use_fpn else cfg.model.use_fpn)
    train = cfg.train
    if args.meanteacher or args.isp:
        # reference semantics: -ISP implies the mean teacher
        # (main_baseline.py:637-639); SCT-only training is available via
        # the sct_ada_weak preset rather than flags
        train = dataclasses.replace(train, mean_teacher=True,
                                    isp=args.isp or train.isp)
    if args.stage:
        train = dataclasses.replace(train, stage=args.stage)
    if getattr(args, "perf", False):
        # throughput configuration (bench.py's train_config; docs/PERF.md):
        # bf16 conv stack + train-mode folded-frequency stem + fused
        # Pallas stem-epilogue kernels + fused student/teacher streams.
        # Exact up to fp reassociation and pooled-BN batch stats — NOT the
        # per-stream-BN parity-grade dynamics, hence opt-in.
        model = dataclasses.replace(model, compute_dtype="bfloat16",
                                    folded_train_stem=True,
                                    fused_stem_epilogue=True)
        train = dataclasses.replace(train, fused_streams=True)
    da = cfg.da
    if args.level:
        da = dataclasses.replace(da, level=args.level)
    return dataclasses.replace(cfg, model=model, train=train, da=da)


def _datasets(cfg, args):
    """(syn, weak, unlabeled, val) datasets — real feature dumps under
    --data-root, deterministic synthetic fixtures otherwise so every command
    is runnable without shipped data."""
    from bsed_tpu.data.codec import ManyHotEncoder
    from bsed_tpu.data.datasets import (NpyFeatureDataset,
                                        PseudoLabeledDataset,
                                        SyntheticDataSource)

    codec = ManyHotEncoder(cfg.bird_list, n_frames=cfg.n_frames,
                           sr=cfg.audio.sr, hop_size=cfg.audio.hop_size,
                           pooling_time_ratio=cfg.model.pooling_time_ratio)
    root = args.data_root
    if root is None:
        n = args.subpart_data or 64
        syn = SyntheticDataSource(cfg, n_items=n, seed=1)
        weak = SyntheticDataSource(cfg, n_items=n // 2, seed=2)
        unlab = SyntheticDataSource(cfg, n_items=n // 2, seed=3)
        val = SyntheticDataSource(cfg, n_items=max(8, n // 4), seed=4)
    else:
        syn = NpyFeatureDataset(
            os.path.join(root, cfg.data.synth_root,
                         cfg.data.synth_feature_subdir), codec, cfg)
        weak = NpyFeatureDataset(
            os.path.join(root, cfg.data.dataset_root,
                         cfg.data.train_weak_subdir), codec, cfg)
        pl_tsv = getattr(args, "pseudo_labels", None)
        if pl_tsv and not os.path.exists(pl_tsv):
            # an explicitly requested TSV must exist — silently training
            # with all-empty weak targets would be a trap (the dataset
            # itself tolerates a missing DEFAULT TSV so the pseudo-label
            # writer can read the unlabeled set before the first cycle)
            sys.exit(f"error: pseudo-label TSV not found: {pl_tsv}")
        pl_tsv = pl_tsv or cfg.data.pseudo_label_tsv
        unlab = PseudoLabeledDataset(
            os.path.join(root, cfg.data.dataset_root,
                         cfg.data.train_unlabeled_subdir),
            pl_tsv, codec, cfg)
        val = NpyFeatureDataset(
            os.path.join(root, cfg.data.dataset_root, cfg.data.val_subdir),
            codec, cfg)
    return syn, weak, unlab, val


def _dataset_loaders(cfg, args):
    import jax

    from bsed_tpu.data.pipeline import EvalLoader, ThreeStreamLoader

    syn, weak, unlab, val = _datasets(cfg, args)
    # multi-host SPMD: each process feeds its own strided slice of every
    # stream (run under jax.distributed.initialize(); on a single host this
    # is (0, 1) — a no-op). The Trainer builds the device mesh itself.
    # the origin lineage trains on the COMBINED real batch (¼ weak +
    # ½ unlabeled + ¼ syn-strong rows, main.py:729-741) — see
    # ThreeStreamLoader layout="origin"
    layout = ("origin" if cfg.train.isp and
              cfg.train.isp_flavor == "origin" else "default")
    train_loader = ThreeStreamLoader(syn, weak, unlab,
                                     batch_size=cfg.train.batch_size,
                                     seed=cfg.train.seed,
                                     process_index=jax.process_index(),
                                     process_count=jax.process_count(),
                                     layout=layout)
    val_loader = EvalLoader(val, batch_size=cfg.train.batch_size)
    syn_eval = EvalLoader(syn, batch_size=cfg.train.batch_size)
    return train_loader, val_loader, syn_eval


def cmd_train(args):
    from bsed_tpu.train.trainer import Trainer

    if args.resume and args.start_epoch == 0:
        # auto-resume: continue after the newest epoch checkpoint in the
        # store (the productionized version of the reference's recovery,
        # which is editing start_epoch in-source — main_baseline.py:649)
        from bsed_tpu.utils.checkpoint import CheckpointManager
        if args.store_dir and os.path.isdir(args.store_dir):
            latest = CheckpointManager(args.store_dir).latest_epoch()
            if latest is not None:
                args.start_epoch = latest + 1
                print(f"# --resume: continuing from epoch {args.start_epoch}"
                      f" (newest checkpoint epoch_{latest})")
    cfg = _apply_flags(
        _resolve_config(args, allow_store=args.start_epoch > 0), args)
    train_loader, val_loader, syn_eval = _dataset_loaders(cfg, args)
    trainer = Trainer(cfg, train_loader, val_loader=val_loader,
                      syn_eval_loader=syn_eval if args.eval_syn else None,
                      store_dir=args.store_dir,
                      use_tensorboard=args.tensorboard,
                      profile_dir=args.profile_dir,
                      grad_flow=args.grad_flow,
                      mesh=args.mesh,
                      scan_epoch=args.scan_epoch)
    best = trainer.fit(n_epochs=args.epochs, start_epoch=args.start_epoch)
    print(best)


def cmd_eval(args):
    from bsed_tpu.eval.test_model import evaluate_checkpoint

    cfg = _apply_flags(_resolve_config(args), args)
    _, val_loader, _ = _dataset_loaders(cfg, args)
    results = evaluate_checkpoint(
        cfg, val_loader, store_dir=args.store_dir,
        torch_ckpt=args.torch_checkpoint, tag=args.tag,
        learned_post=args.learned_post,
        confusion_csv=args.confusion_csv)
    if args.psds_sweep:
        results.update(_psds_sweep(cfg, args, val_loader))
    print({k: v for k, v in results.items() if k != "per_class_f1"})


def _load_eval_params(cfg, args):
    """(params, batch_stats) from an orbax store-dir or a torch pickle."""
    from bsed_tpu.eval.test_model import load_torch_checkpoint
    from bsed_tpu.train.steps import build_modules, create_train_state
    from bsed_tpu.utils.checkpoint import CheckpointManager

    modules = build_modules(cfg)
    if getattr(args, "torch_checkpoint", None):
        params, stats = load_torch_checkpoint(args.torch_checkpoint, cfg)
    else:
        import jax
        template = create_train_state(cfg, modules, jax.random.key(0))
        state = CheckpointManager(args.store_dir).restore(
            getattr(args, "tag", "best"), template)
        params, stats = state.params, state.batch_stats
    return modules, params, stats


def _psds_sweep(cfg, args, val_loader):
    """Multi-OP PSDS report at (0,0)/(1,0)/(0,1) + ROC curve dump
    (evaluation_measures.py:287-315)."""
    import jax.numpy as jnp
    import numpy as np

    from bsed_tpu.eval.decode import (groundtruth_df_from_events,
                                      gt_events_from_frame_targets)
    from bsed_tpu.eval.operating_points import (default_thresholds,
                                                sweep_operating_points)
    from bsed_tpu.eval.psds import compute_psds
    from bsed_tpu.train.steps import make_predict_fn

    from bsed_tpu.data.codec import ManyHotEncoder

    modules, params, stats = _load_eval_params(cfg, args)
    predict = make_predict_fn(modules)

    # GT at original second resolution when the dataset provides it;
    # otherwise fall back to decoding the frame targets (like
    # evaluate_checkpoint / Trainer.evaluate) rather than scoring against
    # an empty ground truth
    true_events = val_loader.groundtruth_events()
    gt_events = dict(true_events) if true_events is not None else {}
    codec = ManyHotEncoder(cfg.bird_list, n_frames=cfg.n_frames,
                           sr=cfg.audio.sr, hop_size=cfg.audio.hop_size,
                           pooling_time_ratio=cfg.model.pooling_time_ratio)

    def batches():
        for mel, target, names, n_valid in val_loader:
            strong, _ = predict(params, stats, jnp.asarray(mel),
                                inference=cfg.model.use_fpn)
            if true_events is None:
                target = np.asarray(target)[:n_valid]
                if target.ndim == 3:
                    gt_events.update(gt_events_from_frame_targets(
                        target, names[:n_valid], codec, cfg))
            yield np.asarray(strong)[:n_valid], names[:n_valid]

    # run the forward pass first so gt_events is fully populated before
    # the operating points are scored
    collected = list(batches())
    gt_df = groundtruth_df_from_events(gt_events)
    sweep = sweep_operating_points(
        iter(collected), cfg, gt_df,
        thresholds=default_thresholds(args.n_thresholds))
    report = dict(sweep["psds"])
    if args.roc_out:
        os.makedirs(args.roc_out, exist_ok=True)
        for name, a_ct, a_st in (("psds_ct0_st0", 0.0, 0.0),
                                 ("psds_ct1_st0", 1.0, 0.0),
                                 ("psds_ct0_st1", 0.0, 1.0)):
            res = compute_psds(sweep["operating_points"],
                               sweep["total_duration_s"],
                               alpha_ct=a_ct, alpha_st=a_st)
            import pandas as pd
            pd.DataFrame({"efpr": res.efpr, "etpr": res.etpr}).to_csv(
                os.path.join(args.roc_out, f"roc_{name}.csv"), index=False)
            try:  # ROC plot files (evaluation_measures.py:304-311)
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.pyplot as plt
                fig, ax = plt.subplots()
                ax.step(res.efpr, res.etpr, where="post")
                ax.set_xlabel("eFPR (per hour)")
                ax.set_ylabel("eTPR")
                ax.set_title(f"{name}: PSDS={res.value:.4f}")
                fig.savefig(os.path.join(args.roc_out, f"roc_{name}.png"),
                            dpi=120)
                plt.close(fig)
            except ImportError:
                pass
    return report


def cmd_tag_train(args):
    """Weak audio-tagging trainer (audio_tagging_system_cnn.py): step (1) of
    the pseudo-labeling cycle (SURVEY.md §3.4)."""
    from bsed_tpu.data.prefetch import prefetch
    from bsed_tpu.train.tagging_trainer import TaggingTrainer

    cfg = _apply_flags(_resolve_config(args), args)
    train_loader, val_loader, _ = _dataset_loaders(cfg, args)
    trainer = TaggingTrainer(cfg, arch=args.arch,
                             mean_teacher=args.meanteacher)
    if args.weights_file:
        # torchvision-style resnet18 state_dict (the reference's
        # pretrained=True init, audio_tagging_system_cnn.py:50-59)
        trainer.load_pretrained_torch(args.weights_file)
    best_f1, best_epoch = 0.0, -1
    for epoch in range(args.epochs):
        loss = trainer.train_epoch(
            prefetch(train_loader.epoch(epoch), depth=2), epoch)
        f1 = trainer.evaluate(val_loader)
        if f1 >= best_f1:
            best_f1, best_epoch = f1, epoch
            if args.save:
                trainer.save(args.save)
        print({"epoch": epoch, "loss": round(loss, 4),
               "weak_f1": round(f1, 4)})
    print({"best_weak_f1": round(best_f1, 4), "best_epoch": best_epoch,
           "saved": args.save})


def cmd_pseudo_label(args):
    """Pseudo-label TSV writer (audio_tagging_inference.py:288-313): step
    (2) of the cycle — tagger weak posteriors over the unlabeled set →
    threshold → decode_weak → TSV consumed by the unlabeled stream."""
    from bsed_tpu.data.codec import ManyHotEncoder
    from bsed_tpu.train.tagging_trainer import (TaggingTrainer,
                                                write_pseudo_labels)

    cfg = _apply_flags(_resolve_config(args), args)
    _, _, unlab, _ = _datasets(cfg, args)
    codec = ManyHotEncoder(cfg.bird_list, n_frames=cfg.n_frames,
                           sr=cfg.audio.sr, hop_size=cfg.audio.hop_size,
                           pooling_time_ratio=cfg.model.pooling_time_ratio)
    trainer = TaggingTrainer(cfg, arch=args.arch)
    trainer.load(args.weights)
    df = write_pseudo_labels(trainer.predict_weak, unlab, args.out_tsv,
                             codec, threshold=args.threshold)
    print({"rows": len(df), "out": args.out_tsv})


def cmd_features(args):
    """Encoder-embedding dumper (save_features.py:235-283)."""
    import jax.numpy as jnp  # noqa: F401  (forces backend init first)

    from bsed_tpu.data.pipeline import EvalLoader
    from bsed_tpu.eval.features import dump_features, make_encode_fn

    cfg = _apply_flags(_resolve_config(args), args)
    syn, weak, unlab, val = _datasets(cfg, args)
    split = {"syn": syn, "weak": weak, "unlabeled": unlab,
             "val": val}[args.split]
    loader = EvalLoader(split, batch_size=cfg.train.batch_size)
    modules, params, stats = _load_eval_params(cfg, args)
    paths = dump_features(make_encode_fn(modules, params, stats), loader,
                          args.out_dir)
    print({"batches": len(paths), "out_dir": args.out_dir})


def cmd_visualize(args):
    """t-SNE + SVM domain-separability probes over two embedding dumps
    (visualize.py:22-121)."""
    import numpy as np

    from bsed_tpu.eval.features import load_feature_dir
    from bsed_tpu.eval.visualize import (svm_domain_accuracy,
                                         tsne_domain_audit)

    syn_emb = load_feature_dir(args.syn_features)
    real_emb = load_feature_dir(args.real_features)
    os.makedirs(args.out_dir, exist_ok=True)
    pts, labels, sil = tsne_domain_audit(
        syn_emb, real_emb,
        plot_path=os.path.join(args.out_dir, "tsne.png"))
    np.save(os.path.join(args.out_dir, "tsne_points.npy"), pts)
    np.save(os.path.join(args.out_dir, "tsne_domains.npy"), labels)
    acc = svm_domain_accuracy(syn_emb, real_emb)
    print({"silhouette": round(sil, 4), "svm_domain_accuracy": round(acc, 4),
           "out_dir": args.out_dir})


def cmd_preprocess(args):
    from bsed_tpu.config import get_config
    from bsed_tpu.data.preprocess import data_split, ena_data_preprocess

    cfg = get_config(args.preset)
    ena_data_preprocess(args.dataset_root, cfg)
    if not args.no_split:
        data_split(args.dataset_root, cfg)


def cmd_synthesize(args):
    from bsed_tpu.config import get_config
    from bsed_tpu.data.synthesizer import generate_dataset, syn_preprocess

    cfg = get_config(args.preset)
    generate_dataset(args.out, args.co_occur, args.n_soundscapes, cfg,
                     fg_dir=args.fg_dir, bg_dir=args.bg_dir, seed=args.seed)
    if args.features_out:
        syn_preprocess(args.out, args.features_out, cfg)


def cmd_analyze(args):
    from bsed_tpu.config import get_config
    from bsed_tpu.data.analysis import (collect_annotations,
                                        cooccurrence_matrix, duration_stats)

    cfg = get_config(args.preset)
    events = collect_annotations(args.annotation_dir, cfg.bird_list)
    os.makedirs(args.out_dir, exist_ok=True)
    cooccurrence_matrix(events, cfg.bird_list,
                        os.path.join(args.out_dir, "occurence_analysis.csv"))
    duration_stats(events, cfg.bird_list,
                   os.path.join(args.out_dir, "dataset_time_analysis.csv"))


def cmd_export(args):
    """Export a trained checkpoint as a reference-format torch pickle so the
    reference's own tooling (TestModel.py) can evaluate/resume it — the
    inverse of `eval --torch-checkpoint`."""
    from bsed_tpu.eval.test_model import export_torch_checkpoint

    cfg = _apply_flags(_resolve_config(args), args)
    _modules, params, stats = _load_eval_params(cfg, args)
    path = export_torch_checkpoint(cfg, params, stats, args.out,
                                   epoch=args.epoch)
    print(f"wrote reference-format checkpoint -> {path}")


def cmd_predict(args):
    """Raw-audio sound-event inference: WAV/npy → decoded event TSV.

    The reference has no one-command inference path — TestModel.py scores
    pre-dumped mel features only. This drives the fused serving pipeline
    (audio → on-device mel → CRNN → posterior → threshold → median filter →
    events) end to end, with overlap-averaged windowing for recordings
    longer than one clip (serve.py:predict_long_recording)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from bsed_tpu.eval.decode import extract_events_batch
    from bsed_tpu.ops.median import threshold_and_filter
    from bsed_tpu.serve import make_fast_forward, predict_long_recording
    from bsed_tpu.utils.audio import read_audio

    cfg = _apply_flags(_resolve_config(args), args)
    modules, params, stats = _load_eval_params(cfg, args)
    # multi-chip host: serve data-parallel over the largest mesh dividing
    # the window batch (zero collectives — clips are independent); single
    # chip: the plain fused program
    from bsed_tpu.parallel.mesh import auto_data_mesh, shard_batch
    mesh = auto_data_mesh(args.batch_size)
    if mesh is None:
        forward = jax.jit(make_fast_forward(cfg, modules, params, stats,
                                            precision=args.precision))
    else:
        from bsed_tpu.serve import make_sharded_forward
        inner = make_sharded_forward(cfg, modules, params, stats, mesh,
                                     precision=args.precision)
        bs = args.batch_size

        def forward(chunk):
            b = chunk.shape[0]
            if b != bs:   # static shapes: pad ragged tails to the batch
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], bs - b, 0)])
            strong, weak = inner(shard_batch(mesh, chunk))
            return strong[:b], weak[:b]

    sec_per_frame = (cfg.model.pooling_time_ratio
                     / (cfg.audio.sr / cfg.audio.hop_size))
    rows = []
    for path in args.audio:
        if path.endswith(".npy"):
            audio = np.load(path).astype(np.float32)
        else:
            audio, _ = read_audio(path, cfg.audio.sr)
        strong, _spf = predict_long_recording(
            forward, audio, cfg, batch_size=args.batch_size,
            hop_seconds=args.hop_seconds)
        act = threshold_and_filter(
            jnp.asarray(strong)[None],
            jnp.asarray([args.threshold], jnp.float32),
            window=cfg.median_window,
            windows=cfg.median_window_classwise if args.learned_post
            else None)
        _, _, c_idx, on_t, off_t = extract_events_batch(np.asarray(act))
        name = os.path.basename(path)
        for c, a, b in zip(c_idx, on_t, off_t):
            rows.append((name, cfg.bird_list[c], a * sec_per_frame,
                         b * sec_per_frame))
    df = pd.DataFrame(rows, columns=["filename", "event_label", "onset",
                                     "offset"])
    df.to_csv(args.out_tsv, sep="\t", index=False, float_format="%.3f")
    print(f"{len(df)} events from {len(args.audio)} recording(s) "
          f"-> {args.out_tsv}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bsed_tpu",
                                description="TPU-native bird-SED framework")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--preset", default=None,
                        help="named preset; omitted: rebuilt from the "
                             "store-dir's meta.json when present")
        sp.add_argument("--data-root", default=None)
        sp.add_argument("--store-dir", default=None)
        sp.add_argument("-s", "--subpart-data", type=int, default=None,
                        dest="subpart_data")
        sp.add_argument("-fpn", "--use-fpn", action="store_true")
        sp.add_argument("-mt", "--meanteacher", action="store_true")
        sp.add_argument("-ISP", "--ISP", dest="isp", action="store_true")
        sp.add_argument("-stage", "--stage",
                        choices=["pretrain", "adaptation"], default=None)
        sp.add_argument("-level", "--level", choices=["clip", "frame"],
                        default=None)
        sp.add_argument("--pseudo-labels", default=None)
        sp.add_argument("--tiny-audio", action="store_true",
                        help=argparse.SUPPRESS)

    sp = sub.add_parser("train")
    sp.add_argument("--perf", action="store_true",
                    help="throughput config: bf16 + folded train stem + "
                         "fused Pallas stem epilogue + fused streams "
                         "(39 ms/MT+ISP step vs 58 parity-grade on v5e; "
                         "pooled-BN semantics, see docs/PERF.md)")
    common(sp)
    sp.add_argument("--epochs", type=int, default=None)
    sp.add_argument("--start-epoch", type=int, default=0)
    sp.add_argument("--resume", action="store_true",
                    help="continue after the newest epoch checkpoint in "
                         "--store-dir (no-op when the store is empty)")
    sp.add_argument("--eval-syn", action="store_true")
    sp.add_argument("--tensorboard", action="store_true")
    sp.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler device trace of the first "
                         "trained epoch into this directory")
    sp.add_argument("--grad-flow", action="store_true",
                    help="per-parameter mean-|grad| metrics + "
                         "gradient_flow.png per epoch "
                         "(plot_grad_flow, main_baseline.py:108-123)")
    sp.add_argument("--mesh", choices=("auto", "off"), default="auto",
                    help="'auto' (default): on a multi-chip host train "
                         "data-parallel over the largest batch-divisible "
                         "device mesh; 'off': force single-device")
    sp.add_argument("--scan-epoch", choices=("auto", "off"), default="auto",
                    help="'auto' (default): when the dataset is device-"
                         "resident and no mesh is in play, run each epoch "
                         "as ONE lax.scan dispatch; 'off': per-step loop "
                         "(per-step host visibility)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval")
    common(sp)
    sp.add_argument("--tag", default="best")
    sp.add_argument("--torch-checkpoint", default=None)
    sp.add_argument("--learned-post", action="store_true")
    sp.add_argument("--confusion-csv", default=None)
    sp.add_argument("--psds-sweep", action="store_true",
                    help="multi-threshold PSDS report at (0,0)/(1,0)/(0,1)")
    sp.add_argument("--n-thresholds", type=int, default=50)
    sp.add_argument("--roc-out", default=None,
                    help="directory for ROC curve CSV/PNG dumps")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("export",
                        help="orbax checkpoint -> reference torch pickle")
    common(sp)
    sp.add_argument("--tag", default="best")
    sp.add_argument("--torch-checkpoint", default=None)
    sp.add_argument("--out", required=True)
    sp.add_argument("--epoch", type=int, default=0)
    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("predict",
                        help="raw audio (wav/npy) -> decoded event TSV")
    common(sp)
    sp.add_argument("--audio", nargs="+", required=True,
                    help="wav or raw-audio .npy file(s), any length")
    sp.add_argument("--out-tsv", required=True)
    sp.add_argument("--tag", default="best")
    sp.add_argument("--torch-checkpoint", default=None)
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.add_argument("--learned-post", action="store_true",
                    help="class-wise median windows instead of the fixed one")
    sp.add_argument("--hop-seconds", type=float, default=None,
                    help="window hop for long recordings (default: one clip)")
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--precision", default="high",
                    choices=["highest", "high", "fast"])
    sp.set_defaults(fn=cmd_predict)

    sp = sub.add_parser("tag-train",
                        help="train the weak audio tagger (cycle step 1)")
    common(sp)
    sp.add_argument("--arch", choices=["resnet", "vgg"], default="resnet")
    sp.add_argument("--epochs", type=int, default=1)
    sp.add_argument("--save", default=None,
                    help="path for the best tagger weights (msgpack)")
    sp.add_argument("--weights-file", default=None,
                    help="torchvision resnet18 state_dict pickle for "
                         "pretrained initialization")
    sp.set_defaults(fn=cmd_tag_train)

    sp = sub.add_parser("pseudo-label",
                        help="write the weak pseudo-label TSV (cycle step 2)")
    common(sp)
    sp.add_argument("--arch", choices=["resnet", "vgg"], default="resnet")
    sp.add_argument("--weights", required=True)
    sp.add_argument("--out-tsv", required=True)
    sp.add_argument("--threshold", type=float, default=0.5)
    sp.set_defaults(fn=cmd_pseudo_label)

    sp = sub.add_parser("features",
                        help="dump (B, 313, 256) encoder embeddings")
    common(sp)
    sp.add_argument("--tag", default="best")
    sp.add_argument("--torch-checkpoint", default=None)
    sp.add_argument("--split", choices=["syn", "weak", "unlabeled", "val"],
                    default="val")
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_features)

    sp = sub.add_parser("visualize",
                        help="t-SNE + SVM domain probes over feature dumps")
    sp.add_argument("--syn-features", required=True)
    sp.add_argument("--real-features", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_visualize)

    sp = sub.add_parser("preprocess")
    sp.add_argument("--preset", default="baseline")
    sp.add_argument("--dataset-root", required=True)
    sp.add_argument("--no-split", action="store_true")
    sp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("synthesize")
    sp.add_argument("--preset", default="baseline")
    sp.add_argument("--co-occur", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--n-soundscapes", type=int, default=100)
    sp.add_argument("--fg-dir", default=None)
    sp.add_argument("--bg-dir", default=None)
    sp.add_argument("--features-out", default=None)
    sp.add_argument("--seed", type=int, default=2023)
    sp.set_defaults(fn=cmd_synthesize)

    sp = sub.add_parser("analyze")
    sp.add_argument("--preset", default="baseline")
    sp.add_argument("--annotation-dir", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_analyze)

    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    try:
        args.fn(args)
    except KeyError as e:
        from bsed_tpu.config import PRESETS
        if str(e).strip("'") in (getattr(args, "preset", "") or ""):
            sys.exit(f"error: unknown preset {e}; available: "
                     f"{', '.join(sorted(PRESETS))}")
        raise
    except FileNotFoundError as e:
        sys.exit(f"error: {e}")


if __name__ == "__main__":
    main()
