"""Unified CLI — one entry point replacing the reference's shell-level API
of 14 ``python main_X.py``/``TestModel.py``/tagging scripts
(SURVEY.md §1 L4/L5).

    python -m bsed_tpu.cli train --preset baseline_mt_isp --data-root ...
    python -m bsed_tpu.cli eval --store-dir stored_data/<name> ...
    python -m bsed_tpu.cli preprocess --dataset-root dataset/ENA
    python -m bsed_tpu.cli synthesize --co-occur ... --out ...
    python -m bsed_tpu.cli tag-train / pseudo-label / features / analyze

Flags mirror the reference argparse surface (main_baseline.py:609-632):
``-fpn``/``--use-fpn``, ``-mt``/``--meanteacher``, ``-ISP``, ``-stage``,
``-level``, ``-s/--subpart-data``.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys


def _apply_flags(cfg, args):
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
    da = cfg.da
    if args.level:
        da = dataclasses.replace(da, level=args.level)
    return dataclasses.replace(cfg, model=model, train=train, da=da)


def _dataset_loaders(cfg, args):
    from bsed_tpu.data.codec import ManyHotEncoder
    from bsed_tpu.data.datasets import (NpyFeatureDataset,
                                        PseudoLabeledDataset,
                                        SyntheticDataSource)
    from bsed_tpu.data.pipeline import EvalLoader, ThreeStreamLoader

    codec = ManyHotEncoder(cfg.bird_list, n_frames=cfg.n_frames,
                           sr=cfg.audio.sr, hop_size=cfg.audio.hop_size,
                           pooling_time_ratio=cfg.model.pooling_time_ratio)
    root = args.data_root
    if root is None:
        # no data shipped: synthetic fixtures so every command is runnable
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
        pl_tsv = args.pseudo_labels or cfg.data.pseudo_label_tsv
        unlab = PseudoLabeledDataset(
            os.path.join(root, cfg.data.dataset_root,
                         cfg.data.train_unlabeled_subdir),
            pl_tsv, codec, cfg)
        val = NpyFeatureDataset(
            os.path.join(root, cfg.data.dataset_root, cfg.data.val_subdir),
            codec, cfg)
    train_loader = ThreeStreamLoader(syn, weak, unlab,
                                     batch_size=cfg.train.batch_size,
                                     seed=cfg.train.seed)
    val_loader = EvalLoader(val, batch_size=cfg.train.batch_size)
    syn_eval = EvalLoader(syn, batch_size=cfg.train.batch_size)
    return train_loader, val_loader, syn_eval


def cmd_train(args):
    from bsed_tpu.config import get_config
    from bsed_tpu.train.trainer import Trainer

    cfg = _apply_flags(get_config(args.preset), args)
    train_loader, val_loader, syn_eval = _dataset_loaders(cfg, args)
    trainer = Trainer(cfg, train_loader, val_loader=val_loader,
                      syn_eval_loader=syn_eval if args.eval_syn else None,
                      store_dir=args.store_dir,
                      use_tensorboard=args.tensorboard)
    best = trainer.fit(n_epochs=args.epochs, start_epoch=args.start_epoch)
    print(best)


def cmd_eval(args):
    from bsed_tpu.config import get_config
    from bsed_tpu.eval.test_model import evaluate_checkpoint

    cfg = _apply_flags(get_config(args.preset), args)
    _, val_loader, _ = _dataset_loaders(cfg, args)
    results = evaluate_checkpoint(
        cfg, val_loader, store_dir=args.store_dir,
        torch_ckpt=args.torch_checkpoint, tag=args.tag,
        learned_post=args.learned_post,
        confusion_csv=args.confusion_csv)
    print({k: v for k, v in results.items() if k != "per_class_f1"})


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


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bsed_tpu",
                                description="TPU-native bird-SED framework")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--preset", default="baseline")
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

    sp = sub.add_parser("train")
    common(sp)
    sp.add_argument("--epochs", type=int, default=None)
    sp.add_argument("--start-epoch", type=int, default=0)
    sp.add_argument("--eval-syn", action="store_true")
    sp.add_argument("--tensorboard", action="store_true")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval")
    common(sp)
    sp.add_argument("--tag", default="best")
    sp.add_argument("--torch-checkpoint", default=None)
    sp.add_argument("--learned-post", action="store_true")
    sp.add_argument("--confusion-csv", default=None)
    sp.set_defaults(fn=cmd_eval)

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
        if str(e).strip("'") in getattr(args, "preset", ""):
            sys.exit(f"error: unknown preset {e}; available: "
                     f"{', '.join(sorted(PRESETS))}")
        raise
    except FileNotFoundError as e:
        sys.exit(f"error: {e}")


if __name__ == "__main__":
    main()
