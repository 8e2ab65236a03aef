"""Checkpoint evaluation — the reference's TestModel.py as a library + CLI.

Reference: /root/reference/src/TestModel.py — loads the best checkpoint,
rebuilds model/encoder/median-window state from it (:34-120), runs
``get_predictions`` + ``compute_metrics`` on the validation set, and writes
a cross-trigger confusion-matrix CSV (:262-265).

Two checkpoint sources are supported:
  * this framework's orbax checkpoints (``stored_data/<name>/model/best``),
  * reference torch pickles via ``bsed_tpu.utils.torch_compat`` (incl. the
    legacy cnn.→cnn.cnn. key migration) for the numerics-parity gate.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from bsed_tpu.config import Config, get_config
from bsed_tpu.data.codec import ManyHotEncoder
from bsed_tpu.data.pipeline import EvalLoader
from bsed_tpu.eval.decode import (decode_batch, groundtruth_df_from_events,
                                  gt_events_from_frame_targets,
                                  merge_prediction_dfs)
from bsed_tpu.eval.psds import compute_macro_f_score
from bsed_tpu.eval.sed_scores import (event_based_counts, macro_f_measure,
                                      per_class_report)
from bsed_tpu.train.steps import (build_modules, create_train_state,
                                  make_predict_fn)
from bsed_tpu.utils.checkpoint import CheckpointManager
from bsed_tpu.utils.logger import create_logger

log = create_logger("bsed_tpu/test_model")


def load_torch_checkpoint(path: str, cfg: Config):
    """Reference torch pickle → (params, batch_stats) for our modules."""
    import torch
    from bsed_tpu.utils import torch_compat as tc

    if cfg.model.predictor_head == "crnn":
        raise ValueError(
            "predictor_head='crnn' has no reference checkpoint layout to "
            "load from: the reference's CRNN_pred-as-head wiring "
            "(main_scmt_ada_weak_seperate_2_crnn.py:673-687) is commented "
            "out; only the 'linear' and 'mlp' heads round-trip")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    crnn_sd = ckpt["model"]["state_dict"]
    pred_sd = ckpt["model_p"]["state_dict"]
    params, stats = tc.convert_crnn(
        {k: v for k, v in crnn_sd.items()},
        n_blocks=len(cfg.model.nb_filters),
        num_layers_rnn=cfg.model.n_layers_rnn,
        activation=cfg.model.activation,
        fpn=cfg.model.use_fpn)
    p_params = tc.convert_predictor({k: v for k, v in pred_sd.items()})
    return ({"encoder": params, "predictor": p_params},
            {"encoder": stats})


def export_torch_checkpoint(cfg: Config, params: Dict, batch_stats: Dict,
                            path: str, epoch: int = 0) -> str:
    """(params, batch_stats) → reference torch pickle.

    Writes the exact layout the reference saves (main_baseline.py:895-971)
    and its TestModel.py consumes — incl. rebuildable ``kwargs`` — so a
    model trained HERE can be evaluated/resumed by the reference's own
    tooling. Inverse of ``load_torch_checkpoint`` (round-trip and
    real-reference-class load are pinned in tests/test_reference_parity.py).
    """
    import torch

    from bsed_tpu.utils import torch_compat as tc

    m = cfg.model
    if m.predictor_head == "crnn":
        raise ValueError(
            "predictor_head='crnn' has no reference checkpoint layout to "
            "export to (see load_torch_checkpoint); only 'linear' and "
            "'mlp' heads round-trip")
    crnn_sd = tc.export_crnn(params["encoder"], batch_stats["encoder"],
                             n_blocks=len(m.nb_filters),
                             num_layers_rnn=m.n_layers_rnn,
                             activation=m.activation, fpn=m.use_fpn)
    pred_sd = tc.export_predictor(params["predictor"])
    as_t = lambda sd: {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()}
    n = len(m.nb_filters)
    crnn_kwargs = {
        "n_in_channel": 1, "nclass": cfg.nclass, "attention": True,
        "n_RNN_cell": m.n_rnn_cell, "n_layers_RNN": m.n_layers_rnn,
        "activation": m.activation, "dropout": m.dropout,
        "kernel_size": n * [m.kernel_size], "padding": n * [1],
        "stride": n * [1], "nb_filters": list(m.nb_filters),
        "pooling": [list(p) for p in m.pooling],
    }
    encoder = ManyHotEncoder(cfg.bird_list, n_frames=cfg.n_frames,
                             sr=cfg.audio.sr, hop_size=cfg.audio.hop_size,
                             pooling_time_ratio=m.pooling_time_ratio)
    torch.save({
        "model": {"name": "CRNN_fpn" if m.use_fpn else "CRNN", "args": "",
                  "kwargs": crnn_kwargs, "state_dict": as_t(crnn_sd)},
        "model_p": {"name": ("Predictor_2" if m.predictor_head == "mlp"
                             else "Predictor"), "args": "",
                    "kwargs": {"nclass": cfg.nclass, "attention": True,
                               "n_RNN_cell": m.n_rnn_cell},
                    "state_dict": as_t(pred_sd)},
        "pooling_time_ratio": m.pooling_time_ratio,
        "many_hot_encoder": encoder.state_dict(),
        "median_window": cfg.median_window,
        "epoch": epoch,
    }, path)
    return path


def evaluate_checkpoint(cfg: Config, loader: EvalLoader,
                        store_dir: Optional[str] = None,
                        torch_ckpt: Optional[str] = None,
                        tag: str = "best",
                        thresholds=(0.5,),
                        learned_post: bool = False,
                        confusion_csv: Optional[str] = None
                        ) -> Dict[str, float]:
    modules = build_modules(cfg)
    if torch_ckpt is not None:
        params, stats = load_torch_checkpoint(torch_ckpt, cfg)
    else:
        import jax
        template = create_train_state(cfg, modules, jax.random.key(0))
        state = CheckpointManager(store_dir).restore(tag, template)
        params, stats = state.params, state.batch_stats
    predict = make_predict_fn(modules)
    codec = ManyHotEncoder(cfg.bird_list, n_frames=cfg.n_frames,
                           sr=cfg.audio.sr, hop_size=cfg.audio.hop_size,
                           pooling_time_ratio=cfg.model.pooling_time_ratio)

    pred_dfs = []
    # GT at original second resolution (evaluation_measures.py:226-248);
    # frame-decoded reconstruction only when annotations are unavailable
    true_events = loader.groundtruth_events()
    gt_events = true_events if true_events is not None else {}
    for mel, target, names, n_valid in loader:
        strong, _ = predict(params, stats, jnp.asarray(mel),
                            inference=cfg.model.use_fpn)
        strong = np.asarray(strong)[:n_valid]
        names = names[:n_valid]
        pred_dfs.append(decode_batch(strong, names, cfg.bird_list, cfg,
                                     thresholds=thresholds,
                                     learned_post=learned_post))
        target = np.asarray(target)[:n_valid]
        if true_events is None:
            gt_events.update(gt_events_from_frame_targets(
                target, names, codec, cfg))

    merged = merge_prediction_dfs(pred_dfs)
    gt_df = groundtruth_df_from_events(gt_events)

    # score EVERY requested threshold (the primary/reported one is
    # thresholds[0], matching the reference's single 0.5 headline —
    # evaluation_measures.py:518-526); extra thresholds land in
    # per_threshold instead of being silently discarded
    per_threshold = {}
    for thr in thresholds:
        c = event_based_counts(gt_df, merged[thr])
        per_threshold[thr] = float(
            np.mean([cc.f_measure for cc in c.values()])) if c else 0.0
    pred_df = merged[thresholds[0]]
    counts = event_based_counts(gt_df, pred_df)
    event_f1 = per_threshold[thresholds[0]]
    ct, psds_f1, per_class = compute_macro_f_score(pred_df, gt_df)
    log.info("event F1=%.4f  psds F1=%.4f", event_f1, psds_f1)
    log.info("\n%s", per_class_report(counts))

    if confusion_csv:
        classes = sorted(set(gt_df["event_label"].dropna())
                         | set(pred_df["event_label"].dropna()))
        pd.DataFrame(ct, index=classes, columns=classes).to_csv(
            confusion_csv)

    results = {"event_f1": event_f1, "psds_f1": psds_f1,
               "per_class_f1": {k: c.f_measure for k, c in counts.items()}}
    if len(thresholds) > 1:
        results["event_f1_per_threshold"] = per_threshold
    return results
