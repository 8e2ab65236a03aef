"""Posterior → event-list decoding.

Reference: /root/reference/src/evaluation_measures.py:123-283
(``get_predictions``). The per-clip, per-threshold host loop (binarize →
scipy median filter → contiguous regions → seconds) becomes:

  1. one on-device pass binarizing + median-filtering ALL clips and ALL
     thresholds at once (ops/median.py),
  2. a single device→host transfer,
  3. vectorized numpy run-length extraction per clip into dataframes.

Frame→second conversion matches the reference exactly:
``pooling_time_ratio / (sr / hop_size)`` seconds per pooled frame, clipped
to [0, max_len_seconds] (evaluation_measures.py:208-209).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from bsed_tpu.config import Config
from bsed_tpu.ops.median import threshold_and_filter


def decode_batch(
    strong_probs: np.ndarray,
    filenames: Sequence[str],
    labels: Sequence[str],
    cfg: Config,
    thresholds: Sequence[float] = (0.5,),
    learned_post: bool = False,
) -> Dict[float, pd.DataFrame]:
    """(B, T, C) frame posteriors → {threshold: events dataframe}.

    Dataframe columns: event_label, onset, offset (seconds), filename.
    """
    thresholds = list(thresholds)
    probs = jnp.asarray(strong_probs)
    windows = cfg.median_window_classwise if learned_post else None
    filtered = threshold_and_filter(
        probs, jnp.asarray(thresholds, jnp.float32),
        window=cfg.median_window,
        windows=windows)
    filtered = np.asarray(filtered)  # (K, B, T, C)

    sec_per_frame = cfg.model.pooling_time_ratio / (cfg.audio.sr / cfg.audio.hop_size)
    k_idx, b_idx, c_idx, on_t, off_t = extract_events_batch(filtered)
    onset = np.clip(on_t * sec_per_frame, 0.0, cfg.audio.max_len_seconds)
    offset = np.clip(off_t * sec_per_frame, 0.0, cfg.audio.max_len_seconds)
    label_arr = np.asarray(labels, dtype=object)
    fname_arr = np.asarray(list(filenames), dtype=object)

    out: Dict[float, pd.DataFrame] = {}
    for k, th in enumerate(thresholds):
        m = k_idx == k
        out[th] = pd.DataFrame({
            "event_label": label_arr[c_idx[m]],
            "onset": onset[m],
            "offset": offset[m],
            "filename": fname_arr[b_idx[m]],
        })
    return out


def extract_events_batch(act: np.ndarray):
    """All contiguous 1-runs of a (K, B, T, C) binary activity tensor in one
    vectorized pass (no per-clip/per-class Python loop — the reference loops
    clip × threshold × class on host, evaluation_measures.py:188-215).

    Returns (k_idx, b_idx, c_idx, onset_frame, offset_frame) int arrays, one
    entry per event, offsets exclusive, ordered lexicographically by
    (k, b, c, onset). Equivalent to find_contiguous_regions per column
    (tests/test_decode_metrics.py pins the equivalence).
    """
    k, b, t, c = act.shape
    # (K, B, C, T) zero-padded along time: diff == +1 at onsets, -1 at the
    # frame AFTER the last active one (exclusive offset), both in-range.
    padded = np.zeros((k, b, c, t + 2), np.int8)
    padded[..., 1:-1] = act.transpose(0, 1, 3, 2)
    d = np.diff(padded, axis=-1)
    on_k, on_b, on_c, on_t = np.nonzero(d == 1)
    _, _, _, off_t = np.nonzero(d == -1)
    # np.nonzero is lexicographic in (k, b, c, t) and every run opens before
    # it closes, so onsets and offsets pair positionally within each column.
    # d[i] = padded[i+1] - padded[i] with padded[j] = a[j-1]: d[i] == +1 ⇒
    # a[i] starts a run (onset = i); d[i] == −1 ⇒ a[i-1] was the last active
    # frame (exclusive stop = i) — matching find_contiguous_regions exactly.
    return on_k, on_b, on_c, on_t, off_t


def merge_prediction_dfs(dfs: Sequence[Dict[float, pd.DataFrame]]
                         ) -> Dict[float, pd.DataFrame]:
    """Concatenate per-batch decodes into one dataframe per threshold."""
    out: Dict[float, pd.DataFrame] = {}
    if not dfs:
        return out
    for th in dfs[0]:
        out[th] = pd.concat([d[th] for d in dfs], ignore_index=True)
    return out


def save_prediction_dfs(dfs, base_path: str) -> list:
    """Per-threshold prediction TSV dump (evaluation_measures.py:250-270):
    one file per threshold named <base>/<threshold:.3f>.tsv (single
    threshold: <base>.tsv)."""
    import os

    thresholds = list(dfs)
    paths = []
    if len(thresholds) == 1:
        paths = [base_path if base_path.endswith(".tsv")
                 else base_path + ".tsv"]
    else:
        base, _ = os.path.splitext(base_path)
        os.makedirs(base, exist_ok=True)
        paths = [os.path.join(base, f"{th:.3f}.tsv") for th in thresholds]
    for th, path in zip(thresholds, paths):
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        dfs[th].to_csv(path, index=False, sep="\t", float_format="%.3f")
    return paths


def gt_events_from_frame_targets(targets: np.ndarray, names: Sequence[str],
                                 codec, cfg: Config
                                 ) -> Dict[str, list]:
    """Fallback ground-truth reconstruction from (B, T_frames, C) frame
    targets when original-second annotations are unavailable: run-length
    decode each clip's target matrix and convert pooled-frame indices to
    seconds (quantized at pooling_time_ratio/(sr/hop) ≈ 32 ms — the
    second-resolution path via ``EvalLoader.groundtruth_events`` is
    preferred, evaluation_measures.py:226-248). Shared by Trainer.evaluate,
    evaluate_checkpoint and ``cli eval --psds-sweep``."""
    sec = cfg.model.pooling_time_ratio / (cfg.audio.sr / cfg.audio.hop_size)
    out: Dict[str, list] = {}
    for b, name in enumerate(names):
        events = codec.decode_strong(targets[b])
        out[name] = [(label, a * sec, b_ * sec)
                     for (label, a, b_) in events]
    return out


def groundtruth_df_from_events(
    per_file_events: Dict[str, Sequence[Tuple[str, float, float]]]
) -> pd.DataFrame:
    rows = [(label, onset, offset, fname)
            for fname, events in per_file_events.items()
            for (label, onset, offset) in events]
    return pd.DataFrame(rows, columns=["event_label", "onset", "offset",
                                       "filename"])


def durations_df(filenames: Sequence[str], duration: float = 10.0) -> pd.DataFrame:
    """Fixed clip-duration metadata frame (evaluation_measures.py:227-230)."""
    uniq = list(dict.fromkeys(filenames))
    return pd.DataFrame({"filename": uniq, "duration": duration})
