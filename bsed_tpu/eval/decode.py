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

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from bsed_tpu.config import Config
from bsed_tpu.data.codec import find_contiguous_regions
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
    out: Dict[float, pd.DataFrame] = {}
    for k, th in enumerate(thresholds):
        rows: List[Tuple[str, float, float, str]] = []
        for b, fname in enumerate(filenames):
            act = filtered[k, b]  # (T, C)
            for c in range(act.shape[1]):
                for a, bb in find_contiguous_regions(act[:, c]):
                    onset = min(max(a * sec_per_frame, 0.0),
                                cfg.audio.max_len_seconds)
                    offset = min(max(bb * sec_per_frame, 0.0),
                                 cfg.audio.max_len_seconds)
                    rows.append((labels[c], onset, offset, fname))
        out[th] = pd.DataFrame(
            rows, columns=["event_label", "onset", "offset", "filename"])
    return out


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
