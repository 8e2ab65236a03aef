"""Dataset analysis + review tooling.

References:
  * /root/reference/src/data/dataset_analysis.py — class co-occurrence
    matrix (→ occurence_analysis.csv) and per-species duration statistics
    (→ dataset_time_analysis.csv).
  * /root/reference/src/data/data_save_audio.py — cut every annotated event
    into per-species review WAVs.
"""
from __future__ import annotations

import os
from glob import glob
from typing import Dict, List, Sequence

import numpy as np
import pandas as pd

from bsed_tpu.config import Config
from bsed_tpu.data.annotations import load_raven_annotations


def collect_annotations(annotation_dir: str, bird_list: Sequence[str]
                        ) -> pd.DataFrame:
    """All per-clip annotation txts under a preprocess dir → one frame."""
    frames = []
    for path in sorted(glob(os.path.join(annotation_dir, "*.txt"))):
        df = pd.read_csv(path, sep="\t")
        if not len(df):
            continue
        df["filename"] = os.path.splitext(os.path.basename(path))[0]
        frames.append(df)
    if not frames:
        return pd.DataFrame(columns=["onset", "offset", "event_label",
                                     "filename"])
    return pd.concat(frames, ignore_index=True)


def cooccurrence_matrix(events: pd.DataFrame, bird_list: Sequence[str],
                        out_csv: str = None) -> pd.DataFrame:
    """Clip-level class co-occurrence counts."""
    mat = pd.DataFrame(0, index=list(bird_list), columns=list(bird_list))
    for _, grp in events.groupby("filename"):
        present = [c for c in grp["event_label"].unique() if c in bird_list]
        for a in present:
            for b in present:
                mat.loc[a, b] += 1
    if out_csv:
        mat.to_csv(out_csv)
    return mat


def duration_stats(events: pd.DataFrame, bird_list: Sequence[str],
                   out_csv: str = None) -> pd.DataFrame:
    """Per-species event counts + duration statistics."""
    rows = []
    for cls in bird_list:
        durs = (events.loc[events.event_label == cls, "offset"]
                - events.loc[events.event_label == cls, "onset"])
        rows.append({
            "event_label": cls,
            "count": len(durs),
            "total_s": float(durs.sum()) if len(durs) else 0.0,
            "mean_s": float(durs.mean()) if len(durs) else 0.0,
            "min_s": float(durs.min()) if len(durs) else 0.0,
            "max_s": float(durs.max()) if len(durs) else 0.0,
        })
    df = pd.DataFrame(rows)
    if out_csv:
        df.to_csv(out_csv, index=False)
    return df


def export_event_audio(dataset_root: str, out_dir: str, cfg: Config,
                       pad_s: float = 0.0) -> int:
    """Cut every annotated event into per-species review wavs
    (data_save_audio.py capability)."""
    from scipy.io import wavfile
    from bsed_tpu.data.preprocess import read_wav

    annotation_root = os.path.join(dataset_root, "annotation")
    recording_root = os.path.join(dataset_root, "wav")
    n_written = 0
    domains = [d for d in sorted(os.listdir(annotation_root))
               if "Recording" in d] if os.path.isdir(annotation_root) else []
    for domain in domains:
        for wav_path in sorted(glob(os.path.join(recording_root, domain,
                                                 "*.wav"))):
            stem = os.path.splitext(os.path.basename(wav_path))[0]
            matches = glob(os.path.join(annotation_root, domain,
                                        stem + "*.txt"))
            if not matches:
                continue
            audio = read_wav(wav_path, cfg.audio.sr)
            df = load_raven_annotations(matches[0], cfg.bird_list)
            for i, row in df.iterrows():
                cls_dir = os.path.join(out_dir, row["event_label"])
                os.makedirs(cls_dir, exist_ok=True)
                a = max(0, int((row["onset"] - pad_s) * cfg.audio.sr))
                b = min(len(audio),
                        int((row["offset"] + pad_s) * cfg.audio.sr))
                if b <= a:
                    continue
                wavfile.write(
                    os.path.join(cls_dir, f"{stem}_{i}.wav"),
                    cfg.audio.sr,
                    (audio[a:b] * 32767).astype(np.int16))
                n_written += 1
    return n_written


def mix_audio_files(paths: Sequence[str], out_path: str,
                    sr: int = 32000) -> str:
    """Equal-weight mix of audio files into one wav — the reference's
    review-mix tool (/root/reference/dataset/SYN_test/generated_mix/mix.py:
    load N wavs at 32 kHz, average, write). Shorter inputs are zero-padded
    to the longest."""
    from scipy.io import wavfile

    from bsed_tpu.utils.audio import read_audio

    audios = [read_audio(p, sr)[0] for p in paths]
    n = max(len(a) for a in audios)
    mix = np.zeros(n, dtype=np.float32)
    for a in audios:
        mix[:len(a)] += a
    mix /= len(audios)
    wavfile.write(out_path, sr, mix)
    return out_path
