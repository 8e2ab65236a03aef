"""Offline dataset fabrication: ENA field recordings → per-clip feature
dumps, with the mel extraction running batched ON DEVICE.

Reference: /root/reference/src/data/preprocess.py:152-298
(``ena_data_preprocess`` + ``data_split``). Differences by design:
  * librosa.load + per-clip CPU mel → one batched TPU pass per recording
    (bsed_tpu.ops.mel.MelFrontEnd) writing the same ``<wav>_<i>.npy``
    linear-mel dumps (1255×128 float32) and ``<wav>_<i>.txt`` annotations.
  * wav IO via scipy (soundfile/librosa are not installed); resampling via
    polyphase filtering (scipy.signal.resample_poly).
  * the annotation cleanup/segmentation ops live in
    bsed_tpu.data.annotations (vectorized, tested).
"""
from __future__ import annotations

import math
import os
from fractions import Fraction
from glob import glob
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from bsed_tpu.config import Config
from bsed_tpu.data.annotations import (clean_annotations, events_to_frame,
                                       load_raven_annotations,
                                       seeded_split, segment_annotations)
from bsed_tpu.utils.logger import create_logger

log = create_logger("bsed_tpu/preprocess")


def read_wav(path: str, target_sr: int) -> np.ndarray:
    """Load a wav file as mono float32 at ``target_sr``."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    sr, data = wavfile.read(path)
    if data.dtype.kind == "i":
        data = data.astype(np.float32) / np.iinfo(data.dtype).max
    elif data.dtype.kind == "u":
        info = np.iinfo(data.dtype)
        data = (data.astype(np.float32) - info.max / 2) / (info.max / 2)
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if sr != target_sr:
        frac = Fraction(target_sr, sr).limit_denominator(1000)
        data = resample_poly(data, frac.numerator, frac.denominator
                             ).astype(np.float32)
    return data


def segment_audio(audio: np.ndarray, seg_samples: int) -> np.ndarray:
    """Non-overlapping full segments (librosa.util.frame semantics —
    trailing partial segment dropped)."""
    n = len(audio) // seg_samples
    return audio[:n * seg_samples].reshape(n, seg_samples)


def preprocess_recording(wav_path: str, annotation_path: Optional[str],
                         cfg: Config, mel_out_dir: str, ann_out_dir: str,
                         front_end=None, batch_size: int = 16) -> List[str]:
    """One recording → per-10s npy/txt dumps. Returns dump basenames."""
    from bsed_tpu.ops.mel import MelFrontEnd

    fe = front_end or MelFrontEnd(cfg.audio)
    os.makedirs(mel_out_dir, exist_ok=True)
    os.makedirs(ann_out_dir, exist_ok=True)

    audio = read_wav(wav_path, cfg.audio.sr)
    seg_samples = int(cfg.audio.max_len_seconds * cfg.audio.sr)
    segments = segment_audio(audio, seg_samples)
    if not len(segments):
        return []

    if annotation_path is not None:
        df = load_raven_annotations(annotation_path, cfg.bird_list)
        events = clean_annotations(df, cfg.data.merge_gap_s,
                                   cfg.data.min_event_dur_s)
    else:
        events = []
    per_segment = segment_annotations(events, len(segments),
                                      cfg.audio.max_len_seconds)

    stem = os.path.splitext(os.path.basename(wav_path))[0]
    names = []
    from bsed_tpu.data.datasets import pad_or_trunc
    for start in range(0, len(segments), batch_size):
        chunk = segments[start:start + batch_size]
        # one batched device pass, normalized to exactly max_frames
        mels = pad_or_trunc(np.asarray(fe(chunk)), cfg.audio.max_frames)
        for j in range(len(chunk)):
            i = start + j
            name = f"{stem}_{i}"
            np.save(os.path.join(mel_out_dir, name), mels[j])
            events_to_frame(per_segment[i]).loc[
                :, ["onset", "offset", "event_label"]].to_csv(
                os.path.join(ann_out_dir, name + ".txt"), sep="\t",
                index=False)
            names.append(name)
    return names


def ena_data_preprocess(dataset_root: str, cfg: Config,
                        out_subdir: Optional[str] = None) -> List[str]:
    """All domains/recordings under <root>/wav + <root>/annotation
    (preprocess.py:152-233 layout)."""
    out = os.path.join(dataset_root, out_subdir or cfg.data.feature_subdir)
    mel_dir = os.path.join(out, "wav")
    ann_dir = os.path.join(out, "annotation")
    from bsed_tpu.ops.mel import MelFrontEnd
    fe = MelFrontEnd(cfg.audio)

    all_names = []
    annotation_root = os.path.join(dataset_root, "annotation")
    recording_root = os.path.join(dataset_root, "wav")
    domains = [d for d in sorted(os.listdir(annotation_root))
               if "Recording" in d] if os.path.isdir(annotation_root) else []
    for domain in domains:
        for wav_path in sorted(glob(os.path.join(recording_root, domain,
                                                 "*.wav"))):
            stem = os.path.splitext(os.path.basename(wav_path))[0]
            matches = glob(os.path.join(annotation_root, domain,
                                        stem + "*.txt"))
            ann = matches[0] if matches else None
            names = preprocess_recording(wav_path, ann, cfg, mel_dir,
                                         ann_dir, front_end=fe)
            all_names.extend(names)
            log.info("%s/%s → %d segments", domain, stem, len(names))
    return all_names


def data_split(dataset_root: str, cfg: Config) -> None:
    """Seeded 50% val / 12.5% weak / 37.5% unlabeled copy-split of the
    dumps (preprocess.py:234-293)."""
    import shutil

    src = os.path.join(dataset_root, cfg.data.feature_subdir)
    mel_dir = os.path.join(src, "wav")
    ann_dir = os.path.join(src, "annotation")
    files = [os.path.splitext(os.path.basename(p))[0]
             for p in glob(os.path.join(mel_dir, "*.npy"))]
    weak, unlabeled, val = seeded_split(files, cfg.train.dataset_seed)

    for subdir, names in ((cfg.data.train_weak_subdir, weak),
                          (cfg.data.train_unlabeled_subdir, unlabeled),
                          (cfg.data.val_subdir, val)):
        dst = os.path.join(dataset_root, subdir)
        os.makedirs(os.path.join(dst, "wav"), exist_ok=True)
        os.makedirs(os.path.join(dst, "annotation"), exist_ok=True)
        for name in names:
            shutil.copy(os.path.join(mel_dir, name + ".npy"),
                        os.path.join(dst, "wav"))
            shutil.copy(os.path.join(ann_dir, name + ".txt"),
                        os.path.join(dst, "annotation"))
    log.info("split: %d weak / %d unlabeled / %d val", len(weak),
             len(unlabeled), len(val))
