"""Audio IO helpers.

Capability parity with /root/reference/src/utilities/utils.py:19-37
(``read_audio``), utils.py:235-251 (``generate_tsv_wav_durations``) and
src/synth_data/mp3_to_wav.py (gated: no mp3 decoder is available in this
image — pydub/ffmpeg absent).
"""
from __future__ import annotations

import os
from glob import glob
from typing import Tuple

import numpy as np
import pandas as pd


def read_audio(path: str, target_sr: int) -> Tuple[np.ndarray, int]:
    """Load + resample like the reference's soundfile/librosa combo."""
    from bsed_tpu.data.preprocess import read_wav
    return read_wav(path, target_sr), target_sr


def wav_duration_s(path: str) -> float:
    import wave
    with wave.open(path, "rb") as w:
        return w.getnframes() / w.getframerate()


def generate_tsv_wav_durations(audio_dir: str, out_tsv: str) -> pd.DataFrame:
    """filename/duration TSV over a wav directory (utils.py:235-251)."""
    rows = [(os.path.basename(p), wav_duration_s(p))
            for p in sorted(glob(os.path.join(audio_dir, "*.wav")))]
    df = pd.DataFrame(rows, columns=["filename", "duration"])
    df.to_csv(out_tsv, sep="\t", index=False)
    return df


def mp3_to_wav(mp3_path: str, wav_path: str) -> None:
    """The reference converts NIPS4B mp3 foregrounds with pydub
    (mp3_to_wav.py:5-20). No mp3 decoder ships in this environment."""
    raise NotImplementedError(
        "mp3 decoding requires pydub/ffmpeg, which are not available in "
        "this image; provide wav foregrounds instead (the synthesizer and "
        "preprocess pipeline consume wav directly)")
