"""Feature normalization statistics.

Reference: /root/reference/src/utilities/Scaler.py — a dataset-level
streaming mean/std scaler (:97-135, JSON-serializable) and per-audio
normalizers (:138-198). Note the reference instantiates these but comments
out ``calculate_scaler`` in every active main (main_baseline.py:700-708),
so normalization is effectively OFF by default; the capability is kept for
parity and for TestModel.py's vestigial fit.
"""
from __future__ import annotations

import json
from typing import Iterable

import numpy as np


class Scaler:
    """Dataset-level mean/std over the time axis, accumulated streaming as
    mean-of-means and mean-of-mean-squares (Scaler.py:97-110)."""

    def __init__(self):
        self.mean_ = None
        self.std_ = None

    def calculate_scaler(self, dataset: Iterable) -> None:
        s1 = None
        s2 = None
        n = 0
        for item in dataset:
            x = np.asarray(item[0], dtype=np.float64)
            m1 = x.mean(axis=-2)
            m2 = (x ** 2).mean(axis=-2)
            s1 = m1 if s1 is None else s1 + m1
            s2 = m2 if s2 is None else s2 + m2
            n += 1
        self.mean_ = s1 / n
        self.std_ = np.sqrt(np.maximum(s2 / n - self.mean_ ** 2, 0.0))

    def normalize(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean_) / np.where(self.std_ == 0, 1.0, self.std_)

    def state_dict(self) -> dict:
        return {"mean": np.asarray(self.mean_).tolist(),
                "std": np.asarray(self.std_).tolist()}

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.state_dict(), f)

    def load(self, path: str) -> "Scaler":
        with open(path) as f:
            state = json.load(f)
        self.mean_ = np.asarray(state["mean"])
        self.std_ = np.asarray(state["std"])
        return self


class ScalerPerAudio:
    """Per-sample normalization: 'standard' | 'max' | 'min-max', with the
    reference's NaN guard (Scaler.py:138-198)."""

    def __init__(self, normalization: str = "standard"):
        self.normalization = normalization

    def normalize(self, x: np.ndarray) -> np.ndarray:
        if self.normalization == "standard":
            std = x.std()
            out = (x - x.mean()) / (std if std else 1.0)
        elif self.normalization == "max":
            peak = np.abs(x).max()
            out = x / (peak if peak else 1.0)
        elif self.normalization == "min-max":
            rng = x.max() - x.min()
            out = (x - x.min()) / (rng if rng else 1.0)
        else:
            raise ValueError(self.normalization)
        return np.nan_to_num(out)
