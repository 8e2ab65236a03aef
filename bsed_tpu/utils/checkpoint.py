"""Orbax checkpointing of the full train state + run metadata.

Replaces the reference's torch-pickle checkpoint dict
(/root/reference/src/main_baseline.py:895-971: model/model_p/model_d/
model_ema/optimizer states + pooling_time_ratio + many_hot_encoder +
median_window + epoch) with an orbax-managed directory per run:

    <store_dir>/model/epoch_<e>/   — full TrainState pytree
    <store_dir>/model/best/        — best-on-validation copy
    <store_dir>/model/meta.json    — codec/config metadata

Every-epoch saving (checkpoint_epochs=1) and resume — incl. the reference's
stage-boundary discriminator re-init (main_baseline.py:836-840) — are
handled by the trainer.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from bsed_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, store_dir: str):
        self.store_dir = os.path.abspath(store_dir)
        self.model_dir = os.path.join(self.store_dir, "model")
        os.makedirs(self.model_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- metadata ----------------------------------------------------------
    def save_meta(self, meta: Dict[str, Any]) -> None:
        with open(os.path.join(self.model_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=_json_default)

    def load_meta(self) -> Dict[str, Any]:
        with open(os.path.join(self.model_dir, "meta.json")) as f:
            return json.load(f)

    # -- state -------------------------------------------------------------
    def _path(self, tag) -> str:
        return os.path.join(self.model_dir, str(tag))

    def save(self, tag, state: TrainState) -> None:
        path = self._path(tag)
        state = jax.tree.map(np.asarray, state)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, tag, template: TrainState) -> TrainState:
        return self._ckptr.restore(self._path(tag), template)

    def has(self, tag) -> bool:
        return os.path.isdir(self._path(tag))

    def latest_epoch(self) -> Optional[int]:
        epochs = []
        for name in os.listdir(self.model_dir):
            if name.startswith("epoch_"):
                try:
                    epochs.append(int(name.split("_", 1)[1]))
                except ValueError:
                    pass
        return max(epochs) if epochs else None


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, tuple):
        return list(o)
    raise TypeError(f"not JSON serializable: {type(o)}")
