"""Weak audio-tagging trainer + pseudo-label writer.

References:
  * trainer: /root/reference/src/audio_tagging_system_cnn.py — weak-only BCE
    on SYN weak targets + real weak half-batch (:367), best checkpoint on
    weak tagging F1.
  * pseudo-label writers: /root/reference/src/audio_tagging_inference.py:
    288-313 (ResNet tagger) and /root/reference/src/audio_tagging.py:256-283
    (CRNN+Predictor): weak posteriors over the unlabeled set → threshold
    0.5 → decode_weak → TSV ``filename<TAB>event_labels`` — the TSV that
    ENA_Dataset_unlabeled consumes (dataload.py:95).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from bsed_tpu.config import Config
from bsed_tpu.data.codec import ManyHotEncoder
from bsed_tpu.eval.tagging import TaggingF1Accumulator
from bsed_tpu.models.resnet import ResNet18Tagger, VGGTagger
from bsed_tpu.ops.mel import amplitude_to_db
from bsed_tpu.train.losses import bce
from bsed_tpu.utils.logger import create_logger
from bsed_tpu.utils.meters import AverageMeterSet, SaveBest


def build_tagger(cfg: Config, arch: str = "resnet"):
    if arch == "resnet":
        return ResNet18Tagger(nclass=cfg.nclass)
    if arch == "vgg":
        return VGGTagger(nclass=cfg.nclass)
    raise ValueError(arch)


class TaggingTrainer:
    def __init__(self, cfg: Config, arch: str = "resnet",
                 learning_rate: float = 1e-3, mean_teacher: bool = False):
        """``mean_teacher=True`` enables the audio_tagging_system.py variant
        (the cnn trainer keeps the same scaffold without the EMA twin):
        EMA teacher on SNR-noised inputs + MSE consistency on weak preds."""
        self.cfg = cfg
        self.mean_teacher = mean_teacher
        self.model = build_tagger(cfg, arch)
        self.log = create_logger(f"bsed_tpu/tagger-{arch}")
        self.optimizer = optax.adam(learning_rate)
        rng = jax.random.key(cfg.train.seed)
        dummy = jnp.zeros((2, cfg.audio.max_frames, cfg.audio.n_mels, 1))
        variables = self.model.init({"params": rng, "dropout": rng}, dummy,
                                    train=True)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.optimizer.init(self.params)
        self.ema_params = (jax.tree.map(jnp.copy, self.params)
                           if mean_teacher else None)
        self.ema_batch_stats = (jax.tree.map(jnp.copy, self.batch_stats)
                                if mean_teacher else None)
        self.step_count = 0
        self.saver = SaveBest("sup")
        self._step = jax.jit(self._train_step)
        self._infer = jax.jit(self._predict)

    def _train_step(self, params, batch_stats, opt_state, batch, rng,
                    ema_params=None, ema_stats=None, step=0):
        from bsed_tpu.ops.augment import gaussian_snr_noise
        from bsed_tpu.train.ema import ema_update

        k_noise, k_drop = jax.random.split(rng)

        teacher_pred = None
        new_ema_stats = ema_stats
        if self.mean_teacher and ema_params is not None:
            noisy = gaussian_snr_noise(k_noise, batch["real"],
                                       self.cfg.audio.noise_snr)
            x_t = amplitude_to_db(noisy)[..., None]
            out = self.model.apply(
                {"params": ema_params, "batch_stats": ema_stats}, x_t,
                train=True, rngs={"dropout": k_noise},
                mutable=["batch_stats"])
            teacher_pred = jax.lax.stop_gradient(out[0])
            new_ema_stats = out[1]["batch_stats"]

        def loss_fn(p):
            def fwd(stats, x):
                out, mut = self.model.apply(
                    {"params": p, "batch_stats": stats}, x, train=True,
                    rngs={"dropout": k_drop}, mutable=["batch_stats"])
                return out, mut["batch_stats"]
            x_syn = amplitude_to_db(batch["syn"])[..., None]
            pred_syn, stats = fwd(batch_stats, x_syn)
            loss = bce(pred_syn, batch["syn_weak"])
            if "real" in batch:
                x_real = amplitude_to_db(batch["real"])[..., None]
                pred_real, stats = fwd(stats, x_real)
                half = pred_real.shape[0] // 2
                # real weak BCE on the labeled half (cnn trainer :367)
                loss = loss + bce(pred_real[:half],
                                  batch["real_weak"][:half])
                if teacher_pred is not None:
                    loss = loss + jnp.mean(
                        jnp.square(pred_real - teacher_pred))
            return loss, stats
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = self.optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_ema = ema_params
        if self.mean_teacher and ema_params is not None:
            new_ema = ema_update(ema_params, new_params, step + 1,
                                 self.cfg.train.ema_alpha)
            new_ema_stats = ema_update(new_ema_stats, new_stats, step + 1,
                                       self.cfg.train.ema_alpha)
        return (new_params, new_stats, new_opt, loss, new_ema,
                new_ema_stats)

    def _predict(self, params, batch_stats, mel):
        x = amplitude_to_db(mel)[..., None]
        return self.model.apply({"params": params,
                                 "batch_stats": batch_stats}, x, train=False)

    # ------------------------------------------------------------------
    def train_epoch(self, batches: Iterable[Dict[str, np.ndarray]],
                    epoch: int) -> float:
        meters = AverageMeterSet()
        rng = jax.random.key(self.cfg.train.seed * 7919 + epoch)
        for batch in batches:
            rng, k = jax.random.split(rng)
            b = {"syn": jnp.asarray(batch["syn"]),
                 "syn_weak": jnp.asarray(batch["syn_strong"]).max(axis=1)
                 if batch["syn_strong"].ndim == 3
                 else jnp.asarray(batch["syn_strong"])}
            if "real" in batch:
                b["real"] = jnp.asarray(batch["real"])
                b["real_weak"] = jnp.asarray(batch["real_weak"])
            (self.params, self.batch_stats, self.opt_state, loss,
             self.ema_params, self.ema_batch_stats) = self._step(
                self.params, self.batch_stats, self.opt_state, b, k,
                self.ema_params, self.ema_batch_stats,
                jnp.asarray(self.step_count))
            self.step_count += 1
            meters.update("loss", float(loss))
        self.log.info("tagger epoch %d: %s", epoch, meters)
        return meters.averages()["loss"]

    def evaluate(self, loader) -> float:
        acc = TaggingF1Accumulator(self.cfg.nclass)
        for mel, target, names, n_valid in loader:
            pred = np.asarray(self._infer(self.params, self.batch_stats,
                                          jnp.asarray(mel)))[:n_valid]
            target = np.asarray(target)[:n_valid]
            acc.update(pred, target.max(axis=1) if target.ndim == 3
                       else target)
        return acc.macro_f1()

    def predict_weak(self, mel: np.ndarray) -> np.ndarray:
        return np.asarray(self._infer(self.params, self.batch_stats,
                                      jnp.asarray(mel)))

    # -- persistence (lets the pseudo-labeling cycle run as separate CLI
    #    commands, SURVEY.md §3.4) -----------------------------------------
    def save(self, path: str) -> None:
        import flax.serialization as fser
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        blob = fser.to_bytes({"params": self.params,
                              "batch_stats": self.batch_stats})
        with open(path, "wb") as f:
            f.write(blob)

    def load(self, path: str) -> None:
        import flax.serialization as fser
        with open(path, "rb") as f:
            blob = f.read()
        restored = fser.from_bytes({"params": self.params,
                                    "batch_stats": self.batch_stats}, blob)
        self.params = restored["params"]
        self.batch_stats = restored["batch_stats"]

    def load_pretrained_torch(self, path_or_state) -> list:
        """Initialize the ResNet tagger from a torchvision-style resnet18
        state_dict (torch pickle path or an in-memory mapping) — the
        reference's ``models.resnet18(pretrained=True)`` hook
        (audio_tagging_system_cnn.py:50-59). Shape-mismatched entries (the
        3-channel ImageNet stem conv, the 1000-class fc — exactly what the
        reference re-initializes) keep their fresh init. Returns the list
        of skipped entries."""
        from bsed_tpu.utils import torch_compat as tc

        state = path_or_state
        if isinstance(state, (str, os.PathLike)):
            import torch
            # a torchvision state_dict is a plain tensor mapping —
            # weights_only=True suffices and refuses arbitrary pickles
            state = torch.load(state, map_location="cpu",
                               weights_only=True)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        self.params, self.batch_stats, skipped = tc.convert_resnet18_tagger(
            state, self.params, self.batch_stats)
        if skipped:
            self.log.info("pretrained init: kept fresh init for %s",
                          ", ".join(skipped))
        return skipped


def write_pseudo_labels(predict_weak: Callable[[np.ndarray], np.ndarray],
                        dataset, out_tsv: str, encoder: ManyHotEncoder,
                        threshold: float = 0.5,
                        batch_size: int = 24) -> pd.DataFrame:
    """Run a weak predictor over an unlabeled dataset and write the
    pseudo-label TSV (audio_tagging_inference.py:288-313 format)."""
    rows = []
    n = len(dataset)
    for start in range(0, n, batch_size):
        ids = range(start, min(start + batch_size, n))
        items = [dataset[i] for i in ids]
        mel = np.stack([it[0] for it in items])
        weak = predict_weak(mel)
        for j, i in enumerate(ids):
            labels = encoder.decode_weak((weak[j] > threshold).astype(int))
            name = dataset.filename(i) if hasattr(dataset, "filename") \
                else str(items[j][2])
            rows.append((name, ",".join(labels)))
    df = pd.DataFrame(rows, columns=["filename", "event_labels"])
    os.makedirs(os.path.dirname(os.path.abspath(out_tsv)), exist_ok=True)
    df.to_csv(out_tsv, sep="\t", index=False)
    return df
