"""Epoch-level trainer: the config-driven replacement for the reference's
``__main__`` blocks (/root/reference/src/main_baseline.py:602-1093).

Responsibilities (with reference anchors):
  * build encoder/predictor/discriminator + optimizers + EMA twins (:780-871)
  * per-epoch: run the jitted train step over the three-stream loader
    (:981-1007), then validate with ``get_predictions``-equivalent decoding
    and event-F1/PSDS scoring (:1015-1031)
  * checkpoint every epoch + SaveBest on the configured metric (:1040-1077)
  * optional EarlyStopping (:1079-1082), stage-boundary discriminator
    re-init on resume (:836-840)
  * metrics to TensorBoard (tensorboardX) + results.tsv (:1092)
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from bsed_tpu.config import Config
from bsed_tpu.data.codec import ManyHotEncoder
from bsed_tpu.data.pipeline import EvalLoader, ThreeStreamLoader
from bsed_tpu.data.prefetch import prefetch
from bsed_tpu.eval.decode import (decode_batch, durations_df,
                                  groundtruth_df_from_events,
                                  gt_events_from_frame_targets,
                                  merge_prediction_dfs)
from bsed_tpu.eval.psds import compute_macro_f_score
from bsed_tpu.eval.sed_scores import event_based_f1
from bsed_tpu.eval.tagging import TaggingF1Accumulator
from bsed_tpu.parallel.mesh import auto_data_mesh, replicate, shard_batch
from bsed_tpu.train.steps import (TrainModules, build_modules,
                                  create_train_state, make_epoch_runner,
                                  make_predict_fn, make_train_step)
from bsed_tpu.utils.checkpoint import CheckpointManager
from bsed_tpu.utils.logger import create_logger
from bsed_tpu.utils.meters import AverageMeterSet, EarlyStopping, SaveBest


class Trainer:
    def __init__(self, cfg: Config, train_loader: ThreeStreamLoader,
                 val_loader: Optional[EvalLoader] = None,
                 syn_eval_loader: Optional[EvalLoader] = None,
                 store_dir: Optional[str] = None,
                 use_tensorboard: bool = False,
                 profile_dir: Optional[str] = None,
                 mesh="auto", grad_flow: bool = False,
                 scan_epoch: str = "auto"):
        self.cfg = cfg
        # grad_flow: per-parameter mean-|grad| in the step metrics +
        # gradient_flow.png per epoch (plot_grad_flow, main_baseline.py:108)
        self.grad_flow = grad_flow
        # when set, the first trained epoch is captured as a jax.profiler
        # device trace (TensorBoard/Perfetto) — utils/profiling.py
        self.profile_dir = profile_dir
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.syn_eval_loader = syn_eval_loader
        self.log = create_logger(f"bsed_tpu/{cfg.model_name}")
        self.store_dir = store_dir or os.path.join("stored_data",
                                                   cfg.model_name)
        self.ckpt = CheckpointManager(self.store_dir)
        self.encoder_codec = ManyHotEncoder(
            cfg.bird_list, n_frames=cfg.n_frames, sr=cfg.audio.sr,
            hop_size=cfg.audio.hop_size,
            pooling_time_ratio=cfg.model.pooling_time_ratio)

        # Dataset normalization (TrainConfig.normalize — the main.py
        # lineage): fit the train scaler on the union of the real train
        # streams + SYN (main.py:681-686 fits on ConcatDataset([ENA train,
        # SYN])), and a SEPARATE scaler on the val set for per-epoch
        # validation (main.py:696-699). `cli eval` (TestModel semantics)
        # never normalizes — TestModel.py:225-231 fits one and ignores it.
        norm_stats = None
        self.val_norm_stats = None
        if cfg.train.normalize:
            from bsed_tpu.utils.scaler import fit_log_mel_stats
            norm_stats = fit_log_mel_stats(
                [train_loader.weak, train_loader.unlab, train_loader.syn])
            if val_loader is not None:
                self.val_norm_stats = fit_log_mel_stats([val_loader.dataset])
        self.norm_stats = norm_stats
        self.modules: TrainModules = build_modules(cfg,
                                                   norm_stats=norm_stats)
        # param init stays threefry (bit-stable across configs); the
        # per-epoch training stream (dropout/noise/shifts/mixup) uses
        # cfg.train.prng_impl — "rbg" = TPU hardware RNG, 1.5× faster
        # per step (see TrainConfig.prng_impl)
        init_rng = jax.random.key(cfg.train.seed)
        self.rng = jax.random.key(cfg.train.seed,
                                  impl=cfg.train.prng_impl)
        self.state = create_train_state(cfg, self.modules, init_rng)
        # SPMD data parallelism (SURVEY §2.3): on a multi-chip host the
        # trainer transparently builds a 1-D data mesh, replicates the train
        # state, and shards each batch on axis 0 — GSPMD turns the step's
        # jnp reductions (loss means, BatchNorm batch stats) into cross-chip
        # psums over ICI. mesh="auto" (default, zero flags): mesh iff >1
        # device; pass an explicit jax.sharding.Mesh or None/"off" to force.
        if mesh == "auto":
            bs = cfg.train.batch_size
            self.mesh = auto_data_mesh(bs, 2 * (bs // 2))
        elif mesh in (None, "off"):
            self.mesh = None
        else:
            self.mesh = mesh
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
        self.train_step = make_train_step(
            self.modules, steps_per_epoch=len(train_loader),
            grad_flow=grad_flow, mesh=self.mesh)
        # scanned-epoch mode: when the dataset arrays are device-resident
        # and no multi-chip mesh is in play, the whole epoch runs as ONE
        # lax.scan dispatch (make_epoch_runner) instead of two dispatches
        # per step — "auto" enables it opportunistically per epoch;
        # "off" forces the loop path (e.g. when per-step host visibility
        # is wanted while debugging)
        self.scan_epoch = scan_epoch
        self._epoch_runner = None
        self.predict = make_predict_fn(self.modules)
        # validation uses the VAL-fitted scaler (main.py:696-699); without
        # normalization both predict fns are the same object
        self.predict_val = (
            make_predict_fn(self.modules, norm_stats=self.val_norm_stats)
            if self.val_norm_stats is not None else self.predict)
        self.saver = SaveBest("sup")
        self.early_stopping = (
            EarlyStopping(cfg.train.early_stopping, cfg.train.es_init_wait)
            if cfg.train.early_stopping else None)
        # writer is created lazily in fit(): a resume must pass
        # purge_step=start_epoch so re-run epochs don't leave duplicate
        # scalars (main_baseline.py:656)
        self.use_tensorboard = use_tensorboard
        self.writer = None
        self.history: list = []
        from bsed_tpu.config import config_to_dict
        self.ckpt.save_meta({
            # full config: the checkpoint is self-describing — `cli eval
            # --store-dir X` rebuilds this exact Config with no --preset
            # (TestModel.py:34-59 semantics)
            "config": config_to_dict(cfg),
            "model_name": cfg.model_name,
            "crnn_kwargs": {
                "nb_filters": cfg.model.nb_filters,
                "pooling": cfg.model.pooling,
                "activation": cfg.model.activation,
                "n_rnn_cell": cfg.model.n_rnn_cell,
                "n_layers_rnn": cfg.model.n_layers_rnn,
                "use_fpn": cfg.model.use_fpn,
            },
            "pooling_time_ratio": cfg.model.pooling_time_ratio,
            "many_hot_encoder": self.encoder_codec.state_dict(),
            "median_window": cfg.median_window,
            "median_window_classwise": cfg.median_window_classwise,
            # train+syn scaler stats (None unless TrainConfig.normalize);
            # recorded for self-description — `cli eval` stays
            # TestModel-faithful and does not apply them
            "scaler": ({"mean": np.asarray(norm_stats[0]).tolist(),
                        "std": np.asarray(norm_stats[1]).tolist()}
                       if norm_stats is not None else None),
        })

    # ------------------------------------------------------------------
    def resume(self, epoch: int) -> None:
        """Resume from epoch_<epoch-1>; at stage boundaries (epoch 1 / 51,
        main_baseline.py:836-840) the discriminator keeps its fresh init."""
        tag = f"epoch_{epoch - 1}"
        restored = self.ckpt.restore(tag, self.state)
        if self.cfg.train.stage == "adaptation" and epoch in (1, 51):
            restored = restored.replace(
                disc_params=self.state.disc_params,
                disc_opt_state=self.state.disc_opt_state,
                disc_batch_stats=self.state.disc_batch_stats)
        if self.mesh is not None:   # restored arrays land on one device
            restored = replicate(self.mesh, restored)
        self.state = restored

    def _mesh_replicated(self, tree: Dict, cache: bool = True) -> Dict:
        """device_put a dict of arrays fully-REPLICATED on the data mesh
        (the scanned-epoch runner's placement contract). The dataset
        arrays are the same objects every epoch, so they're cached by
        identity; per-epoch index matrices pass cache=False."""
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(self.mesh, PartitionSpec())
        if not hasattr(self, "_rep_cache"):
            self._rep_cache = {}
        out = {}
        for k, v in tree.items():
            key = id(v) if cache else None
            if key is not None and key in self._rep_cache:
                # cache entries pin the source array alive so a recycled
                # id() can never alias a dead array's entry (ADVICE r4)
                out[k] = self._rep_cache[key][1]
                continue
            placed = jax.device_put(v, rep)
            if key is not None:
                self._rep_cache[key] = (v, placed)
            out[k] = placed
        return out

    def _sink_metrics(self, meters: AverageMeterSet, stacked: Dict,
                      base_step: int, first_step: int,
                      last_step: int) -> None:
        """Feed a stacked (n, ...) metrics dict into the epoch meters, the
        loss-explosion guard, and (step-indexed) TensorBoard."""
        for k, vals in stacked.items():
            assert np.isfinite(vals).all() and (vals < 1e5).all(), \
                f"Loss explosion in {k} within steps " \
                f"{first_step}..{last_step}: {vals}"
            for i, v in enumerate(vals):
                meters.update(k, float(v))
                if self.writer is not None:
                    self.writer.add_scalar(k, float(v), base_step + 1 + i)

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        meters = AverageMeterSet()
        start = time.time()
        # ONE key + ONE epoch scalar per epoch: the step folds state.step
        # into the key itself, so the loop body issues no per-step host→
        # device transfers beyond the batch (tunnel dispatch economy)
        self.rng, epoch_rng = jax.random.split(self.rng)
        epoch_arr = jnp.asarray(epoch, jnp.float32)

        # scanned-epoch fast path: the whole epoch as ONE lax.scan dispatch
        # over the device-resident dataset arrays (same traced step body —
        # identical schedule and, up to XLA reassociation, identical
        # numerics; the NaN guard surfaces at epoch end instead of ≤9
        # steps late). Under a data mesh the dataset arrays/indices live
        # replicated on the mesh and the scan body row-shards each
        # gathered batch — the same sharded step program as the loop path
        # (make_epoch_runner mesh note). Multi-host keeps the loop path:
        # its per-process strided loaders own the data split.
        ea = (self.train_loader.epoch_arrays(epoch)
              if self.scan_epoch != "off" and jax.process_count() == 1
              and hasattr(self.train_loader, "epoch_arrays") else None)
        if ea is not None:
            arrays, idx = ea
            if self.mesh is not None:
                arrays = self._mesh_replicated(arrays)
                idx = self._mesh_replicated(idx, cache=False)
            if self._epoch_runner is None:
                self._epoch_runner = make_epoch_runner(
                    self.modules, steps_per_epoch=len(self.train_loader),
                    grad_flow=self.grad_flow, mesh=self.mesh)
            self.state, metrics = self._epoch_runner(
                self.state, arrays, idx, epoch_rng, epoch_arr)
            stacked = {k: np.asarray(v) for k, v in metrics.items()}
            n_steps = len(idx["syn"])
            self._sink_metrics(meters, stacked,
                               int(self.state.step) - n_steps, 1, n_steps)
            self.last_meters = meters
            avgs = meters.averages()
            if self.grad_flow:
                from bsed_tpu.utils.profiling import plot_grad_flow
                plot_grad_flow(avgs, os.path.join(self.store_dir,
                                                  "gradient_flow.png"))
            self.log.info("Epoch %d: %d steps in %.1fs (scanned)  %s",
                          epoch, n_steps, time.time() - start, meters)
            return avgs

        n_steps = 0
        # device-side metric history: the host syncs only every 10th step
        # (to keep dispatch pipelined) but EVERY step's full metrics dict is
        # stacked device-side, so the finiteness guard and the epoch meters
        # cover every step (reference updates meters per step,
        # main_baseline.py:188, and asserts per step, :564) — a NaN can
        # surface at most 9 steps late, never silently
        pending: list = []
        batches = self.train_loader.epoch(epoch)
        if self.mesh is not None:
            # shard on the producer side so the device_put (async) overlaps
            # the consumer's step dispatch
            mesh = self.mesh
            batches = (shard_batch(mesh, b) for b in batches)
        for batch in prefetch(batches, depth=2):
            self.state, metrics = self.train_step(
                self.state, batch, epoch_rng, epoch_arr)
            pending.append(metrics)
            n_steps += 1
            if n_steps % 10 == 0 or n_steps == len(self.train_loader):
                stacked = {k: np.asarray(jnp.stack([m[k] for m in pending]))
                           for k in pending[0]}
                base_step = int(self.state.step) - len(pending)
                n_pend = len(pending)
                pending = []
                self._sink_metrics(meters, stacked, base_step,
                                   n_steps - n_pend + 1, n_steps)
        self.last_meters = meters   # exposed for tests/inspection
        avgs = meters.averages()
        if self.grad_flow:
            from bsed_tpu.utils.profiling import plot_grad_flow
            plot_grad_flow(avgs, os.path.join(self.store_dir,
                                              "gradient_flow.png"))
        self.log.info("Epoch %d: %d steps in %.1fs  %s", epoch, n_steps,
                      time.time() - start, meters)
        return avgs

    # ------------------------------------------------------------------
    def _eval_params(self):
        """Validate with the student model (the reference evaluates the
        student; the EMA teacher is used for consistency only).

        Multi-host: evaluation runs REPLICATED per process — the val loader
        is not process-strided (every host iterates the full val set) and
        the decode/scoring path is host-side pandas, so each host pulls its
        addressable copy of the (replicated) params and predicts locally.
        Sharding eval batches over a multi-host mesh would instead treat
        each host's identical batch as a disjoint shard and produce
        non-addressable outputs that ``np.asarray`` cannot fetch."""
        params, stats = self.state.params, self.state.batch_stats
        if self.mesh is not None and jax.process_count() > 1:
            def pull(x):
                return (np.asarray(x.addressable_data(0))
                        if isinstance(x, jax.Array) else x)
            params = jax.tree.map(pull, params)
            stats = jax.tree.map(pull, stats)
        return params, stats

    def _allgather_eval(self, merged: Dict, tagging, thresholds):
        """Multi-host eval exchange: each process decoded only its strided
        slice of the val batches; gather every process's decoded events
        (rows encoded as [thr_idx, class_idx, onset, offset] + a parallel
        filename list carried by index into the locally-reconstructable
        name order) and sum the tagging counts, so every host ends with
        the full prediction set at ~1/P of the forward+decode work."""
        from jax.experimental import multihost_utils

        thr_idx = {t: i for i, t in enumerate(thresholds)}
        rows, name_keys = [], []
        for t, df in merged.items():
            for _, r in df.iterrows():
                rows.append([thr_idx[t],
                             self.cfg.bird_list.index(r["event_label"]),
                             float(r["onset"]), float(r["offset"])])
                name_keys.append(str(r["filename"]))
        # names cross processes as indices into the union name table,
        # broadcast as a sorted list every host derives identically from
        # its own (full, unstrided) copy of the val dataset
        local_names = sorted(set(name_keys))
        # two-phase ragged allgather: counts first, then pad to the max
        n_local = np.asarray([len(rows)], np.int32)
        counts = np.asarray(multihost_utils.process_allgather(n_local)
                            ).reshape(-1)
        cap = int(counts.max()) if counts.size else 0
        enc = np.full((max(cap, 1), 4), -1.0, np.float32)
        if rows:
            enc[:len(rows)] = np.asarray(rows, np.float32)
        gathered = np.asarray(multihost_utils.process_allgather(enc))
        # name tables are exchanged the same way (fixed-width bytes);
        # width = allgathered max of the UTF-8-encoded lengths so long or
        # non-ASCII filenames survive the round trip intact (ADVICE r4)
        encoded = [s.encode("utf-8") for s in local_names]
        local_w = np.asarray([max((len(b) for b in encoded), default=1)],
                             np.int32)
        width = int(np.asarray(multihost_utils.process_allgather(local_w)
                               ).max())
        nm = np.zeros((max(len(local_names), 1), width), np.uint8)
        for i, b in enumerate(encoded):
            nm[i, :len(b)] = np.frombuffer(b, np.uint8)
        n_names = np.asarray([len(local_names)], np.int32)
        name_counts = np.asarray(
            multihost_utils.process_allgather(n_names)).reshape(-1)
        pad_names = np.zeros(
            (int(name_counts.max()) if name_counts.size else 1, width),
            np.uint8)
        pad_names[:nm.shape[0]] = nm
        names_gathered = np.asarray(
            multihost_utils.process_allgather(pad_names))
        name_idx_local = {s: i for i, s in enumerate(local_names)}
        row_name_idx = np.asarray([name_idx_local[k] for k in name_keys],
                                  np.int32) if name_keys else \
            np.zeros((0,), np.int32)
        idx_enc = np.full((max(cap, 1),), -1, np.int32)
        idx_enc[:len(row_name_idx)] = row_name_idx
        idx_gathered = np.asarray(multihost_utils.process_allgather(idx_enc))

        out = {t: [] for t in thresholds}
        for p in range(gathered.shape[0]):
            p_names = [bytes(r[r != 0].tolist()).decode("utf-8")
                       for r in names_gathered[p][:name_counts[p]]]
            for j in range(counts[p]):
                ti, ci, on, off = gathered[p, j]
                out[thresholds[int(ti)]].append(
                    (p_names[int(idx_gathered[p, j])],
                     self.cfg.bird_list[int(ci)], float(on), float(off)))
        merged2 = {}
        for t in thresholds:
            merged2[t] = pd.DataFrame(
                out[t], columns=["filename", "event_label", "onset",
                                 "offset"])[["event_label", "onset",
                                             "offset", "filename"]]
        for attr in ("tp", "fp", "fn", "tn"):
            local = np.asarray(getattr(tagging, attr))
            # allgather prepends a process axis → (P, 1, n); flatten it
            # before summing so the counts keep their (n,) shape
            summed = np.asarray(multihost_utils.process_allgather(
                local[None])).reshape(-1, local.shape[0]).sum(axis=0)
            setattr(tagging, attr, summed)
        return merged2, tagging

    def evaluate(self, loader: EvalLoader, thresholds=(0.5,),
                 learned_post: bool = False,
                 predict_fn=None, shard=None) -> Dict[str, float]:
        """``shard``: None = auto (shard the val batches across processes
        when multi-host + original-resolution GT available); False forces
        the fully-replicated path (every host scores the full set)."""
        predict = predict_fn if predict_fn is not None else self.predict
        params, stats = self._eval_params()
        pred_dfs = []
        # GT at original second resolution when available; frame-decoded
        # reconstruction (32 ms quantized) only as fallback
        true_events = loader.groundtruth_events()
        gt_events: Dict[str, list] = true_events if true_events is not None \
            else {}
        tagging = TaggingF1Accumulator(self.cfg.nclass)
        filenames_all = []
        # multi-host: shard the val BATCHES across processes (each host
        # forwards + decodes only its stride, then the decoded events and
        # tagging counts are all-gathered) — requires original-resolution
        # GT so every host can score the full set without decoding the
        # others' frame targets; falls back to fully-replicated eval
        # otherwise (VERDICT r3 item 8)
        n_proc = jax.process_count()
        shard_eval = (n_proc > 1 and self.mesh is not None
                      and true_events is not None)
        if shard is False:
            shard_eval = False
        for bi, (mel, target, names, n_valid) in enumerate(loader):
            if shard_eval and bi % n_proc != jax.process_index():
                continue
            mel = jnp.asarray(mel)
            if self.mesh is not None and jax.process_count() == 1:
                # rows are independent: pure DP (multi-host forwards run
                # per-process on the strided batches instead)
                mel = shard_batch(self.mesh, mel)
            strong, weak = predict(params, stats, mel,
                                   inference=self.cfg.model.use_fpn)
            strong = np.asarray(strong)[:n_valid]
            weak = np.asarray(weak)[:n_valid]
            names = names[:n_valid]
            pred_dfs.append(decode_batch(strong, names, self.cfg.bird_list,
                                         self.cfg, thresholds=thresholds,
                                         learned_post=learned_post))
            target = np.asarray(target)[:n_valid]
            if target.ndim == 3:
                if true_events is None:
                    gt_events.update(gt_events_from_frame_targets(
                        target, names, self.encoder_codec, self.cfg))
                tagging.update(weak, target.max(axis=1))
            else:
                tagging.update(weak, target)
            filenames_all.extend(names)

        merged = merge_prediction_dfs(pred_dfs)
        if shard_eval:
            merged, tagging = self._allgather_eval(merged, tagging,
                                                   thresholds)
        pred_df = merged[thresholds[0]]
        gt_df = groundtruth_df_from_events(gt_events)
        results = {"weak_f1": tagging.macro_f1()}
        if len(gt_df):
            results["event_f1"] = event_based_f1(gt_df, pred_df)
            _, psds_f1, _ = compute_macro_f_score(pred_df, gt_df)
            results["psds_f1"] = psds_f1
        else:
            results["event_f1"] = 0.0
            results["psds_f1"] = 0.0
        return results

    # ------------------------------------------------------------------
    def fit(self, n_epochs: Optional[int] = None,
            start_epoch: int = 0) -> Dict[str, float]:
        cfg = self.cfg
        n_epochs = n_epochs if n_epochs is not None else cfg.train.n_epoch
        if self.use_tensorboard and self.writer is None:
            from tensorboardX import SummaryWriter
            # purge on resume so re-run scalars overwrite instead of
            # duplicating (the reference passes purge_step=start_epoch,
            # main_baseline.py:656 — but its train scalars are STEP-indexed,
            # so an epoch-unit purge wipes nearly all prior train curves;
            # here the purge is in step units, matching how train_epoch
            # indexes its scalars)
            self.writer = SummaryWriter(
                os.path.join(self.store_dir, "log"),
                purge_step=start_epoch * len(self.train_loader)
                if start_epoch > 0 else None)
        if start_epoch > 0:
            self.resume(start_epoch)
        best = {}
        for epoch in range(start_epoch, n_epochs):
            if self.profile_dir and epoch == start_epoch:
                from bsed_tpu.utils.profiling import trace
                with trace(self.profile_dir):
                    train_metrics = self.train_epoch(epoch)
            else:
                train_metrics = self.train_epoch(epoch)
            row = {"epoch": epoch, **train_metrics}
            if self.syn_eval_loader is not None:
                syn_scores = self.evaluate(self.syn_eval_loader)
                row.update({f"syn_{k}": v for k, v in syn_scores.items()})
            if self.val_loader is not None:
                val_scores = self.evaluate(self.val_loader,
                                           predict_fn=self.predict_val)
                row.update({f"val_{k}": v for k, v in val_scores.items()})
                metric_key = ("val_weak_f1"
                              if cfg.train.best_metric == "weak_f1"
                              else "val_event_f1")
                score = row.get(metric_key, 0.0)
                if self.writer is not None:
                    # index val scalars by END-OF-EPOCH global step so the
                    # step-unit purge_step on resume covers them too (an
                    # epoch-unit index would sit below any step-unit purge
                    # point and survive as duplicates)
                    self.writer.add_scalar(
                        metric_key, score,
                        (epoch + 1) * len(self.train_loader))
                if cfg.train.checkpoint_epochs and \
                        epoch % cfg.train.checkpoint_epochs == 0:
                    self.ckpt.save(f"epoch_{epoch}", self.state)
                if self.saver.apply(score, epoch):
                    self.ckpt.save("best", self.state)
                    best = dict(row)
                if self.early_stopping is not None and \
                        self.early_stopping.apply(score, epoch):
                    self.log.info("Early stopping at epoch %d", epoch)
                    self.history.append(row)
                    break
            else:
                if cfg.train.checkpoint_epochs and \
                        epoch % cfg.train.checkpoint_epochs == 0:
                    self.ckpt.save(f"epoch_{epoch}", self.state)
            self.history.append(row)
        self._write_results()
        return best or (self.history[-1] if self.history else {})

    def _write_results(self) -> None:
        if self.history:
            df = pd.DataFrame(self.history)
            df.to_csv(os.path.join(self.store_dir, "results.tsv"),
                      sep="\t", index=False)
