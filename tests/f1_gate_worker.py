"""Worker for the event-F1 training gate (run OUTSIDE the pytest process).

The suite's conftest forces an 8-virtual-device CPU backend, where this
gate's ~2000 tiny MT+ISP steps cost ~50 s/epoch (no AMX fastpath for the
training graph) — hours instead of minutes. The gate therefore runs in a
clean subprocess on the machine's REAL accelerator (the same pattern as
``__graft_entry__.dryrun_multichip``'s child and
``tests/multihost_worker.py``), and the parent test SKIPS when only a CPU
backend exists.

Prints one JSON line: {"backend": ..., "oracle_f1": ..., "best_f1": ...,
"epochs": ...}.
"""
import dataclasses
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import numpy as np

    backend = jax.default_backend()
    if backend == "cpu":
        print(json.dumps({"backend": "cpu"}))
        return

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import EvalLoader, ThreeStreamLoader
    from bsed_tpu.eval.decode import (decode_batch,
                                      groundtruth_df_from_events,
                                      merge_prediction_dfs)
    from bsed_tpu.eval.sed_scores import event_based_f1
    from bsed_tpu.train.trainer import Trainer

    # calibrated recipe — see the parent test's docstring
    fine_audio = AudioConfig(sr=3200, hop_size=80, max_len_seconds=4.0)
    cfg = get_config("baseline_mt_isp").replace(audio=fine_audio)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dropout=0.1),
        train=dataclasses.replace(cfg.train, batch_size=8,
                                  adjust_lr=False,
                                  max_learning_rate=2e-3))

    def mk(n, seed):
        return SyntheticDataSource(cfg, n_items=n, seed=seed,
                                   event_rate=0.10, signal_boost=8.0)

    loader = ThreeStreamLoader(mk(128, 1), mk(32, 2), mk(32, 3),
                               batch_size=8, seed=cfg.train.seed)
    val_ds = mk(32, 4)
    val = EvalLoader(val_ds, batch_size=8)
    store = tempfile.mkdtemp()
    try:
        trainer = Trainer(cfg, loader, val_loader=val, store_dir=store,
                          mesh="off", scan_epoch="auto")

        # decode-path oracle: GT frame targets through binarize → median →
        # region extraction → bipartite matching must score ~1
        pred_dfs, gt_events = [], {}
        for mel, target, names, nv in val:
            t = np.asarray(target)[:nv].astype(np.float32)
            pred_dfs.append(decode_batch(t, names[:nv], cfg.bird_list, cfg,
                                         thresholds=(0.5,)))
        for i in range(len(val_ds)):
            gt_events[val_ds.filename(i)] = list(val_ds.events(i))
        oracle = event_based_f1(groundtruth_df_from_events(gt_events),
                                merge_prediction_dfs(pred_dfs)[0.5])

        best, epochs = 0.0, 0
        for e in range(300):
            trainer.train_epoch(e)
            epochs = e + 1
            if (e + 1) % 20 == 0:
                best = max(best,
                           trainer.evaluate(trainer.val_loader)["event_f1"])
                if best >= 0.15:
                    break
        print(json.dumps({"backend": backend, "oracle_f1": float(oracle),
                          "best_f1": float(best), "epochs": epochs}))
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
