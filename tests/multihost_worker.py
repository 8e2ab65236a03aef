"""True multi-process worker for the 2-process ``jax.distributed`` test.

Run as a plain script (NOT under pytest — conftest must not interfere):

    python tests/multihost_worker.py <process_id> <coordinator_port> <out.json> <store_dir>

Each process forces the CPU platform with 4 virtual devices, joins the
coordination service (gloo CPU collectives), and drives a REAL
``Trainer.fit`` epoch over the resulting 8-device 2-process global mesh:
process-strided ``ThreeStreamLoader`` → ``shard_batch`` (which routes
through ``jax.make_array_from_process_local_data`` when
``jax.process_count() > 1``) → jitted train step with cross-process global
reductions → replicated per-process evaluation → orbax checkpoint. This is
the exact recipe ``cli train`` runs on a real multi-host TPU pod
(SURVEY.md §2.3: ``jax.distributed.initialize`` + GSPMD over DCN), executed
on fake CPU devices.
"""
import json
import os
import sys

# file-mode python does not put cwd on sys.path in this environment
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    out_path = sys.argv[3]
    store_dir = sys.argv[4]

    # Platform forcing mirrors tests/conftest.py: this environment
    # pre-imports jax at interpreter startup, so env vars alone are
    # captured too late — the config must be updated post-import, before
    # any backend client exists.
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    import dataclasses

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import EvalLoader, ThreeStreamLoader
    from bsed_tpu.train.trainer import Trainer

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    # dropout off: the only op whose result depends on the global row
    # ORDER; everything else in the supervised step is a permutation-
    # invariant global reduction, so the 2-host run must match the
    # 1-process global-batch run numerically
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dropout=0.0),
        train=dataclasses.replace(cfg.train, batch_size=4))

    syn = SyntheticDataSource(cfg, n_items=16, seed=1)
    weak = SyntheticDataSource(cfg, n_items=8, seed=2)
    unlab = SyntheticDataSource(cfg, n_items=8, seed=3)
    val = SyntheticDataSource(cfg, n_items=8, seed=4)

    loader = ThreeStreamLoader(
        syn, weak, unlab, batch_size=4, seed=7, shuffle=False,
        process_index=jax.process_index(),
        process_count=jax.process_count())
    # 2 val batches → one per process on the sharded-eval path
    val_loader = EvalLoader(val, batch_size=4)
    trainer = Trainer(cfg, loader, val_loader=val_loader,
                      store_dir=store_dir, mesh="auto")
    assert trainer.mesh is not None and trainer.mesh.size == 8, trainer.mesh
    row = trainer.fit(n_epochs=1)

    # VERDICT r3 item 8: sharded multi-host eval (each process forwards +
    # decodes only its batch stride, decoded events + tagging counts
    # all-gathered) must reproduce the fully-replicated eval's metrics.
    # Guard against this comparison going vacuous: the sharded path only
    # engages when original-resolution GT exists, so pin that precondition
    assert val_loader.groundtruth_events() is not None, \
        "sharded-eval precondition lost: evaluate() would silently " \
        "fall back to replicated eval and the equality below is vacuous"
    sharded = trainer.evaluate(val_loader)          # auto → sharded
    replicated = trainer.evaluate(val_loader, shard=False)
    for k in replicated:
        assert abs(sharded[k] - replicated[k]) < 1e-9, (
            k, sharded[k], replicated[k])

    row.update({f"sharded_{k}": float(v) for k, v in sharded.items()})
    with open(out_path, "w") as f:
        json.dump({k: float(v) for k, v in row.items()}, f)


if __name__ == "__main__":
    main()
