"""Multi-device tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dryrun_multichip_executes():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    strong, weak = jax.jit(fn)(*args)
    assert strong.shape == (2, 313, 20)
    assert weak.shape == (2, 20)
    assert np.isfinite(np.asarray(strong)).all()


@pytest.mark.slow
def test_sharded_batch_matches_single_device():
    """The sharded supervised step must produce the same loss as the
    unsharded one (global-batch BN semantics under GSPMD)."""
    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    modules = build_modules(cfg)
    rng = np.random.default_rng(0)
    b, t_in, f = 8, cfg.audio.max_frames, cfg.audio.n_mels
    batch = {
        "syn": np.abs(rng.standard_normal((b, t_in, f))).astype(np.float32),
        "syn_strong": (rng.random((b, cfg.n_frames, cfg.nclass)) > 0.9
                       ).astype(np.float32),
        "real": np.abs(rng.standard_normal((b, t_in, f))).astype(np.float32),
        "real_weak": (rng.random((b, cfg.nclass)) > 0.8).astype(np.float32),
    }

    state1 = create_train_state(cfg, modules, jax.random.key(0))
    step = make_train_step(modules)
    _, m1 = step(state1, batch, jax.random.key(1), jnp.asarray(0.0))

    mesh = make_mesh()
    state8 = create_train_state(cfg, modules, jax.random.key(0))
    state8 = replicate(mesh, state8)
    sharded = shard_batch(mesh, batch)
    _, m8 = step(state8, sharded, jax.random.key(1), jnp.asarray(0.0))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)


def _mk_batch(cfg, b=8, seed=0):
    rng = np.random.default_rng(seed)
    t_in, f = cfg.audio.max_frames, cfg.audio.n_mels
    return {
        "syn": np.abs(rng.standard_normal((b, t_in, f))).astype(np.float32),
        "syn_strong": (rng.random((b, cfg.n_frames, cfg.nclass)) > 0.9
                       ).astype(np.float32),
        "real": np.abs(rng.standard_normal((b, t_in, f))).astype(np.float32),
        "real_weak": (rng.random((b, cfg.nclass)) > 0.8).astype(np.float32),
    }


def _sharded_vs_single(cfg, rtol=1e-5):
    from bsed_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    modules = build_modules(cfg)
    batch = _mk_batch(cfg)
    step = make_train_step(modules)
    state1 = create_train_state(cfg, modules, jax.random.key(0))
    _, m1 = step(state1, batch, jax.random.key(1), jnp.asarray(0.0))

    mesh = make_mesh()
    state8 = replicate(mesh, create_train_state(cfg, modules,
                                                jax.random.key(0)))
    _, m8 = step(state8, shard_batch(mesh, batch), jax.random.key(1),
                 jnp.asarray(0.0))
    for key in m1:
        np.testing.assert_allclose(float(m1[key]), float(m8[key]),
                                   rtol=rtol, err_msg=key)


@pytest.mark.slow
def test_sharded_mt_isp_matches_single_device():
    """MT+ISP (9 forwards, teacher/student BatchNorm threading) — the step
    the driver's dryrun jits — must be sharding-invariant: per-stream BN
    batch stats are GLOBAL means under GSPMD, so every metric matches the
    unsharded run."""
    from bsed_tpu.config import AudioConfig, get_config

    cfg = get_config("baseline_mt_isp").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    _sharded_vs_single(cfg)


@pytest.mark.slow
def test_sharded_joint_da_matches_single_device():
    """Joint-backward DA (discriminator co-update, main_scmt_ada_weak.py
    lineage) under the data mesh."""
    import dataclasses

    from bsed_tpu.config import AudioConfig, get_config

    cfg = get_config("scmt_ada_weak").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                stage="adaptation"))
    assert cfg.da.joint_backward
    _sharded_vs_single(cfg)


@pytest.mark.slow
def test_sharded_fused_stem_epilogue_matches_single_device():
    """The fused Pallas stem epilogue (ops/stem_epilogue.py) runs under
    shard_map on a mesh (Mosaic kernels are opaque to GSPMD): the sharded
    MT+ISP step with folded_train_stem + fused_stem_epilogue must match
    the single-device step — metrics AND updated parameters (the kernel's
    dW/db/dinv/dc accumulators cross the mesh through shard_map's psum
    transpose)."""
    import dataclasses

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    cfg = get_config("baseline_mt_isp").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, folded_train_stem=True, fused_stem_epilogue=True,
        dropout=0.0))
    modules = build_modules(cfg)
    batch = _mk_batch(cfg)

    step1 = make_train_step(modules)
    state1 = create_train_state(cfg, modules, jax.random.key(0))
    s1, m1 = step1(state1, batch, jax.random.key(1), jnp.asarray(0.0))

    mesh = make_mesh()
    step8 = make_train_step(modules, mesh=mesh)
    state8 = replicate(mesh, create_train_state(cfg, modules,
                                                jax.random.key(0)))
    s8, m8 = step8(state8, shard_batch(mesh, batch), jax.random.key(1),
                   jnp.asarray(0.0))
    for key in m1:
        np.testing.assert_allclose(float(m1[key]), float(m8[key]),
                                   rtol=2e-4, err_msg=key)
    flat1 = jax.tree_util.tree_leaves_with_path(s1.params)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(s8.params))
    for path, v1 in flat1:
        v8 = flat8[path]
        np.testing.assert_allclose(
            np.asarray(v1, np.float32), np.asarray(v8, np.float32),
            rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_trainer_fit_mesh_matches_single_device(tmp_path):
    """VERDICT r2 item 1 done-criterion: a FULL Trainer.fit epoch (loader →
    prefetch → sharded step → eval → checkpoint) on the 8-device mesh must
    match the single-device run's metrics row-for-row. The Trainer builds
    the mesh itself (mesh='auto'), replicates state, and shards batches —
    multi-chip training is reachable from the user path with zero flags."""
    from tests.test_trainer import make_trainer

    t_mesh = make_trainer(tmp_path / "mesh", batch=8)  # auto: 8 CPU devices
    assert t_mesh.mesh is not None and t_mesh.mesh.size == 8
    t_single = make_trainer(tmp_path / "single", batch=8, mesh_override=None)
    assert t_single.mesh is None

    best_m = t_mesh.fit(n_epochs=1)
    best_s = t_single.fit(n_epochs=1)
    assert t_mesh.history and len(t_mesh.history) == len(t_single.history)
    for row_m, row_s in zip(t_mesh.history, t_single.history):
        assert row_m.keys() == row_s.keys()
        for k in row_s:
            np.testing.assert_allclose(
                row_m[k], row_s[k], rtol=1e-4, atol=1e-6,
                err_msg=f"metric {k} diverges between mesh and single")
    # checkpoints written from the sharded state restore cleanly
    assert t_mesh.ckpt.has("epoch_0")
    t_mesh.resume(1)
    assert int(t_mesh.state.step) == len(t_mesh.train_loader)


@pytest.mark.slow
def test_scanned_epoch_matches_loop_on_mesh(tmp_path):
    """VERDICT r3 item 3: the one-dispatch ``lax.scan`` epoch runs UNDER
    the 8-device data mesh (dataset arrays replicated, each gathered batch
    row-sharded by constraint) and matches the per-step loop path's epoch
    metrics. The Trainer auto-selects scan whenever the arrays are
    device-resident — mesh or not (the old single-chip-only gate is
    gone)."""
    import dataclasses

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import ThreeStreamLoader
    from bsed_tpu.train.trainer import Trainer

    def build(tag, scan):
        cfg = get_config("baseline_mt_isp").replace(
            audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    batch_size=8))
        syn = SyntheticDataSource(cfg, n_items=16, seed=1)
        weak = SyntheticDataSource(cfg, n_items=8, seed=2)
        unlab = SyntheticDataSource(cfg, n_items=8, seed=3)
        loader = ThreeStreamLoader(syn, weak, unlab, batch_size=8,
                                   seed=cfg.train.seed,
                                   device_resident=True)
        return Trainer(cfg, loader, store_dir=str(tmp_path / tag),
                       mesh="auto", scan_epoch=scan)

    t_scan = build("scan", "auto")
    assert t_scan.mesh is not None and t_scan.mesh.size == 8
    assert t_scan.train_loader.epoch_arrays(0) is not None
    m_scan = t_scan.train_epoch(0)
    t_loop = build("loop", "off")
    m_loop = t_loop.train_epoch(0)
    assert m_scan.keys() == m_loop.keys()
    for k in m_loop:
        np.testing.assert_allclose(
            m_scan[k], m_loop[k], rtol=1e-4, atol=1e-6,
            err_msg=f"metric {k}: scanned-mesh vs loop-mesh")


def test_auto_data_mesh_divisibility():
    """auto_data_mesh picks the largest device count dividing every batch
    stream (GSPMD needs axis-0 divisibility), or None when only 1 fits."""
    from bsed_tpu.parallel.mesh import auto_data_mesh

    assert auto_data_mesh(8, 8).size == 8
    assert auto_data_mesh(12, 12).size == 6      # 8 devices: 12 % 8 != 0
    assert auto_data_mesh(4, 4).size == 4
    assert auto_data_mesh(3, 2) is None          # gcd 1 → single device
    assert auto_data_mesh(16, 16, devices=jax.devices()[:1]) is None


def test_host_local_batch_slicing(monkeypatch):
    """Deterministic host data sharding: each simulated process takes a
    disjoint, covering slice of the global batch."""
    from bsed_tpu.parallel import mesh as pm

    slices = []
    for i in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda i=i: i)
        slices.append(pm.host_local_batch(24))
    idx = np.arange(24)
    got = np.concatenate([idx[s] for s in slices])
    assert sorted(got.tolist()) == idx.tolist()
    assert len(idx[slices[0]]) == len(idx[slices[1]]) == 12


def test_three_stream_loader_process_striding():
    """ThreeStreamLoader process-strided loading: two simulated hosts see
    disjoint syn items covering the dataset, with identical batch shapes."""
    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import ThreeStreamLoader

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    syn = SyntheticDataSource(cfg, n_items=16, seed=1)
    weak = SyntheticDataSource(cfg, n_items=8, seed=2)
    unlab = SyntheticDataSource(cfg, n_items=8, seed=3)

    seen = []
    for pi in range(2):
        loader = ThreeStreamLoader(syn, weak, unlab, batch_size=4,
                                   seed=7, shuffle=False,
                                   process_index=pi, process_count=2)
        assert len(loader) == 2          # 8 host items / bs 4
        host_items = []
        for batch in loader.epoch(0):
            assert batch["syn"].shape[0] == 4
            assert batch["real"].shape[0] == 4
            host_items.append(batch["syn"])
        seen.append(np.concatenate(host_items))
    # strided slices are disjoint: host 0 gets even indices, host 1 odd
    all_feats = np.stack([syn[i][0] for i in range(16)])
    np.testing.assert_array_equal(seen[0], all_feats[0::2])
    np.testing.assert_array_equal(seen[1], all_feats[1::2])


@pytest.mark.slow
def test_multihost_epoch_global_batch_equivalence(tmp_path):
    """Simulated 2-process run (SURVEY §2.3 multi-host): each process
    drives its process-strided ThreeStreamLoader through a REAL epoch; at
    every step the assembled global batch (concat of host batches) must
    contain exactly the same samples as the 1-process run with the global
    batch size — and the jitted train step must produce the same loss on
    both (permutation-invariant global reductions).

    Real recipe: per host, call ``jax.distributed.initialize(...)`` before
    building the mesh, construct the loader with
    process_index=jax.process_index(), process_count=jax.process_count()
    (cli.py does this), and feed each host's shard of the global batch.
    """
    import dataclasses

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import ThreeStreamLoader
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    cfg = get_config("baseline_mt").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    # dropout off: dropout masks are positional, so loss equality under a
    # batch permutation needs the only non-permutation-invariant op removed
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, dropout=0.0))

    syn = SyntheticDataSource(cfg, n_items=16, seed=1)
    weak = SyntheticDataSource(cfg, n_items=8, seed=2)
    unlab = SyntheticDataSource(cfg, n_items=8, seed=3)

    def epoch_batches(process_index, process_count, batch_size):
        loader = ThreeStreamLoader(syn, weak, unlab, batch_size=batch_size,
                                   seed=7, shuffle=False,
                                   process_index=process_index,
                                   process_count=process_count)
        return list(loader.epoch(0))

    per_host = 4
    host_runs = [epoch_batches(pi, 2, per_host) for pi in range(2)]
    global_run = epoch_batches(0, 1, 2 * per_host)
    assert len(host_runs[0]) == len(host_runs[1]) == len(global_run) == 2

    def row_set(arr):
        return {np.asarray(r).tobytes() for r in arr}

    assembled0 = None
    for t, (b0, b1, bg) in enumerate(zip(*host_runs, global_run)):
        assembled = {k: np.concatenate([np.asarray(b0[k]),
                                        np.asarray(b1[k])])
                     for k in bg}
        for k in ("syn", "real"):
            # host shards are disjoint and their union is the global batch
            assert not (row_set(b0[k]) & row_set(b1[k])), (t, k)
            assert row_set(assembled[k]) == row_set(np.asarray(bg[k])), (t, k)
        if assembled0 is None:
            assembled0 = assembled

    # one real step on the assembled vs the native global batch — the
    # supervised losses are global-mean reductions, permutation invariant
    modules = build_modules(cfg)
    step = make_train_step(modules, steps_per_epoch=2)
    s_a = create_train_state(cfg, modules, jax.random.key(0))
    s_g = create_train_state(cfg, modules, jax.random.key(0))
    _, m_a = step(s_a, assembled0, jax.random.key(1), jnp.asarray(0.0))
    _, m_g = step(s_g, {k: np.asarray(v) for k, v in global_run[0].items()},
                  jax.random.key(1), jnp.asarray(0.0))
    np.testing.assert_allclose(float(m_a["strong_class_loss"]),
                               float(m_g["strong_class_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_a["weak_class_loss"]),
                               float(m_g["weak_class_loss"]), rtol=1e-5)


def test_sharded_serving_matches_single_device():
    """make_sharded_forward over the 8-device mesh must reproduce the
    unsharded serving posteriors exactly (pure data parallelism: zero
    collectives, batch rows independent)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.parallel.mesh import make_mesh, shard_batch
    from bsed_tpu.serve import make_fast_forward, make_sharded_forward
    from bsed_tpu.train.steps import build_modules, create_train_state

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    audio = np.random.default_rng(0).standard_normal(
        (8, cfg.audio.n_samples)).astype(np.float32) * 0.1

    ref_fwd = jax.jit(make_fast_forward(cfg, modules, state.params,
                                        state.batch_stats))
    ref_strong, ref_weak = ref_fwd(jnp.asarray(audio))

    mesh = make_mesh(jax.devices()[:8])
    fwd = make_sharded_forward(cfg, modules, state.params,
                               state.batch_stats, mesh,
                               precision="highest")
    strong, weak = fwd(shard_batch(mesh, jnp.asarray(audio)))
    np.testing.assert_allclose(np.asarray(strong), np.asarray(ref_strong),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(weak), np.asarray(ref_weak),
                               atol=1e-6)


def test_sharded_serving_with_pallas_mel_kernel():
    """The multi-chip serving path at the PARITY audio config, with the
    fused block-STFT Pallas mel kernel forced on (off-TPU the auto default
    would fall back to dense): shard_map must run the kernel per-shard and
    reproduce the single-device posteriors exactly."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from bsed_tpu.serve import make_fast_forward
    from bsed_tpu.train.steps import build_modules, create_train_state
    from jax.sharding import PartitionSpec as P

    cfg = get_config("baseline").replace(
        audio=dataclasses.replace(AudioConfig(), max_len_seconds=1.0))
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    audio = np.random.default_rng(1).standard_normal(
        (8, cfg.audio.n_samples)).astype(np.float32) * 0.1

    ref_fwd = jax.jit(make_fast_forward(
        cfg, modules, state.params, state.batch_stats, precision="high",
        mel_algorithm="block_pallas"))
    ref_strong, ref_weak = ref_fwd(jnp.asarray(audio))

    mesh = make_mesh(jax.devices()[:8])
    params = replicate(mesh, state.params)
    stats = replicate(mesh, state.batch_stats)
    fwd = make_fast_forward(cfg, modules, params, stats, precision="high",
                            mel_algorithm="block_pallas")
    sharded = jax.jit(jax.shard_map(fwd, mesh=mesh, in_specs=P("data"),
                                    out_specs=P("data"), check_vma=False))
    strong, weak = sharded(shard_batch(mesh, jnp.asarray(audio)))
    np.testing.assert_allclose(np.asarray(strong), np.asarray(ref_strong),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(weak), np.asarray(ref_weak),
                               atol=1e-6)


@pytest.mark.slow
def test_true_two_process_distributed_training(tmp_path):
    """REAL 2-process ``jax.distributed`` run (no monkeypatching): two
    subprocesses join a coordination service, form one 8-device global CPU
    mesh (4 virtual devices each, gloo collectives), and each drives a full
    ``Trainer.fit`` epoch with process-strided loaders — the exact cli
    recipe for a multi-host TPU pod. Both processes must agree exactly
    (replicated state), and the epoch losses must match the 1-process
    global-batch run (permutation-invariant global reductions; the only
    difference is the global row order, so agreement is up to fp
    reassociation)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    import dataclasses

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.data.datasets import SyntheticDataSource
    from bsed_tpu.data.pipeline import EvalLoader, ThreeStreamLoader
    from bsed_tpu.train.trainer import Trainer

    with socket.socket() as s:     # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), outs[i],
         str(tmp_path / f"store{i}")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, cwd=os.getcwd())
        for i in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-4000:]

    rows = [json.load(open(o)) for o in outs]
    # replicated state + identical full val set → bit-identical reports
    assert rows[0].keys() == rows[1].keys()
    for k in rows[0]:
        assert rows[0][k] == rows[1][k], (k, rows)

    # 1-process reference: same datasets, global batch 8 over the
    # in-process 8-device mesh
    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, dropout=0.0),
        train=dataclasses.replace(cfg.train, batch_size=8))
    syn = SyntheticDataSource(cfg, n_items=16, seed=1)
    weak = SyntheticDataSource(cfg, n_items=8, seed=2)
    unlab = SyntheticDataSource(cfg, n_items=8, seed=3)
    val = SyntheticDataSource(cfg, n_items=8, seed=4)
    loader = ThreeStreamLoader(syn, weak, unlab, batch_size=8, seed=7,
                               shuffle=False)
    trainer = Trainer(cfg, loader, val_loader=EvalLoader(val, batch_size=8),
                      store_dir=str(tmp_path / "ref"), mesh="auto")
    ref = trainer.fit(n_epochs=1)

    for k in ("loss", "strong_class_loss", "weak_class_loss"):
        np.testing.assert_allclose(rows[0][k], ref[k], rtol=1e-4,
                                   err_msg=k)
    # the posteriors feeding val decoding differ only by fp reassociation
    for k in ("val_weak_f1", "val_event_f1"):
        assert abs(rows[0][k] - ref[k]) < 0.05, (k, rows[0][k], ref[k])
