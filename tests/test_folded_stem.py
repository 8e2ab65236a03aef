"""Exactness of the folded-frequency stem (ops/folded_stem.py) against the
standard flax conv stack — same params, eval mode, every supported
activation. The folding is pure algebra (lane-layout change), so agreement
must be float-roundoff tight."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsed_tpu.models.cnn import CNN
from bsed_tpu.ops.folded_stem import build_folded_stem, fold_conv_kernel

FILTERS = (16, 32, 64, 128, 128, 128, 128)
POOLING = ((2, 2), (2, 2), (1, 2), (1, 2), (1, 2), (1, 2), (1, 2))


def _init_cnn(activation="glu", seed=0, t=64):
    cnn = CNN(FILTERS, POOLING, activation, dropout=0.5)
    x = jnp.zeros((2, t, 128, 1))
    variables = cnn.init(jax.random.key(seed), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    # make BN affine + running stats non-trivial so folding is actually
    # exercised (fresh init has mean 0 / var 1)
    rng = np.random.default_rng(seed + 1)
    stats = jax.tree.map(
        lambda v: jnp.asarray(
            rng.normal(0.1, 0.3, v.shape).astype(np.float32) ** 2 + 0.5),
        stats)
    params = jax.tree.map(
        lambda v: v + jnp.asarray(
            rng.normal(0, 0.05, v.shape).astype(np.float32)),
        params)
    return cnn, params, stats


def test_fold_conv_kernel_identity_at_fold_1():
    k = np.random.default_rng(0).normal(size=(3, 3, 5, 7)).astype(np.float32)
    kf = fold_conv_kernel(k, 1)
    np.testing.assert_array_equal(kf, k)


@pytest.mark.parametrize("activation", ["glu", "cg", "relu", "leakyrelu"])
def test_folded_stem_matches_standard_cnn(activation):
    cnn, params, stats = _init_cnn(activation)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.normal(size=(2, 64, 128, 1)).astype(np.float32))

    ref = cnn.apply({"params": params, "batch_stats": stats}, mel,
                    train=False)

    stem, n_folded = build_folded_stem(params, stats, FILTERS, POOLING,
                                       activation=activation)
    assert n_folded == 3            # fold 8 -> 4 -> 2 -> 1 over blocks 0-2
    h = stem(mel)
    assert h.shape == (2, 16, 16, 64)   # (B, T/4, F/8, C2)

    # run the remaining blocks 3..6 on the unfolded tensor
    from bsed_tpu.models.layers import ConvBlock
    for i in range(n_folded, len(FILTERS)):
        blk = ConvBlock(FILTERS[i], POOLING[i], activation, 0.5,
                        name=f"block{i}")
        h = blk.apply({"params": params[f"block{i}"],
                       "batch_stats": stats[f"block{i}"]}, h, train=False)
    np.testing.assert_allclose(np.asarray(h, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=2e-4)


def test_folded_stem_bf16_close_to_bf16_standard():
    """The serving configuration: both paths in bfloat16 must agree to
    bf16 resolution (the folded path is the same math, reordered)."""
    cnn, params, stats = _init_cnn("glu")
    cnn16 = CNN(FILTERS, POOLING, "glu", dropout=0.5, dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.normal(size=(2, 64, 128, 1)).astype(np.float32))

    ref = cnn16.apply({"params": params, "batch_stats": stats}, mel,
                      train=False)
    stem, n_folded = build_folded_stem(params, stats, FILTERS, POOLING,
                                       dtype=jnp.bfloat16)
    h = stem(mel)
    from bsed_tpu.models.layers import ConvBlock
    for i in range(n_folded, len(FILTERS)):
        blk = ConvBlock(FILTERS[i], POOLING[i], "glu", 0.5,
                        dtype=jnp.bfloat16, name=f"block{i}")
        h = blk.apply({"params": params[f"block{i}"],
                       "batch_stats": stats[f"block{i}"]}, h, train=False)
    np.testing.assert_allclose(np.asarray(h, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=0.15)


def test_folded_serving_forward_matches_standard():
    """make_fast_forward(use_folded_stem=True) must produce the same
    posteriors as the standard serving path (f32, CPU)."""
    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.serve import make_fast_forward
    from bsed_tpu.train.steps import build_modules, create_train_state

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))

    std = jax.jit(make_fast_forward(cfg, modules, state.params,
                                    state.batch_stats))
    fold = jax.jit(make_fast_forward(cfg, modules, state.params,
                                     state.batch_stats,
                                     use_folded_stem=True))
    rng = np.random.default_rng(11)
    audio = jnp.asarray(
        rng.standard_normal((3, cfg.audio.n_samples)).astype(np.float32))
    s0, w0 = std(audio)
    s1, w1 = fold(audio)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=1e-5)


def test_fold_divides_gate_matches_builder():
    """serve's auto-selection gate must admit exactly the pooling layouts
    build_folded_stem can fold: each leading block's frequency pool has to
    divide the running fold (ops/folded_stem.py:104). A layout like
    ((1,4),(1,4),...) with fold0=8 used to pass the gate and crash
    construction (4 does not divide 2 after the first block)."""
    from bsed_tpu.serve import _fold_divides

    assert _fold_divides(((2, 2), (2, 2), (1, 2), (1, 2)))   # default cfg
    assert _fold_divides(((1, 8), (1, 1)))                    # one-shot
    assert _fold_divides(((1, 2), (1, 2), (1, 2)))            # leftover f=1
    assert _fold_divides(((1, 2), (1, 2)))                    # leftover f=2
    assert not _fold_divides(((1, 4), (1, 4)))                # 4 ∤ 2
    assert not _fold_divides(((1, 3), (1, 2)))                # 3 ∤ 8


def test_folded_train_stem_matches_standard_train_forward():
    """The TRAIN-mode folded stem (make_folded_encoder_fwd) must reproduce
    the standard flax encoder's train-mode forward on the same params:
    outputs, grouped BatchNorm batch-stat updates, and parameter gradients
    (dropout=0 — masks are layout-dependent by design). f32, tiny shapes."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_folded_encoder_fwd)

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, dropout=0.0, folded_train_stem=True))
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    fwd = make_folded_encoder_fwd(cfg)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(
        (3, cfg.audio.max_frames, cfg.audio.n_mels, 1)).astype(np.float32))
    key = jax.random.key(7)

    out_f, stats_f = jax.jit(lambda p, s: fwd(p, s, x, key))(
        state.params["encoder"], state.batch_stats["encoder"])
    (out_s, _), mut = jax.jit(lambda p, s: modules.encoder.apply(
        {"params": p, "batch_stats": s}, x, train=True,
        rngs={"dropout": key}, mutable=["batch_stats"]))(
        state.params["encoder"], state.batch_stats["encoder"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               atol=2e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(stats_f)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(
        mut["batch_stats"]))
    assert len(flat_f) == len(flat_s)
    for path, v in flat_f:
        np.testing.assert_allclose(np.asarray(v),
                                   np.asarray(flat_s[path]),
                                   atol=1e-5, err_msg=str(path))

    # gradient equality through both paths
    g_f = jax.jit(jax.grad(lambda p: fwd(
        p, state.batch_stats["encoder"], x, key)[0].sum()))(
        state.params["encoder"])
    g_s = jax.jit(jax.grad(lambda p: modules.encoder.apply(
        {"params": p, "batch_stats": state.batch_stats["encoder"]},
        x, train=True, rngs={"dropout": key},
        mutable=["batch_stats"])[0][0].sum()))(state.params["encoder"])
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_f),
            jax.tree_util.tree_leaves_with_path(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4,
                                   err_msg=str(path))


def test_folded_train_stem_full_step_matches(tmp_path):
    """A full jitted train step with folded_train_stem=True must match the
    standard step's losses and updated params (dropout=0, f32)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_train_step)

    rng = np.random.default_rng(5)

    def run(folded):
        cfg = get_config("baseline_mt").replace(
            audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, dropout=0.0, folded_train_stem=folded))
        modules = build_modules(cfg)
        state = create_train_state(cfg, modules, jax.random.key(0))
        step = make_train_step(modules, steps_per_epoch=2)
        bs = 4
        batch = {
            "syn": jnp.asarray(np.abs(rng.standard_normal(
                (bs, cfg.audio.max_frames,
                 cfg.audio.n_mels))).astype(np.float32)),
            "syn_strong": jnp.asarray((np.arange(
                bs * cfg.n_frames * cfg.nclass).reshape(
                bs, cfg.n_frames, cfg.nclass) % 7 == 0
            ).astype(np.float32)),
            "real": jnp.asarray(np.abs(rng.standard_normal(
                (bs, cfg.audio.max_frames,
                 cfg.audio.n_mels))).astype(np.float32)),
            "real_weak": jnp.asarray((np.arange(bs * cfg.nclass).reshape(
                bs, cfg.nclass) % 3 == 0).astype(np.float32)),
        }
        state, m = step(state, batch, jax.random.key(1), jnp.asarray(0.0))
        return state, {k: float(v) for k, v in m.items()}

    rng = np.random.default_rng(5)
    s_std, m_std = run(False)
    rng = np.random.default_rng(5)
    s_fold, m_fold = run(True)
    for k in ("loss", "strong_class_loss", "weak_class_loss"):
        np.testing.assert_allclose(m_fold[k], m_std[k], rtol=1e-4,
                                   err_msg=k)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(s_std.params),
                    jax.tree_util.tree_leaves(s_fold.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3)


def test_fused_epilogue_serving_close_to_folded():
    """make_fast_forward(use_fused_epilogue=True) — the serving-side
    Pallas stem epilogue (auto-on on TPU) — must agree with the unfused
    folded path to float tolerance (the kernel's f32 register math
    reorders the bf16 chain, so bit-equality is not expected)."""
    import dataclasses

    import jax
    import numpy as np

    from bsed_tpu.config import AudioConfig, get_config
    from bsed_tpu.serve import make_fast_forward
    from bsed_tpu.train.steps import build_modules, create_train_state

    cfg = get_config("baseline").replace(
        audio=AudioConfig(sr=3200, hop_size=160, max_len_seconds=2.0))
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(0))
    audio = np.random.default_rng(3).standard_normal(
        (2, cfg.audio.n_samples)).astype(np.float32)
    base = make_fast_forward(cfg, modules, state.params,
                             state.batch_stats,
                             use_fused_epilogue=False)
    fused = make_fast_forward(cfg, modules, state.params,
                              state.batch_stats,
                              use_fused_epilogue=True)
    s0, w0 = jax.jit(base)(audio)
    s1, w1 = jax.jit(fused)(audio)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0),
                               rtol=2e-3, atol=2e-3)
