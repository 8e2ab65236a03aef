"""Parity gate against the ACTUAL reference source.

``tests/torch_ref.py`` is a fast hand-written mirror; any drift in it would
silently weaken the 1e-3 gate. These tests retire that risk: they import the
real torch classes from ``/root/reference/src/models`` (read-only mount),
build them with the canonical kwargs (main_baseline.py:663-673), save a
reference-format checkpoint, load it through ``load_torch_checkpoint`` (the
full torch_compat contract incl. key layout), and assert frame/clip
posteriors within 1e-3 on full (1255, 128) input — the BASELINE.md gate.

Covered oracles:
  * models/CRNN_GRL.py:142-204 CRNN + :430-460 Predictor (the live classes)
  * models/CRNN.py:178-240 twin CRNN (checkpoint-compatible twin)
  * models/CRNN_GRL.py:293-389 CRNN_fpn (weight-tied pyramid + upsample)
"""
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast core
import torch

import jax.numpy as jnp

from bsed_tpu.config import get_config

REF_SRC = "/root/reference/src"

# canonical kwargs, main_baseline.py:663-673
N_LAYERS = 7
CRNN_KWARGS = {
    "n_in_channel": 1, "nclass": 20, "attention": True, "n_RNN_cell": 128,
    "n_layers_RNN": 2, "activation": "glu", "dropout": 0.5,
    "kernel_size": N_LAYERS * [3], "padding": N_LAYERS * [1],
    "stride": N_LAYERS * [1],
    "nb_filters": [16, 32, 64, 128, 128, 128, 128],
    "pooling": [[2, 2], [2, 2], [1, 2], [1, 2], [1, 2], [1, 2], [1, 2]],
}
PREDICTOR_KWARGS = {"nclass": 20, "attention": True, "n_RNN_cell": 128}


@pytest.fixture(scope="module")
def ref_models():
    """Import the real reference model modules (they use intra-package
    ``from models.X import`` absolute imports, so src/ goes on sys.path)."""
    sys.path.insert(0, REF_SRC)
    try:
        import models.CRNN as crnn_mod
        import models.CRNN_GRL as grl_mod
    finally:
        sys.path.remove(REF_SRC)
    return grl_mod, crnn_mod


def _save_ckpt(path, crnn, predictor):
    """Reference checkpoint layout (main_baseline.py:895-971)."""
    torch.save({
        "model": {"name": type(crnn).__name__, "args": "", "kwargs": {},
                  "state_dict": crnn.state_dict()},
        "model_p": {"name": "Predictor", "args": "", "kwargs": {},
                    "state_dict": predictor.state_dict()},
        "pooling_time_ratio": 4,
        "median_window": 14,
        "epoch": 0,
    }, path)


def _assert_parity(cfg, ckpt_path, crnn, predictor, seed=3, batch=2):
    from bsed_tpu.eval.test_model import load_torch_checkpoint
    from bsed_tpu.train.steps import build_modules, make_predict_fn

    params, stats = load_torch_checkpoint(ckpt_path, cfg)
    predict = make_predict_fn(build_modules(cfg))

    rng = np.random.default_rng(seed)
    logmel = rng.standard_normal(
        (batch, cfg.audio.max_frames, cfg.audio.n_mels)).astype(np.float32)
    strong, weak = predict(params, stats, jnp.asarray(logmel),
                           apply_log=False)

    with torch.no_grad():
        enc, _ = crnn(torch.from_numpy(logmel).unsqueeze(1))
        ref_strong, ref_weak = predictor(enc)

    s_err = np.max(np.abs(np.asarray(strong) - ref_strong.numpy()))
    w_err = np.max(np.abs(np.asarray(weak) - ref_weak.numpy()))
    assert s_err <= 1e-3, f"strong posterior error {s_err}"
    assert w_err <= 1e-3, f"weak posterior error {w_err}"


def test_crnn_grl_reference_parity(ref_models, tmp_path):
    """The live classes: CRNN_GRL.CRNN + CRNN_GRL.Predictor."""
    grl_mod, _ = ref_models
    torch.manual_seed(11)
    crnn = grl_mod.CRNN(**CRNN_KWARGS).eval()
    predictor = grl_mod.Predictor(**PREDICTOR_KWARGS).eval()
    ckpt = str(tmp_path / "baseline_best")
    _save_ckpt(ckpt, crnn, predictor)
    _assert_parity(get_config("baseline"), ckpt, crnn, predictor)


def test_crnn_twin_reference_parity(ref_models, tmp_path):
    """models/CRNN.py twin (same state-dict contract)."""
    _, crnn_mod = ref_models
    torch.manual_seed(12)
    crnn = crnn_mod.CRNN(**CRNN_KWARGS).eval()
    predictor = crnn_mod.Predictor(**PREDICTOR_KWARGS).eval()
    ckpt = str(tmp_path / "baseline_best")
    _save_ckpt(ckpt, crnn, predictor)
    _assert_parity(get_config("baseline"), ckpt, crnn, predictor, seed=4)


def test_crnn_fpn_reference_parity(ref_models, tmp_path):
    """CRNN_GRL.CRNN_fpn: weight-tied pyramid, 3 BiGRUs, align_corners
    bilinear upsample, 1x1 fusion convs."""
    grl_mod, _ = ref_models
    torch.manual_seed(13)
    crnn = grl_mod.CRNN_fpn(**CRNN_KWARGS).eval()
    predictor = grl_mod.Predictor(**PREDICTOR_KWARGS).eval()
    ckpt = str(tmp_path / "fpn_best")
    _save_ckpt(ckpt, crnn, predictor)
    import dataclasses
    cfg = get_config("baseline")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, use_fpn=True))
    _assert_parity(cfg, ckpt, crnn, predictor, seed=5)


def test_supervised_gradient_parity(ref_models, tmp_path):
    """Training-dynamics parity, one level deeper than posteriors: for the
    supervised loss (BCE strong + BCE weak, the main_baseline.py:431-474
    core), per-parameter gradients of the jax model must match torch
    autograd through the REAL reference classes on identical weights and
    identical inputs. Torch grads are mapped into the jax layout by the
    same converters that map the weights (transposes/permutes carry
    gradients identically)."""
    import jax
    from bsed_tpu.eval.test_model import load_torch_checkpoint
    from bsed_tpu.train.losses import bce
    from bsed_tpu.train.steps import build_modules
    from bsed_tpu.utils import torch_compat as tc

    grl_mod, _ = ref_models
    torch.manual_seed(21)
    crnn = grl_mod.CRNN(**CRNN_KWARGS).eval()
    predictor = grl_mod.Predictor(**PREDICTOR_KWARGS).eval()
    ckpt = str(tmp_path / "baseline_best")
    _save_ckpt(ckpt, crnn, predictor)
    cfg = get_config("baseline")
    params, stats = load_torch_checkpoint(ckpt, cfg)
    modules = build_modules(cfg)

    rng = np.random.default_rng(9)
    logmel = rng.standard_normal(
        (2, cfg.audio.max_frames, cfg.audio.n_mels)).astype(np.float32)
    strong_t = (rng.random((2, cfg.n_frames, cfg.nclass)) > 0.9
                ).astype(np.float32)
    weak_t = strong_t.max(axis=1)

    def loss_fn(p):
        enc, _ = modules.encoder.apply(
            {"params": p["encoder"], "batch_stats": stats["encoder"]},
            jnp.asarray(logmel)[..., None], train=False)
        s, w = modules.predictor.apply({"params": p["predictor"]}, enc,
                                       train=False)
        return bce(s, jnp.asarray(strong_t)) + bce(w, jnp.asarray(weak_t))

    jloss, jgrads = jax.value_and_grad(loss_fn)(params)

    x = torch.from_numpy(logmel).unsqueeze(1)
    enc, _ = crnn(x)
    s, w = predictor(enc)
    tloss = (torch.nn.functional.binary_cross_entropy(
                 s, torch.from_numpy(strong_t))
             + torch.nn.functional.binary_cross_entropy(
                 w, torch.from_numpy(weak_t)))
    tloss.backward()
    assert abs(float(jloss) - float(tloss)) < 1e-5

    def grad_state_dict(module):
        # the reference CNN's state_dict() strips one "cnn." level vs
        # named_parameters (the very quirk behind the cnn.→cnn.cnn.
        # checkpoint migration) — match grads through both spellings
        named = dict(module.named_parameters())
        out = {}
        for k, v in module.state_dict().items():
            p = named.get(k)
            if p is None:
                p = named.get("cnn." + k)
            g = p.grad if p is not None else None
            out[k] = g if g is not None else torch.zeros_like(v)
        return out

    ref_enc_grads, _ = tc.convert_crnn(
        grad_state_dict(crnn), n_blocks=len(cfg.model.nb_filters),
        num_layers_rnn=cfg.model.n_layers_rnn,
        activation=cfg.model.activation, fpn=False)
    ref_pred_grads = tc.convert_predictor(grad_state_dict(predictor))
    ref_grads = {"encoder": ref_enc_grads, "predictor": ref_pred_grads}

    flat_j = jax.tree_util.tree_flatten_with_path(jgrads)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    paths_j = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat_j}
    paths_r = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat_r}
    assert set(paths_j) == set(paths_r)
    for key in sorted(paths_j):
        a, b = paths_j[key], paths_r[key]
        # measured worst per-leaf |Δ| is 7.8e-6 (fp32 backprop through the
        # 313-step GRU + 7 conv blocks); floor 5e-5 leaves 6x margin while
        # any real wiring error lands orders above it
        tol = max(5e-5, 5e-3 * float(np.max(np.abs(b)) or 0.0))
        err = float(np.max(np.abs(a - b)))
        assert err <= tol, f"{key}: grad err {err} > tol {tol}"


def test_export_loads_into_reference_classes(ref_models, tmp_path):
    """Checkpoint EXPORT interop: a model initialized HERE, exported via
    export_torch_checkpoint, must load into the REAL reference classes
    with strict state-dict matching and reproduce our posteriors ≤1e-3 —
    the inverse direction of the load gate above."""
    import jax
    from bsed_tpu.eval.test_model import export_torch_checkpoint
    from bsed_tpu.train.steps import (build_modules, create_train_state,
                                      make_predict_fn)

    grl_mod, _ = ref_models
    cfg = get_config("baseline")
    modules = build_modules(cfg)
    state = create_train_state(cfg, modules, jax.random.key(5))
    path = str(tmp_path / "exported_best")
    export_torch_checkpoint(cfg, state.params, state.batch_stats, path,
                            epoch=7)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 7
    assert ckpt["pooling_time_ratio"] == 4
    assert ckpt["median_window"] == 14
    assert ckpt["many_hot_encoder"]["labels"] == list(cfg.bird_list)
    crnn = grl_mod.CRNN(**ckpt["model"]["kwargs"]).eval()
    predictor = grl_mod.Predictor(**ckpt["model_p"]["kwargs"]).eval()
    # strict load: every key must exist with the right shape
    crnn.load_state_dict(ckpt["model"]["state_dict"], strict=True)
    predictor.load_state_dict(ckpt["model_p"]["state_dict"], strict=True)

    rng = np.random.default_rng(6)
    logmel = rng.standard_normal(
        (2, cfg.audio.max_frames, cfg.audio.n_mels)).astype(np.float32)
    predict = make_predict_fn(modules)
    strong, weak = predict(state.params, state.batch_stats,
                           jnp.asarray(logmel), apply_log=False)
    with torch.no_grad():
        enc, _ = crnn(torch.from_numpy(logmel).unsqueeze(1))
        ref_strong, ref_weak = predictor(enc)
    assert np.max(np.abs(np.asarray(strong) - ref_strong.numpy())) <= 1e-3
    assert np.max(np.abs(np.asarray(weak) - ref_weak.numpy())) <= 1e-3


@pytest.mark.parametrize("topo", [
    # activation coverage + non-canonical filters / pooling / RNN geometry:
    # the canonical-kwargs tests above pin the flagship; these pin the
    # GENERALITY of the conversion + flax topology against the real classes
    dict(activation="relu",
         nb_filters=(8, 16, 32, 64, 64, 64, 64),
         pooling=((2, 4), (2, 4), (1, 2), (1, 2), (1, 1), (1, 2), (1, 1)),
         n_rnn_cell=64, n_layers_rnn=1),
    dict(activation="cg",
         nb_filters=(16, 32, 64, 96, 96, 96, 96),
         pooling=((4, 2), (1, 2), (1, 2), (1, 2), (1, 2), (1, 2), (1, 2)),
         n_rnn_cell=128, n_layers_rnn=2),
    dict(activation="leakyrelu",
         nb_filters=(24, 48, 96, 128, 128, 128, 128),
         pooling=((2, 2), (2, 2), (1, 2), (1, 2), (1, 2), (1, 2), (1, 2)),
         n_rnn_cell=96, n_layers_rnn=3),
], ids=["relu-shallowGRU", "cg-ptr4", "leakyrelu-3layerGRU"])
def test_nondefault_topology_reference_parity(ref_models, tmp_path, topo):
    """Topology fuzz vs the REAL reference classes: activation variants
    (relu / ContextGating / leakyrelu — CNN.py:33-84 supports all four),
    non-canonical filter counts, redistributed time/freq pooling (incl.
    ptr=16 and ptr=4 with a front-loaded time pool), and 1–3 GRU layers.
    Pins that torch_compat's conversion and the flax modules are generic
    over the reference's whole constructor surface, not just the flagship
    kwargs."""
    import dataclasses

    grl_mod, _ = ref_models
    n = len(topo["nb_filters"])
    kwargs = {
        "n_in_channel": 1, "nclass": 20, "attention": True,
        "n_RNN_cell": topo["n_rnn_cell"],
        "n_layers_RNN": topo["n_layers_rnn"],
        "activation": topo["activation"], "dropout": 0.5,
        "kernel_size": n * [3], "padding": n * [1], "stride": n * [1],
        "nb_filters": list(topo["nb_filters"]),
        "pooling": [list(p) for p in topo["pooling"]],
    }
    torch.manual_seed(hash(topo["activation"]) % 2**31)
    crnn = grl_mod.CRNN(**kwargs).eval()
    predictor = grl_mod.Predictor(
        nclass=20, attention=True, n_RNN_cell=topo["n_rnn_cell"]).eval()
    ckpt = str(tmp_path / "baseline_best")
    _save_ckpt(ckpt, crnn, predictor)

    cfg = get_config("baseline")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, **topo))
    _assert_parity(cfg, ckpt, crnn, predictor, batch=1)


def test_predictor2_head_load_and_export_roundtrip(ref_models, tmp_path):
    """The mlp head (Predictor_2, CRNN_GRL.py:391-428) must round-trip
    through both directions of the checkpoint contract: a REAL reference
    Predictor_2 state_dict loads via convert_predictor and reproduces the
    torch posteriors; export_predictor writes a state_dict that strict-
    loads back into the reference class."""
    import dataclasses

    import jax.numpy as jnp
    from bsed_tpu.config import get_config
    from bsed_tpu.train.steps import build_modules, make_predict_fn
    from bsed_tpu.utils.torch_compat import (convert_predictor,
                                             export_predictor)

    grl_mod, _ = ref_models
    torch.manual_seed(21)
    crnn = grl_mod.CRNN(**CRNN_KWARGS).eval()
    ref_pred = grl_mod.Predictor_2(nclass=20, attention=True,
                                   n_RNN_cell=128).eval()
    ckpt = str(tmp_path / "baseline_best")
    _save_ckpt(ckpt, crnn, ref_pred)

    cfg = get_config("scmt_ada_weak_separate_2crnn")
    assert cfg.model.predictor_head == "mlp"
    cfg = get_config("baseline").replace(
        model=dataclasses.replace(get_config("baseline").model,
                                  predictor_head="mlp"))
    _assert_parity(cfg, ckpt, crnn, ref_pred, batch=1)

    # export direction: flax params -> reference state_dict, strict load
    p_params = convert_predictor(
        {k: v.numpy() for k, v in ref_pred.state_dict().items()})
    sd = export_predictor(p_params)
    ref2 = grl_mod.Predictor_2(nclass=20, attention=True, n_RNN_cell=128)
    ref2.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}, strict=True)
    x = torch.randn(1, 313, 256)
    with torch.no_grad():
        s1, w1 = ref_pred(x)
        s2, w2 = ref2.eval()(x)
    assert torch.allclose(s1, s2) and torch.allclose(w1, w2)
