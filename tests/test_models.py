"""Numerics-parity tests: flax models vs torch oracle with identical weights.

This is the posterior-parity gate from BASELINE.md (<=1e-3) exercised at
unit level: random torch weights are converted through
bsed_tpu.utils.torch_compat and both stacks must agree in eval mode.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast core
import torch

import jax
import jax.numpy as jnp

from bsed_tpu.config import ModelConfig
from bsed_tpu.models.crnn import CRNN, CRNNFPN
from bsed_tpu.models.predictor import Predictor
from bsed_tpu.models.rnn import BidirectionalGRU
from bsed_tpu.utils import torch_compat as tc

from tests.torch_ref import (TorchCRNN, TorchCRNNFPN, TorchPredictor,
                             TorchBiGRUWrap, state_dict_numpy)

SMALL = ModelConfig()  # full filters; tests use short time axis instead
T_IN, F_IN = 80, 128   # 80 frames → 20 post-CNN frames


def _to_torch_input(x_nhwc):
    # (B, T, F, 1) → (B, 1, T, F)
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def test_bigru_matches_torch():
    torch.manual_seed(0)
    tmodel = TorchBiGRUWrap(64, 32, num_layers=2).eval()
    x = np.random.default_rng(0).standard_normal((3, 17, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    params = tc.convert_gru(state_dict_numpy(tmodel), "rnn.", 2)
    model = BidirectionalGRU(n_hidden=32, num_layers=2)
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_crnn_matches_torch_eval():
    torch.manual_seed(1)
    tmodel = TorchCRNN().eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, T_IN, F_IN, 1)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tmodel(_to_torch_input(x))

    params, stats = tc.convert_crnn(state_dict_numpy(tmodel))
    model = CRNN(SMALL)
    out, d_input = model.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False)
    assert out.shape == (2, T_IN // 4, 256)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_input), ref.numpy(), atol=1e-4)


def test_crnn_fpn_matches_torch_eval():
    t_post = T_IN // 4  # 20
    torch.manual_seed(2)
    tmodel = TorchCRNNFPN(t_frames=t_post).eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, T_IN, F_IN, 1)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tmodel(_to_torch_input(x))

    params, stats = tc.convert_crnn(state_dict_numpy(tmodel), fpn=True)
    model = CRNNFPN(ModelConfig(use_fpn=True), n_frames=t_post)
    out, _ = model.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(x), train=False)
    assert out.shape == (2, t_post, 256)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_predictor_matches_torch_and_gates():
    torch.manual_seed(3)
    tmodel = TorchPredictor().eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 20, 256)).astype(np.float32)
    with torch.no_grad():
        ref_s, ref_w = tmodel(torch.from_numpy(x))
        ref_s_inf, _ = tmodel(torch.from_numpy(x), inference=True)

    params = tc.convert_predictor(state_dict_numpy(tmodel))
    model = Predictor(nclass=20)
    strong, weak = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(strong), ref_s.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(weak), ref_w.numpy(), atol=1e-5)

    strong_inf, _ = model.apply({"params": params}, jnp.asarray(x),
                                inference=True)
    np.testing.assert_allclose(np.asarray(strong_inf), ref_s_inf.numpy(),
                               atol=1e-5)
    # gating zeroes whole class columns where weak <= 0.5
    gated_off = np.asarray(weak) <= 0.5
    assert (np.asarray(strong_inf)[:, :, :][np.broadcast_to(
        gated_off[:, None, :], strong_inf.shape)] == 0).all()


def test_train_mode_runs_and_updates_batch_stats():
    model = CRNN(SMALL)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, T_IN, F_IN, 1)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, x, train=True)
    out, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"])
    assert out[0].shape == (2, T_IN // 4, 256)
    old = variables["batch_stats"]["cnn"]["block0"]["bn"]["mean"]
    new = mutated["batch_stats"]["cnn"]["block0"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_bf16_compute_dtype_close_to_fp32():
    """compute_dtype='bfloat16' keeps params fp32 and produces encoder
    outputs close to the fp32 path (throughput mode, not the parity path)."""
    model32 = CRNN(SMALL)
    model16 = CRNN(ModelConfig(compute_dtype="bfloat16"))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, T_IN, F_IN, 1)).astype(np.float32))
    variables = model32.init({"params": jax.random.key(0),
                              "dropout": jax.random.key(1)}, x, train=False)
    out32, _ = model32.apply(variables, x, train=False)
    out16, _ = model16.apply(variables, x, train=False)  # same fp32 params
    assert out16.dtype == jnp.float32  # cast back after the conv stack
    err = np.abs(np.asarray(out32) - np.asarray(out16))
    assert err.max() < 0.1 and err.mean() < 0.01


def test_torch_batchnorm_running_stats_match_torch():
    """TorchBatchNorm (models/layers.py) vs torch.nn.BatchNorm2d, TRAIN
    mode: outputs AND running statistics must match across two steps.
    torch accumulates the UNBIASED batch variance (× n/(n−1)) into
    running_var while normalizing with the biased one — the very semantics
    flax's nn.BatchNorm gets wrong (it accumulates the biased variance),
    which is why the framework carries its own BN module."""
    from bsed_tpu.models.layers import TorchBatchNorm

    b, h, w, c = 3, 5, 2, 4            # n = 30 → visible n/(n−1) factor
    rng = np.random.default_rng(0)
    xs = [rng.standard_normal((b, h, w, c)).astype(np.float32)
          for _ in range(2)]
    scale = np.asarray([1.2, 0.8, 1.0, 0.5], np.float32)
    bias = np.asarray([0.1, -0.2, 0.0, 0.3], np.float32)

    tbn = torch.nn.BatchNorm2d(c, eps=1e-3, momentum=0.99)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))
    tbn.train()
    touts = [tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().numpy()
             for x in xs]

    mod = TorchBatchNorm(use_running_average=False, momentum=0.01,
                         epsilon=1e-3)
    variables = mod.init(jax.random.key(0), jnp.asarray(xs[0]))
    params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    stats = variables["batch_stats"]
    for i, x in enumerate(xs):
        out, mut = mod.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x), mutable=["batch_stats"])
        stats = mut["batch_stats"]
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), touts[i], atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), atol=1e-6)
