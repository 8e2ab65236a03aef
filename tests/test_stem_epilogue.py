"""Exactness of the fused Pallas stem epilogue (ops/stem_epilogue.py)
against an unfused pure-JAX composition of the same ops: BN affine →
GLU/CG → dropout → time pool → freq-pool matmul, forward AND all five
gradients (h, inv, c, w, b). Runs the kernel in interpret mode on the
CPU test backend; the math is backend-independent."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bsed_tpu.ops.pooling import fast_avg_pool
from bsed_tpu.ops.stem_epilogue import make_fused_epilogue

B, T, G, L, L2 = 2, 21, 16, 128, 64


def _ref_epilogue(h, inv, c, w, b, bits, act, pt, rate, pool_w):
    """The unfused op chain exactly as folded_stem.make_folded_train_stem
    composes it (modulo the bias/mean pre-fold into c)."""
    dt = h.dtype
    y = h * inv.astype(dt) + c.astype(dt)
    lin = y @ w.astype(dt) + b.astype(dt)
    z = lin * jax.nn.sigmoid(y) if act == "glu" \
        else y * jax.nn.sigmoid(lin)
    if rate > 0:
        k = int(round((1.0 - rate) * 256))
        keep = bits.reshape(h.shape) < jnp.uint8(k)
        z = jnp.where(keep, z / jnp.asarray(1.0 - rate, dt),
                      jnp.zeros((), dt))
    if pt > 1:
        z = fast_avg_pool(z, (pt, 1))
    return z @ pool_w.astype(dt)


def _inputs(seed, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    h = jax.random.normal(ks[0], (B, T, G, L), dtype)
    inv = jax.random.uniform(ks[1], (L,), jnp.float32, 0.5, 1.5)
    c = jax.random.normal(ks[2], (L,), jnp.float32) * 0.3
    w = (jax.random.normal(ks[3], (L, L), jnp.float32) / np.sqrt(L)
         ).astype(dtype)
    b = jax.random.normal(ks[4], (L,), jnp.float32) * 0.1
    pool_w = np.zeros((L, L2), np.float32)
    for r in range(L):
        pool_w[r, r % L2] = 0.5
    bits = jax.random.bits(ks[5], (B, T * G, L), jnp.uint8)
    return h, inv, c, w, b, pool_w, bits


@pytest.mark.parametrize("act", ["glu", "cg"])
@pytest.mark.parametrize("pt", [1, 2])
def test_fwd_matches_reference(act, pt):
    h, inv, c, w, b, pool_w, bits = _inputs(0)
    ep = make_fused_epilogue(act, pt, 0.0, pool_w, tile_target=8)
    got = ep(h, inv, c, w, b, None)
    want = _ref_epilogue(h, inv, c, w, b, None, act, pt, 0.0, pool_w)
    assert got.shape == (B, T // pt, G, L2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act", ["glu", "cg"])
@pytest.mark.parametrize("pt", [1, 2])
def test_grads_match_reference(act, pt):
    h, inv, c, w, b, pool_w, bits = _inputs(1)
    ep = make_fused_epilogue(act, pt, 0.0, pool_w, tile_target=8)
    cot = jax.random.normal(jax.random.PRNGKey(9),
                            (B, T // pt, G, L2), jnp.float32)

    def loss_fused(h, inv, c, w, b):
        return jnp.sum(ep(h, inv, c, w, b, None) * cot)

    def loss_ref(h, inv, c, w, b):
        return jnp.sum(_ref_epilogue(h, inv, c, w, b, None, act, pt,
                                     0.0, pool_w) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        h, inv, c, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(h, inv, c, w, b)
    for name, gf, gr in zip("h inv c w b".split(), g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name} (act={act}, pt={pt})")


def test_dropout_mask_and_scale_match():
    """Same uint8 bits -> identical mask decisions and 1/(1-rate) scaling
    as ops/dropout.py's fast path, forward and backward."""
    h, inv, c, w, b, pool_w, bits = _inputs(2)
    rate = 0.5
    ep = make_fused_epilogue("glu", 2, rate, pool_w, tile_target=8)
    got = ep(h, inv, c, w, b, bits)
    want = _ref_epilogue(h, inv, c, w, b, bits, "glu", 2, rate, pool_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    cot = jnp.ones((B, T // 2, G, L2), jnp.float32)
    gh_f = jax.grad(lambda x: jnp.sum(ep(x, inv, c, w, b, bits) * cot))(h)
    gh_r = jax.grad(lambda x: jnp.sum(_ref_epilogue(
        x, inv, c, w, b, bits, "glu", 2, rate, pool_w) * cot))(h)
    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_r),
                               rtol=2e-4, atol=2e-4)


def test_bf16_close_to_reference():
    h, inv, c, w, b, pool_w, _ = _inputs(3, jnp.bfloat16)
    ep = make_fused_epilogue("glu", 2, 0.0, pool_w, tile_target=8)
    got = ep(h, inv, c, w, b, None)
    want = _ref_epilogue(h, inv, c, w, b, None, "glu", 2, 0.0, pool_w)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.06, atol=0.06)


def test_odd_time_and_partial_tiles():
    """T=21 with pt=2 drops the remainder row; its dh must be exactly 0
    and the parameter gradients must ignore every padded row (this is the
    masking path: tile_target=8 makes the last tile half-padded)."""
    h, inv, c, w, b, pool_w, _ = _inputs(4)
    ep = make_fused_epilogue("glu", 2, 0.0, pool_w, tile_target=8)
    gh = jax.grad(lambda x: jnp.sum(ep(x, inv, c, w, b, None)))(h)
    assert np.asarray(gh[:, -1]).max() == 0.0          # dropped remainder
    assert np.isfinite(np.asarray(gh)).all()


def _ref_epilogue_pg(h, inv, c, w, b, bits, act, pt, pg, rate):
    """Unfolded-block reference: group-axis frequency pooling, no lane
    pool matrix (what ConvBlock does after the conv for blocks 3+)."""
    dt = h.dtype
    y = h * inv.astype(dt) + c.astype(dt)
    lin = y @ w.astype(dt) + b.astype(dt)
    z = lin * jax.nn.sigmoid(y) if act == "glu" \
        else y * jax.nn.sigmoid(lin)
    if rate > 0:
        k = int(round((1.0 - rate) * 256))
        keep = bits.reshape(h.shape) < jnp.uint8(k)
        z = jnp.where(keep, z / jnp.asarray(1.0 - rate, dt),
                      jnp.zeros((), dt))
    return fast_avg_pool(z, (pt, pg))


@pytest.mark.parametrize("pt,pg", [(1, 2), (2, 2), (1, 1)])
def test_group_pool_matches_reference(pt, pg):
    """The unfolded-block form: pg pools the group (spatial frequency)
    axis, no lane-pool matrix — forward and gradients."""
    h, inv, c, w, b, _, bits = _inputs(5)
    ep = make_fused_epilogue("glu", pt, 0.0, None, pg=pg, tile_target=8)
    got = ep(h, inv, c, w, b, None)
    want = _ref_epilogue_pg(h, inv, c, w, b, None, "glu", pt, pg, 0.0)
    assert got.shape == (B, T // pt, G // pg, L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    cot = jax.random.normal(jax.random.PRNGKey(3), want.shape, jnp.float32)
    gf = jax.grad(lambda *a: jnp.sum(ep(*a, None) * cot),
                  argnums=(0, 1, 2, 3, 4))(h, inv, c, w, b)
    gr = jax.grad(lambda *a: jnp.sum(_ref_epilogue_pg(
        *a, None, "glu", pt, pg, 0.0) * cot),
        argnums=(0, 1, 2, 3, 4))(h, inv, c, w, b)
    for name, a1, a2 in zip("h inv c w b".split(), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a2), rtol=2e-4, atol=2e-4,
            err_msg=f"grad {name} (pt={pt}, pg={pg})")


def test_group_pool_dropout_matches_reference():
    h, inv, c, w, b, _, bits = _inputs(6)
    ep = make_fused_epilogue("glu", 1, 0.5, None, pg=2, tile_target=8)
    got = ep(h, inv, c, w, b, bits)
    want = _ref_epilogue_pg(h, inv, c, w, b, bits, "glu", 1, 2, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
