"""Domain-adaptation losses: DANN, CDAN (clip), frame-CDAN, ADDA.

References:
  * DANN:        /root/reference/src/DA/dan.py:89-107 — h = GRL(f), BCE vs
                 source-1 / target-0, no conditioning.
  * CDAN (clip): /root/reference/src/DA/cdan.py:89-103 — NIPS'18 CDAN with
                 multilinear (or randomized) feature×prediction map,
                 optional entropy weighting w = 1 + e^(−H(g)).
  * frame-CDAN:  /root/reference/src/DA/cdan_frame.py:89-119 — the variant
                 main_baseline.py uses: conditioning is disabled (h = GRL(f)
                 only, :95), the discriminator consumes the full (B, T, 256)
                 encoding and emits one clip-level logit, plain BCE.
  * ADDA-style:  /root/reference/src/main_scmt.py:312-369 — explicit
                 alternating updates: discriminator BCE on detached balanced
                 features, then feature-extractor confusion vs all-source
                 labels on a random half batch.

The random matrices R_f/R_g of the randomized multilinear map are sampled
once from a fixed seed and sized to the *actual* flattened feature dims —
not the reference's 2.8 GB import-time torch constants (config.py:89-91).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bsed_tpu.ops.grl import grad_reverse
from bsed_tpu.train.losses import bce, entropy


def multilinear_map(f: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """T(f, g) = flatten(g ⊗ f): (B, F), (B, C) → (B, C·F)."""
    return jnp.einsum("bc,bf->bcf", g, f).reshape(f.shape[0], -1)


def make_randomized_maps(features_dim: int, num_classes: int,
                         output_dim: int, seed: int = 0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    kf, kg = jax.random.split(jax.random.key(seed))
    rf = jax.random.normal(kf, (features_dim, output_dim), jnp.float32)
    rg = jax.random.normal(kg, (num_classes, output_dim), jnp.float32)
    return rf, rg


def randomized_multilinear_map(f: jnp.ndarray, g: jnp.ndarray,
                               rf: jnp.ndarray, rg: jnp.ndarray) -> jnp.ndarray:
    """(R_f f) ⊙ (R_g g) / sqrt(d)   (cdan.py:129-133)."""
    return (f @ rf) * (g @ rg) / np.sqrt(float(rf.shape[1]))


def dann_loss(disc_apply: Callable, f_s: jnp.ndarray, f_t: jnp.ndarray,
              grl_coeff=1.0) -> jnp.ndarray:
    """Plain DANN over flattened features; source label 1, target 0."""
    f = jnp.concatenate([f_s, f_t], axis=0)
    d = disc_apply(grad_reverse(f, grl_coeff))
    labels = jnp.concatenate([
        jnp.ones((f_s.shape[0],) + d.shape[1:], d.dtype),
        jnp.zeros((f_t.shape[0],) + d.shape[1:], d.dtype)], axis=0)
    return bce(d, labels)


def cdan_loss(disc_apply: Callable, g_s, f_s, g_t, f_t,
              rf: Optional[jnp.ndarray] = None,
              rg: Optional[jnp.ndarray] = None,
              entropy_conditioning: bool = False,
              grl_coeff=1.0) -> jnp.ndarray:
    """CDAN with multilinear conditioning (cdan.py:89-103). g_* are raw
    predictions (softmaxed & detached here, matching :92)."""
    f = jnp.concatenate([f_s, f_t], axis=0)
    g = jnp.concatenate([g_s, g_t], axis=0)
    g = jax.lax.stop_gradient(jax.nn.softmax(g, axis=1))
    if rf is not None:
        h = randomized_multilinear_map(f, g, rf, rg)
    else:
        h = multilinear_map(f, g)
    d = disc_apply(grad_reverse(h, grl_coeff))
    labels = jnp.concatenate([
        jnp.ones((g_s.shape[0], 1), d.dtype),
        jnp.zeros((g_t.shape[0], 1), d.dtype)], axis=0)
    if entropy_conditioning:
        w = 1.0 + jnp.exp(-entropy(g))
        w = w / jnp.sum(w) * f.shape[0]
        return bce(d, labels, weight=w.reshape(d.shape))
    return bce(d, labels)


def cdan_frame_loss(disc_apply: Callable, g_s, f_s, g_t, f_t,
                    grl_coeff=1.0) -> jnp.ndarray:
    """Frame-CDAN as actually wired (cdan_frame.py:89-119): the multilinear
    conditioning is computed-then-discarded in the reference; the
    discriminator sees only the gradient-reversed (B, T, 256) features.

    Note: the reference pairs this loss with a per-frame discriminator whose
    (2B, 313) output cannot broadcast against its (2B,) clip labels — that
    code path is bit-rotted upstream. Here domain labels broadcast over the
    frame axis, which is the evident intent (frame-level domain labels,
    cdan_frame.py:104-108)."""
    f = jnp.concatenate([f_s, f_t], axis=0)
    d = jnp.squeeze(disc_apply(grad_reverse(f, grl_coeff)), axis=-1)
    labels = jnp.concatenate([
        jnp.ones((g_s.shape[0],), d.dtype),
        jnp.zeros((g_t.shape[0],), d.dtype)], axis=0)
    labels = labels.reshape((-1,) + (1,) * (d.ndim - 1))
    return bce(d, jnp.broadcast_to(labels, d.shape))


def adda_discriminator_loss(disc_apply: Callable, rng: jax.Array,
                            f_real: jnp.ndarray, f_syn: jnp.ndarray,
                            adv_weight: float = 2.5) -> jnp.ndarray:
    """Discriminator update (main_scmt.py:314-336): detached features, a
    shared random half-batch from each domain; real → target (unit 1),
    syn → source (unit 0); two-unit sigmoid discriminator."""
    b = f_real.shape[0]
    choice = jax.random.permutation(rng, b)[: b // 2]
    d_real = disc_apply(jax.lax.stop_gradient(f_real))[choice]
    d_syn = disc_apply(jax.lax.stop_gradient(f_syn))[choice]
    d = jnp.concatenate([d_real, d_syn], axis=0)
    lbl_real = jnp.zeros_like(d_real).at[..., 1].set(1.0)
    lbl_syn = jnp.zeros_like(d_syn).at[..., 0].set(1.0)
    labels = jnp.concatenate([lbl_real, lbl_syn], axis=0)
    return adv_weight * bce(d, labels)


def adda_confusion_loss(disc_apply: Callable, rng: jax.Array,
                        f_real: jnp.ndarray,
                        adv_weight: float = 2.5) -> jnp.ndarray:
    """Feature-extractor confusion step (main_scmt.py:343-369): push real
    features toward the SOURCE label on a random half batch."""
    b = f_real.shape[0]
    choice = jax.random.permutation(rng, b)[: b // 2]
    d = disc_apply(f_real)[choice]
    labels = jnp.zeros_like(d).at[..., 0].set(1.0)
    return adv_weight * bce(d, labels)
