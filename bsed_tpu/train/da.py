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


def adda_discriminator_loss(d_real: jnp.ndarray, d_syn: jnp.ndarray,
                            choice: jnp.ndarray, adv_weight: float = 2.5,
                            disc_labels: str = "split") -> jnp.ndarray:
    """Discriminator update on precomputed (detached-feature) discriminator
    outputs: ``cat(d_real[choice], d_syn[choice])`` vs the lineage's domain
    labels, × adv_weight (the caller runs the model/discriminator forwards
    so their BatchNorm batch-stat order matches the reference exactly).

    ``disc_labels``:
      * "split" — real → target (unit 1), syn → source (unit 0): the frame-
        level label block every script carries (main.py:234-237,
        main_scmt.py:271-274 frame branch) and the one RUNNABLE in
        main.py/main_origin.py (Frame_Discriminator(input_dim=256),
        main.py:640).
      * "all_target" — every row labeled [0, 1]: main_scmt.py's clip branch
        builds ``zeros((12, 2)); [:18, 1] = 1`` (:276-278) which target-
        labels ALL 12 rows — the degenerate labels its runnable clip-level
        adaptation actually trains with (frame level crashes at HEAD:
        input_dim 256·20 vs 256-dim frame features, main_scmt.py:740).
    """
    d = jnp.concatenate([d_real[choice], d_syn[choice]], axis=0)
    if disc_labels == "all_target":
        labels = jnp.zeros_like(d).at[..., 1].set(1.0)
    else:
        lbl_real = jnp.zeros_like(d_real[choice]).at[..., 1].set(1.0)
        lbl_syn = jnp.zeros_like(d_syn[choice]).at[..., 0].set(1.0)
        labels = jnp.concatenate([lbl_real, lbl_syn], axis=0)
    return adv_weight * bce(d, labels)


def adda_confusion_loss(d_conf: jnp.ndarray, choice: Optional[jnp.ndarray],
                        adv_weight: float = 2.5,
                        flipped: bool = False) -> jnp.ndarray:
    """Feature-extractor confusion step on a precomputed NON-detached
    discriminator output. The three lineages differ:

      * main_scmt.py:343-371 — real-stream output subset to a fresh random
        half batch (``choice``), labels all-[..., 0] ("source").
      * main.py:291-332 — FULL real-stream output (the half-batch choice is
        drawn but dead, :322-325), labels all-[..., 0]; the runnable
        Frame_Discriminator applies grad_reverse at its input
        (models/CRNN.py:80-89,104), so the encoder gradient is NEGATED —
        the caller owns that via the discriminator flavor.
      * main_scmt_ada_origin.py:448-466 — SYN-stream output vs flipped
        all-[..., 1] labels (``flipped=True``); dead at HEAD (its (B,313,2)
        labels cannot BCE against the 1-unit CRNN_GRL discriminator,
        :312-322 vs CRNN_GRL.py:116-140) — kept as the written intent.
    """
    d = d_conf if choice is None else d_conf[choice]
    unit = 1 if flipped else 0
    labels = jnp.zeros_like(d).at[..., unit].set(1.0)
    return adv_weight * bce(d, labels)
