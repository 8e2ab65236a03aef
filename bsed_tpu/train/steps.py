"""The single, config-driven, jitted train step.

Replaces the reference's 12 near-duplicate ~1,100-line training scripts
(src/main_*.py — skeleton at /root/reference/src/main_baseline.py:168-598)
with one XLA program assembled from static feature flags:

  * supervised BCE on SYN (or ENA) strong+weak targets
  * mean-teacher: EMA twins, on-device SNR noise for the teacher input,
    MSE consistency × sigmoid ramp cost
  * ISP/SCT: vmapped per-sample time/freq rolls (replacing the reference's
    per-sample host loop, main_baseline.py:229-277) + shift-consistency
  * ICT mixup (main.py lineage)
  * domain adaptation: GRL pre-step (DANN/CDAN/frame-CDAN) or ADDA-style
    alternating discriminator/confusion updates (main_scmt.py:312-369)

TPU-first details: the whole step is ONE jit program (all 9+ forwards fuse
into a single XLA executable, no per-op dispatch); ApplyLog and the noise
augmentation run on device in the step; BatchNorm batch-stat threading
follows the reference's forward order exactly so training dynamics match
(SURVEY.md §7 hard part 3/4). Under a data mesh the batch arrives sharded;
jnp reductions insert the cross-chip collectives automatically.
"""
from __future__ import annotations

import dataclasses
import functools
import itertools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as flax_nn
import jax
import jax.numpy as jnp
import optax

from bsed_tpu.config import Config
from bsed_tpu.models.crnn import EncodedCRNNPred, make_encoder
from bsed_tpu.models.discriminators import (ClipDiscriminator,
                                            ClipDiscriminatorSoftmax,
                                            FrameDiscriminator,
                                            FrameDiscriminatorGRL)
from bsed_tpu.ops.augment import (gaussian_snr_noise, mixup, roll_batch,
                                  sample_isp_shifts)
from bsed_tpu.ops.dropout import FastDropout
from bsed_tpu.ops.grl import warm_start_lambda
from bsed_tpu.ops.mel import amplitude_to_db
from bsed_tpu.models.predictor import Predictor, Predictor2
from bsed_tpu.train import da as da_losses
from bsed_tpu.train.ema import ema_update
from bsed_tpu.train.losses import bce, mse
from bsed_tpu.train.ramps import exp_rampup, sigmoid_rampdown
from bsed_tpu.train.schedule import learning_rate
from bsed_tpu.train.state import TrainState

sg = jax.lax.stop_gradient


@dataclasses.dataclass
class TrainModules:
    cfg: Config
    encoder: Any
    predictor: Any
    discriminator: Optional[Any]
    optimizer: optax.GradientTransformation
    enc_optimizer: Optional[optax.GradientTransformation]
    disc_optimizer: Optional[optax.GradientTransformation]
    rand_maps: Optional[Tuple[jnp.ndarray, jnp.ndarray]]
    # dataset-level (mean, std) per mel bin for TrainConfig.normalize (the
    # main.py lineage's live scaler, utils/scaler.py) — None = no
    # normalization; applied right after the log, BEFORE ISP rolls, like
    # the reference's transform order (Normalize is the last transform,
    # shifts are applied to the already-transformed batch, main.py:203-218)
    norm_stats: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None


def _base_optimizer(cfg: Config, family: Optional[str] = None):
    """``family`` overrides cfg.train.optimizer for the AUX optimizers —
    two scripts mix families at HEAD (DAConfig.aux_optimizer docstring)."""
    t = cfg.train
    if (family or t.optimizer) == "adam":
        def make(learning_rate):
            return optax.adam(learning_rate, b1=0.9, b2=0.999)
    else:  # SGD(momentum .9, nesterov, wd 1e-4) — main_scmt_ada_weak.py:854-862
        def make(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(t.sgd_weight_decay),
                optax.sgd(learning_rate, momentum=t.sgd_momentum,
                          nesterov=True))
    return optax.inject_hyperparams(make)(
        learning_rate=t.max_learning_rate)


def _effective_da_mode(cfg: Config) -> str:
    """DA is active only in the adaptation stage (the reference builds no
    discriminator in pretrain — main_baseline.py:789-799,
    main_scmt.py:864)."""
    return cfg.da.mode if cfg.train.stage == "adaptation" else "none"


def sample_adda_choice(rng: jax.Array, batch_size: int) -> jnp.ndarray:
    """The reference's ``np.random.choice(batch_size, batch_size//2,
    replace=False)`` half-batch subset (main_scmt.py:325, main.py:276) as a
    device-side draw. Module-level so training-dynamics parity tests can
    replay the reference's exact host draws."""
    return jax.random.permutation(rng, batch_size)[: batch_size // 2]


def _make_discriminator(cfg: Config):
    mode, level = _effective_da_mode(cfg), cfg.da.level
    if mode == "none":
        return None
    if mode == "adda":
        if level == "clip":
            # main_scmt.py's runnable adaptation: Clip_Discriminator with
            # the 2-way softmax head (models/CRNN.py:16-51)
            return ClipDiscriminatorSoftmax()
        if cfg.da.adda_confusion == "syn_flipped":
            # scmt_ada_origin's CRNN_GRL import carries no internal GRL
            # (CRNN_GRL.py:116-140); 2 units to match its (…, 2) labels
            return FrameDiscriminatorGRL(dropout=cfg.da.disc_dropout,
                                         n_out=2, apply_grl=False)
        # main.py lineage's runnable frame-level Frame_Discriminator
        # (CRNN.py:91-112): 256→1024→1024→2 sigmoid with grad_reverse at
        # the input — live in the confusion step, where it NEGATES the
        # gradient into the encoder (the disc step detaches features, so
        # the reversal is inert there)
        return FrameDiscriminatorGRL(dropout=cfg.da.disc_dropout,
                                     n_out=2, apply_grl=True)
    if mode == "cdan_frame":
        return FrameDiscriminator(dropout=cfg.da.disc_dropout)  # per-frame 1-unit
    if mode == "cdan":
        if level == "clip":
            return ClipDiscriminator()
        # 1-unit MLP over the (randomized) multilinear map; the loss
        # applies grad_reverse itself
        return FrameDiscriminatorGRL(dropout=cfg.da.disc_dropout,
                                     n_out=1, apply_grl=False)
    if mode == "dann":
        return FrameDiscriminatorGRL(dropout=cfg.da.disc_dropout,
                                     n_out=1, apply_grl=False)
    raise ValueError(mode)


def make_predictor_head(cfg: Config):
    """Prediction head per cfg.model.predictor_head: the default attention
    Predictor, the Predictor_2 MLP (dual-CRNN script, CRNN_GRL.py:391-428),
    or CRNN_pred as a conv head (CRNN_GRL.py:206-290)."""
    m = cfg.model
    if m.predictor_head == "mlp":
        return Predictor2(nclass=cfg.nclass, attention=m.attention,
                          dropout=m.dropout)
    if m.predictor_head == "crnn":
        head_cfg = dataclasses.replace(
            m, nb_filters=(16, 32, 64, 32, cfg.nclass),
            pooling=((1, 4), (1, 4), (1, 4), (1, 2), (1, 2)),
            predictor_head="linear")
        return EncodedCRNNPred(head_cfg)
    return Predictor(nclass=cfg.nclass, attention=m.attention)


def build_modules(cfg: Config, norm_stats=None) -> TrainModules:
    encoder = make_encoder(cfg.model, cfg.n_frames)
    predictor = make_predictor_head(cfg)
    disc = _make_discriminator(cfg)
    rand_maps = None
    if _effective_da_mode(cfg) == "cdan" and cfg.da.level != "clip":
        if cfg.da.randomized_dim <= 0:
            # the un-randomized multilinear map at frame level would be
            # (2·n_rnn_cell·n_frames)·nclass ≈ 3.2 M dims — the reference
            # always randomizes here (randomized_dim=3130/8192,
            # main_baseline.py:794-796, main_scmt_ada_weak.py:787-792)
            raise ValueError(
                "frame-level CDAN requires da.randomized_dim > 0 (the "
                "full multilinear map over flattened frame features is "
                "infeasibly large; the reference always randomizes)")
        feat_dim = 2 * cfg.model.n_rnn_cell * cfg.n_frames
        rand_maps = da_losses.make_randomized_maps(
            feat_dim, cfg.nclass, cfg.da.randomized_dim, seed=cfg.train.seed)
    aux_family = cfg.da.aux_optimizer or None
    return TrainModules(
        cfg=cfg,
        encoder=encoder,
        predictor=predictor,
        discriminator=disc,
        optimizer=_base_optimizer(cfg),
        enc_optimizer=(_base_optimizer(cfg, aux_family)
                       if disc is not None else None),
        disc_optimizer=(_base_optimizer(cfg, aux_family)
                        if disc is not None else None),
        rand_maps=rand_maps,
        norm_stats=(tuple(jnp.asarray(a, jnp.float32)[:, None]
                          for a in norm_stats)
                    if norm_stats is not None else None),
    )


def _init_model(module, rng, x, **kw):
    p_rng, d_rng = jax.random.split(rng)
    variables = module.init({"params": p_rng, "dropout": d_rng}, x,
                            train=True, **kw)
    return variables.get("params", {}), variables.get("batch_stats", {})


def create_train_state(cfg: Config, modules: TrainModules,
                       rng: jax.Array) -> TrainState:
    dummy = jnp.zeros((2, cfg.audio.max_frames, cfg.audio.n_mels, 1),
                      jnp.float32)
    k_enc, k_pred, k_ema_e, k_ema_p, k_disc = jax.random.split(rng, 5)
    enc_params, enc_stats = _init_model(modules.encoder, k_enc, dummy)
    dummy_enc = jnp.zeros((2, cfg.n_frames, 2 * cfg.model.n_rnn_cell))
    pred_params, pred_stats = _init_model(modules.predictor, k_pred,
                                          dummy_enc)
    params = {"encoder": enc_params, "predictor": pred_params}
    batch_stats = {"encoder": enc_stats}
    if pred_stats:                       # CRNN_pred head carries BatchNorm
        batch_stats["predictor"] = pred_stats
    opt_state = modules.optimizer.init(params)

    ema_params = ema_stats = None
    if cfg.train.mean_teacher:
        # the reference gives the teacher its OWN random init
        # (main_baseline.py:817-818) — the EMA converges onto the student
        e_params, e_stats = _init_model(modules.encoder, k_ema_e, dummy)
        p_params, p_stats = _init_model(modules.predictor, k_ema_p, dummy_enc)
        ema_params = {"encoder": e_params, "predictor": p_params}
        ema_stats = {"encoder": e_stats}
        if p_stats:
            ema_stats["predictor"] = p_stats

    disc_params = disc_stats = disc_opt = enc_opt = None
    if modules.discriminator is not None:
        if cfg.da.mode in ("cdan",) and cfg.da.level == "clip":
            dummy_d = jnp.zeros((2, cfg.n_frames, 2 * cfg.model.n_rnn_cell))
        elif cfg.da.mode == "cdan" and modules.rand_maps is not None:
            dummy_d = jnp.zeros((2, cfg.da.randomized_dim))
        elif cfg.da.mode == "dann":
            dummy_d = jnp.zeros((2, cfg.n_frames * 2 * cfg.model.n_rnn_cell))
        else:
            dummy_d = jnp.zeros((2, cfg.n_frames, 2 * cfg.model.n_rnn_cell))
        disc_params, disc_stats = _init_model(modules.discriminator, k_disc,
                                              dummy_d)
        disc_opt = modules.disc_optimizer.init(disc_params)
        enc_opt = modules.enc_optimizer.init(enc_params)

    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      ema_params=ema_params, ema_batch_stats=ema_stats,
                      disc_params=disc_params, disc_batch_stats=disc_stats,
                      disc_opt_state=disc_opt, enc_opt_state=enc_opt)


def _log_input(linear_mel: jnp.ndarray) -> jnp.ndarray:
    """linear mel (B, T, F) → log-mel with channel axis (B, T, F, 1)."""
    return amplitude_to_db(linear_mel)[..., None]


class _FoldedRestCRNN(flax_nn.Module):
    """Blocks ``start``..N-1 + squeeze + BiGRU + post-RNN dropout — the
    flax-managed tail of the folded-train-stem encoder (the leading blocks
    run through ops/folded_stem.make_folded_train_stem). Parameter names
    match the standard CRNN tree so the SAME params/stats are consumed."""
    cfg_model: Any
    start: int

    @flax_nn.compact
    def __call__(self, h, train: bool = False):
        from bsed_tpu.models.layers import ConvBlock
        from bsed_tpu.models.rnn import BidirectionalGRU

        m = self.cfg_model
        dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else None
        for i in range(self.start, len(m.nb_filters)):
            h = ConvBlock(m.nb_filters[i], tuple(m.pooling[i]),
                          m.activation, m.dropout, m.kernel_size,
                          dtype=dtype, name=f"block{i}")(h, train=train)
        h = h.astype(jnp.float32)
        h = jnp.squeeze(h, axis=2)
        h = BidirectionalGRU(m.n_rnn_cell, m.n_layers_rnn,
                             m.dropout_recurrent, unroll=m.rnn_unroll,
                             dtype=dtype, name="rnn")(h, train=train)
        h = FastDropout(m.dropout, deterministic=not train)(h)
        return h


def make_folded_encoder_fwd(cfg: Config, mesh=None):
    """Train-mode encoder forward with the folded-frequency stem
    (ModelConfig.folded_train_stem): leading blocks on the folded layout
    (differentiable, grouped BN batch stats), remaining blocks + GRU via
    flax with the standard parameter names. Signature:
    ``fwd(enc_params, enc_stats, x, key) -> (enc, new_enc_stats)``.

    ``mesh``: the data mesh the surrounding step is sharded over, if any —
    the fused Pallas stem epilogue must run under ``shard_map`` there
    (Mosaic kernels are opaque to the GSPMD partitioner), batch-sharded
    with replicated parameters, so it stays collective-free per block
    while the parameter-gradient psums are inserted by shard_map's
    transpose."""
    from bsed_tpu.ops.folded_stem import (folded_train_eligible,
                                          make_folded_train_stem)

    if not folded_train_eligible(cfg.model, cfg.audio.n_mels):
        raise ValueError(
            "folded_train_stem=True but the topology is not foldable "
            "(needs non-FPN, kernel 3, glu/cg/relu/leakyrelu activation, "
            "n_mels divisible by 8, freq pooling dividing the fold)")
    stem_apply, n_folded = make_folded_train_stem(cfg.model,
                                                  cfg.audio.n_mels,
                                                  mesh=mesh)
    rest = _FoldedRestCRNN(cfg.model, start=n_folded)

    def blk_idx(name: str) -> int:
        return int(name.replace("block", ""))

    def fwd(enc_params, enc_stats, x, key, train: bool = True):
        k_stem, k_rest = jax.random.split(key)
        h, stem_stats = stem_apply(enc_params["cnn"], enc_stats["cnn"], x,
                                   train, k_stem)
        rest_params = {k: v for k, v in enc_params["cnn"].items()
                       if k.startswith("block") and blk_idx(k) >= n_folded}
        rest_params["rnn"] = enc_params["rnn"]
        rest_stats = {k: v for k, v in enc_stats["cnn"].items()
                      if k.startswith("block") and blk_idx(k) >= n_folded}
        out, mut = rest.apply(
            {"params": rest_params, "batch_stats": rest_stats}, h,
            train=train, rngs={"dropout": k_rest},
            mutable=["batch_stats"])
        return out, {"cnn": {**stem_stats, **mut["batch_stats"]}}

    return fwd


def make_train_step(modules: TrainModules,
                    steps_per_epoch: Optional[int] = None,
                    grad_flow: bool = False,
                    jit: bool = True, mesh=None) -> Callable:
    """Build the jitted step. ``steps_per_epoch`` (= len(syn_loader)) is
    required when ``cfg.train.cost_ramp == "exp_step"``: that lineage's
    consistency cost ramps with exp_rampup(global_step,
    n_epoch_rampup * len(syn_loader)) (main_scmt.py:261,515).

    ``grad_flow=True`` adds per-parameter mean-|grad| diagnostics to the
    metrics dict (``grad_abs/<path>`` for every non-bias leaf) — the
    reference's plot_grad_flow diagnostic (main_baseline.py:108-123),
    computed inside the jitted step instead of a host-side hook."""
    cfg = modules.cfg
    t = cfg.train
    encoder, predictor = modules.encoder, modules.predictor
    mean_teacher = t.mean_teacher
    isp = t.isp
    use_mixup = t.mixup
    da_mode = _effective_da_mode(cfg)
    if t.cost_ramp == "exp_step" and steps_per_epoch is None:
        raise ValueError(
            "cfg.train.cost_ramp='exp_step' needs steps_per_epoch "
            "(= len(syn_loader)) to size the step-based exp_rampup — "
            "pass make_train_step(modules, steps_per_epoch=len(loader))")

    pred_has_stats = cfg.model.predictor_head == "crnn"
    folded_fwd = (make_folded_encoder_fwd(cfg, mesh=mesh)
                  if cfg.model.folded_train_stem else None)
    # scmt/scmt_ada lineage: the real-stream shifted STUDENT forwards are
    # commented out of the reference (main_scmt.py:425-430,
    # main_scmt_ada.py:402-405, main_scmt_ada_origin.py:539-542) — only the
    # syn stream runs shifted through the student
    isp_syn_only = t.isp_flavor in ("scmt", "scmt_ada")
    # origin lineage (main.py): the ISP/ICT wiring is MASKED over ONE
    # combined real batch — ¼ weak + ½ unlabeled-PL + ¼ strong rows
    # (mask_weak / mask_unlabel=slice(6,18) / mask_strong at batch 24,
    # main.py:224,363-377) — with a separate SYN stream whose forward runs
    # but whose predictions are unused (:344-346); ONLY the real batch is
    # shifted (:205-218), there are no teacher shift forwards, and the
    # three ICT mixups act on the weak / strong / unlabeled row slices.
    # NOTE main.py's own __main__ passes mask_weak=None (:954), under
    # which -ISP raises NameError at :486 — the masked wiring is the
    # lineage's runnable ICT semantics, pinned by
    # tests/test_reference_train_parity.py::test_origin_ict…
    origin_masks = isp and t.isp_flavor == "origin"
    if origin_masks and cfg.da.joint_backward and _effective_da_mode(cfg) \
            in ("dann", "cdan", "cdan_frame"):
        # the origin forward never binds the syn-stream predictions the
        # joint-DA branch conditions on (its DA lineage is alternating
        # ADDA, main.py:262-333); fail loudly instead of UnboundLocalError
        # at trace time (ADVICE r4)
        raise ValueError(
            "isp_flavor='origin' is incompatible with da.joint_backward "
            "GRL modes: the origin lineage uses alternating (ADDA-style) "
            "updates; set da.joint_backward=False or da.mode='adda'")

    def model_fwd(params, stats, x, key, inference=False):
        k1, k2 = jax.random.split(key)
        if folded_fwd is not None:
            enc, enc_stats = folded_fwd(params["encoder"],
                                        stats["encoder"], x, k1)
            new_stats = {"encoder": enc_stats}
        else:
            (enc, _), mut = encoder.apply(
                {"params": params["encoder"],
                 "batch_stats": stats["encoder"]},
                x, train=True, rngs={"dropout": k1},
                mutable=["batch_stats"])
            new_stats = {"encoder": mut["batch_stats"]}
        if pred_has_stats:
            (strong, weak), mut_p = predictor.apply(
                {"params": params["predictor"],
                 "batch_stats": stats["predictor"]}, enc, train=True,
                inference=inference, rngs={"dropout": k2},
                mutable=["batch_stats"])
            new_stats["predictor"] = mut_p["batch_stats"]
        else:
            strong, weak = predictor.apply(
                {"params": params["predictor"]}, enc, train=True,
                inference=inference, rngs={"dropout": k2})
        return strong, weak, enc, new_stats

    def disc_apply_fn(disc_params, disc_stats, key):
        """Train-mode discriminator application that THREADS BatchNorm
        running-stat updates across successive calls: the torch
        discriminators update running stats on every forward (the clip
        flavors carry five BatchNorm2d, CRNN.py:31-36), so each call here
        consumes the previous call's mutated stats, in call order. The
        caller reads ``cell["stats"]`` after the last call and stores it
        back into the train state (as a value_and_grad aux output when the
        calls happen inside a loss)."""
        cell = {"stats": disc_stats}

        def apply(h):
            if cell["stats"]:
                out, mut = modules.discriminator.apply(
                    {"params": disc_params, "batch_stats": cell["stats"]},
                    h, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                cell["stats"] = mut["batch_stats"]
                return out
            return modules.discriminator.apply(
                {"params": disc_params}, h, train=True,
                rngs={"dropout": key})
        return apply, cell

    def _domain_features(params, stats, x_syn, x_real, key):
        k1, k2 = jax.random.split(key)
        syn_strong, syn_weak, syn_enc, stats = model_fwd(params, stats,
                                                         x_syn, k1)
        r_strong, r_weak, r_enc, stats = model_fwd(params, stats, x_real, k2)
        return syn_strong, syn_weak, syn_enc, r_strong, r_weak, r_enc, stats

    def _grl_domain_loss(dapply, syn_s, syn_w, syn_f, r_s, r_w, r_f,
                         grl_coeff):
        """Dispatch the configured GRL-based domain loss flavor. Every live
        cdan/dann caller in the reference passes the WEAK (attention-
        pooled) predictions as g (pseudo_labeling_main.py:335,
        main_sct_ada_weak.py:326, ..._2_crnn.py:331) — only
        main_baseline.py's cdan_frame passes strong preds, and there g is
        computed-then-discarded (cdan_frame.py:92-95)."""
        if da_mode == "cdan_frame":
            return da_losses.cdan_frame_loss(dapply, syn_s, syn_f, r_s,
                                             r_f, grl_coeff)
        if da_mode == "cdan":
            if cfg.da.level == "clip":
                # Clip_Discriminator consumes the gradient-reversed full
                # (B, T, 256) encoding with clip-level labels
                # (main_scmt_ada_weak.py:331 wiring)
                return da_losses.cdan_frame_loss(dapply, syn_s, syn_f,
                                                 r_s, r_f, grl_coeff)
            fs = syn_f.reshape(syn_f.shape[0], -1)
            ft = r_f.reshape(r_f.shape[0], -1)
            rf, rg = modules.rand_maps
            return da_losses.cdan_loss(dapply, syn_w, fs, r_w, ft, rf, rg,
                                       cfg.da.entropy_conditioning,
                                       grl_coeff)
        # dann
        fs = syn_f.reshape(syn_f.shape[0], -1)
        ft = r_f.reshape(r_f.shape[0], -1)
        return da_losses.dann_loss(dapply, fs, ft, grl_coeff)

    def grl_pre_step(state: TrainState, x_syn, x_real, key):
        """GRL-based discriminator pre-step (main_baseline.py:314-335):
        one backward through the reversed discriminator loss updates both
        the encoder (via its aux optimizer) and the discriminator."""
        grl_coeff = warm_start_lambda(state.step, cfg.da.grl_alpha,
                                      cfg.da.grl_lo, cfg.da.grl_hi,
                                      cfg.da.grl_max_iters)
        k_fwd, k_disc = jax.random.split(key)

        def domain_loss_fn(enc_params, disc_params):
            params = {"encoder": enc_params,
                      "predictor": state.params["predictor"]}
            (syn_s, syn_w, syn_f, r_s, r_w, r_f,
             stats) = _domain_features(params, state.batch_stats, x_syn,
                                       x_real, k_fwd)
            dapply, dcell = disc_apply_fn(disc_params,
                                          state.disc_batch_stats, k_disc)
            dl = _grl_domain_loss(dapply, syn_s, syn_w, syn_f, r_s, r_w,
                                  r_f, grl_coeff)
            return dl, (stats, dcell["stats"])

        (dl, (new_stats, new_disc_stats)), (g_enc, g_disc) = \
            jax.value_and_grad(
                domain_loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params["encoder"], state.disc_params)

        enc_updates, enc_opt = modules.enc_optimizer.update(
            g_enc, state.enc_opt_state, state.params["encoder"])
        enc_params = optax.apply_updates(state.params["encoder"], enc_updates)
        disc_updates, disc_opt = modules.disc_optimizer.update(
            g_disc, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, disc_updates)

        state = state.replace(
            params={**state.params, "encoder": enc_params},
            batch_stats=new_stats,
            disc_params=disc_params,
            disc_batch_stats=new_disc_stats,
            disc_opt_state=disc_opt,
            enc_opt_state=enc_opt)
        return state, dl

    def adda_steps(state: TrainState, x_syn, x_real, key):
        """ADDA-style alternating updates (main_scmt.py:312-371,
        main.py:262-332, main_scmt_ada_origin.py:369-466), executed every
        cfg.da.update_step steps via lax.cond. Per-lineage wiring — label
        scheme and confusion composition — comes from
        cfg.da.adda_disc_labels / adda_confusion (see DAConfig); the
        main.py lineage's confusion-gradient NEGATION lives in its
        discriminator flavor (FrameDiscriminatorGRL with apply_grl=True,
        mirroring CRNN.py:80-89,104)."""
        k_fwd1, k_fwd2, k_d, k_c, k_choice1, k_choice2 = jax.random.split(
            key, 6)

        def run(state):
            # --- discriminator step on detached features; forward order is
            # REAL then SYN (main_scmt.py:317-323, main.py:268-272), which
            # fixes the BN batch-stat update sequence; the discriminator
            # forwards run on the FULL batch (predictions are subset after)
            choice_d = sample_adda_choice(k_choice1, x_real.shape[0])

            def d_loss_fn(disc_params):
                ka, kb = jax.random.split(k_fwd1)
                _, _, r_f, stats = model_fwd(state.params,
                                             state.batch_stats, x_real, ka)
                _, _, syn_f, stats = model_fwd(state.params, stats, x_syn,
                                               kb)
                dapply, dcell = disc_apply_fn(disc_params,
                                              state.disc_batch_stats, k_d)
                d_real = dapply(jax.lax.stop_gradient(r_f))
                d_syn = dapply(jax.lax.stop_gradient(syn_f))
                return da_losses.adda_discriminator_loss(
                    d_real, d_syn, choice_d, cfg.da.adv_weight,
                    cfg.da.adda_disc_labels), (stats, dcell["stats"])
            (dl, (stats_after, dstats)), g_disc = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.disc_params)
            disc_updates, disc_opt = modules.disc_optimizer.update(
                g_disc, state.disc_opt_state, state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, disc_updates)

            # --- feature-extractor confusion step: main_scmt forwards ONLY
            # the real stream and subsets a fresh random half batch
            # (:353-366); main.py forwards only the real stream at FULL
            # batch (:295-326); scmt_ada_origin's written intent is the syn
            # stream vs flipped labels (:461-466)
            syn_conf = cfg.da.adda_confusion == "syn_flipped"
            conf_choice = (sample_adda_choice(k_choice2, x_real.shape[0])
                           if cfg.da.adda_confusion == "half" else None)

            def c_loss_fn(enc_params):
                params = {"encoder": enc_params,
                          "predictor": state.params["predictor"]}
                _, _, f, stats = model_fwd(
                    params, stats_after, x_syn if syn_conf else x_real,
                    k_fwd2)
                dapply, dcell = disc_apply_fn(disc_params, dstats, k_c)
                d_conf = dapply(f)
                return da_losses.adda_confusion_loss(
                    d_conf, conf_choice, cfg.da.adv_weight,
                    flipped=syn_conf), (stats, dcell["stats"])
            (cl, (new_stats, dstats2)), g_enc = jax.value_and_grad(
                c_loss_fn, has_aux=True)(state.params["encoder"])
            enc_updates, enc_opt = modules.enc_optimizer.update(
                g_enc, state.enc_opt_state, state.params["encoder"])
            enc_params = optax.apply_updates(state.params["encoder"],
                                             enc_updates)
            return state.replace(
                params={**state.params, "encoder": enc_params},
                batch_stats=new_stats,
                disc_params=disc_params, disc_batch_stats=dstats2,
                disc_opt_state=disc_opt,
                enc_opt_state=enc_opt), dl + cl

        def skip(state):
            return state, jnp.zeros(())

        return jax.lax.cond(state.step % cfg.da.update_step == 0, run, skip,
                            state)

    norm_stats = modules.norm_stats

    def _inp(lin):
        """linear mel → log-mel (+ channel axis), then dataset-level
        normalization when TrainConfig.normalize is live (main.py:689-690;
        order matches the reference: Normalize is the final transform, ISP
        rolls shift the already-normalized batch, main.py:203-218)."""
        x = _log_input(lin)
        if norm_stats is not None:
            x = (x - norm_stats[0]) / norm_stats[1]
        return x

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array, epoch: jnp.ndarray):
        # fold the step counter into the key INSIDE the program: callers can
        # pass one constant key per epoch (zero per-step host dispatches —
        # under a tunneled backend the per-step jax.random.split was a
        # measurable slice of the e2e gap) and still get distinct
        # per-step randomness; distinct caller keys keep working unchanged
        rng = jax.random.fold_in(rng, state.step)
        keys = jax.random.split(rng, 20)
        (k_noise, k_shift, k_s1, k_s2, k_s3, k_s4, k_s5, k_s6,
         k_t1, k_t2, k_t3, k_da, k_mix, k_mix2, k_t4, k_umix, k_umix2,
         k_wmix, k_wmix2, _) = keys

        if t.cost_ramp == "exp_step":
            # scmt/origin/ada lineage: per-STEP exponential ramp over
            # n_epoch_rampup epochs' worth of steps (main_scmt.py:261,515;
            # state.step == c_epoch * len(syn_loader) + i at step entry)
            rampup_value = exp_rampup(state.step,
                                      t.n_epoch_rampup * steps_per_epoch)
        else:
            # main_baseline lineage: per-EPOCH sigmoid-shaped ramp
            # (main_baseline.py:285)
            rampup_value = sigmoid_rampdown(epoch, t.rampdown_epochs)
        cost = t.max_consistency_cost * rampup_value
        lr = learning_rate(epoch, t.max_learning_rate, t.adjust_lr,
                           t.rampdown_epochs)
        state.opt_state.hyperparams["learning_rate"] = lr
        if state.enc_opt_state is not None:
            # aux optimizers stay at their CONSTANT construction lr: the
            # reference's "aux = lr × 0.1" block (main_baseline.py:80-88)
            # is dead in every live path — main_baseline.py:292 passes
            # optimizer_d=None, and the scmt/origin/ada scripts import
            # data.config with adjust_lr=False so adjust_learning_rate
            # never runs; construction lr = default_learning_rate
            # (main_scmt.py:923-930), == max_learning_rate here.
            aux_lr = t.max_learning_rate * cfg.da.aux_lr_factor
            state.enc_opt_state.hyperparams["learning_rate"] = aux_lr
            state.disc_opt_state.hyperparams["learning_rate"] = aux_lr

        # origin_masks trains on the combined real batch only — the syn
        # stream is optional there (used by DA stages if provided)
        syn_lin = (batch.get("syn") if origin_masks else batch["syn"])
        real_lin = batch.get("real", None)
        syn_target = (batch.get("syn_strong") if origin_masks
                      else batch["syn_strong"])              # (Bs, Tf, C)
        syn_target_weak = (syn_target.max(axis=-2)
                           if syn_target is not None else None)
        x_syn = _inp(syn_lin) if syn_lin is not None else None
        x_real = _inp(real_lin) if real_lin is not None else None
        real_weak_target = batch.get("real_weak", None)      # (Br, C)
        real_strong_target = batch.get("real_strong", None)

        metrics: Dict[str, jnp.ndarray] = {"lr": lr,
                                           "consistency_cost": cost}

        # ---- domain-adaptation updates that precede the main step
        joint_da = (cfg.da.joint_backward
                    and da_mode in ("dann", "cdan", "cdan_frame"))
        if da_mode in ("dann", "cdan", "cdan_frame") and not joint_da:
            state, dl = grl_pre_step(state, x_syn, x_real, k_da)
            metrics["domain_loss"] = dl
        elif da_mode == "adda":
            state, dl = adda_steps(state, x_syn, x_real, k_da)
            metrics["domain_loss"] = dl

        if (mean_teacher or isp) and real_lin is None:
            # fail with intent instead of an AttributeError inside vmap:
            # the MT noise target and every ISP/SCT loss are defined over
            # the REAL streams (main_baseline.py:229-277, 352-368)
            raise ValueError(
                "mean_teacher/isp presets need the real streams — build "
                "the loader with weak + unlabeled datasets (batch carries "
                "no 'real' key)")

        # ---- teacher inputs (noise in the LINEAR mel domain, then log —
        # transform order of get_transforms, Transforms.py:317)
        if mean_teacher:
            x_real_t = _inp(
                gaussian_snr_noise(k_noise, real_lin, cfg.audio.noise_snr))

        # ---- ISP shifts (shared between real and syn streams,
        # main_baseline.py:232-248; origin: drawn for and applied to the
        # combined real batch ONLY, main.py:205-218)
        if isp:
            n_shift = (real_lin.shape[0] if origin_masks
                       else syn_lin.shape[0])
            in_shift, pool_shift, freq_shift = sample_isp_shifts(
                k_shift, n_shift, t.time_shift_max,
                t.freq_shift_max, cfg.model.pooling_time_ratio)
            if origin_masks or not isp_syn_only:
                x_real_shift = roll_batch(x_real, in_shift, axis=1)
                x_real_freq = roll_batch(x_real, freq_shift, axis=2)
            if not origin_masks:
                x_syn_shift = roll_batch(x_syn, in_shift, axis=1)
                x_syn_freq = roll_batch(x_syn, freq_shift, axis=2)
                syn_target_shift = roll_batch(syn_target, pool_shift,
                                              axis=1)
                if mean_teacher:
                    x_real_t_shift = roll_batch(x_real_t, in_shift, axis=1)
                    x_real_t_freq = roll_batch(x_real_t, freq_shift, axis=2)

        # ---- teacher forwards (no grad; teacher BN stats thread in the
        # reference's call order, main_baseline.py:352-368). With
        # fused_streams the 3 same-shape teacher forwards run as ONE
        # batched forward (BN stats pool over the 3 streams — opt-in).
        teacher = {}
        t_stats = state.ema_batch_stats
        if mean_teacher:
            # origin: the teacher scores ONLY the plain real batch — no
            # shifted teacher forwards exist in main.py (:251-255)
            if isp and t.fused_streams and not origin_masks:
                n_t = x_real_t.shape[0]
                ts_all, tw_all, _, t_stats = model_fwd(
                    state.ema_params, t_stats,
                    jnp.concatenate([x_real_t, x_real_t_shift,
                                     x_real_t_freq], 0), k_t1)
                for i, tag in enumerate(("", "_shift", "_freq")):
                    teacher[f"strong{tag}"] = sg(
                        ts_all[i * n_t:(i + 1) * n_t])
                    teacher[f"weak{tag}"] = sg(tw_all[i * n_t:(i + 1) * n_t])
            else:
                ts, tw, _, t_stats = model_fwd(state.ema_params, t_stats,
                                               x_real_t, k_t1)
                teacher["strong"], teacher["weak"] = sg(ts), sg(tw)
                if isp and not origin_masks:
                    ts, tw, _, t_stats = model_fwd(state.ema_params, t_stats,
                                                   x_real_t_shift, k_t2)
                    teacher["strong_shift"] = sg(ts)
                    teacher["weak_shift"] = sg(tw)
                    ts, tw, _, t_stats = model_fwd(state.ema_params, t_stats,
                                                   x_real_t_freq, k_t3)
                    teacher["strong_freq"] = sg(ts)
                    teacher["weak_freq"] = sg(tw)

        # ---- ICT unlabeled mixup-consistency targets (main.py:451-470):
        # EMA teacher scores the CLEAN unlabeled inputs; input and both
        # teacher posteriors are mixed with one shared λ/permutation and
        # the student is scored on the mixed input inside loss_fn
        if use_mixup and mean_teacher and x_real is not None:
            if origin_masks:
                # mask_unlabel rows of the combined batch (main.py:363,454)
                b = x_real.shape[0]
                x_u = x_real[b // 4: 3 * b // 4]
            else:
                u_half = x_real.shape[0] // 2
                x_u = x_real[u_half:]                # unlabeled-PL stream
            ts_u, tw_u, _, t_stats = model_fwd(state.ema_params, t_stats,
                                               x_u, k_t4)
            mixed_x_u, mixed_strong_u, mixed_weak_u, _ = mixup(
                k_umix, x_u, sg(ts_u), sg(tw_u), alpha=t.mixup_usup_alpha)

        # ---- main loss
        fused = t.fused_streams and real_lin is not None

        def loss_fn(params, disc_params=None):
            m: Dict[str, jnp.ndarray] = {}
            stats = state.batch_stats
            if fused:
                # one batched forward over all same-rank student streams
                # (2 main + up to 4 ISP); split back by static sizes
                parts = [x_syn, x_real]
                if origin_masks:
                    # main_origin.py's train() has NO syn stream at all
                    # (:173 — one combined loader)
                    parts = [x_real, x_real_shift, x_real_freq]
                elif isp and not isp_syn_only:
                    parts += [x_real_shift, x_real_freq,
                              x_syn_shift, x_syn_freq]
                elif isp:
                    parts += [x_syn_shift, x_syn_freq]
                sizes = [p.shape[0] for p in parts]
                cuts = list(itertools.accumulate(sizes))[:-1]
                s_all, w_all, e_all, stats = model_fwd(
                    params, stats, jnp.concatenate(parts, 0), k_s1)
                s_p = jnp.split(s_all, cuts, 0)
                w_p = jnp.split(w_all, cuts, 0)
                e_p = jnp.split(e_all, cuts, 0)
                if origin_masks:
                    r_strong, r_weak, r_enc = s_p[0], w_p[0], e_p[0]
                    rs_strong, rf_strong = s_p[1:3]
                    rs_weak, rf_weak = w_p[1:3]
                else:
                    syn_strong, syn_weak, syn_enc = s_p[0], w_p[0], e_p[0]
                    r_strong, r_weak, r_enc = s_p[1], w_p[1], e_p[1]
                if origin_masks:
                    pass
                elif isp and not isp_syn_only:
                    rs_strong, rf_strong, ss_strong, sf_strong = s_p[2:6]
                    rs_weak, rf_weak, ss_weak, sf_weak = w_p[2:6]
                elif isp:
                    ss_strong, sf_strong = s_p[2:4]
                    ss_weak, sf_weak = w_p[2:4]
            elif origin_masks:
                # main_origin.py's train() consumes ONE combined loader —
                # there is no syn stream and no syn forward (:173,281-283)
                r_strong, r_weak, r_enc, stats = model_fwd(
                    params, stats, x_real, k_s2)
            else:
                # NOTE: the syn forward runs (and its BatchNorm batch-stat
                # update is kept) even when supervise_on == "real" — the
                # ENA script also forwards the syn stream in train mode
                # without using it in the loss (main_baseline_ena.py:338),
                # so its BN running stats see syn statistics; skipping it
                # here would diverge from the reference's training dynamics
                syn_strong, syn_weak, syn_enc, stats = model_fwd(
                    params, stats, x_syn, k_s1)
                if x_real is not None:
                    r_strong, r_weak, r_enc, stats = model_fwd(
                        params, stats, x_real, k_s2)

            # supervised BCE (main_baseline.py:431-475 / _ena variant;
            # origin: masked slices of the combined real batch — the syn
            # stream's predictions are forwarded-then-unused, main.py:
            # 344-346,380,417)
            if origin_masks:
                if real_strong_target is None:
                    raise ValueError(
                        "the origin preset's masked ICT wiring needs the "
                        "combined real batch's strong targets — build the "
                        "loader with layout='origin' (batch carries no "
                        "'real_strong' key)")
                b = r_weak.shape[0]
                b4, b34 = b // 4, 3 * b // 4
                weak_loss = bce(r_weak[:b34], real_weak_target[:b34])
                strong_loss = bce(r_strong[b34:], real_strong_target[b34:])
            elif t.supervise_on == "real" and real_strong_target is not None:
                weak_loss = bce(r_weak, real_strong_target.max(axis=-2))
                if mean_teacher:
                    # the ENA script's weak BCE is counted TWICE under MT:
                    # the base term (main_baseline_ena.py:434) plus the
                    # `if ema_model is not None` add of the SAME term
                    # (:437) — an editing artifact, but live behavior
                    weak_loss = 2.0 * weak_loss
                strong_loss = bce(r_strong, real_strong_target)
            else:
                weak_loss = bce(syn_weak, syn_target_weak)
                if real_weak_target is not None:
                    if t.real_weak_bce == "full" and mean_teacher:
                        # whole real stream: labeled weak + PL
                        # (main_baseline.py:435)
                        weak_loss = weak_loss + bce(r_weak, real_weak_target)
                    elif t.real_weak_bce == "half":
                        # labeled half only, with or without a teacher
                        # (main_sct_ada_weak.py:419-423)
                        hw = real_weak_target.shape[0] // 2
                        weak_loss = weak_loss + bce(r_weak[:hw],
                                                    real_weak_target[:hw])
                    # "none": the 2-loader scmt/origin lineage adds no real
                    # weak term (main_scmt.py:459, main.py:394)
                strong_loss = bce(syn_strong, syn_target)
            m["weak_class_loss"] = weak_loss
            m["strong_class_loss"] = strong_loss
            loss = strong_loss + weak_loss

            if mean_teacher:
                c_strong = cost * mse(r_strong, teacher["strong"])
                c_weak = cost * mse(r_weak, teacher["weak"])
                m["consistency_strong"] = c_strong
                m["consistency_weak"] = c_weak
                loss = loss + c_strong + c_weak

            if isp and origin_masks:
                # masked combined-batch SCT (main.py:363-367,383,422-423):
                # real shift then real freq student forwards (:363-367);
                # class terms on the weak/strong row slices; single
                # self-consistency MSE over the FULL combined batch
                # (:484); NO syn shifted forwards, NO teacher shift terms
                b = r_weak.shape[0]
                b4, b34 = b // 4, 3 * b // 4
                if not fused:
                    rs_strong, rs_weak, _, stats = model_fwd(
                        params, stats, x_real_shift, k_s3)
                    rf_strong, rf_weak, _, stats = model_fwd(
                        params, stats, x_real_freq, k_s4)
                real_strong_shift = roll_batch(real_strong_target,
                                               pool_shift, axis=1)
                strong_shift_loss = bce(rs_strong[b34:],
                                        real_strong_shift[b34:])
                strong_freq_loss = bce(rf_strong[b34:],
                                       real_strong_target[b34:])
                weak_freq_loss = bce(rf_weak[:b4], real_weak_target[:b4])
                m["strong_shift_class_loss"] = strong_shift_loss
                m["strong_freq_shift_class_loss"] = strong_freq_loss
                m["weak_freq_shift_class_loss"] = weak_freq_loss
                loss = (loss + strong_shift_loss + strong_freq_loss
                        + weak_freq_loss)
                c_shift = cost / 2 * mse(
                    rs_strong, sg(roll_batch(r_strong, pool_shift,
                                             axis=1)))
                m["consistency_shift"] = c_shift
                loss = loss + c_shift
            elif isp:
                half = r_weak.shape[0] // 2
                if not fused:
                    if not isp_syn_only:
                        if t.isp_flavor == "sct":
                            # main_sct_ada_weak.py:397-400: the real FREQ-
                            # shift forward PRECEDES the time-shift one —
                            # BN batch-stat threading order differs from
                            # the baseline lineage (main_baseline.py:
                            # 372-407, shift first)
                            rf_strong, rf_weak, _, stats = model_fwd(
                                params, stats, x_real_freq, k_s4)
                            rs_strong, rs_weak, _, stats = model_fwd(
                                params, stats, x_real_shift, k_s3)
                        else:
                            rs_strong, rs_weak, _, stats = model_fwd(
                                params, stats, x_real_shift, k_s3)
                            rf_strong, rf_weak, _, stats = model_fwd(
                                params, stats, x_real_freq, k_s4)
                    ss_strong, ss_weak, _, stats = model_fwd(
                        params, stats, x_syn_shift, k_s5)
                    sf_strong, sf_weak, _, stats = model_fwd(
                        params, stats, x_syn_freq, k_s6)

                # SCT classification losses — the strong terms are common to
                # every lineage (main_baseline.py:479-480, main_scmt.py:
                # 503-504, main_sct_ada_weak.py:462-463, main.py:422-423)
                strong_shift_loss = bce(ss_strong, syn_target_shift)
                strong_freq_loss = bce(sf_strong, syn_target)
                m["strong_shift_class_loss"] = strong_shift_loss
                m["strong_freq_shift_class_loss"] = strong_freq_loss
                loss = loss + strong_shift_loss + strong_freq_loss

                # weak-freq SCT term: composition and liveness per lineage
                if t.isp_flavor == "baseline":
                    # syn + labeled real half (main_baseline.py:445)
                    weak_freq_loss = bce(sf_weak, syn_target_weak)
                    if real_weak_target is not None:
                        weak_freq_loss = weak_freq_loss + bce(
                            rf_weak[:half], real_weak_target[:half])
                    m["weak_freq_shift_class_loss"] = weak_freq_loss
                    loss = loss + weak_freq_loss
                elif t.isp_flavor in ("scmt", "scmt_ada"):
                    # syn only (main_scmt.py:459, main_scmt_ada.py:422)
                    weak_freq_loss = bce(sf_weak, syn_target_weak)
                    m["weak_freq_shift_class_loss"] = weak_freq_loss
                    loss = loss + weak_freq_loss
                elif t.isp_flavor == "sct":
                    # computed but NEVER added to the live sum
                    # (main_sct_ada_weak.py:428 vs :513) — metric only
                    m["weak_freq_shift_class_loss"] = bce(sf_weak,
                                                          syn_target_weak)

                # self shift-consistency: pairing differs per lineage
                syn_pred_shift = sg(roll_batch(syn_strong, pool_shift,
                                               axis=1))
                if t.isp_flavor == "baseline":
                    # two-term: each stream vs its own rolled prediction
                    # (main_baseline.py:524-525)
                    real_pred_shift = sg(roll_batch(r_strong, pool_shift,
                                                    axis=1))
                    c_shift = cost / 2 * (mse(ss_strong, syn_pred_shift)
                                          + mse(rs_strong, real_pred_shift))
                elif t.isp_flavor == "scmt":
                    # CROSS-STREAM: syn shifted student vs the rolled REAL
                    # student prediction (main_scmt.py:571, same sum in
                    # main_scmt_ada_origin.py:686)
                    real_pred_shift = sg(roll_batch(r_strong, pool_shift,
                                                    axis=1))
                    c_shift = cost / 2 * mse(ss_strong, real_pred_shift)
                else:
                    # scmt_ada (:542-544) / sct (main_sct_ada_weak.py:512):
                    # syn shifted student vs rolled SYN prediction
                    c_shift = cost / 2 * mse(ss_strong, syn_pred_shift)
                m["consistency_shift"] = c_shift
                loss = loss + c_shift

                # teacher shift consistencies
                if mean_teacher and t.isp_flavor == "baseline":
                    # strong-only, REAL shifted student, half weight
                    # (main_baseline.py:501-513, added at :541)
                    c_ss = cost * mse(rs_strong, teacher["strong_shift"])
                    c_sf = cost * mse(rf_strong, teacher["strong_freq"])
                    m["consistency_strong_shift"] = c_ss
                    m["consistency_strong_freq_shift"] = c_sf
                    loss = loss + 0.5 * (c_ss + c_sf)
                elif mean_teacher and t.isp_flavor in ("scmt", "scmt_ada"):
                    # FOUR full-weight terms: SYN shifted student (strong
                    # AND weak) vs the real-stream shifted teacher
                    # (main_scmt.py:529-547, added :579;
                    # main_scmt_ada.py:491-499, added :545)
                    c_ss = cost * mse(ss_strong, teacher["strong_shift"])
                    c_ws = cost * mse(ss_weak, teacher["weak_shift"])
                    c_sf = cost * mse(sf_strong, teacher["strong_freq"])
                    c_wf = cost * mse(sf_weak, teacher["weak_freq"])
                    m["consistency_strong_shift"] = c_ss
                    m["consistency_weak_shift"] = c_ws
                    m["consistency_strong_freq_shift"] = c_sf
                    m["consistency_weak_freq_shift"] = c_wf
                    loss = loss + c_ss + c_ws + c_sf + c_wf
                elif mean_teacher and t.isp_flavor == "sct":
                    # computed-but-never-added (main_sct_ada_weak.py:
                    # 481-495 vs :514 commented) — metrics only
                    m["consistency_strong_shift"] = cost * mse(
                        rs_strong, teacher["strong_shift"])
                    m["consistency_strong_freq_shift"] = cost * mse(
                        rf_strong, teacher["strong_freq"])
                # "origin": no teacher shift terms exist (main.py)

            if use_mixup and origin_masks:
                b = r_weak.shape[0]
                b4, b34 = b // 4, 3 * b // 4
                # ICT weak mixup on the mask_weak rows (main.py:386-392);
                # the λ-weighted BCE pair of mixup_criterion equals BCE
                # against the λ-blended target (BCE is affine in the
                # target). Forward order weak→strong→unsup follows the
                # reference's loss-section order (BN batch-stat threading)
                mixed_xw, mixed_yw, _ = mixup(k_wmix, x_real[:b4],
                                              real_weak_target[:b4],
                                              alpha=t.mixup_alpha)
                _, mw_weak, _, stats = model_fwd(params, stats, mixed_xw,
                                                 k_wmix2)
                mix_weak_loss = bce(mw_weak, mixed_yw)
                m["mixup_weak_class_loss"] = mix_weak_loss
                loss = loss + mix_weak_loss
                # ICT strong mixup on the mask_strong rows (main.py:426-432)
                mixed_x, mixed_y, _ = mixup(k_mix, x_real[b34:],
                                            real_strong_target[b34:],
                                            alpha=t.mixup_alpha)
                mx_strong, _, _, stats = model_fwd(params, stats, mixed_x,
                                                   k_mix2)
                mix_loss = bce(mx_strong, mixed_y)
                m["mixup_strong_loss"] = mix_loss
                loss = loss + mix_loss
                # ICT unlabeled mixup-consistency vs the EMA teacher
                # (main.py:459-470), × the ramped consistency cost
                if mean_teacher:
                    u_strong, u_weak, _, stats = model_fwd(params, stats,
                                                           mixed_x_u,
                                                           k_umix2)
                    c_u_strong = (t.mixup_consistency * cost
                                  * mse(u_strong, mixed_strong_u))
                    c_u_weak = (t.mixup_consistency * cost
                                * mse(u_weak, mixed_weak_u))
                    m["mixup_cons_strong_loss"] = c_u_strong
                    m["mixup_cons_weak_loss"] = c_u_weak
                    loss = loss + c_u_strong + c_u_weak
            elif use_mixup:
                # generic (non-masked) ICT composition for experimental
                # flavor combinations: syn-stream strong mixup, labeled
                # real-half weak mixup, unlabeled-half consistency
                mixed_x, mixed_y, lam = mixup(k_mix, x_syn, syn_target,
                                              alpha=t.mixup_alpha)
                mx_strong, _, _, stats = model_fwd(params, stats, mixed_x,
                                                   k_mix2)
                mix_loss = bce(mx_strong, mixed_y)
                m["mixup_strong_loss"] = mix_loss
                loss = loss + mix_loss
                # ICT supervised weak mixup on the labeled real half
                # (main.py:386-392)
                if real_weak_target is not None:
                    w_half = x_real.shape[0] // 2
                    mixed_xw, mixed_yw, _ = mixup(
                        k_wmix, x_real[:w_half], real_weak_target[:w_half],
                        alpha=t.mixup_alpha)
                    _, mw_weak, _, stats = model_fwd(params, stats, mixed_xw,
                                                     k_wmix2)
                    mix_weak_loss = bce(mw_weak, mixed_yw)
                    m["mixup_weak_class_loss"] = mix_weak_loss
                    loss = loss + mix_weak_loss
                # ICT unlabeled mixup-consistency vs the EMA teacher
                # (main.py:459-470), weighted like the MT consistency terms
                if mean_teacher and x_real is not None:
                    u_strong, u_weak, _, stats = model_fwd(params, stats,
                                                           mixed_x_u, k_umix2)
                    c_u_strong = (t.mixup_consistency * cost
                                  * mse(u_strong, mixed_strong_u))
                    c_u_weak = (t.mixup_consistency * cost
                                * mse(u_weak, mixed_weak_u))
                    m["mixup_cons_strong_loss"] = c_u_strong
                    m["mixup_cons_weak_loss"] = c_u_weak
                    loss = loss + c_u_strong + c_u_weak

            if joint_da:
                # domain loss from the MAIN forward's features, added to
                # the combined loss (main_scmt_ada_weak.py:312-331,527-528)
                grl_coeff = warm_start_lambda(
                    state.step, cfg.da.grl_alpha, cfg.da.grl_lo,
                    cfg.da.grl_hi, cfg.da.grl_max_iters)
                dapply, dcell = disc_apply_fn(disc_params,
                                              state.disc_batch_stats, k_da)
                dl = _grl_domain_loss(dapply, syn_strong, syn_weak, syn_enc,
                                      r_strong, r_weak, r_enc, grl_coeff)
                m["domain_loss"] = dl
                loss = loss + cfg.da.adv_weight * dl
                m["loss"] = loss
                return loss, (stats, m, dcell["stats"])

            m["loss"] = loss
            return loss, (stats, m)

        if joint_da:
            # single combined backward updating model AND discriminator
            (loss, (new_stats, loss_metrics, new_disc_stats)), \
                (grads, disc_grads) = \
                jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, state.disc_params)
            disc_updates, new_disc_opt = modules.disc_optimizer.update(
                disc_grads, state.disc_opt_state, state.disc_params)
            state = state.replace(
                disc_params=optax.apply_updates(state.disc_params,
                                                disc_updates),
                disc_batch_stats=new_disc_stats,
                disc_opt_state=new_disc_opt)
        else:
            (loss, (new_stats, loss_metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        metrics.update(loss_metrics)
        if grad_flow:
            for path, g in jax.tree_util.tree_leaves_with_path(grads):
                name = jax.tree_util.keystr(path).replace("']['", ".") \
                    .strip("[']")
                if "bias" not in name:
                    metrics[f"grad_abs/{name}"] = jnp.abs(g).mean()

        updates, new_opt_state = modules.optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1

        ema_params, ema_stats = state.ema_params, state.ema_batch_stats
        if mean_teacher:
            ema_params = ema_update(state.ema_params, new_params, new_step,
                                    t.ema_alpha)
            if t.ema_scope == "params":
                # main_origin.py:86-89 — parameter-wise EMA only; the
                # teacher's BN running stats evolve solely through its own
                # train-mode forwards (already threaded into t_stats)
                ema_stats = t_stats
            else:
                # state-dict EMA: params AND batch stats
                # (main_baseline.py:91-105)
                ema_stats = ema_update(t_stats, new_stats, new_step,
                                       t.ema_alpha)

        new_state = state.replace(step=new_step, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  ema_params=ema_params,
                                  ema_batch_stats=ema_stats)
        return new_state, metrics

    if not jit:
        # raw traceable body — make_epoch_runner scans it over a whole
        # epoch's worth of device-resident batches
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_epoch_runner(modules: TrainModules,
                      steps_per_epoch: Optional[int] = None,
                      grad_flow: bool = False,
                      mesh=None) -> Callable:
    """ONE-dispatch epoch: ``lax.scan`` of the train step over every batch
    of a device-resident epoch.

    The per-step Python loop costs one dispatch for batch assembly plus one
    for the step (~0.2 ms/step of un-overlapped host time against a ~1.1 ms
    step on v5e). With the three-stream dataset arrays resident in HBM the
    whole epoch is a closed program: the scan body gathers batch b by
    index, runs the identical step body, and carries the train state — the
    host dispatches ONCE per epoch and fetches the stacked (n_steps, ...)
    metrics, which is exactly the shape Trainer's every-step meters/NaN
    guard consume. Numerics: the scan body is the same traced step, so
    results match the loop path (XLA fusion may reassociate within fp
    tolerance).

    Signature: ``run_epoch(state, arrays, idx, rng, epoch) ->
    (state, stacked_metrics)`` where ``arrays``/``idx`` come from
    ``ThreeStreamLoader.epoch_arrays``.

    ``mesh``: a 1-D ``jax.sharding.Mesh(('data',))`` makes the scanned
    epoch multi-chip: the dataset arrays + index matrices live REPLICATED
    on the mesh (the caller places them — Trainer.train_epoch), the train
    state is replicated, and the scan body constrains each gathered batch
    to row-sharding over the data axis — from there GSPMD inserts exactly
    the collectives the per-step loop path gets from ``shard_batch``, so
    the two paths run the same sharded program per step. The replicated
    gather is redundant per-device work (each chip gathers the full batch
    then keeps its rows), which keeps index row→device assignment free of
    divisibility constraints on the half-batch streams.
    """
    from bsed_tpu.data.pipeline import gather_batch

    step_body = make_train_step(modules, steps_per_epoch=steps_per_epoch,
                                grad_flow=grad_flow, jit=False, mesh=mesh)
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        shard = NamedSharding(mesh, PartitionSpec("data"))

    def run_epoch(state, arrays, idx, rng, epoch):
        def body(carry, ids):
            batch = gather_batch(arrays, ids)
            if shard is not None:
                batch = {k: jax.lax.with_sharding_constraint(v, shard)
                         for k, v in batch.items()}
            return step_body(carry, batch, rng, epoch)
        return jax.lax.scan(body, state, idx)

    return jax.jit(run_epoch, donate_argnums=(0,))


def make_predict_fn(modules: TrainModules, norm_stats="train") -> Callable:
    """Jitted inference: linear mel (B, T, F) → (strong, weak) posteriors
    with BN running averages and no dropout (get_predictions contract,
    evaluation_measures.py:163-182).

    norm_stats: "train" uses modules.norm_stats (the train+syn scaler —
    what main.py's per-epoch SYN evaluation sees through the train
    transforms); None disables normalization (TestModel.py semantics);
    an explicit (mean, std) pair ((F,) arrays) normalizes with those —
    the Trainer passes the VAL-fitted stats for per-epoch validation
    (main.py:696-699)."""
    cfg = modules.cfg
    if norm_stats == "train":
        nm = modules.norm_stats
    elif norm_stats is None:
        nm = None
    else:
        nm = tuple(jnp.asarray(a, jnp.float32)[:, None] for a in norm_stats)

    pred_has_stats = cfg.model.predictor_head == "crnn"

    @functools.partial(jax.jit, static_argnames=("inference", "apply_log"))
    def predict(params, batch_stats, mel, inference=False, apply_log=True):
        x = _log_input(mel) if apply_log else mel[..., None]
        if nm is not None:
            x = (x - nm[0]) / nm[1]
        enc, _ = modules.encoder.apply(
            {"params": params["encoder"],
             "batch_stats": batch_stats["encoder"]}, x, train=False)
        pred_vars = {"params": params["predictor"]}
        if pred_has_stats:
            pred_vars["batch_stats"] = batch_stats["predictor"]
        strong, weak = modules.predictor.apply(pred_vars, enc, train=False,
                                               inference=inference)
        return strong, weak

    return predict
