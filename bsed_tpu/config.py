"""Declarative configuration for the TPU-native bird-SED framework.

One frozen dataclass tree + a preset registry replaces the reference's three
near-identical module-constant config files (``src/data/config.py``,
``config_baseline.py``, ``config_baseline_ena.py``) and its 12-script
experiment matrix (``src/main_*.py``): every experiment in the reference is a
named preset here, selected by flags instead of by editing import lines.

Hyperparameter provenance (reference file:line):
  - audio front end:   /root/reference/src/data/config.py:47-57
  - median windows:    /root/reference/src/data/config.py:60-63
  - train schedule:    /root/reference/src/data/config.py:83-100
  - bird list:         /root/reference/src/data/config.py:103-109
  - crnn kwargs:       /root/reference/src/main_baseline.py:663-669
  - predictor kwargs:  /root/reference/src/main_baseline.py:673
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

BIRD_LIST: Tuple[str, ...] = (
    "EATO", "WOTH", "BCCH", "BTNW", "TUTI",
    "NOCA", "REVI", "AMCR", "BLJA", "OVEN",
    "COYE", "BGGN", "SCTA", "AMRE", "KEWA",
    "BHCO", "BHVI", "HETH", "RBWO", "BAWW",
)


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """STFT→mel front-end parameters (config.py:47-57)."""
    sr: int = 32000
    n_window: int = 2048
    hop_size: int = 255
    n_mels: int = 128
    mel_f_min: float = 0.0
    mel_f_max: float = 16000.0
    max_len_seconds: float = 10.0
    noise_snr: float = 30.0

    @property
    def n_samples(self) -> int:
        return int(self.max_len_seconds * self.sr)

    @property
    def max_frames(self) -> int:
        # ceil(10 * 32000 / 255) = 1255
        return math.ceil(self.max_len_seconds * self.sr / self.hop_size)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """CRNN topology (main_baseline.py:663-673)."""
    n_in_channel: int = 1
    nclass: int = 20
    activation: str = "glu"           # relu | leakyrelu | glu | cg
    dropout: float = 0.5
    nb_filters: Tuple[int, ...] = (16, 32, 64, 128, 128, 128, 128)
    pooling: Tuple[Tuple[int, int], ...] = (
        (2, 2), (2, 2), (1, 2), (1, 2), (1, 2), (1, 2), (1, 2))
    kernel_size: int = 3
    n_rnn_cell: int = 128
    n_layers_rnn: int = 2
    dropout_recurrent: float = 0.0
    # lax.scan unroll factor of the GRU recurrence (numerics-neutral).
    # The 313-step sequential scan is the train step's real latency
    # roofline on a tunneled v5e, so the unroll is a first-class knob.
    rnn_unroll: int = 8
    attention: bool = True
    use_fpn: bool = False
    # prediction head over the (B, 313, 256) encoding:
    #   "linear" — Predictor (CRNN_GRL.py:430-460), the default everywhere
    #   "mlp"    — Predictor_2 (CRNN_GRL.py:391-428), the live head of the
    #              dual-CRNN script (main_scmt_ada_weak_seperate_2_crnn.py:818)
    #   "crnn"   — CRNN_pred (CRNN_GRL.py:206-290) as a conv head over the
    #              encoding (the reference's alternate wiring at :819 is
    #              commented out and shape-broken; this realizes its intent)
    predictor_head: str = "linear"
    # conv-stack computation dtype: "float32" (reference parity, default) or
    # "bfloat16" (~1.6x faster conv stack on v5e; ~1e-2 activation error —
    # fine for training/serving throughput, not for the 1e-3 parity gate)
    compute_dtype: str = "float32"
    # TRAIN-mode folded-frequency stem (ops/folded_stem.py
    # make_folded_train_stem): run the leading conv blocks with mel bins
    # packed into the lane dim during TRAINING too — same parameter tree,
    # grouped BatchNorm batch stats, iid dropout on the folded layout.
    # Exact up to fp reassociation (tests/test_folded_stem.py), so opt-in
    # like fused_streams: OFF for bit-parity training, ON for throughput.
    folded_train_stem: bool = False
    # Fuse each folded block's BN-affine → GLU/CG → dropout → pools into
    # ONE Pallas kernel with a hand-written backward
    # (ops/stem_epilogue.py) — the round-4 profile's dominant train-step
    # terms collapse into a single HBM pass per direction. Applies only
    # when folded_train_stem runs and the block is eligible (glu/cg
    # activation, freq pooling, time pool ≤2, dropout on the k/256
    # grid); same math as the unfused folded path up to fp reassociation
    # and an independent dropout bit-stream (tests/test_stem_epilogue.py).
    fused_stem_epilogue: bool = True

    @property
    def pooling_time_ratio(self) -> int:
        r = 1
        for p in self.pooling:
            r *= p[0]
        return r


@dataclasses.dataclass(frozen=True)
class DAConfig:
    """Domain-adaptation settings (src/DA/, main_* adaptation stages)."""
    mode: str = "none"                # none | dann | cdan | cdan_frame | adda
    level: str = "frame"              # clip | frame
    # True: domain loss is added to the main loss and one backward updates
    # model + discriminator together (main_scmt_ada_weak.py:527-528,569-574);
    # False: separate discriminator pre-step (main_baseline.py:314-335)
    joint_backward: bool = False
    entropy_conditioning: bool = False
    randomized_dim: int = 8192        # config.py:89 (cdan random projection)
    adv_weight: float = 1.0           # main_baseline.py:306 (scmt uses 2.5/5)
    update_step: int = 1
    # ADDA per-lineage wiring (audited against each script's RUNNABLE path;
    # see train/da.py adda_* docstrings for the file:line trail):
    #   adda_disc_labels: "split" = real→target/syn→source (main.py:234-237,
    #     the runnable frame-level block); "all_target" = main_scmt.py's
    #     clip branch labels every row [0,1] (:276-278 hard-codes 12 rows
    #     all-target) — the labels its runnable clip adaptation trains with.
    #   adda_confusion: "half" = fresh random half-batch subset of the real
    #     stream (main_scmt.py:363-366); "full" = whole real stream
    #     (main.py:322-326 — the choice draw is dead); "syn_flipped" =
    #     syn stream vs flipped all-target labels (main_scmt_ada_origin.py:
    #     461-466; its DA block is dead at HEAD — (B,313,2) labels vs the
    #     1-unit CRNN_GRL discriminator — kept as the written intent).
    adda_disc_labels: str = "split"
    adda_confusion: str = "half"
    grl_alpha: float = 1.0            # DA/grl.py:33-74 warm-start schedule
    grl_lo: float = 0.0
    grl_hi: float = 1.0
    grl_max_iters: int = 1000
    # Aux-optimizer (discriminator / encoder-confusion) lr, as a factor on
    # the CONSTANT construction lr (max_learning_rate). The reference's
    # adjust_learning_rate carries an "aux = lr × 0.1" block
    # (main_baseline.py:80-88) but it is DEAD in every live path:
    # main_baseline.py:292 calls it with optimizer_d=None, and
    # main_scmt.py / main_origin.py / main_scmt_ada_origin.py import
    # data.config with adjust_lr=False (config.py:97) so the call never
    # fires — aux optimizers keep their construction lr
    # (default_learning_rate, == max lr) forever (main_scmt.py:923-930).
    # 1.0 reproduces that; other values are an exposed experiment knob.
    aux_lr_factor: float = 1.0
    # Optimizer FAMILY for the aux (discriminator / encoder-confusion)
    # optimizers when it differs from the main one: two scripts mix
    # families at HEAD — main_sct_ada_weak.py (main Adam :837-841, aux SGD
    # momentum/nesterov/wd :835-845) and pseudo_labeling_main.py (main Adam
    # :817-822, disc SGD :814-825, stepped by the joint backward :570-571).
    # "" = inherit cfg.train.optimizer.
    aux_optimizer: str = ""
    # Discriminator dropout — the reference's discriminator_kwargs carry
    # their own rate (0.5, main_baseline.py:671), independent of the model
    # dropout; exposed so deterministic parity tests can zero it.
    disc_dropout: float = 0.5


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization / semi-supervised schedule (config.py:83-100,
    main_baseline.py:53-105,168-598)."""
    batch_size: int = 12              # SYN stream; real weak/unlabeled get bs/2 each
    # PRNG implementation for the TRAINING randomness stream (dropout
    # masks, teacher noise, ISP shifts, mixup λ): "rbg" uses the TPU
    # hardware RNG — measured 1.5× faster per train step than threefry
    # (dropout bit-generation over ~100M conv activations is a real
    # compute term) with statistically equivalent masks. "threefry" gives
    # bit-reproducible draws across backends. Parameter INIT always uses
    # threefry regardless, so checkpoints/init parity never depend on this.
    prng_impl: str = "rbg"
    n_epoch: int = 300
    n_epoch_rampup: int = 50
    n_epoch_rampdown: int = 80
    rampdown_epochs: int = 30         # sigmoid_rampdown(c_epoch, 30), main_baseline.py:285
    # defaults mirror src/data/config.py:97-99 (adjust_lr=False, 5e-4) used
    # by the scmt/origin/ada script family; the main_baseline.py lineage
    # imports config_baseline.py:97-99 (adjust_lr=True, 1e-3) — set per
    # preset below.
    max_learning_rate: float = 5e-4
    adjust_lr: bool = False
    optimizer: str = "adam"           # adam | sgd(momentum .9 nesterov wd 1e-4)
    sgd_momentum: float = 0.9
    sgd_weight_decay: float = 1e-4
    max_consistency_cost: float = 1.0
    # Consistency-cost ramp schedule — the reference has TWO lineages:
    #   "sigmoid_epoch" — rampup_value = sigmoid_rampdown(c_epoch, 30)
    #       (main_baseline.py:285, also main_scmt_ada_weak.py:285,
    #       ..._seperate.py:285, ..._2_crnn.py:285, pseudo_labeling_main.py:285)
    #   "exp_step"      — rampup_value = exp_rampup(global_step,
    #       n_epoch_rampup * len(syn_loader)) with global_step =
    #       c_epoch * len(syn_loader) + i (main_scmt.py:261→515, main.py:222,
    #       main_origin.py:196, main_scmt_ada.py:275,
    #       main_scmt_ada_origin.py:273, main_sct_ada_weak.py:282).
    # At epoch 10 the two differ ~10× (0.04 vs 0.004 of max cost).
    cost_ramp: str = "sigmoid_epoch"
    ema_alpha: float = 0.999
    # EMA update scope — the reference has TWO update_ema_variables
    # flavors: "state_dict" averages parameters AND BatchNorm running
    # stats (main_baseline.py:91-105, main.py:91-100 — every train_mt
    # script); "params" is main_origin.py:86-89's parameter-wise in-place
    # EMA, which leaves the teacher's running stats to evolve only through
    # its own train-mode forwards.
    ema_scope: str = "state_dict"
    mean_teacher: bool = False
    isp: bool = False                 # shift-consistency training (SCT)
    mixup: bool = False               # ICT mixup (main.py lineage)
    mixup_alpha: float = 1.0          # mixup_sup_alpha (main.py:368)
    mixup_usup_alpha: float = 2.0     # unlabeled mixup alpha (main.py:369)
    mixup_consistency: float = 1.0    # unlabeled mixup-consistency weight
                                      # (main.py:370), scaled by the ramped
                                      # consistency cost like the MT terms
    pseudo_labels: bool = False       # consume weak PL TSV for unlabeled stream
    stage: str = "pretrain"           # pretrain | adaptation
    seed: int = 2023
    dataset_seed: int = 1215          # preprocess.py:236 split seed
    checkpoint_epochs: int = 1
    early_stopping: Optional[int] = None
    es_init_wait: int = 50
    # ISP time-roll magnitude: randint(-N,N) * ptr frames. TWO lineages in
    # the reference: 64 for main_baseline / *_weak* / pseudo_labeling
    # (main_baseline.py:232, main_scmt_ada_weak.py:232,
    # main_sct_ada_weak.py:230, pseudo_labeling_main.py:232) but 32 for the
    # scmt/origin/ada family (main.py:203, main_origin.py:177,
    # main_scmt.py:205, main_scmt_ada.py:208, main_scmt_ada_origin.py:206) —
    # note this split is NOT the cost_ramp split (main_sct_ada_weak.py has
    # the exp_step ramp but the 64-frame shift), so it is its own knob.
    time_shift_max: int = 64
    freq_shift_max: int = 4           # ISP: randint(-4,4) mel bins
    # Which SCT/ISP loss WIRING the script lineage uses. The reference's
    # per-script ISP blocks differ structurally, not just in constants —
    # audited line-by-line against every live loss sum:
    #   "baseline"  — 4 shifted student forwards (real shift/freq, syn
    #       shift/freq); weak-freq SCT on syn + real[:half]; two-term self
    #       shift consistency cost/2·(MSE(syn_s, roll syn)+MSE(real_s,
    #       roll real)); MT adds ½·(strong shift + strong freq-shift)
    #       teacher consistencies. Live in main_baseline.py:441-529,
    #       main_baseline_ena.py:447-532, main_scmt_ada_weak.py:441-525,
    #       ..._seperate.py:445-529, ..._2_crnn.py:447-531,
    #       pseudo_labeling_main.py:438-522.
    #   "scmt"      — SYN-ONLY shifted student forwards (main_scmt.py:
    #       425-430 — the real-stream shift forwards are commented out);
    #       weak-freq SCT on syn only (:459); CROSS-STREAM self shift
    #       consistency cost/2·MSE(syn shifted student, rolled REAL student
    #       pred) (:571); FOUR full-weight teacher shift consistencies
    #       (strong+weak × shift+freq), pairing the syn shifted student
    #       against the real-stream shifted teacher (:529-547, added :579).
    #       Also live in main_scmt_ada_origin.py:682-694 (same sums).
    #   "scmt_ada"  — like "scmt" but the self shift consistency pairs the
    #       rolled SYN student pred (main_scmt_ada.py:542-545; the MT-block
    #       real-paired variant is commented out :536-537).
    #   "sct"       — 4 shifted student forwards like "baseline" but the
    #       live sum adds ONLY strong shift + strong freq-shift class
    #       losses and the single-term syn self consistency
    #       (main_sct_ada_weak.py:510-513); weak-freq and all teacher shift
    #       terms are computed-but-never-added (:514 commented) — teacher
    #       shift FORWARDS still run (EMA BN side effects, :481-495).
    #   "origin"    — main.py's mask-era wiring: 4 shifted student
    #       forwards, weak-freq on the labeled real half (main.py:383),
    #       strong shift/freq on syn (:422-423), single combined-batch self
    #       shift consistency (:482), no teacher shift terms. NOTE: at HEAD
    #       main.py -ISP crashes with NameError — the SCT losses are
    #       defined only under `mask_weak is not None` (:379-391) but the
    #       live call passes mask_weak=None (:953) while the sum uses them
    #       unconditionally (:483); the preset models the mask-era intent
    #       (weak slice = real[:half], strong slice = syn).
    isp_flavor: str = "baseline"
    # The real-stream weak BCE term added to the supervised weak loss when
    # a teacher is present: "full" = whole real stream (weak + PL,
    # main_baseline.py:435), "half" = labeled half only, added EVEN without
    # a teacher (main_sct_ada_weak.py:419-423), "none" = syn-only weak BCE
    # (the 2-loader scmt/origin lineage: main_scmt.py:459, main.py:394 —
    # their real streams carry strong ENA labels that feed no weak loss).
    real_weak_bce: str = "full"
    supervise_on: str = "syn"         # syn | real  (main_baseline vs main_baseline_ena)
    # Dataset-level feature normalization — live in exactly ONE reference
    # script: main.py fits a Scaler on ConcatDataset([ENA train, SYN])
    # (:681-686) and passes it to the train transforms (:689-690), with a
    # SEPARATE val-fitted scaler for per-epoch validation (:696-699).
    # main_baseline & the *_weak*/pseudo_labeling family pass scaler=None
    # (main_baseline.py:710-713); main_scmt.py:783 / main_origin.py:620 /
    # main_scmt_ada_origin.py:907 crash on the undefined cfg.syn_or_not
    # before training (bit-rot); main_scmt_ada.py fits one but passes None
    # (:748-768). TestModel.py:225-231 fits and IGNORES one, so `cli eval`
    # never normalizes. See utils/scaler.py.
    normalize: bool = False
    best_metric: str = "event_f1"     # event_f1 | weak_f1 (pseudo_labeling_main.py:990)
    # perf opt-in: stack the same-shape MT+ISP student forwards (and the 3
    # teacher forwards) into ONE batched forward each. Changes per-stream
    # BatchNorm semantics (batch stats pool over all streams), so it is OFF
    # for reference-parity training and ON for throughput runs.
    fused_streams: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Filesystem layout of feature dumps; mirrors config.py:6-42 but rooted
    at a configurable directory."""
    dataset_root: str = "dataset/ENA"
    synth_root: str = "dataset/SYN"
    feature_subdir: str = "preprocess_02_015"
    train_weak_subdir: str = "train_weak_preprocess_quarter_02_015"
    train_unlabeled_subdir: str = "train_unlabeled_preprocess_quarter_02_015"
    val_subdir: str = "val_preprocess_quarter_02_015"
    synth_feature_subdir: str = "preprocess"
    pseudo_label_tsv: str = "unlabel_in_domain_pseudo_weak_resNet.tsv"
    # ENA annotation cleanup (preprocess.py:123-150,186-193)
    merge_gap_s: float = 0.15
    min_event_dur_s: float = 0.2


@dataclasses.dataclass(frozen=True)
class Config:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    da: DAConfig = dataclasses.field(default_factory=DAConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    bird_list: Tuple[str, ...] = BIRD_LIST
    model_name: str = "bsed_tpu"
    median_window_s: float = 0.45
    # class-wise median windows (config.py:62); reference list has 10 entries
    # for 20 classes — cycled to cover all classes, matching its zip semantics.
    median_window_s_classwise: Tuple[float, ...] = (
        0.45, 0.45, 0.45, 0.45, 0.45, 2.7, 2.7, 2.7, 0.45, 2.7)

    @property
    def nclass(self) -> int:
        return len(self.bird_list)

    @property
    def n_frames(self) -> int:
        """Post-CNN frame count: 1255 // 4 = 313."""
        return self.audio.max_frames // self.model.pooling_time_ratio

    @property
    def out_nb_frames_1s(self) -> float:
        return self.audio.sr / self.audio.hop_size / self.model.pooling_time_ratio

    @property
    def median_window(self) -> int:
        """Fixed median window: max(int(0.45 * 31.37), 1) = 14."""
        return max(int(self.median_window_s * self.out_nb_frames_1s), 1)

    @property
    def median_window_classwise(self) -> Tuple[int, ...]:
        wins = [max(int(s * self.out_nb_frames_1s), 1)
                for s in self.median_window_s_classwise]
        # cycle to nclass entries
        return tuple(wins[i % len(wins)] for i in range(self.nclass))

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def config_to_dict(cfg: Config) -> dict:
    """JSON-serializable dict of the full config tree — written into each
    run's ``meta.json`` so checkpoints are SELF-DESCRIBING: eval/predict can
    rebuild the exact Config with no --preset flag, like the reference's
    TestModel.py rebuilding the model from checkpoint kwargs
    (/root/reference/src/TestModel.py:34-59)."""
    return dataclasses.asdict(cfg)


def _tupled(v):
    if isinstance(v, list):
        return tuple(_tupled(x) for x in v)
    return v


def config_from_dict(d: dict) -> Config:
    """Inverse of ``config_to_dict`` (tolerates missing keys — fields fall
    back to their defaults — and JSON's list-for-tuple round-trip)."""
    def build(cls, sub):
        kw = {f.name: _tupled(sub[f.name])
              for f in dataclasses.fields(cls) if f.name in sub}
        return cls(**kw)

    nested = {"audio": AudioConfig, "model": ModelConfig,
              "train": TrainConfig, "da": DAConfig, "data": DataConfig}
    kw = {}
    for f in dataclasses.fields(Config):
        if f.name not in d:
            continue
        if f.name in nested:
            kw[f.name] = build(nested[f.name], d[f.name] or {})
        else:
            kw[f.name] = _tupled(d[f.name])
    return Config(**kw)


def _cfg(model_name: str, *, model=None, train=None, da=None, **kw) -> Config:
    c = Config(model_name=model_name, **kw)
    if model:
        c = dataclasses.replace(c, model=dataclasses.replace(c.model, **model))
    if train:
        c = dataclasses.replace(c, train=dataclasses.replace(c.train, **train))
    if da:
        c = dataclasses.replace(c, da=dataclasses.replace(c.da, **da))
    return c


# ---------------------------------------------------------------------------
# Preset registry — one entry per reference training script (SURVEY.md §2.2).
# ---------------------------------------------------------------------------
PRESETS = {
    # main_baseline.py: supervised-on-SYN core; -mt/-ISP/-fpn add MT/SCT/FPN;
    # adaptation stage adds frame-CDAN discriminator pre-step. The lineage
    # imports config_baseline.py:97-99: adjust_lr=True, max_lr=1e-3.
    "baseline": _cfg("baseline",
                     train={"adjust_lr": True, "max_learning_rate": 1e-3}),
    "baseline_mt": _cfg("baseline_mt",
                        train={"mean_teacher": True, "pseudo_labels": True,
                               "adjust_lr": True, "max_learning_rate": 1e-3}),
    "baseline_mt_isp": _cfg("baseline_mt_isp",
                            train={"mean_teacher": True, "isp": True,
                                   "pseudo_labels": True, "adjust_lr": True,
                                   "max_learning_rate": 1e-3}),
    "baseline_fpn_mt_isp": _cfg("baseline_fpn_mt_isp",
                                model={"use_fpn": True},
                                train={"mean_teacher": True, "isp": True,
                                       "pseudo_labels": True,
                                       "adjust_lr": True,
                                       "max_learning_rate": 1e-3}),
    "baseline_adaptation": _cfg("baseline_adaptation",
                                train={"stage": "adaptation",
                                       "mean_teacher": True, "isp": True,
                                       "pseudo_labels": True,
                                       "adjust_lr": True,
                                       "max_learning_rate": 1e-3},
                                da={"mode": "cdan_frame", "level": "frame",
                                    "randomized_dim": 3130}),
    # main_baseline_ena.py: fully-supervised-on-ENA upper bound
    # (config_baseline_ena.py:97-99: adjust_lr=False, lr=1e-3).
    "baseline_ena": _cfg("baseline_ena",
                         train={"supervise_on": "real",
                                "max_learning_rate": 1e-3}),
    # main_scmt.py: MT + SCT with ADDA-style alternating update, adv_w=2.5;
    # aux optimizers at the constant construction lr (main_scmt.py:923-930;
    # the ×0.1 coupling never fires — adjust_lr=False in data/config.py:97).
    # normalize stays False: the script's scaler block references the
    # UNDEFINED cfg.syn_or_not (:783) and crashes before training at HEAD;
    # the preset models the pre-bit-rot trainable configuration without
    # normalization (pass normalize=True by hand to opt in).
    "scmt": _cfg("scmt",
                 train={"mean_teacher": True, "isp": True,
                        "cost_ramp": "exp_step", "time_shift_max": 32,
                        "isp_flavor": "scmt", "real_weak_bce": "none"},
                 # level "clip" is main_scmt.py's RUNNABLE adaptation: the
                 # frame default crashes at HEAD (Frame_Discriminator built
                 # with input_dim 256·20 vs 256-dim frame features, :740,
                 # :865) while Clip_Discriminator ignores input_dim (:867,
                 # CRNN.py:16-51); its clip labels are the degenerate
                 # all-target block (:276-278) and its confusion step
                 # subsets a fresh random half batch (:363-366)
                 da={"mode": "adda", "level": "clip", "adv_weight": 2.5,
                     "update_step": 2, "adda_disc_labels": "all_target",
                     "adda_confusion": "half"}),
    # main.py / main_origin.py: oldest lineage with ICT mixup (supervised
    # mixup + unlabeled mixup-consistency vs the EMA teacher, main.py:386-470);
    # aux optimizers at the constant construction lr (adjust_lr=False).
    # normalize=True: main.py is the ONE script with live dataset
    # normalization (scaler fit on train+syn, main.py:681-690; val uses a
    # val-fitted scaler, :696-699). main_origin.py itself crashes at HEAD
    # on the undefined cfg.syn_or_not (:620) — main.py is the preset's
    # runnable anchor.
    # The masked ICT epoch's runnable anchor is main_origin.py's train()
    # (ONE combined ¼weak+½unl+¼strong loader :173, masks live,
    # target_weak defined :316, params-only EMA :86-89) — main.py's own
    # masked branch is bit-rotted at HEAD (train_mt never defines
    # target_weak, :380 NameError) and its __main__ passes mask_weak=None
    # (:954), under which -ISP dies at :486. Pinned by tests/
    # test_reference_train_parity.py::test_origin_ict_epoch….
    "origin": _cfg("origin",
                   train={"mean_teacher": True, "isp": True, "mixup": True,
                          "cost_ramp": "exp_step", "time_shift_max": 32,
                          "normalize": True, "isp_flavor": "origin",
                          "ema_scope": "params",
                          "real_weak_bce": "none"},
                   # main.py's frame-level ADDA is the lineage's RUNNABLE
                   # one (Frame_Discriminator(input_dim=256), main.py:640):
                   # split domain labels (:234-237), FULL-batch confusion
                   # (:322-326 — the half-batch draw is dead), and the
                   # discriminator's built-in grad_reverse (CRNN.py:80-89,
                   # 104) NEGATES the confusion gradient into the encoder
                   da={"mode": "adda", "level": "frame", "adv_weight": 5.0,
                       "update_step": 2, "adda_disc_labels": "split",
                       "adda_confusion": "full"}),
    # main_scmt_ada_origin.py: the largest ADA variant — MT + SCT + ICT
    # mixup with per-step alternating discriminator/confusion updates on the
    # frame features (adv_w=2.5, update_step=1, :364-466), Adam main
    # optimizer (:1056-1060); aux optimizers at the constant construction
    # lr (adjust_lr=False, so the :279 coupling call never fires).
    # mixup is OFF: every mixup term in main_scmt_ada_origin.py is
    # commented out of the live sums (:558-560, :579-585, :619-624 — the
    # helpers exist at :128-150 but nothing calls them), unlike main.py.
    "scmt_ada_origin": _cfg("scmt_ada_origin",
                            train={"mean_teacher": True, "isp": True,
                                   "cost_ramp": "exp_step",
                                   "time_shift_max": 32,
                                   "isp_flavor": "scmt",
                                   "real_weak_bce": "none"},
                            # its DA block is DEAD at HEAD ((B,313,2)
                            # labels vs the 1-unit CRNN_GRL discriminator,
                            # :312-322 vs CRNN_GRL.py:116-140); written
                            # intent: split labels, per-step updates,
                            # syn-stream confusion vs flipped labels
                            da={"mode": "adda", "level": "frame",
                                "adv_weight": 2.5, "update_step": 1,
                                "adda_disc_labels": "split",
                                "adda_confusion": "syn_flipped"}),
    # main_scmt_ada.py: MT + DANN on clip features. Its scaler fit is dead
    # work — fitted on SYN (:748-754) but every transform gets None
    # (:756-768) — so normalize stays False.
    "scmt_ada": _cfg("scmt_ada",
                     train={"mean_teacher": True, "cost_ramp": "exp_step",
                            "time_shift_max": 32,
                            "isp_flavor": "scmt_ada",
                            "real_weak_bce": "none"},
                     da={"mode": "dann", "level": "clip"}),
    # main_scmt_ada_weak.py: MT + clip-CDAN + weak PL, SGD, joint backward.
    "scmt_ada_weak": _cfg("scmt_ada_weak",
                          train={"mean_teacher": True, "pseudo_labels": True,
                                 "optimizer": "sgd"},
                          da={"mode": "cdan", "level": "clip",
                              "joint_backward": True,
                              "randomized_dim": 8192}),
    # main_sct_ada_weak.py: SCT + DANN. mean_teacher is ON because
    # the script's runnable -ISP invocation passes the EMA twins (:975) and
    # then ADDS the MT weak/strong consistencies (:503) — the no-teacher
    # call (:980) with ISP crashes on the undefined consistency_cost
    # (:512), so "SCT-only" is unreachable at HEAD. The "sct" flavor keeps
    # the script's reduced ISP sum (no weak-freq term, no teacher shift
    # terms, single-term syn self consistency, :510-513) and the
    # real[:half] weak BCE (:419-423). Optimizers at HEAD: main = Adam at
    # default_learning_rate (:837-841, the SGD kwargs/line are commented),
    # aux = SGD(momentum .9, nesterov, wd 1e-4) (:835-845) — pinned by
    # tests/test_reference_train_parity.py::test_sct_ada_weak_epoch…
    "sct_ada_weak": _cfg("sct_ada_weak",
                         train={"isp": True, "mean_teacher": True,
                                "pseudo_labels": True,
                                "cost_ramp": "exp_step",
                                "isp_flavor": "sct",
                                "real_weak_bce": "half"},
                         da={"mode": "dann", "joint_backward": True,
                             "aux_optimizer": "sgd"}),
    # main_scmt_ada_weak_seperate.py: stage-2 resume with discriminator re-init.
    "scmt_ada_weak_separate": _cfg("scmt_ada_weak_separate",
                                   train={"mean_teacher": True,
                                          "pseudo_labels": True,
                                          "optimizer": "sgd",
                                          "stage": "adaptation"},
                                   da={"mode": "cdan", "level": "clip",
                                       "joint_backward": True}),
    # main_scmt_ada_weak_seperate_2_crnn.py: the dual-CRNN self-training
    # stage-2 script — Predictor_2 MLP head (:818), frame-CDAN-flavor loss
    # over weak preds + clip-flattened features in a discriminator pre-step
    # (:320-336, randomized_dim=3130 at :813), SGD.
    "scmt_ada_weak_separate_2crnn": _cfg(
        "scmt_ada_weak_separate_2crnn",
        model={"predictor_head": "mlp"},
        train={"mean_teacher": True, "pseudo_labels": True,
               "optimizer": "sgd", "stage": "adaptation"},
        da={"mode": "cdan_frame", "level": "frame",
            "randomized_dim": 3130}),
    # pseudo_labeling_main.py: CDAN with entropy conditioning; best on weak
    # F1. Its domain loss comes from the MAIN forwards' weak preds +
    # flattened features (:332-335), is added into the combined loss
    # (:524-525) and ONE backward steps the Adam main optimizer AND the SGD
    # disc optimizer (:566-571). Weak BCE uses the labeled real HALF in
    # both MT branches (:429-434). Pinned by tests/
    # test_reference_train_parity.py::test_pseudo_labeling_entropy_cdan….
    "pseudo_labeling": _cfg("pseudo_labeling",
                            train={"mean_teacher": True, "pseudo_labels": True,
                                   "real_weak_bce": "half",
                                   "best_metric": "weak_f1"},
                            da={"mode": "cdan", "entropy_conditioning": True,
                                "joint_backward": True,
                                "aux_optimizer": "sgd"}),
}


def get_config(preset: str = "baseline", **overrides) -> Config:
    cfg = PRESETS[preset]
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg
