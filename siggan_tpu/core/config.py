"""Unified configuration tree.

The reference scatters configuration over four mechanisms (dataclasses,
argparse, env vars, an unread YAML registry — see
``/root/reference/src/train_vanilla_gan_signatures.py:39`` and SURVEY §5).
Here a single dataclass tree is the source of truth: it serializes into every
checkpoint and log as JSON, and every CLI builds one from flags.

Defaults mirror the reference recipe
(``train_vanilla_gan_signatures.py:63-91``): z=100, 64x64 grayscale, batch 64,
200 epochs, Adam(2e-4, betas=(0.5, 0.999)), one-sided label smoothing 0.9,
sample every 5 epochs / checkpoint every 10.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    return obj


@dataclass(frozen=True)
class ModelConfig:
    """Generator/discriminator architecture knobs.

    Parity: ``generator_vanilla_gan.py:97-163`` and
    ``discriminator_vanilla_gan.py:111-207``.
    """

    latent_dim: int = 100
    image_size: int = 64           # 64 or 128
    image_channels: int = 1
    base_features: int = 256       # generator stem width at 4x4
    # Conditional per-writer generation (the reference registry's v2.0 plan,
    # /root/reference/model_versions.yaml:74-97 — planned there, implemented
    # here). 0 = unconditional (v1.x). When > 0: G adds a learned per-class
    # embedding to z; D scores with a projection head (logit += <emb_y, feat>).
    num_classes: int = 0
    # How G consumes the class label (num_classes > 0):
    #   "full"       class-conditional BN affine + class embedding added to z
    #   "bn_only"    class-conditional BN affine only
    #   "embed_only" class embedding added to z only (plain BN)
    #   "concat"     one-hot label concatenated to z (classic cGAN, Mirza &
    #                Osindero 2014) — NO learnable conditioning params; the
    #                fc rows for the one-hot columns receive ordinary
    #                bounded gradients (the round-3 bisect measured every
    #                learnable-drift mechanism destabilizing training)
    #   "none"       G ignores y (bisect control)
    g_conditioning: str = "full"
    # Projection-discriminator class head (logit += <embed[y], feat>). Off =
    # D's adversarial logit is unconditional (classic AC-GAN shape when
    # aux_classifier is on).
    d_projection: bool = True
    # AC-GAN auxiliary classifier head on D (conditional models only): a
    # second linear head over the pre-classifier features predicting the
    # writer class. Trained with TrainConfig.aux_weight; strengthens class
    # steering beyond the projection head (Odena et al. 2017). Part of the
    # v2.0 conditional capability the reference registry plans
    # (/root/reference/model_versions.yaml:74-97).
    aux_classifier: bool = False
    use_spectral_norm: bool = False
    # Compute D's stride-2 conv INPUT gradients by 2x2 output-phase
    # decomposition (ops/conv.py:conv_s2p1_phase_dgrad) instead of the
    # autodiff input-dilated conv. Perf experiment knob; numerics identical
    # up to fp reassociation (tested).
    d_dgrad_phases: bool = False
    # Run D's first packed conv FORWARD in merged-tap matmul form
    # (ops/packed.py:conv3s1p1_matmul_both): K=36 contraction instead of a
    # Cin=4 conv. Perf experiment knob; same numerics class as above.
    d_conv1_matmul: bool = False
    # Custom VJP for G's matmul-form packed final conv
    # (ops/packed.py:conv3_mc_as_matmul_cvjp): one merged-tap tensor of the
    # output cotangent feeds both gradient dots instead of autodiff's
    # 9Q-channel pad-accumulate buffer. Same numerics class as the two knobs
    # above (fp reassociation only, tested). Default ON: measured 1.496 ->
    # 1.469 ms/step at 64px/b64/K=256 on TPU v5e (BASELINE.md round-3b).
    g_final_cvjp: bool = True
    # Build ALL packed generator-tail kernels in one Pallas launch
    # (ops/packed.py:pack_tail_kernels_pallas) instead of ~50 strided-slice
    # micro-fusions of ~2.2 us each. Backward is the identical XLA
    # transpose; forward equality tested. Default ON: measured 1.469 ->
    # 1.430 ms/step at 64px/b64/K=256 on TPU v5e (BASELINE.md round-3b).
    g_pack_pallas: bool = True
    # Adjoint-form backward for every generator ConvTranspose
    # (ops/conv.py:convt_adjoint_dgrad): dx as a plain strided conv and dw
    # through its reversal-free wgrad, instead of the autodiff transpose of
    # the input-dilated forward — which leaves XLA a window-reversal it must
    # materialize as reverse(dy) over the full activation cotangent plus an
    # un-fusable add pass. Same numerics class as the knobs above (fp
    # reassociation only, tested). Default ON: measured 1.306 -> 1.284
    # ms/step (-22 us) at 64px/b64/K=512 on TPU v5e (BASELINE.md round-4).
    # NOTE: all three custom-VJP knobs (this, g_final_cvjp, d_dgrad_phases)
    # make their op reverse-mode-only — jvp raises when on.
    g_convt_cvjp: bool = True
    dropout: float = 0.25          # discriminator Dropout2d rate
    leaky_slope: float = 0.2
    # Generator activation for the ablation grid ("relu" | "leaky_relu"),
    # mirroring ConfigurableGenerator (ablation_vanilla_gan_signatures.py:216).
    g_activation: str = "relu"

    def __post_init__(self):
        # Fail at construction, not silently at apply time: an unknown
        # g_conditioning would otherwise fall through every branch and
        # train an UNCONDITIONAL generator under a conditional recipe.
        valid = ("full", "bn_only", "embed_only", "concat", "none")
        if self.g_conditioning not in valid:
            raise ValueError(f"g_conditioning must be one of {valid}, "
                             f"got {self.g_conditioning!r}")
        if self.g_activation not in ("relu", "leaky_relu"):
            raise ValueError("g_activation must be 'relu' or 'leaky_relu', "
                             f"got {self.g_activation!r}")
        if self.aux_classifier and self.num_classes == 0:
            # e.g. --aux_weight without --num_classes: the aux head would
            # silently never be built and the requested loss would be a
            # no-op for the whole run.
            raise ValueError("aux_classifier requires num_classes > 0 "
                             "(set num_classes / pass --num_classes)")


@dataclass(frozen=True)
class OptimConfig:
    g_lr: float = 2e-4
    d_lr: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    gradient_clip_value: Optional[float] = None  # global-norm clip, None = off
    # Learning-rate schedule over the whole run (both nets): "constant"
    # (reference semantics — its scripts mutate LR only by hand via
    # set_learning_rates), "linear" or "cosine" decay. Decay starts at
    # lr_decay_start_frac of total steps and ends at lr_end_frac * lr.
    # Schedules are step-indexed inside the jitted scan (optax schedule in
    # the Adam chain), so they cost nothing at dispatch time.
    lr_schedule: str = "constant"
    lr_decay_start_frac: float = 0.5
    lr_end_frac: float = 0.0
    # Total optimizer steps the schedule spans. 0 = "fill me in": GANTrainer
    # sets it to epochs * steps_per_epoch at construction (and the value is
    # serialized into checkpoints, so resume keeps the same schedule).
    # Required > 0 when lr_schedule != "constant" and building states by
    # hand.
    lr_total_steps: int = 0
    # Adam moment storage dtype. "bfloat16" halves the optimizer state's HBM
    # traffic (the moments are read+written every step); the moment MATH is
    # still f32 (upcast, update, downcast) and params stay f32 master
    # weights. Equivalence to f32 moments is tested statistically
    # (tests/test_ema_acgan.py). Default bfloat16: on the current graph the
    # biggest wgrad+Adam fusion sits AT the f32 p+m+v HBM floor, and bf16
    # moments measured -14 us/step at 64px/b64 (an earlier, differently-
    # fused graph measured the opposite — see BASELINE.md round-3 notes).
    # Set "float32" for bit-level optimizer-state compatibility with torch.
    moment_dtype: str = "bfloat16"


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for data-parallel training over ICI.

    The reference is single-device (SURVEY §2.2); DP over a 1-D ``data`` axis
    is a first-class capability of this framework. ``model_axis`` is reserved
    for future tensor sharding at 128/256px scale.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    num_data: int = -1   # -1 = all visible devices
    num_model: int = 1


@dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    batch_size: int = 64          # GLOBAL batch (sharded over the data axis)
    epochs: int = 200
    label_smoothing: float = 0.9
    n_critic: int = 1
    # Fast mode with the reference's ABLATION-trainer semantics
    # (ablation_vanilla_gan_signatures.py:434,444): one latent batch per
    # iteration, D trains on the detached fakes, G reuses them through the
    # updated D — saving a full generator forward per step. Default OFF:
    # the faithful main-trainer recipe draws fresh noise per sub-step.
    share_fakes: bool = False
    # Merge the iteration's n_critic+1 generator forwards (one per D step +
    # one for the G step — all under the SAME G params) into one grouped
    # batch with per-group BatchNorm statistics. Numerically exact vs the
    # sequential forwards (tests/test_train_step.py::test_fused_g_forwards_*):
    # each group normalizes with its own batch stats and the running-stat
    # update composes sequentially; the G gradient is recovered through the
    # merged VJP with zero cotangents on the stop-gradient groups. Default
    # OFF: measured SLOWER on TPU v5e at 64px/b64 (1.856 vs 1.508 ms/step,
    # K=256 A/B) — the merged VJP differentiates the D-step groups' forward
    # too (zero cotangents don't prune the shared-primal backward work), so
    # the saved re-indexing is swamped by a fatter backward graph. Kept as a
    # tested opt-in (exactness: test_fused_g_forwards_*); see BASELINE.md
    # round-3 dead ends.
    fuse_g_forwards: bool = False
    # DiffAugment (Zhao et al. 2020) policy applied to EVERY discriminator
    # input (reals and fakes, differentiable, fresh draws per step) — the
    # standard anti-D-overfitting lever for small datasets. "" = off
    # (reference-faithful); e.g. "color,translation,cutout". See
    # ops/diffaug.py for the packed-layout-exact policy definitions.
    diffaugment: str = ""
    seed: int = 42
    # PRNG bit-generator for every stream derived from `seed` ("rbg" |
    # "threefry2x32"). rbg = XLA's counter-based RngBitGenerator, one vector
    # pass per block vs threefry's 20 rounds: -40 us/step at 64px/b64 (z
    # noise, dropout, DiffAugment and the epoch shuffle/augment tables all
    # sample in the hot loop). Both are deterministic given (seed, step);
    # rbg streams are additionally tied to the (jax version, backend) pair,
    # so pick threefry2x32 when bit-identical replays across versions matter
    # more than speed. Runs resumed from pre-knob checkpoints continue under
    # rbg (a reseed, not a semantic change).
    rng_impl: str = "rbg"

    # Numerics: params kept in f32; matmul/conv compute in bf16 on TPU when
    # enabled (MXU-native), losses and BN statistics always f32.
    compute_dtype: str = "bfloat16"
    # Per-step gradient-norm metrics (d_grad_norm/g_grad_norm). These are an
    # addition over the reference's metric set and cost full extra reads of
    # every gradient tensor each step (~0.05 ms at 64px/b64); off by default,
    # flip on when debugging training dynamics.
    log_grad_norms: bool = False
    # Train with images in 2x2 space-to-depth form (N,H/2,W/2,4), folding the
    # repack into G's final / D's first conv — mathematically exact (see
    # ops/packed.py) and removes every C=1 tensor from the hot graph, which
    # TPU layouts handle at ~1/16 utilization. Applies only to 1-channel
    # models; flip off to debug against the canonical pixel-space graph.
    packed_io: bool = True
    # Use fused Pallas kernels for hot blocks where available. Default OFF:
    # measured on TPU v5e at 64px the XLA pipeline beats the hand-fused
    # kernels (see ops/pallas/generator_fwd.py MEASURED VERDICT); flip on for
    # experiments or larger-shape variants where fusion wins.
    use_pallas: bool = False

    # Cadence (reference: sample_interval=5, checkpoint_interval=10).
    sample_interval: int = 5
    checkpoint_interval: int = 10
    fixed_noise_samples: int = 64

    # Quality-tracked "best" checkpoint. The reference tracks best-G-loss
    # (train_vanilla_gan_signatures.py:598), but adversarial G loss is not a
    # quality signal; when fid_interval > 0 the trainer scores a relative FID
    # (random-backbone InceptionV3, fixed eval noise, vs fid_samples training
    # reals) every fid_interval epochs and the checkpoint "best" alias
    # follows lowest FID instead. 0 = off (reference-faithful best-G-loss).
    fid_interval: int = 0
    fid_samples: int = 512

    # Generator weight EMA for evaluation (decay per step; 0 = off). The
    # training path keeps updating the raw weights; sampling, FID scoring
    # and checkpointed "best" selection use the EMA shadow (params + BN
    # running stats). Standard GAN practice with large FID gains on DCGANs;
    # the reference has no equivalent (pure addition).
    ema_decay: float = 0.0

    # AC-GAN auxiliary classification loss weight (requires
    # model.num_classes > 0 and model.aux_classifier). D learns to classify
    # the writer of real AND fake samples; G is rewarded for fakes the
    # classifier assigns to their conditioned class (Odena et al. 2017).
    aux_weight: float = 0.0

    # Whether D's auxiliary loss also classifies FAKE samples by their
    # conditioned label (Odena et al. 2017 does; much follow-up work drops
    # it because rewarding D for classifying junk as the intended class
    # removes the pressure on G to make classes distinct and measurably
    # hurts per-class fidelity). G's aux term is unaffected.
    aux_d_on_fakes: bool = False

    # Class-balanced fake batches for conditional training: draw each
    # step's fake labels as a random permutation of a balanced label set
    # instead of iid uniform — every class gets gradient signal every step.
    class_balanced_fakes: bool = True

    # Mode-collapse detector (train_vanilla_gan_signatures.py:104-165).
    mode_collapse_threshold: float = 0.1
    mode_collapse_window: int = 50

    # Paths.
    data_dir: str = ""
    checkpoint_dir: str = "./checkpoints"
    sample_dir: str = "./samples"
    log_dir: str = "./logs"

    # Data pipeline. resident_data keeps the whole dataset in HBM and selects
    # batches on device (zero per-step H2D); falls back to the streaming
    # loader automatically when the dataset exceeds resident_max_mb.
    augment: bool = True
    # Resident path: hoist augmentation out of the per-step body — augment
    # (and space-to-depth-pack) the whole resident dataset once per EPOCH
    # with one key per epoch (same per-image per-epoch cadence as the
    # per-step form and as the reference's DataLoader transforms), so the
    # scan body's warp/convert/pack ops (measured ~52 us/step at 64px/b64,
    # 32-50 GiB/s — the worst-laid-out ops in the whole step) disappear into
    # one full-lane bulk pass. Falls back to in-step augmentation when the
    # augmented window table would not fit resident_max_mb.
    augment_bulk: bool = True
    hflip: bool = False
    prefetch: int = 2
    resident_data: bool = True
    resident_max_mb: int = 4096
    # Device-side training loop: steps per dispatch (lax.scan). 0 = auto —
    # the largest divisor of steps_per_epoch <= 64, or whole-epoch dispatch
    # when no useful divisor exists (prime steps_per_epoch). 1 = one
    # dispatch per step (reference-like per-batch host control, finest
    # stop-file granularity). Explicit values must divide steps_per_epoch
    # (the trainer validates; the bench calls make_resident_multi_step
    # directly for multi-epoch windows).
    scan_steps: int = 0

    # Observability: when set, the trainer captures a jax.profiler trace of
    # the first post-warmup epoch into this directory (view with
    # tensorboard / xprof). SURVEY §5: the reference has no tracing at all.
    profile_dir: str = ""

    def to_dict(self) -> Dict[str, Any]:
        return _asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        # Unknown keys are dropped at EVERY level (not just the top), so a
        # sidecar config.json written by a build with extra/renamed fields
        # still loads — checkpoints must outlive field churn.
        def known_only(dc_cls, sub: Dict[str, Any]) -> Dict[str, Any]:
            names = {f.name for f in dataclasses.fields(dc_cls)}
            return {k: v for k, v in sub.items() if k in names}

        d = dict(d)
        model = ModelConfig(**known_only(ModelConfig, d.pop("model", {})))
        optim = OptimConfig(**known_only(OptimConfig, d.pop("optim", {})))
        mesh = MeshConfig(**known_only(MeshConfig, d.pop("mesh", {})))
        d = known_only(cls, d)
        return cls(model=model, optim=optim, mesh=mesh, **d)

    @classmethod
    def from_json(cls, s: str) -> "TrainConfig":
        return cls.from_dict(json.loads(s))

    def replace(self, **kw: Any) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
