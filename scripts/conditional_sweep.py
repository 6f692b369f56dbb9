"""Conditional v2.0 ablation sweep: WHERE does conditional training lose
quality vs the unconditional showcase?

Unconditional SN+TTUR reaches trainer-FID ~500-600 by epoch 60 on 8192
diverse images; the conditional run on 8x1024 writer-labeled images starts
at 220k and only reaches ~4100 after 400 epochs. This sweep isolates the
component responsible, one variant per knob (all 400 epochs, SN+TTUR, EMA,
fid_interval 10, best-FID tracking):

  uncond_control  labeled data, num_classes=0   -> is the DATA harder?
  proj_only       projection D + cond BN, no aux -> is conditioning itself?
  acgan_real      + aux 0.5, D-aux on reals only -> is the aux task?
  acgan_weak      + aux 0.15, reals only         -> or just its weight?

Each run is ~3-4 min on TPU v5e at ~32k img/s. Reports best trainer-FID per
variant (same 512-sample EMA protocol for every variant).
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_WRITERS = 8
PER_WRITER = 1024
EPOCHS = 400

VARIANTS = {
    "uncond_control": dict(num_classes=0, aux=False, aux_weight=0.0),
    "proj_only": dict(num_classes=N_WRITERS, aux=False, aux_weight=0.0),
    "acgan_real": dict(num_classes=N_WRITERS, aux=True, aux_weight=0.5),
    "acgan_weak": dict(num_classes=N_WRITERS, aux=True, aux_weight=0.15),
    # --- round-3b bisects: G-side vs D-side conditioning cost ---
    # D fully unconditional; G conditioned (if quality ~uncond_control, the
    # projection D is the quality problem; steering pressure absent though)
    "g_only": dict(num_classes=N_WRITERS, aux=False, aux_weight=0.0,
                   model=dict(d_projection=False)),
    # classic AC-GAN: unconditional adversarial D + aux classifier only
    "acgan_classic": dict(num_classes=N_WRITERS, aux=True, aux_weight=0.5,
                          model=dict(d_projection=False)),
    # projection D, G conditioned via z-embedding only (plain BN)
    "proj_embedonly": dict(num_classes=N_WRITERS, aux=False, aux_weight=0.0,
                           model=dict(g_conditioning="embed_only")),
    # projection D, G conditioned via per-class BN only (no z shift)
    "proj_bnonly": dict(num_classes=N_WRITERS, aux=False, aux_weight=0.0,
                        model=dict(g_conditioning="bn_only")),
    # --- round-3c: drift-free conditioning + implementation control ---
    # The 3b bisect: EVERY learnable conditioning mechanism (embed z-shift,
    # per-class BN, projection head) collapses quality around epoch 10-30
    # while uncond_control trains fine to 389 — pointing at parameter-table
    # drift (8 samples/class/batch through Adam), not at the data or the
    # conditioning signal. One-hot CONCAT to z has no learnable conditioning
    # params at all: the fc one-hot columns get ordinary bounded gradients.
    "concat_only": dict(num_classes=N_WRITERS, aux=False, aux_weight=0.0,
                        model=dict(g_conditioning="concat",
                                   d_projection=False)),
    "concat_proj": dict(num_classes=N_WRITERS, aux=False, aux_weight=0.0,
                        model=dict(g_conditioning="concat")),
    "concat_acgan": dict(num_classes=N_WRITERS, aux=True, aux_weight=0.5,
                         model=dict(g_conditioning="concat",
                                    d_projection=False)),
    # full conditioning machinery but every label identical — isolates the
    # mechanism's implementation cost from multi-class learning difficulty
    "labels_const": dict(num_classes=N_WRITERS, aux=False, aux_weight=0.0,
                         const_labels=True),
}


def run(name: str, spec: dict) -> dict:
    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from siggan_tpu.data.synthetic import generate_labeled_dataset
    from siggan_tpu.train.trainer import GANTrainer

    out = Path(f"/tmp/cond_sweep/{name}")
    images, labels = generate_labeled_dataset(N_WRITERS, PER_WRITER, 64,
                                              seed=21)
    if spec.get("const_labels"):
        import jax.numpy as jnp
        labels = jnp.zeros_like(labels)
    cond = spec["num_classes"] > 0
    cfg = TrainConfig(
        model=ModelConfig(num_classes=spec["num_classes"],
                          use_spectral_norm=True,
                          aux_classifier=spec["aux"],
                          **spec.get("model", {})),
        optim=OptimConfig(d_lr=1e-4, g_lr=2e-4),
        # ema_decay=0: the round-3 EMA A/B measured EMA-eval ~20% WORSE
        # than raw weights late in training (BASELINE.md); round-3b variants
        # (incl. the uncond_control rerun) all use raw-weight FID.
        aux_weight=spec["aux_weight"], ema_decay=0.0,
        epochs=EPOCHS, sample_interval=0, checkpoint_interval=10,
        fid_interval=10, fid_samples=512,
        checkpoint_dir=str(out / "checkpoints"),
        sample_dir=str(out / "samples"), log_dir=str(out / "logs"))
    tr = GANTrainer(cfg, images, labels=labels if cond else None,
                    experiment_name=f"cond_sweep_{name}")
    tr.train()
    avail = tr.ckpt.available()
    res = {"variant": name, "best_fid": avail.get("best_fid"),
           "best_epoch": avail.get("best")}
    bf = res["best_fid"]
    print(f"[sweep] {name}: best trainer-FID "
          f"{'n/a' if bf is None else f'{bf:.1f}'} "
          f"@ {res['best_epoch']}", flush=True)
    return res


def main() -> None:
    results = []
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        results.append(run(name, VARIANTS[name]))
    Path("/tmp/cond_sweep/results.json").write_text(
        json.dumps(results, indent=2))
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
