"""Conditional (v2.0) quality run + class-fidelity evaluation.

Trains the conditional model on writer-labeled synthetic signatures, then
measures CLASS FIDELITY: for each writer c, FID(fake_c, real_c) should be
lower than FID(fake_c, real_OTHER) — i.e. conditioning steers generation
toward the right writer, not just any signature. One shared random-init
backbone for every measurement. Writes docs/examples/conditional.json.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

RUN = Path("/tmp/cond_quality")
N_WRITERS = 8
PER_WRITER = 1024      # showcase-scale data (8192 total): per-class FID is
                       # quality-dominated, so conditional needs the same
                       # data budget that got the unconditional run to 383
EPOCHS = 400


def train():
    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from siggan_tpu.data.synthetic import generate_labeled_dataset
    from siggan_tpu.train.trainer import GANTrainer

    images, labels = generate_labeled_dataset(N_WRITERS, PER_WRITER, 64, seed=21)
    print(f"dataset: {images.shape}, writers {N_WRITERS}", flush=True)
    # Round-3 recipe (VERDICT r2 #2): AC-GAN auxiliary classifier on top of
    # the projection head + per-class BN, class-balanced fake batches
    # (default), generator EMA for eval, 2x the round-2 schedule.
    cfg = TrainConfig(
        model=ModelConfig(num_classes=N_WRITERS, use_spectral_norm=True,
                          aux_classifier=True),
        optim=OptimConfig(d_lr=1e-4, g_lr=2e-4),
        aux_weight=0.5, ema_decay=0.999,
        epochs=EPOCHS, sample_interval=100, checkpoint_interval=10,
        fid_interval=10, fid_samples=512,
        checkpoint_dir=str(RUN / "checkpoints"),
        sample_dir=str(RUN / "samples"), log_dir=str(RUN / "logs"))
    tr = GANTrainer(cfg, images, labels=labels,
                    experiment_name="conditional_v2")
    tr.train()
    print("train done", flush=True)


def evaluate():
    import numpy as np

    from siggan_tpu.data.synthetic import generate_labeled_dataset
    from siggan_tpu.eval.fid import FIDScorer
    from siggan_tpu.infer.generate import load_session

    images, labels = generate_labeled_dataset(N_WRITERS, PER_WRITER, 64, seed=21)
    sess = load_session(str(RUN / "checkpoints"), "best")
    scorer = FIDScorer()
    per_class = {}
    n_gen = 512
    for c in range(N_WRITERS):
        fake_c = sess.sample(n_gen, seed=100 + c, batch_size=128, class_id=c)
        real_c = images[labels == c][:n_gen]
        real_other = images[labels != c]
        rs = np.random.RandomState(c)
        real_other = real_other[rs.permutation(len(real_other))[:n_gen]]
        fid_own = scorer.fid(real_c, fake_c)
        fid_other = scorer.fid(real_other, fake_c)
        per_class[c] = {"fid_own": fid_own, "fid_other": fid_other,
                        "steered": bool(fid_own < fid_other)}
        print(f"writer {c}: FID own {fid_own:.1f} vs other {fid_other:.1f} "
              f"{'OK' if fid_own < fid_other else 'MISS'}", flush=True)
    n_ok = sum(1 for v in per_class.values() if v["steered"])

    # Style-steering probe: per-writer foreground (ink) ratio is a strong
    # style signature (real writers span ~0.04-0.18). Correlation between
    # the per-class fake means and the per-class real means measures
    # whether class_id steers generation toward the right writer style —
    # it is robust to the overall residual quality gap that dominates
    # per-class FID (real own-half floor ~500 vs fake ~5000).
    from siggan_tpu.eval.stroke import calculate_foreground_ratio
    fr_real, fr_fake = [], []
    for c in range(N_WRITERS):
        fake_c = sess.sample(128, seed=200 + c, batch_size=128, class_id=c)
        fr_fake.append(calculate_foreground_ratio(fake_c)["mean"])
        fr_real.append(calculate_foreground_ratio(
            images[labels == c])["mean"])
    corr = float(np.corrcoef(fr_real, fr_fake)[0, 1])
    print(f"style steering: fg-ratio corr(real, fake | class) = {corr:.3f}",
          flush=True)

    out = {
        "recipe": f"conditional v2.0: {N_WRITERS} writers x {PER_WRITER}, "
                  f"SN+TTUR+AC-GAN(aux 0.5)+EMA, {EPOCHS} epochs, "
                  f"best-FID checkpoint (fid_interval=10)",
        "per_class": per_class,
        "classes_steered_by_fid": f"{n_ok}/{N_WRITERS}",
        "mean_fid_own": float(np.mean([v["fid_own"] for v in per_class.values()])),
        "mean_fid_other": float(np.mean([v["fid_other"] for v in per_class.values()])),
        "metric_control": "real writers ARE separable on this backbone "
                          "(own-half FID 400-600 vs other-mix 5k-12k)",
        "style_steering_fg_ratio_correlation": corr,
        "per_class_fg_ratio": {"real": fr_real, "fake": fr_fake},
        "verdict": ("class conditioning is LEARNED at the style level "
                    "(fg-ratio correlation) while per-class FID remains "
                    "dominated by the overall residual quality gap — "
                    "conditional fidelity at FID level needs longer "
                    "training; status stays 'experimental'"
                    if corr > 0.8 else
                    "class conditioning weak — see per-class numbers"),
    }
    Path("docs/examples/conditional.json").write_text(json.dumps(out, indent=2))
    print(json.dumps({k: v for k, v in out.items() if k != "per_class"},
                     indent=2), flush=True)


if __name__ == "__main__":
    if "--eval-only" not in sys.argv:
        train()
    evaluate()
