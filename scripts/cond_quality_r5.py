"""Conditional v2.0 quality wave (VERDICT r4 #4): close the 510-vs-266 gap.

The round-3 conditional winner (concat + projection-D) proved steering
(7/8 writers by random-init FID, 8/8 by verifier FID) but trained WITHOUT
the levers that got the unconditional showcase from 383 to 266: DiffAugment
(translation,cutout), linear LR decay, z=200, 600-epoch schedule with
fid_interval=5 best-checkpoint selection.  This wave applies them, with an
UNCONDITIONAL CONTROL on the SAME 8-writer mixture data so "conditioning
cost" is measured apples-to-apples (the raw 510-vs-266 comparison conflates
the data change with the conditioning change — round-3's uncond_control
already measured trainer-FID 389 on this data).

Arms (all concat+projection-D unless noted):
  uncond_ctl  num_classes=0 on the same labeled mixture — the yardstick
  core        + DiffAugment, TTUR, linear decay (z=100)
  z200        core with latent_dim=200 (the unconditional wave winner)
  acgan15     z200 + weak AC-GAN auxiliary head (aux_weight=0.15)

Eval per arm: P2048 overall FID (fake sampled with UNIFORM classes vs the
writer-mixture real set, 3 generation seeds, random-init backbone, same
protocol shape as the showcase) + the per-class steering battery
(conditional_eval.evaluate) for conditional arms.  Done-criterion from the
VERDICT: best conditional eval FID within ~1.3x of uncond_ctl on both
backbones with >=7/8 steering.

Usage: python scripts/cond_quality_r5.py --arm=core [--seed=42] [--eval-only]
       python scripts/cond_quality_r5.py --collect   # summarize all arms
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_WRITERS = 8
PER_WRITER = 1024
EPOCHS = 600

ARMS = {
    "uncond_ctl": dict(num_classes=0),
    "core": dict(),
    "z200": dict(latent=200),
    "acgan15": dict(latent=200, aux=True, aux_weight=0.15),
}


def run_dir(arm: str, seed: int) -> Path:
    return Path(f"/tmp/cond_r5_{arm}_s{seed}")


def train(arm: str, spec: dict, seed: int) -> None:
    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from siggan_tpu.data.synthetic import generate_labeled_dataset
    from siggan_tpu.train.trainer import GANTrainer

    out = run_dir(arm, seed)
    images, labels = generate_labeled_dataset(N_WRITERS, PER_WRITER, 64,
                                              seed=21)
    n_classes = spec.get("num_classes", N_WRITERS)
    cond = n_classes > 0
    cfg = TrainConfig(
        model=ModelConfig(num_classes=n_classes, use_spectral_norm=True,
                          latent_dim=spec.get("latent", 100),
                          g_conditioning="concat",
                          aux_classifier=spec.get("aux", False)),
        optim=OptimConfig(d_lr=1e-4, g_lr=2e-4, lr_schedule="linear",
                          lr_decay_start_frac=0.5),
        aux_weight=spec.get("aux_weight", 0.0),
        ema_decay=0.0,
        diffaugment="translation,cutout",
        augment_bulk=True,
        batch_size=64, epochs=EPOCHS, seed=seed,
        fid_interval=5, fid_samples=1024,
        sample_interval=0, checkpoint_interval=5,
        checkpoint_dir=str(out / "checkpoints"),
        sample_dir=str(out / "samples"), log_dir=str(out / "logs"),
        hflip=False)
    print(f"ARM {arm} seed={seed}: {spec}", flush=True)
    t0 = time.time()
    tr = GANTrainer(cfg, images, labels=labels if cond else None,
                    experiment_name=f"cond_r5_{arm}_s{seed}")
    tr.train()
    avail = tr.ckpt.available()
    bf = avail.get("best_fid")
    print(f"trained in {time.time() - t0:.0f}s; best "
          f"{avail.get('best')} trainer-fid="
          f"{'n/a' if bf is None else f'{bf:.1f}'}", flush=True)


def evaluate(arm: str, seed: int) -> dict:
    import numpy as np

    from siggan_tpu.data.synthetic import generate_labeled_dataset
    from siggan_tpu.eval.fid import FIDScorer, make_scorer
    from siggan_tpu.infer.generate import load_session

    out = run_dir(arm, seed)
    images, _labels = generate_labeled_dataset(N_WRITERS, PER_WRITER, 64,
                                               seed=21)
    images = np.asarray(images)
    rs = np.random.RandomState(0)
    real = images[rs.permutation(len(images))[:2048]]
    scorer = FIDScorer()
    half = rs.permutation(len(real))
    floor = scorer.fid(real[half[:1024]], real[half[1024:]])
    vb = Path("/tmp/verifier_backbone/verifier.pkl")
    scorer_v = make_scorer(f"verifier:{vb}") if vb.exists() else None

    sess = load_session(str(out / "checkpoints"), "best")
    fids, fids_v = [], []
    for es in (11, 22, 33):
        fake = sess.sample(2048, seed=es, batch_size=256)  # uniform classes
        fids.append(float(scorer.fid(real, fake)))
        if scorer_v is not None:
            fids_v.append(float(scorer_v.fid(real, fake)))
        print(f"[{arm} s{seed}] eval seed {es}: FID {fids[-1]:.1f}"
              + (f" verifier-FID {fids_v[-1]:.1f}" if fids_v else ""),
              flush=True)
    floor_v = (float(scorer_v.fid(real[half[:1024]], real[half[1024:]]))
               if scorer_v is not None else None)
    report = {
        "arm": arm, "spec": ARMS[arm], "train_seed": seed,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "protocol": "P2048 uniform-class fakes vs 8-writer mixture real",
        "fid_floor": floor, "fid_mean": float(np.mean(fids)),
        "fid_std": float(np.std(fids)), "fid_per_seed": fids,
        "x_floor": float(np.mean(fids) / floor),
        "verifier_fid_mean": (float(np.mean(fids_v)) if fids_v else None),
        "verifier_fid_floor": floor_v,
    }
    (out / "cond_quality_report.json").write_text(json.dumps(report, indent=2))
    print(f"ARM {arm} s{seed}: FID {report['fid_mean']:.1f}"
          f"±{report['fid_std']:.1f} ({report['x_floor']:.2f}x floor)",
          flush=True)
    return report


def collect() -> None:
    """Summarize every completed arm; compute conditioning-cost ratios."""
    import numpy as np  # noqa: F401

    rows = []
    for p in sorted(Path("/tmp").glob("cond_r5_*_s*/cond_quality_report.json")):
        rows.append(json.loads(p.read_text()))
    if not rows:
        print("no completed arms", flush=True)
        return
    base = [r for r in rows if r["arm"] == "uncond_ctl"]
    summary = {"arms": rows}
    if base:
        b = min(base, key=lambda r: r["fid_mean"])
        for r in rows:
            if r["arm"] != "uncond_ctl":
                r["x_uncond_ctl"] = r["fid_mean"] / b["fid_mean"]
                if r.get("verifier_fid_mean") and b.get("verifier_fid_mean"):
                    r["x_uncond_ctl_verifier"] = (
                        r["verifier_fid_mean"] / b["verifier_fid_mean"])
        summary["uncond_ctl_fid"] = b["fid_mean"]
    out = Path("docs/examples/cond_quality_wave.json")
    out.write_text(json.dumps(summary, indent=2))
    print(json.dumps([{k: r.get(k) for k in
                       ("arm", "train_seed", "fid_mean", "x_floor",
                        "x_uncond_ctl", "x_uncond_ctl_verifier")}
                      for r in rows], indent=2), flush=True)


def main() -> None:
    arm, seed, eval_only = "core", 42, False
    for a in sys.argv[1:]:
        if a.startswith("--arm="):
            arm = a.split("=", 1)[1]
        elif a.startswith("--seed="):
            seed = int(a.split("=", 1)[1])
        elif a == "--eval-only":
            eval_only = True
        elif a == "--collect":
            collect()
            return
    if not eval_only:
        train(arm, ARMS[arm], seed)
    evaluate(arm, seed)


if __name__ == "__main__":
    main()
