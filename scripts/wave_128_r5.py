"""Round-5 128px recipe wave (VERDICT r4 #3): push the v1.1 quality bar.

The tuned 128px recipe (docs/baseline/drive_128.json, commit 7306ec0)
measures FID 531.3 = 2.14x its P1024 floor — under the declared 3x bar.
This wave applies the 64px levers that were never tried at 128px, each a
single cheap run (~3-8 min on one v5e chip at 8.8k img/s):

  control   the committed tuned recipe re-run under shipped defaults
            (rbg PRNG, bf16 Adam moments, round-4/5 graph) — the yardstick
  z200      latent_dim=200 (the 64px showcase-search winner, never applied
            at 128px)
  long600   600 epochs, linear decay over the second half (the v1.1 plan
            prescribes 300 "plus tuning"; the 64px winner trains 600)
  n16k      16384 training images (data scale was the measured binding
            lever in the round-3 128px search: 758 -> 611 trainer-FID)
  z200_long z200 + 600 epochs (combination of the two winners, if both
            help individually)

All arms: 128px, spectral norm, TTUR (d_lr 1e-4), linear decay,
DiffAugment translation+cutout, batch 64, fid_interval=5 best-checkpoint
selection (120 candidates).  Eval = the drive_128 protocol (P1024, 3
generation seeds) inline; the WINNER is then re-scored by
scripts/drive_128.py --run-dir (which adds the bias-reduced P8192 block)
and published to docs/baseline/drive_128.json.

Usage: python scripts/wave_128_r5.py --arm=z200 [--seed=42] [--eval-only]
       python scripts/wave_128_r5.py --collect
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ARMS = {
    "control": dict(),
    "z200": dict(latent=200),
    "long600": dict(epochs=600),
    "n16k": dict(n=16384),
    "z200_long": dict(latent=200, epochs=600),
    "z200_long_n16k": dict(latent=200, epochs=600, n=16384),
}


def run_dir(arm: str, seed: int) -> Path:
    return Path(f"/tmp/wave128_{arm}_s{seed}")


def main() -> None:
    arm, seed, eval_only = "control", 42, False
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
    spec = ARMS[arm]
    out = run_dir(arm, seed)

    import numpy as np

    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.eval import lpips as lpips_mod
    from siggan_tpu.eval.fid import FIDScorer
    from siggan_tpu.infer.generate import load_session

    n_img = spec.get("n", 8192)
    cfg = TrainConfig(
        model=ModelConfig(image_size=128, use_spectral_norm=True,
                          latent_dim=spec.get("latent", 100)),
        optim=OptimConfig(d_lr=1e-4, g_lr=2e-4, lr_schedule="linear",
                          lr_decay_start_frac=0.5),
        diffaugment="translation,cutout",
        augment_bulk=True,
        ema_decay=0.0,
        batch_size=64,
        epochs=spec.get("epochs", 300),
        seed=seed,
        fid_interval=5, fid_samples=512,
        sample_interval=0, checkpoint_interval=5,
        checkpoint_dir=str(out / "checkpoints"),
        sample_dir=str(out / "samples"), log_dir=str(out / "logs"),
        hflip=False)
    if not eval_only:
        from siggan_tpu.train.trainer import GANTrainer
        images = generate_dataset(n_img, 128, seed=7)
        print(f"ARM {arm} seed={seed}: {spec}", flush=True)
        t0 = time.time()
        tr = GANTrainer(cfg, images, experiment_name=f"wave128_{arm}_s{seed}")
        tr.train()
        avail = tr.ckpt.available()
        bf = avail.get("best_fid")
        print(f"trained in {time.time() - t0:.0f}s; best "
              f"{avail.get('best')} trainer-fid="
              f"{'n/a' if bf is None else f'{bf:.1f}'}", flush=True)

    # Inline P1024 eval (drive_128's protocol: 1024/side, 3 gen seeds).
    real = generate_dataset(1024, 128, seed=7)
    scorer = FIDScorer()
    lp = lpips_mod.init_params()
    rs = np.random.RandomState(0)
    half = rs.permutation(len(real))
    floor = scorer.fid(real[half[:512]], real[half[512:]])
    session = load_session(str(out / "checkpoints"), "best")
    fids, lps = [], []
    for es in (11, 22, 33):
        fake = session.sample(1024, seed=es, batch_size=128)
        fids.append(float(scorer.fid(real, fake)))
        lps.append(float(lpips_mod.diversity(lp, fake[:100])))
        print(f"eval seed {es}: FID {fids[-1]:.1f}", flush=True)
    report = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "arm": arm, "spec": spec, "train_seed": seed, "n_images": n_img,
        "fid_real_vs_real_floor": floor,
        "fid_mean": float(np.mean(fids)), "fid_std": float(np.std(fids)),
        "fid_per_seed": fids, "fid_worst": float(max(fids)),
        "worst_x_floor": float(max(fids) / floor),
        "lpips_diversity_mean": float(np.mean(lps)),
    }
    (out / "wave_report.json").write_text(json.dumps(report, indent=2))
    print(f"ARM {arm} s{seed}: FID {report['fid_mean']:.1f}"
          f"±{report['fid_std']:.1f}, worst {max(fids):.1f} = "
          f"{max(fids) / floor:.2f}x floor", flush=True)


def collect() -> None:
    rows = []
    for p in sorted(Path("/tmp").glob("wave128_*_s*/wave_report.json")):
        rows.append(json.loads(p.read_text()))
    out = Path("docs/baseline/wave_128_r5.json")
    out.write_text(json.dumps({
        "wave": "round-5 128px recipe wave (scripts/wave_128_r5.py)",
        "eval_protocol": "P1024: 3 generation seeds x 1024 vs 1024 real, "
                         "random-init backbone (drive_128 protocol)",
        "arms": rows}, indent=2))
    print(json.dumps([{k: r.get(k) for k in
                       ("arm", "train_seed", "fid_mean", "fid_std",
                        "worst_x_floor")} for r in rows], indent=2),
          flush=True)


if __name__ == "__main__":
    main()
