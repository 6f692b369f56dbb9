"""Round-4 quality attribution A/B (VERDICT r3 #4/#5).

The round-4 showcase retrain under the NEW defaults (rbg PRNG + bf16 Adam
moments + the round-4 exact-graph rewrites) landed at FID 408 vs round-3's
266 under the OLD defaults (threefry + f32 moments).  GAN training is
chaotic, so before blaming the defaults we need controlled arms: this
script trains the IDENTICAL showcase recipe (the recorded round-3 winner
``diffaug_tc_z200``: 600 epochs, 8192 images, TTUR, DiffAugment
translation+cutout, latent 200) with an explicit (rng_impl, moment_dtype,
train seed) triple and writes the multi-seed eval report into the run dir
— never into docs/examples.

Usage:
  python scripts/quality_ab_r4.py --rng=threefry --moments=float32 \
      --seed=42 --run-dir=/tmp/ab_tf_f32_s42 [--eval-only]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from showcase_search_r3 import VARIANTS

WINNER = "diffaug_tc_z200"


def main() -> None:
    rng_impl, moments, seed = "rbg", "bfloat16", 42
    run = Path("/tmp/quality_ab")
    eval_only = False
    for a in sys.argv[1:]:
        if a.startswith("--rng="):
            rng_impl = a.split("=", 1)[1]
        elif a.startswith("--moments="):
            moments = a.split("=", 1)[1]
        elif a.startswith("--seed="):
            seed = int(a.split("=", 1)[1])
        elif a.startswith("--run-dir="):
            run = Path(a.split("=", 1)[1])
        elif a == "--eval-only":
            eval_only = True

    import dataclasses

    import numpy as np

    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig

    def filt(cls, **kw):
        # Version-tolerant: arms also run in old-code worktrees whose
        # TrainConfig lacks newer fields (e.g. rng_impl at cfca7ef).
        names = {f.name for f in dataclasses.fields(cls)}
        dropped = sorted(set(kw) - names)
        if dropped:
            print(f"({cls.__name__} lacks {dropped} in this code version)",
                  flush=True)
        return cls(**{k: v for k, v in kw.items() if k in names})
    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.eval import lpips as lpips_mod
    from siggan_tpu.eval.evaluate import compute_metrics
    from siggan_tpu.eval.fid import FIDScorer
    from siggan_tpu.infer.generate import load_session

    spec = VARIANTS[WINNER]
    cfg = filt(TrainConfig,
        model=filt(ModelConfig, use_spectral_norm=True,
                          latent_dim=spec.get("latent", 100)),
        optim=filt(OptimConfig, d_lr=spec.get("d_lr", 1e-4), g_lr=2e-4,
                          lr_schedule=spec.get("lr", "constant"),
                          lr_decay_start_frac=spec.get("decay_start", 0.5),
                          moment_dtype=moments),
        ema_decay=spec.get("ema", 0.0),
        diffaugment=spec.get("diffaug", ""),
        augment_bulk=spec.get("bulk", True),
        n_critic=spec.get("n_critic", 1),
        batch_size=spec.get("batch_size", 64),
        epochs=spec.get("epochs", 600),
        seed=seed, rng_impl=rng_impl,
        fid_interval=10, fid_samples=1024,
        sample_interval=0, checkpoint_interval=10,
        checkpoint_dir=str(run / "checkpoints"),
        sample_dir=str(run / "samples"),
        log_dir=str(run / "logs"),
        hflip=False,
    )
    if not eval_only:
        from siggan_tpu.train.trainer import GANTrainer
        images = generate_dataset(spec.get("n", 8192), 64, seed=7)
        print(f"arm rng={rng_impl} moments={moments} seed={seed} "
              f"dataset={images.shape}", flush=True)
        tr = GANTrainer(cfg, images,
                        experiment_name=f"ab_{rng_impl}_{moments}_s{seed}")
        tr.train()
        avail = tr.ckpt.available()
        bf = avail.get("best_fid")
        print(f"best: {avail.get('best')} "
              f"fid={'n/a' if bf is None else f'{bf:.1f}'}", flush=True)

    real = generate_dataset(2048, 64, seed=7)
    scorer = FIDScorer()
    lpips_params = lpips_mod.init_params()
    rs = np.random.RandomState(0)
    half = rs.permutation(len(real))
    floor = scorer.fid(real[half[:1024]], real[half[1024:]])
    session = load_session(str(run / "checkpoints"), "best")
    fids, lps = [], []
    for es in (11, 22, 33):
        fake = session.sample(2048, seed=es, batch_size=256)
        m = compute_metrics(real, fake, scorer=scorer,
                            lpips_params=lpips_params,
                            lpips_backbone="random-init")
        fids.append(float(m["fid"]))
        lps.append(float(m.get("lpips_diversity", float("nan"))))
        print(f"eval seed {es}: FID {fids[-1]:.1f}", flush=True)
    report = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "arm": {"rng_impl": rng_impl, "moment_dtype": moments,
                "train_seed": seed, "recipe": WINNER},
        "fid_real_vs_real_floor": floor,
        "fid_mean": float(np.mean(fids)), "fid_std": float(np.std(fids)),
        "fid_per_seed": fids,
        "lpips_diversity_mean": float(np.mean(lps)),
    }
    (run / "ab_report.json").write_text(json.dumps(report, indent=2))
    print(f"ARM rng={rng_impl} moments={moments} seed={seed}: "
          f"FID {report['fid_mean']:.1f}±{report['fid_std']:.1f} "
          f"({report['fid_mean'] / floor:.2f}x floor)", flush=True)


if __name__ == "__main__":
    main()
