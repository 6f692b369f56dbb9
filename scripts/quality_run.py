"""The round-2 quality run (VERDICT r1 #4).

Trains the full reference recipe (200 epochs, 64px, batch 64) on a large
diverse synthetic signature set with FID-tracked best checkpoints, then
evaluates the BEST checkpoint with the multi-seed protocol and refreshes
docs/examples/ (report + grids).

Target (VERDICT): FID(fake) within ~2x of the real-vs-real floor and LPIPS
diversity > 0.05 on the same random-init backbone.
"""
from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

RUN = Path("/tmp/quality_run")
N_IMAGES = 8192
EPOCHS = 600


def _winning_spec():
    """Recipe = the measured winner of the round-3 showcase search
    (scripts/showcase_search_r3.py writes /tmp/showcase_r3/results.json);
    falls back to the lin_decay arm when no results exist."""
    import json as _json

    from showcase_search_r3 import VARIANTS
    res_path = Path("/tmp/showcase_r3/results.json")
    res = {}
    if res_path.exists():
        # results.json accumulates across reruns: skip null best_fid
        # (interrupted arms) and keep the BEST entry per variant.
        for r in _json.loads(res_path.read_text()):
            v, f = r.get("variant"), r.get("best_fid")
            if v in VARIANTS and f is not None and f < res.get(v, float("inf")):
                res[v] = f
    if res:
        winner = min(res, key=res.get)
        print(f"showcase search winner: {winner} "
              f"(trainer-FID {res[winner]:.1f})", flush=True)
    else:
        # The round-3 search's measured winner (recorded in
        # docs/examples/report.json "search_winner"); used when the /tmp
        # search results no longer exist on this host.
        winner = "diffaug_tc_z200"
        print("no search results; using the recorded round-3 winner "
              f"{winner}", flush=True)
    return winner, VARIANTS[winner]


def train():
    import numpy as np

    from siggan_tpu.core.config import TrainConfig
    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.train.trainer import GANTrainer

    from siggan_tpu.core.config import ModelConfig, OptimConfig

    global N_IMAGES
    winner, spec = _winning_spec()
    N_IMAGES = spec.get("n", N_IMAGES)
    images = generate_dataset(N_IMAGES, 64, seed=7)
    print(f"dataset: {images.shape}", flush=True)
    cfg = TrainConfig(
        model=ModelConfig(use_spectral_norm=True,
                          latent_dim=spec.get("latent", 100)),
        optim=OptimConfig(d_lr=spec.get("d_lr", 1e-4),  # TTUR (r2 winner)
                          g_lr=2e-4,
                          lr_schedule=spec.get("lr", "constant"),
                          lr_decay_start_frac=spec.get("decay_start", 0.5)),
        ema_decay=spec.get("ema", 0.0),
        diffaugment=spec.get("diffaug", ""),
        augment_bulk=spec.get("bulk", True),
        n_critic=spec.get("n_critic", 1),
        batch_size=spec.get("batch_size", 64),
        epochs=spec.get("epochs", EPOCHS),
        # Selection quality: 1024-sample in-training FID halves the
        # small-sample noise of the best-checkpoint pick (the search arms
        # stay at 512 so their trainer-FIDs remain cross-comparable).
        fid_interval=10, fid_samples=1024,
        sample_interval=20, checkpoint_interval=10,
        checkpoint_dir=str(RUN / "checkpoints"),
        sample_dir=str(RUN / "samples"),
        log_dir=str(RUN / "logs"),
        hflip=False,
    )
    tr = GANTrainer(cfg, images, experiment_name=f"quality_r3_{winner}")
    summary = tr.train()
    print(f"summary g_loss last={summary['g_loss']['last']:.3f}", flush=True)
    bf = tr.ckpt.available().get("best_fid")
    print(f"best: {tr.ckpt.available().get('best')} "
          f"fid={'n/a' if bf is None else f'{bf:.1f}'}", flush=True)


def evaluate():
    import time

    import numpy as np

    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.eval import lpips as lpips_mod
    from siggan_tpu.eval.evaluate import compute_metrics
    from siggan_tpu.eval.fid import FIDScorer
    from siggan_tpu.infer.export import contact_sheet
    from siggan_tpu.infer.generate import load_session

    out = Path("docs/examples")
    out.mkdir(parents=True, exist_ok=True)
    real = generate_dataset(2048, 64, seed=7)
    scorer = FIDScorer()
    lpips_params = lpips_mod.init_params()
    rs = np.random.RandomState(0)
    half = rs.permutation(len(real))
    floor = scorer.fid(real[half[:1024]], real[half[1024:]])
    noise = rs.rand(1024, 64, 64, 1).astype(np.float32) * 2 - 1
    ceiling = scorer.fid(real[:1024], noise)
    print(f"floor {floor:.1f} noise {ceiling:.1f}", flush=True)

    session = load_session(str(RUN / "checkpoints"), "best")
    fids, lps, metrics = [], [], None
    for seed in (11, 22, 33):
        fake = session.sample(2048, seed=seed, batch_size=256)
        metrics = compute_metrics(real, fake, scorer=scorer,
                                  lpips_params=lpips_params,
                                  lpips_backbone="random-init")
        fids.append(float(metrics["fid"]))
        lps.append(float(metrics.get("lpips_diversity", float("nan"))))
        print(f"seed {seed}: FID {fids[-1]:.1f} LPIPS {lps[-1]:.4f}",
              flush=True)
    # Bias-reduced P8192 protocol alongside the historical P2048 (round-4
    # eval-protocol analysis, docs/examples/eval_protocol.json: the P2048
    # floor is mostly finite-sample bias; 4x samples cut eval-seed std
    # 18.7 -> 5.2). P2048 stays the headline for cross-round comparability.
    p8192 = None
    if "--skip-p8192" not in sys.argv:
        real8 = generate_dataset(8192, 64, seed=7)
        half8 = rs.permutation(len(real8))
        floor8 = scorer.fid(real8[half8[:4096]], real8[half8[4096:]])
        fids8 = []
        for seed in (11, 22, 33):
            fake8 = session.sample(8192, seed=seed, batch_size=256)
            fids8.append(float(scorer.fid(real8, fake8)))
            print(f"P8192 seed {seed}: FID {fids8[-1]:.1f}", flush=True)
        p8192 = {
            "n_per_side": 8192, "floor": floor8,
            "fid_per_seed": fids8, "fid_mean": float(np.mean(fids8)),
            "fid_std": float(np.std(fids8)),
            "worst_x_floor": float(max(fids8) / floor8),
        }
    # Re-derive the winner here (not the N_IMAGES global, which only
    # train() updates) so --eval-only reports the dataset size the winning
    # recipe actually trained on.  --wave-arm=<arm> instead reports a
    # round-4/5 wave arm's recipe (scripts/showcase_wave_r4.py ARMS) when
    # the evaluated --run-dir is a wave checkpoint.
    wave_arm = next((a.split("=", 1)[1] for a in sys.argv
                     if a.startswith("--wave-arm=")), None)
    if wave_arm:
        from showcase_wave_r4 import ARMS
        spec = dict(ARMS[wave_arm])
        spec.setdefault("n", 8192)
        spec.setdefault("epochs", 600)
        spec["latent"] = spec.get("latent", 200)  # wave arms fix z=200
        winner = f"wave:{wave_arm}"
    else:
        winner, spec = _winning_spec()
    report = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "recipe": {"epochs": spec.get("epochs", EPOCHS),
                   "n_images": spec.get("n", N_IMAGES),
                   "search_winner": winner,
                   "checkpoint": ("best (lowest trainer-FID, fid_interval="
                                  f"{5 if wave_arm else 10})")},
        "fid_real_vs_real_floor": floor,
        "fid_real_vs_noise_control": ceiling,
        "fid_mean": float(np.mean(fids)), "fid_std": float(np.std(fids)),
        "fid_per_seed": fids,
        "lpips_diversity_mean": float(np.mean(lps)),
        "protocol_p8192": p8192,
        "metrics": metrics,
    }
    (out / "report.json").write_text(json.dumps(report, indent=2))
    contact_sheet(fake[:64], out / "fake_grid.png")
    contact_sheet(real[:64], out / "real_grid.png")
    grids = sorted((RUN / "samples").glob("epoch_*.png"))
    if grids:   # sweep runs set sample_interval=0 (no grids)
        shutil.copy(grids[-1], out / "progress_final.png")
    print(f"FID {report['fid_mean']:.1f}±{report['fid_std']:.1f} "
          f"(floor {floor:.1f}, {report['fid_mean']/floor:.2f}x) "
          f"LPIPS {report['lpips_diversity_mean']:.4f}", flush=True)


if __name__ == "__main__":
    for a in sys.argv[1:]:
        if a.startswith("--run-dir="):
            RUN = Path(a.split("=", 1)[1])
    if "--eval-only" not in sys.argv:
        train()
    evaluate()
