"""Recipe search for the quality run (VERDICT r1 #4): try the stability
knobs the reference itself exposes (spectral norm = its v1.1 plan,
n_critic, per-net LR) and report each run's best relative FID. Also
measures the REAL set's LPIPS self-diversity on the random backbone — the
honest ceiling for generator diversity numbers on this backbone.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_IMAGES = 8192
EPOCHS = 200


def run(tag, **kw):
    import dataclasses

    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.train.trainer import GANTrainer

    images = generate_dataset(N_IMAGES, 64, seed=7)
    run_dir = Path(f"/tmp/recipe_{tag}")
    model_kw = kw.pop("model", {})
    optim_kw = kw.pop("optim", {})
    cfg = TrainConfig(
        model=ModelConfig(**model_kw), optim=OptimConfig(**optim_kw),
        epochs=EPOCHS, fid_interval=10, fid_samples=512,
        sample_interval=50, checkpoint_interval=10,
        checkpoint_dir=str(run_dir / "checkpoints"),
        sample_dir=str(run_dir / "samples"),
        log_dir=str(run_dir / "logs"), **kw)
    tr = GANTrainer(cfg, images, experiment_name=f"recipe_{tag}")
    tr.train()
    idx = tr.ckpt.available()
    fids = [m.get("fid") for m in tr.logger.metrics if "fid" in m]
    bf = idx.get("best_fid")
    print(f"RESULT {tag}: best_fid={'n/a' if bf is None else f'{bf:.1f}'} "
          f"at epoch {idx.get('best')} (fid trail: "
          f"{[round(f, 1) for f in fids]})", flush=True)
    return idx.get("best_fid")


def real_lpips_context():
    import numpy as np

    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.eval import lpips as lpips_mod

    real = generate_dataset(256, 64, seed=7)
    params = lpips_mod.init_params()
    div = lpips_mod.diversity(params, real[:100])
    print(f"REAL-set LPIPS self-diversity (random backbone): {div:.4f}",
          flush=True)
    return float(div)


if __name__ == "__main__":
    results = {"real_lpips_self_diversity": real_lpips_context()}
    results["sn"] = run("sn", model={"use_spectral_norm": True})
    results["ncritic2"] = run("ncritic2", n_critic=2)
    results["sn_ttur"] = run(
        "sn_ttur", model={"use_spectral_norm": True},
        optim={"d_lr": 1e-4, "g_lr": 2e-4})
    print(json.dumps(results, indent=2), flush=True)
