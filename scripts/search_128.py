"""128px recipe tuning arms (VERDICT r2 #3: close the 3x-floor bar).

The round-3 full-recipe drive (docs/baseline/drive_128.json) ended with its
best checkpoint at epoch 279 of 300 — the run was still improving when the
schedule ran out. The v1.1 plan itself says 300 epochs *plus tuning*
(/root/reference/model_versions.yaml:59-71), so the tuning arms here extend
the schedule and the data budget; everything else is the measured round-3
recipe (SN, TTUR d_lr 1e-4, linear decay, DiffAugment translation,cutout).

Each arm reports its best trainer-FID (256-sample protocol, identical across
arms); the winner gets the full drive_128 eval. Results to
/tmp/search128/results.json.

Usage: python scripts/search_128.py [arm ...]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ARMS = {
    "e450": dict(epochs=450, n=4096),
    "n8192": dict(epochs=300, n=8192),
    "e450_n8192": dict(epochs=450, n=8192),
}


def run(name: str, spec: dict) -> dict:
    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.train.trainer import GANTrainer

    out = Path(f"/tmp/search128/{name}")
    images = generate_dataset(spec["n"], 128, seed=7)
    cfg = TrainConfig(
        model=ModelConfig(image_size=128, use_spectral_norm=True),
        optim=OptimConfig(d_lr=1e-4, g_lr=2e-4, lr_schedule="linear"),
        diffaugment="translation,cutout",
        ema_decay=0.0,
        epochs=spec["epochs"], fid_interval=10, fid_samples=256,
        sample_interval=0, checkpoint_interval=10,
        checkpoint_dir=str(out / "checkpoints"),
        sample_dir=str(out / "samples"), log_dir=str(out / "logs"))
    tr = GANTrainer(cfg, images, experiment_name=f"search128_{name}")
    tr.train()
    avail = tr.ckpt.available()
    res = {"arm": name, **spec, "best_fid": avail.get("best_fid"),
           "best_epoch": avail.get("best")}
    bf = res["best_fid"]
    print(f"[search128] {name}: best trainer-FID "
          f"{'n/a' if bf is None else f'{bf:.1f}'} @ {res['best_epoch']}",
          flush=True)
    return res


def main() -> None:
    results = []
    for name in (sys.argv[1:] or list(ARMS)):
        results.append(run(name, ARMS[name]))
    outp = Path("/tmp/search128/results.json")
    outp.parent.mkdir(parents=True, exist_ok=True)
    prev = json.loads(outp.read_text()) if outp.exists() else []
    outp.write_text(json.dumps(prev + results, indent=2))
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
