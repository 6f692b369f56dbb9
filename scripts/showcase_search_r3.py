"""Round-3 showcase recipe search (VERDICT r2 #3): close 383 -> <=270
(2x the real-vs-real floor 135) at 64px.

Base recipe = round-2 winner (SN + TTUR, 8192 images). Levers, one per
variant (each ~4 min TPU): LR decay schedules (new optim.lr_schedule),
EMA on/off (the round-3 600-epoch EMA run REGRESSED to best 658 vs 484
without EMA — measured, see /tmp/ema_ab), doubled data. Selection by best
trainer-FID (512-sample protocol, identical across variants).

Usage: python showcase_search_r3.py [variant ...]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

EPOCHS = 600

VARIANTS = {
    # r2 winner control on current code (did round-3 perf commits move
    # training quality at all, beyond the measured EMA regression?)
    "no_ema_rerun": dict(ema=0.0, n=8192, lr="constant"),
    # same but with the round-3 bulk per-epoch augmentation path disabled
    # (in-step augmentation, the round-2 code path) — the other bisect arm
    "no_ema_augstep": dict(ema=0.0, n=8192, lr="constant", bulk=False),
    # lr decay, second half of the run, to zero
    "lin_decay": dict(ema=0.0, n=8192, lr="linear"),
    "cos_decay": dict(ema=0.0, n=8192, lr="cosine"),
    "data16k_decay": dict(ema=0.0, n=16384, lr="linear"),
    # DiffAugment (ops/diffaug.py) on the lin_decay base: the direct
    # anti-D-overfitting lever for the observed late-training d_acc 0.9+
    "diffaug": dict(ema=0.0, n=8192, lr="linear",
                    diffaug="color,translation,cutout"),
    "diffaug_tc": dict(ema=0.0, n=8192, lr="linear",
                       diffaug="translation,cutout"),
    # Round-3 second wave, built on the measured diffaug_tc winner (424.6):
    # is cutout pulling its weight, does more data stack with DiffAugment,
    # and does decaying from the best-epoch region (289/600) help?
    "diffaug_t": dict(ema=0.0, n=8192, lr="linear", diffaug="translation"),
    "diffaug_tc_16k": dict(ema=0.0, n=16384, lr="linear",
                           diffaug="translation,cutout"),
    "diffaug_tc_early": dict(ema=0.0, n=8192, lr="linear",
                             diffaug="translation,cutout", decay_start=0.25),
    # Round-3 wave 2b, still on the diffaug_tc base: two D/G balance levers
    # (more D steps per G step; slower D via stronger TTUR) and a doubled
    # schedule (does the best-epoch region move past 600 when the decay
    # span doubles with it?).
    "diffaug_tc_ncritic2": dict(ema=0.0, n=8192, lr="linear",
                                diffaug="translation,cutout", n_critic=2),
    "diffaug_tc_dlr5": dict(ema=0.0, n=8192, lr="linear",
                            diffaug="translation,cutout", d_lr=5e-5),
    "diffaug_tc_1200": dict(ema=0.0, n=8192, lr="linear",
                            diffaug="translation,cutout", epochs=1200),
    # Round-3 wave 3, informed by the 128px tuning search (search_128.py):
    # data scale was the binding lever there (trainer-FID 758 -> 611 at
    # n 4096 -> 8192). Re-measure the 16k arm and push to 32k, plus two
    # capacity/dynamics levers the earlier waves never touched: global
    # batch 128 (better BN statistics; the engine runs it at 51k img/s)
    # and latent_dim 200 (the ablation grid's largest z).
    "diffaug_tc_32k": dict(ema=0.0, n=32768, lr="linear",
                           diffaug="translation,cutout"),
    "diffaug_tc_b128": dict(ema=0.0, n=8192, lr="linear",
                            diffaug="translation,cutout", batch_size=128),
    "diffaug_tc_z200": dict(ema=0.0, n=8192, lr="linear",
                            diffaug="translation,cutout", latent=200),
    # Round-3 wave 4: combinations of the wave-3 winners (z200 413.2 <
    # b128 446.0 < 16k 455.1 < control 495.5) plus a z=400 direction probe.
    "diffaug_tc_z200_16k": dict(ema=0.0, n=16384, lr="linear",
                                diffaug="translation,cutout", latent=200),
    "diffaug_tc_z200_b128": dict(ema=0.0, n=8192, lr="linear",
                                 diffaug="translation,cutout", latent=200,
                                 batch_size=128),
    "diffaug_tc_z200_16k_b128": dict(ema=0.0, n=16384, lr="linear",
                                     diffaug="translation,cutout",
                                     latent=200, batch_size=128),
    "diffaug_tc_z400": dict(ema=0.0, n=8192, lr="linear",
                            diffaug="translation,cutout", latent=400),
}


def run(name: str, spec: dict) -> dict:
    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.train.trainer import GANTrainer

    out = Path(f"/tmp/showcase_r3/{name}")
    images = generate_dataset(spec["n"], 64, seed=7)
    cfg = TrainConfig(
        model=ModelConfig(use_spectral_norm=True,
                          latent_dim=spec.get("latent", 100)),
        optim=OptimConfig(d_lr=spec.get("d_lr", 1e-4), g_lr=2e-4,
                          lr_schedule=spec["lr"],
                          lr_decay_start_frac=spec.get("decay_start", 0.5)),
        ema_decay=spec["ema"],
        diffaugment=spec.get("diffaug", ""),
        augment_bulk=spec.get("bulk", True),
        n_critic=spec.get("n_critic", 1),
        batch_size=spec.get("batch_size", 64),
        epochs=spec.get("epochs", EPOCHS),
        sample_interval=0, checkpoint_interval=10,
        fid_interval=10, fid_samples=512,
        checkpoint_dir=str(out / "checkpoints"),
        sample_dir=str(out / "samples"), log_dir=str(out / "logs"))
    tr = GANTrainer(cfg, images, experiment_name=f"showcase_r3_{name}")
    tr.train()
    avail = tr.ckpt.available()
    res = {"variant": name, "best_fid": avail.get("best_fid"),
           "best_epoch": avail.get("best")}
    bf = res["best_fid"]
    print(f"[showcase_r3] {name}: best trainer-FID "
          f"{'n/a' if bf is None else f'{bf:.1f}'} "
          f"@ {res['best_epoch']}", flush=True)
    return res


def main() -> None:
    results = []
    for name in (sys.argv[1:] or list(VARIANTS)):
        results.append(run(name, VARIANTS[name]))
    outp = Path("/tmp/showcase_r3/results.json")
    outp.parent.mkdir(parents=True, exist_ok=True)
    prev = json.loads(outp.read_text()) if outp.exists() else []
    outp.write_text(json.dumps(prev + results, indent=2))
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
