"""Per-writer conditional augmentation for the verifier (VERDICT r4 #2).

The round-4 experiment was an honest negative: at showcase quality,
unconditional synthetics grouped as an EXTRA USER (the reference's own
rule, signature_verifier_train.py:500-697) LOWERED accuracy in a
data-rich regime (24 genuine/writer).  The reference's premise — GAN
augmentation helps verification — is really a claim about the SCARCE
regime, and this framework has the one tool the reference lacks:
per-writer conditional generation (v2.0).  This experiment answers the
question where it actually matters:

  regime   6 genuine signatures/writer for training (scarce), 8 held out
           per writer for testing, 16 writers
  arm A    baseline — real-only verifier
  arm B    reference-style — UNCONDITIONAL GAN trained on the same pooled
           96 scarce images, synthetics grouped as an extra user
           (extra negatives only)
  arm C    conditional — v2.0 concat+projection-D GAN trained on the same
           96 images WITH writer labels; per-writer samples dropped into
           each writer's train directory as extra GENUINE data

Both GANs get the same recipe/budget (SN, TTUR, DiffAugment, linear
decay) so B-vs-C isolates the GROUPING + CONDITIONING, not GAN quality.
Each arm trains the Siamese verifier with >=3 seeds; all seeds/arms are
evaluated on the SAME held-out test pairs (seed 123).  Full battery:
accuracy / FAR / FRR / EER / ROC-AUC, mean +/- std across seeds, plus
ROC/DET plots for the seed-0 models.  Verdict is reported either way.

Usage: python scripts/verifier_scarce_r5.py [--publish] [--skip-gan]
       [--workdir=/tmp/verifier_scarce_r5]
"""
from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_WRITERS = 16
TRAIN_PER_WRITER = 6       # the scarce regime
TEST_PER_WRITER = 8
GAN_EPOCHS = 1500
SYNTH_PER_WRITER = 12      # arm C: conditional genuines added per writer
N_SYNTH_UNCOND = 16 * 12   # arm B: same synthetic budget, one extra "user"
VERIFIER_SEEDS = (0, 1, 2)
VERIFIER_EPOCHS = 20
PAIRS_PER_USER = 20


def build_trees(root: Path):
    """Per-writer scarce train tree + held-out test tree, same 16 writers."""
    from siggan_tpu.data.synthetic import make_writer_signature, writer_style
    from siggan_tpu.infer.export import save_pngs

    train, test = root / "train_real", root / "test_real"
    rs = np.random.RandomState(11)
    for w in range(N_WRITERS):
        style = writer_style(rs)
        imgs = np.stack([
            make_writer_signature(rs, style, 64)
            for _ in range(TRAIN_PER_WRITER + TEST_PER_WRITER)])
        save_pngs(imgs[:TRAIN_PER_WRITER], train / f"user_{w:03d}",
                  prefix="sig")
        save_pngs(imgs[TRAIN_PER_WRITER:], test / f"user_{w:03d}",
                  prefix="sig")
    return train, test


def train_gan(workdir: Path, images, labels, conditional: bool) -> Path:
    """Same recipe/budget for both arms; only the conditioning differs."""
    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from siggan_tpu.train.trainer import GANTrainer

    name = "cond" if conditional else "uncond"
    out = workdir / f"gan_{name}"
    cfg = TrainConfig(
        model=ModelConfig(
            use_spectral_norm=True, latent_dim=100,
            num_classes=N_WRITERS if conditional else 0,
            g_conditioning="concat"),   # v2.0 winner (conditional.json)
        optim=OptimConfig(d_lr=1e-4, g_lr=2e-4, lr_schedule="linear",
                          lr_decay_start_frac=0.5),
        diffaugment="translation,cutout",  # the scarce-data lever
        augment_bulk=True,
        batch_size=32, epochs=GAN_EPOCHS, seed=42,
        fid_interval=25, fid_samples=512,
        sample_interval=0, checkpoint_interval=25,
        checkpoint_dir=str(out / "checkpoints"),
        sample_dir=str(out / "samples"), log_dir=str(out / "logs"),
        hflip=False)
    t0 = time.time()
    tr = GANTrainer(cfg, images, labels=labels if conditional else None,
                    experiment_name=f"scarce_{name}")
    tr.train()
    avail = tr.ckpt.available()
    bf = avail.get("best_fid")
    print(f"[gan/{name}] trained {GAN_EPOCHS} epochs in "
          f"{time.time() - t0:.0f}s; best trainer-FID "
          f"{'n/a' if bf is None else f'{bf:.1f}'} @ {avail.get('best')}",
          flush=True)
    return out / "checkpoints"


def build_arm_trees(workdir: Path, train_real: Path,
                    uncond_ckpt: Path, cond_ckpt: Path):
    """Arm B: extra-user dir.  Arm C: real tree + per-writer synthetics."""
    from siggan_tpu.infer.export import save_pngs
    from siggan_tpu.infer.generate import load_session

    # Arm B: unconditional samples as one synthetic 'extra user' dir.
    synth_b = workdir / "synth_extra_user"
    sess_u = load_session(str(uncond_ckpt), "best")
    save_pngs(np.asarray(sess_u.sample(N_SYNTH_UNCOND, seed=5,
                                       batch_size=64)),
              synth_b, prefix="gan")

    # Arm C: conditional per-writer samples INSIDE each writer's dir.
    tree_c = workdir / "train_real_plus_cond"
    shutil.copytree(train_real, tree_c, dirs_exist_ok=True)
    sess_c = load_session(str(cond_ckpt), "best")
    for w in range(N_WRITERS):
        imgs = sess_c.sample(SYNTH_PER_WRITER, seed=1000 + w,
                             batch_size=SYNTH_PER_WRITER, class_id=w)
        save_pngs(np.asarray(imgs), tree_c / f"user_{w:03d}", prefix="gansyn")
    return synth_b, tree_c


def main() -> None:
    workdir, publish, skip_gan = Path("/tmp/verifier_scarce_r5"), False, False
    for a in sys.argv[1:]:
        if a.startswith("--workdir="):
            workdir = Path(a.split("=", 1)[1])
        elif a == "--publish":
            publish = True
        elif a == "--skip-gan":
            skip_gan = True

    from siggan_tpu.data.dataset import SignatureDataset
    from siggan_tpu.verify.eval import (evaluate_model, plot_det,
                                        plot_metric_bars, plot_roc)
    from siggan_tpu.verify.pairs import PairDataset
    from siggan_tpu.verify.train import load_verifier, train_verifier

    workdir.mkdir(parents=True, exist_ok=True)
    print("building scarce train/test trees ...", flush=True)
    train_real, test_real = build_trees(workdir)

    if not skip_gan:
        ds = SignatureDataset(train_real, 64)
        labels, _names = ds.writer_labels()
        print(f"GAN training data: {ds.images.shape}, "
              f"{len(set(labels.tolist()))} writers", flush=True)
        uncond_ckpt = train_gan(workdir, ds.images, None, conditional=False)
        cond_ckpt = train_gan(workdir, ds.images, labels, conditional=True)
    else:
        uncond_ckpt = workdir / "gan_uncond" / "checkpoints"
        cond_ckpt = workdir / "gan_cond" / "checkpoints"

    print("sampling synthetics / building arm trees ...", flush=True)
    synth_b, tree_c = build_arm_trees(workdir, train_real,
                                      uncond_ckpt, cond_ckpt)

    arms = {
        "baseline": dict(data_dir=train_real, synthetic_dir=None),
        "uncond_extra_user": dict(data_dir=train_real, synthetic_dir=synth_b),
        "cond_per_writer_genuine": dict(data_dir=tree_c, synthetic_dir=None),
    }

    # Shared held-out test pairs (seed 123) for every arm and seed.
    test_ds = PairDataset(test_real, None, PAIRS_PER_USER, seed=123)
    test_data = (test_ds.img1, test_ds.img2, test_ds.labels)
    print(f"test pairs: {test_ds.summary()}", flush=True)

    results, plots_seed0 = {}, {}
    for arm, spec in arms.items():
        per_seed = []
        for seed in VERIFIER_SEEDS:
            ds = PairDataset(spec["data_dir"], spec["synthetic_dir"],
                             PAIRS_PER_USER, seed=seed)
            train_data, val_data = ds.split(0.2, seed=seed)
            path = workdir / "models" / f"{arm}_s{seed}.pkl"
            train_verifier(train_data, val_data, epochs=VERIFIER_EPOCHS,
                           batch_size=32, lr=1e-3, seed=seed,
                           embedding_dim=128, save_path=path)
            ev = evaluate_model(load_verifier(path), test_data)
            m = ev["metrics"]
            per_seed.append({k: float(m[k]) for k in
                             ("accuracy", "far", "frr", "eer", "roc_auc")})
            print(f"[{arm} s{seed}] acc={m['accuracy']:.3f} "
                  f"EER={m['eer']:.3f} AUC={m['roc_auc']:.3f}", flush=True)
            if seed == VERIFIER_SEEDS[0]:
                plots_seed0[arm] = ev
        results[arm] = {
            "per_seed": per_seed,
            "mean": {k: float(np.mean([r[k] for r in per_seed]))
                     for k in per_seed[0]},
            "std": {k: float(np.std([r[k] for r in per_seed]))
                    for k in per_seed[0]},
            "train_pairs": len(ds),
        }

    out = workdir / "evaluation"
    out.mkdir(exist_ok=True)
    plot_roc(plots_seed0, out / "roc.png")
    plot_det(plots_seed0, out / "det.png")
    plot_metric_bars(plots_seed0, out / "metric_comparison.png")

    base, cond = results["baseline"]["mean"], \
        results["cond_per_writer_genuine"]["mean"]
    unc = results["uncond_extra_user"]["mean"]
    verdict = {
        "cond_vs_baseline": {
            "eer_delta": cond["eer"] - base["eer"],
            "auc_delta": cond["roc_auc"] - base["roc_auc"],
            "helps": bool(cond["eer"] < base["eer"]
                          and cond["roc_auc"] > base["roc_auc"]),
        },
        "uncond_vs_baseline": {
            "eer_delta": unc["eer"] - base["eer"],
            "auc_delta": unc["roc_auc"] - base["roc_auc"],
            "helps": bool(unc["eer"] < base["eer"]
                          and unc["roc_auc"] > base["roc_auc"]),
        },
    }
    artifact = {
        "experiment": "scarce-regime verifier augmentation: baseline vs "
                      "reference-style extra-user synthetics vs per-writer "
                      "conditional genuines (VERDICT r4 #2)",
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "protocol": {
            "writers": N_WRITERS,
            "train_per_writer": TRAIN_PER_WRITER,
            "test_per_writer": TEST_PER_WRITER,
            "gan": f"both arms: SN+TTUR+DiffAugment(translation,cutout)+"
                   f"linear decay, {GAN_EPOCHS} epochs on the pooled "
                   f"{N_WRITERS * TRAIN_PER_WRITER} scarce images; "
                   "conditional = v2.0 concat + projection-D "
                   "(docs/examples/conditional.json winner)",
            "synthetics": {
                "uncond_extra_user": N_SYNTH_UNCOND,
                "cond_per_writer_genuine":
                    f"{SYNTH_PER_WRITER}/writer as extra genuine files",
            },
            "verifier": f"Siamese contrastive+BCE, {VERIFIER_EPOCHS} epochs, "
                        f"pairs_per_user={PAIRS_PER_USER}, seeds "
                        f"{list(VERIFIER_SEEDS)}",
            "test": "held-out signatures of the SAME writers, pair seed 123 "
                    "(shared across all arms/seeds)",
        },
        "results": results,
        "verdict": verdict,
    }
    (workdir / "verifier_scarce.json").write_text(
        json.dumps(artifact, indent=2))
    print(json.dumps({"verdict": verdict,
                      "means": {a: r["mean"] for a, r in results.items()}},
                     indent=2), flush=True)

    if publish:
        docs = Path(__file__).resolve().parents[1] / "docs" / "examples"
        shutil.copy(workdir / "verifier_scarce.json",
                    docs / "verifier_scarce.json")
        for plot in ("roc.png", "det.png", "metric_comparison.png"):
            shutil.copy(out / plot, docs / f"verifier_scarce_{plot}")
        print(f"published to {docs}", flush=True)


if __name__ == "__main__":
    main()
