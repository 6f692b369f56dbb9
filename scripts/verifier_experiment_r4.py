"""The reference's flagship downstream experiment, end-to-end (VERDICT r3 #3).

Does GAN-synthetic signature data improve a Siamese verifier?  Mirrors
``/root/reference/src/signature_verifier_eval.py:795-927`` (improvement-%
report comparing a baseline real-only verifier against one trained with
GAN synthetics as extra data) on the in-env data:

1. "Real" data: per-writer directory tree of synthetic-stroke signatures
   (the environment bundles no real signature dataset — disclosed in
   docs/examples/README.md; writers are style-consistent via
   data/synthetic.py:make_writer_signature).
2. Synthetic data: sampled from a trained showcase generator checkpoint
   (path + its eval FID recorded in the published artifact).
3. Train baseline + augmented verifiers (verify/train.py:train_model,
   reference signature_verifier_train.py:500-697 parity).
4. Evaluate both on seeded test pairs (seed 123) with the full
   FAR/FRR/EER/ROC-AUC battery + ROC/DET/score-dist/comparison plots
   (verify/eval.py, reference :935-1058) and publish
   docs/examples/verifier_experiment.json + plots.

Usage:
  python scripts/verifier_experiment_r4.py --ckpt=/path/to/checkpoints \
      [--workdir=/tmp/verifier_exp_r4] [--gen-fid=<float>] [--publish]
"""
from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_WRITERS = 12
PER_WRITER = 24
N_SYNTH = 256
EPOCHS = 20


def build_real_tree(root: Path) -> Path:
    """Per-user subdir layout (reference signature_verifier_train.py:261-316:
    one directory per writer)."""
    from siggan_tpu.data.synthetic import make_writer_signature, writer_style
    from siggan_tpu.infer.export import save_pngs

    real = root / "real"
    rs = np.random.RandomState(11)
    for w in range(N_WRITERS):
        style = writer_style(rs)
        imgs = np.stack([make_writer_signature(rs, style, 64)
                         for _ in range(PER_WRITER)])
        save_pngs(imgs, real / f"user_{w:03d}", prefix="sig")
    return real


def build_synthetic_dir(root: Path, ckpt: str) -> Path:
    from siggan_tpu.infer.export import save_pngs
    from siggan_tpu.infer.generate import load_session

    synth = root / "synthetic"
    session = load_session(ckpt, "best")
    imgs = session.sample(N_SYNTH, seed=5, batch_size=64)
    save_pngs(np.asarray(imgs), synth, prefix="gan")
    return synth


def main() -> None:
    ckpt, workdir, gen_fid, publish = None, Path("/tmp/verifier_exp_r4"), None, False
    for a in sys.argv[1:]:
        if a.startswith("--ckpt="):
            ckpt = a.split("=", 1)[1]
        elif a.startswith("--workdir="):
            workdir = Path(a.split("=", 1)[1])
        elif a.startswith("--gen-fid="):
            gen_fid = float(a.split("=", 1)[1])
        elif a == "--publish":
            publish = True
    if not ckpt:
        sys.exit("--ckpt=<generator checkpoint dir> is required")

    workdir.mkdir(parents=True, exist_ok=True)
    print("building real per-writer tree ...", flush=True)
    real = build_real_tree(workdir)
    print("sampling GAN synthetics ...", flush=True)
    synth = build_synthetic_dir(workdir, ckpt)

    from siggan_tpu.cli import verifier_eval, verifier_train

    models = workdir / "models"
    print("training baseline + augmented verifiers ...", flush=True)
    t0 = time.time()
    verifier_train.main([
        "--data_dir", str(real), "--synthetic_dir", str(synth),
        "--output_dir", str(models), "--epochs", str(EPOCHS),
        "--pairs_per_user", "20", "--seed", "0"])
    train_s = time.time() - t0

    out = workdir / "evaluation"
    print("evaluating on seeded test pairs ...", flush=True)
    verifier_eval.main([
        "--data_dir", str(real),
        "--baseline_model", str(models / "verifier_baseline.pkl"),
        "--augmented_model", str(models / "verifier_augmented.pkl"),
        "--output_dir", str(out), "--pairs_per_user", "20",
        "--seed", "123"])

    report = json.loads((out / "evaluation_report.json").read_text())
    history = json.loads((models / "training_history.json").read_text())
    artifact = {
        "experiment": "does GAN-synthetic data help signature verification?",
        "reference_parity": "signature_verifier_eval.py:795-927",
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "protocol": {
            "real_data": f"{N_WRITERS} synthetic-stroke writers x "
                         f"{PER_WRITER} signatures (per-user dirs; no real "
                         "signature dataset exists in this environment)",
            "synthetic_data": f"{N_SYNTH} samples from the showcase "
                              "generator checkpoint",
            "generator_checkpoint": ckpt,
            "generator_eval_fid": gen_fid,
            "train": f"{EPOCHS} epochs, pairs_per_user=20, seed 0; "
                     "augmented model sees GAN samples as an extra user "
                     "(extra negatives, reference grouping rules)",
            "test": "seeded pairs (seed 123) on the real tree",
            "train_seconds": round(train_s, 1),
        },
        "best_val_accuracy": {k: v["best_val_accuracy"]
                              for k, v in history.items()},
        "results": report,
    }
    (workdir / "verifier_experiment.json").write_text(
        json.dumps(artifact, indent=2))
    print(json.dumps(report.get("comparison", {}), indent=2,
                     default=str)[:2000], flush=True)

    if publish:
        docs = Path(__file__).resolve().parents[1] / "docs" / "examples"
        shutil.copy(workdir / "verifier_experiment.json",
                    docs / "verifier_experiment.json")
        for plot in ("roc.png", "det.png", "metric_comparison.png"):
            if (out / plot).exists():
                shutil.copy(out / plot, docs / f"verifier_{plot}")
        print(f"published to {docs}", flush=True)


if __name__ == "__main__":
    main()
