"""Domain-trained FID backbone (VERDICT r2 #4).

Pretrained Inception weights cannot enter this environment (no egress), so
absolute FID in the reference's 50-80 band is impossible. The next-best
in-env evidence is a DOMAIN-TRAINED feature backbone: train the signature
verifier's CNN encoder (``siggan_tpu/verify``) on real writer-labeled
signatures (same-writer / different-writer contrastive pairs, the
verifier's own protocol), then score FID in its 512-d hidden features via
``make_scorer("verifier:<ckpt>")``. Trained features rank-order generator
quality far closer to pretrained-Inception FID than random-init features
do (random features barely separate real-from-noise; the reference's
pretrained backbone plays this role at
``/root/reference/src/utils/metrics.py:23-46``).

Protocol (one backbone for every number):
  1. Train the verifier on 32 writers x 128 real synthetic signatures
     (best-val-accuracy snapshot; accuracy is reported as the backbone's
     own quality control).
  2. Score, on the SAME verifier backbone AND the random-init Inception
     backbone side by side:
       - real-vs-real floor (2048/2048 split of the showcase set)
       - uniform-noise ceiling
       - showcase BEST checkpoint fakes (docs/examples quality run)
       - showcase EARLY checkpoint fakes (a deliberately-worse midpoint)
       - parity-run fakes (torch reference + siggan_tpu, matched recipe)
  3. The deliverable is the RANK ORDER: floor < best < early < noise on
     both backbones, with the trained backbone separating the middle far
     more than random features do. Writes docs/examples/verifier_backbone.json.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CKPT = Path("/tmp/verifier_backbone/verifier.pkl")
QUALITY_RUN = Path("/tmp/quality_run")
PARITY_DATA = "/tmp/parity_data"
PARITY_TORCH = "/tmp/parity_torch_s42/checkpoints/checkpoint_latest.pt"
PARITY_JAX = "/tmp/parity_jax_r3"
N = 2048


def make_pairs(images: np.ndarray, labels: np.ndarray, n_pairs: int,
               seed: int):
    """(img1, img2, same-writer labels) — the verifier's training format."""
    rs = np.random.RandomState(seed)
    by_writer = {w: np.flatnonzero(labels == w) for w in np.unique(labels)}
    writers = list(by_writer)
    i1, i2, y = [], [], []
    for k in range(n_pairs):
        if k % 2 == 0:                       # same-writer pair
            w = writers[rs.randint(len(writers))]
            a, b = rs.choice(by_writer[w], 2, replace=False)
            y.append(1)
        else:                                # different-writer pair
            wa, wb = rs.choice(len(writers), 2, replace=False)
            a = rs.choice(by_writer[writers[wa]])
            b = rs.choice(by_writer[writers[wb]])
            y.append(0)
        i1.append(a)
        i2.append(b)
    return (images[np.asarray(i1)], images[np.asarray(i2)],
            np.asarray(y, np.float32))


def train_backbone() -> float:
    from siggan_tpu.data.synthetic import generate_labeled_dataset
    from siggan_tpu.verify.train import train_verifier

    images, labels = generate_labeled_dataset(32, 128, 64, seed=5)
    train_pairs = make_pairs(images, labels, 4096, seed=0)
    val_pairs = make_pairs(images, labels, 1024, seed=1)
    _, hist = train_verifier(train_pairs, val_pairs, epochs=15,
                             batch_size=64, save_path=CKPT)
    best = max(v["accuracy"] for v in hist["val"])
    print(f"verifier backbone trained: best val acc {best:.3f}", flush=True)
    return float(best)


def main() -> None:
    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.eval.fid import make_scorer
    from siggan_tpu.infer.generate import load_session

    val_acc = train_backbone() if not CKPT.exists() else None

    scorers = {"verifier": make_scorer(f"verifier:{CKPT}"),
               "random-init": make_scorer("random-init")}

    real = generate_dataset(2 * N, 64, seed=7)
    rs = np.random.RandomState(3)
    halves = rs.permutation(2 * N)
    noise = rs.rand(N, 64, 64, 1).astype(np.float32) * 2 - 1

    sess_best = load_session(str(QUALITY_RUN / "checkpoints"), "best")
    early_epoch = min(int(p.name.split("_")[1])
                      for p in (QUALITY_RUN / "checkpoints").glob("epoch_*"))
    sess_early = load_session(str(QUALITY_RUN / "checkpoints"), early_epoch)
    fakes = {"showcase_best": np.asarray(sess_best.sample(N, seed=11,
                                                          batch_size=256)),
             "showcase_early": np.asarray(sess_early.sample(N, seed=11,
                                                            batch_size=256))}

    # Parity fakes vs the parity real set (different data distribution, so
    # scored against their own reals).
    parity_real = None
    try:
        from scripts.parity_eval import jax_fakes, load_reals, torch_fakes
        parity_real = load_reals(PARITY_DATA)
        fakes["parity_torch"] = np.asarray(torch_fakes(PARITY_TORCH, 101,
                                                       n=1024))
        fakes["parity_jax"] = np.asarray(jax_fakes(PARITY_JAX, 101, n=1024))
    except Exception as e:  # parity runs may not exist yet
        print(f"parity rescore skipped: {e}", flush=True)

    report = {"backbone_ckpt": str(CKPT), "n_samples": N,
              "verifier_val_accuracy": val_acc, "scores": {}}
    for bname, scorer in scorers.items():
        s = {"floor_real_vs_real": scorer.fid(real[halves[:N]],
                                              real[halves[N:]]),
             "noise_ceiling": scorer.fid(real[halves[:N]], noise)}
        for k in ("showcase_best", "showcase_early"):
            s[k] = scorer.fid(real[halves[:N]], fakes[k])
        if parity_real is not None:
            for k in ("parity_torch", "parity_jax"):
                s[k] = scorer.fid(parity_real, fakes[k])
        report["scores"][bname] = s
        order = ["floor_real_vs_real", "showcase_best", "showcase_early",
                 "noise_ceiling"]
        vals = [s[k] for k in order]
        s["rank_order_correct"] = bool(all(
            vals[i] < vals[i + 1] for i in range(len(vals) - 1)))
        # Separation of the middle (best vs early) relative to the floor:
        # the figure random features compress and trained features don't.
        s["best_vs_early_ratio"] = float(
            (s["showcase_early"] - s["floor_real_vs_real"])
            / max(s["showcase_best"] - s["floor_real_vs_real"], 1e-9))
        print(f"[{bname}] " + " ".join(f"{k}={v:.1f}" for k, v in s.items()
                                       if isinstance(v, float)), flush=True)

    out = Path("docs/examples/verifier_backbone.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
