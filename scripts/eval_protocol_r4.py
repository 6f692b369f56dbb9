"""Eval-protocol noise vs training-luck noise (VERDICT r3 #5 "prove which").

Scores ONE trained checkpoint under two FID protocols:

  P2048 (round-3 protocol): real = 2048 training images, fake = 2048/seed,
        floor = real 1024-vs-1024 split.  Per-seed spread here is PURE
        protocol noise (same checkpoint, same real set, different z).
  P8192: real = the full 8192-image training set, fake = 8192/seed,
        floor = real 4096-vs-4096 split.  4x the samples shrinks both the
        random-backbone FID bias and the per-seed variance.

MEASURED OUTCOME (docs/examples/eval_protocol.json, ab_old_s42 "best"):
per-seed std 18.7 -> 5.2 (the spread IS protocol noise), but the floor
collapses 134.7 -> 37.5 while fake-vs-real only drops 266 -> 207, so the
x-floor ratio balloons 1.98x -> 5.5x.  A small-sample floor is biased
HIGH, which DEFLATES the reported ratio — P2048's 1024v1024 floor under
2048v2048 comparisons was flattering, not conservative.  Ratio-to-floor
claims are protocol-definition-dependent on the random-init backbone;
report.json discloses this and BASELINE.md carries the analysis.

Usage: python scripts/eval_protocol_r4.py --ckpt=/tmp/ab_old_s42/checkpoints
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ckpt, out = None, None
    for a in sys.argv[1:]:
        if a.startswith("--ckpt="):
            ckpt = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
    if not ckpt:
        sys.exit("--ckpt required")

    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.eval.fid import FIDScorer
    from siggan_tpu.infer.generate import load_session

    scorer = FIDScorer()
    session = load_session(ckpt, "best")
    real8k = generate_dataset(8192, 64, seed=7)
    rs = np.random.RandomState(0)

    report = {"checkpoint": ckpt,
              "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
              "protocols": {}}
    for name, n in (("P2048", 2048), ("P8192", 8192)):
        real = real8k[:n]
        half = rs.permutation(n)
        floor = scorer.fid(real[half[:n // 2]], real[half[n // 2:]])
        fids = []
        for es in (11, 22, 33):
            fake = session.sample(n, seed=es, batch_size=256)
            fids.append(float(scorer.fid(real, np.asarray(fake))))
            print(f"{name} seed {es}: FID {fids[-1]:.1f} "
                  f"(floor {floor:.1f}, {fids[-1] / floor:.2f}x)", flush=True)
        report["protocols"][name] = {
            "n_per_side": n, "floor": float(floor),
            "fid_per_seed": fids,
            "fid_mean": float(np.mean(fids)),
            "fid_std_across_eval_seeds": float(np.std(fids)),
            "worst_x_floor": float(max(fids) / floor),
        }
    p2, p8 = report["protocols"]["P2048"], report["protocols"]["P8192"]
    report["conclusion"] = {
        "protocol_noise_std_P2048": p2["fid_std_across_eval_seeds"],
        "protocol_noise_std_P8192": p8["fid_std_across_eval_seeds"],
        "note": "same checkpoint; any per-seed spread is eval-protocol "
                "noise, to compare against the ~50-70 FID training-luck "
                "std measured in BASELINE.md round-4 attribution",
    }
    text = json.dumps(report, indent=2)
    print(text[-600:])
    if out:
        Path(out).write_text(text)


if __name__ == "__main__":
    main()
