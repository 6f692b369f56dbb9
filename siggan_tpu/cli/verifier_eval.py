"""Verifier evaluation CLI.

Parity with ``signature_verifier_eval.py:1061-1156``: evaluate trained
verifier checkpoints on seeded test pairs; FAR/FRR/EER/ROC-AUC, ROC/DET/
score-distribution/comparison plots, JSON report with improvement %.
"""

from __future__ import annotations

import argparse
import sys


def parse_arguments(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Evaluate signature verifiers")
    p.add_argument("--data_dir", type=str, required=True,
                   help="real signatures for test pair generation")
    p.add_argument("--baseline_model", type=str, required=True)
    p.add_argument("--augmented_model", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="./verifier_evaluation")
    p.add_argument("--pairs_per_user", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=123,
                   help="test pairs are seeded for reproducibility")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="decision threshold on the similarity score "
                        "(signature_verifier_eval.py CLI parity)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    from siggan_tpu.core.platform import setup
    setup()
    args = parse_arguments(argv)

    from siggan_tpu.verify.eval import evaluate_signature_verifier
    from siggan_tpu.verify.pairs import PairDataset

    ds = PairDataset(args.data_dir, pairs_per_user=args.pairs_per_user,
                     seed=args.seed)
    print(f"Test pairs: {ds.summary()}", flush=True)
    test_data = (ds.img1, ds.img2, ds.labels)

    model_paths = {"baseline": args.baseline_model}
    if args.augmented_model:
        model_paths["augmented"] = args.augmented_model
    evaluate_signature_verifier(model_paths, test_data, args.output_dir,
                                args.batch_size, args.threshold)
    print(f"Outputs in {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
