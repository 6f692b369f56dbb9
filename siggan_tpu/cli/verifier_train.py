"""Verifier training CLI.

Parity with ``signature_verifier_train.py:700-800``: train a baseline
(real-only) and optionally an augmented (real + synthetic) Siamese verifier.
"""

from __future__ import annotations

import argparse
import sys


def parse_arguments(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Train Siamese signature verifiers (baseline vs augmented)")
    p.add_argument("--data_dir", type=str, required=True,
                   help="real signatures (per-user subdirs or prefixed files)")
    p.add_argument("--synthetic_dir", type=str, default=None,
                   help="GAN-generated signatures for the augmented model")
    p.add_argument("--output_dir", type=str, default="./verifier_models")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--pairs_per_user", type=int, default=10)
    p.add_argument("--embedding_dim", type=int, default=128,
                   help="Siamese embedding size (CNNEncoder:94)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None) -> int:
    from siggan_tpu.core.platform import setup
    setup()
    args = parse_arguments(argv)

    from siggan_tpu.verify.train import train_model

    results = train_model(
        args.data_dir, args.synthetic_dir, args.output_dir,
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        pairs_per_user=args.pairs_per_user, seed=args.seed,
        embedding_dim=args.embedding_dim)
    for name, r in results.items():
        print(f"{name}: best val accuracy {r['best_val_accuracy']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
