"""Ablation study CLI.

Parity with ``ablation_vanilla_gan_signatures.py:1015-1121``: run the
latent x activation x spectral-norm grid, emit CSV/Markdown/JSON tables,
plots, and per-run sample montages.
"""

from __future__ import annotations

import argparse
import sys


def parse_arguments(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Run the GAN ablation grid")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./ablation_results")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--latent_dims", type=int, nargs="+", default=[50, 100, 200])
    p.add_argument("--activations", type=str, nargs="+",
                   default=["relu", "leaky_relu"])
    p.add_argument("--spectral_norm", type=str, nargs="+",
                   default=["off", "on"], choices=["off", "on"])
    p.add_argument("--no_fid", action="store_true")
    p.add_argument("--max_images", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None) -> int:
    from siggan_tpu.core.platform import setup
    setup()
    args = parse_arguments(argv)

    from siggan_tpu.data.dataset import SignatureDataset
    from siggan_tpu.train.ablation import AblationStudyManager

    ds = SignatureDataset(args.data_dir, 64, max_images=args.max_images)
    mgr = AblationStudyManager(ds.images, args.output_dir,
                               epochs=args.epochs, batch_size=args.batch_size,
                               seed=args.seed)
    overrides = {
        "latent_dim": args.latent_dims,
        "g_activation": args.activations,
        "use_spectral_norm": [s == "on" for s in args.spectral_norm],
    }
    results = mgr.run_all(overrides, compute_fid=not args.no_fid)
    print(f"{len(results)} runs complete -> {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
