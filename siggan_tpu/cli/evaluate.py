"""Evaluation CLI.

Parity with ``evaluate_vanilla_gan_signatures.py:447-612``: load a
checkpoint, generate N samples, load real images, compute FID/LPIPS/stroke
metrics, write sample grids and a JSON report, print a summary.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def parse_arguments(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Evaluate a signature GAN checkpoint")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--which", type=str, default="latest")
    p.add_argument("--data_dir", type=str, required=True,
                   help="directory of real (preprocessed) images")
    p.add_argument("--n_samples", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--seeds", type=int, nargs="+", default=None,
                   help="multi-seed protocol: evaluate each seed and report "
                        "mean±std (GAN metrics are seed-sensitive; single-run "
                        "FID comparisons are noise — SURVEY §7)")
    p.add_argument("--output_dir", type=str, default="./evaluation")
    p.add_argument("--lpips_subset", type=int, default=100)
    p.add_argument("--n_grids", type=int, default=3,
                   help="sample grids to write for visual inspection "
                        "(evaluate…py:194 create_sample_grids)")
    p.add_argument("--grid_size", type=int, default=64,
                   help="samples per grid")
    p.add_argument("--max_real", type=int, default=None)
    p.add_argument("--inception_weights", type=str, default=None,
                   help="optional torchvision inception_v3 state-dict file "
                        "(.pt/.npz) for true-FID parity")
    p.add_argument("--backbone", type=str, default="random-init",
                   help="FID feature backbone: 'random-init' | "
                        "'torchvision:<state_dict.pt>' | "
                        "'verifier:<verifier_ckpt.pkl>' (domain-trained "
                        "signature encoder; reports its own real-vs-real "
                        "floor + feature diversity)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    from siggan_tpu.core.platform import setup
    setup()
    args = parse_arguments(argv)
    which = args.which if args.which in ("latest", "best") else int(args.which)
    out = Path(args.output_dir)

    from siggan_tpu.data.dataset import SignatureDataset
    from siggan_tpu.eval.evaluate import (compute_metrics, print_summary,
                                          save_evaluation_report)
    from siggan_tpu.infer.export import contact_sheet
    from siggan_tpu.infer.generate import load_session

    session = load_session(args.checkpoint, which)
    real_ds = SignatureDataset(args.data_dir, session.cfg.image_size,
                               max_images=args.max_real)
    real = real_ds.images
    print(f"Real set: {len(real)} images", flush=True)

    inception_params = None
    if args.inception_weights:
        if args.backbone != "random-init":
            # compute_metrics would silently prefer inception_params and
            # drop the explicitly requested backbone — refuse instead.
            raise SystemExit("--inception_weights and --backbone are "
                             "mutually exclusive (use "
                             "--backbone torchvision:<file> instead)")
        inception_params = _load_inception_weights(args.inception_weights)

    seeds = args.seeds or [args.seed]
    per_seed = []
    for seed in seeds:
        print(f"Generating {args.n_samples} samples (seed {seed})…", flush=True)
        fake = session.sample(args.n_samples, seed=seed,
                              batch_size=args.batch_size)
        res = compute_metrics(real, fake, lpips_subset=args.lpips_subset,
                              inception_params=inception_params,
                              fid_backbone=args.backbone)
        res["seed"] = seed
        per_seed.append(res)
    results = per_seed[0]
    if len(per_seed) > 1:
        import numpy as np
        agg = {}
        for key in ("fid", "lpips_diversity"):
            # Pair each value with ITS seed — filtering values but zipping
            # against all seeds misattributed results whenever one seed's
            # metric errored (round-3 review).
            pairs = [(r["seed"], r[key]) for r in per_seed if key in r]
            if pairs:
                vals = [v for _, v in pairs]
                agg[key] = {"mean": float(np.mean(vals)),
                            "std": float(np.std(vals)),
                            "per_seed": {str(s): v for s, v in pairs}}
        results = dict(per_seed[0])
        results["multi_seed"] = agg
        print("Multi-seed:", {k: f"{v['mean']:.3f}±{v['std']:.3f}"
                              for k, v in agg.items()})
    contact_sheet(fake[:64], out / "fake_grid.png")
    contact_sheet(real[:64], out / "real_grid.png")
    # Multi-grid writer (reference create_sample_grids :194): n_grids
    # disjoint windows of the generated set.
    from siggan_tpu.utils.visualizer import save_sample_grid
    for gi in range(args.n_grids):
        lo = gi * args.grid_size
        if lo >= len(fake):
            break
        save_sample_grid(fake[lo:lo + args.grid_size],
                         out / f"sample_grid_{gi + 1}.png")
    report = save_evaluation_report(
        results, out / "evaluation_report.json",
        extra={"checkpoint": args.checkpoint, "which": str(which),
               "n_samples": args.n_samples, "n_real": len(real),
               "seeds": seeds})
    print_summary(results)
    print(f"Report: {report}")
    return 0


def _load_inception_weights(path: str):
    from siggan_tpu.eval.inception import convert_torch_state_dict
    from siggan_tpu.eval.manifests import (INCEPTION_V3_REQUIRED,
                                           INCEPTION_V3_SD, check_state_dict)
    if path.endswith(".npz"):
        import numpy as np
        sd = dict(np.load(path))
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    check_state_dict(sd, INCEPTION_V3_SD, required=INCEPTION_V3_REQUIRED,
                     label=path)
    return convert_torch_state_dict(sd)


if __name__ == "__main__":
    sys.exit(main())
