"""Measure the ACTUAL reference implementation's train step (torch CPU).

Runs the reference's own ``VanillaGAN.train_step`` (vanilla_gan_model.py:308)
imported from the read-only mount, at the reference recipe (64px, batch 64,
z=100, n_critic=1), and records:

  * measured step time / images-per-sec on this host's CPU
  * the number of distinct aten ops dispatched per combined step (the
    kernel-launch count an eager-PyTorch run of the same code would pay on
    any GPU, H100 included)

Both feed the H100-equivalent derivation in BASELINE.md. Usage:

    python docs/baseline/ref_torch_bench.py [--steps 20] [--batch 64]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/reference/src")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=64)
    args = ap.parse_args()

    import torch
    from vanilla_gan_model import VanillaGAN  # reference, read-only mount

    torch.manual_seed(0)
    gan = VanillaGAN(latent_dim=100, image_size=args.image_size, device="cpu")
    batch = torch.rand(args.batch, 1, args.image_size, args.image_size) * 2 - 1

    # Warmup.
    for _ in range(3):
        gan.train_step(batch)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        gan.train_step(batch)
    dt = time.perf_counter() - t0
    step_ms = dt / args.steps * 1000.0
    img_s = args.batch * args.steps / dt

    # Count dispatched aten ops for one combined step — a proxy for the
    # kernel-launch count eager PyTorch pays per step on a GPU.
    from torch.profiler import ProfilerActivity, profile
    with profile(activities=[ProfilerActivity.CPU]) as prof:
        gan.train_step(batch)
    events = prof.key_averages()
    n_op_calls = sum(e.count for e in events if e.key.startswith("aten::"))

    print(json.dumps({
        "what": "reference VanillaGAN.train_step, torch CPU, this host",
        "torch": torch.__version__,
        "threads": torch.get_num_threads(),
        "batch": args.batch,
        "image_size": args.image_size,
        "step_ms": round(step_ms, 2),
        "images_per_sec": round(img_s, 1),
        "aten_op_calls_per_step": n_op_calls,
    }))


if __name__ == "__main__":
    main()
