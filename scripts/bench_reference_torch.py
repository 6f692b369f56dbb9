"""Measure the ACTUAL PyTorch reference train step, in-environment.

Runs the reference's own `VanillaGAN.train_step` (imported read-only from
/root/reference/src — executed, not copied) on torch-CPU with the exact
published recipe (64x64 grayscale, batch 64, fp32 eager, BCE + one-sided
label smoothing 0.9, Adam lr 2e-4), and records:

  * measured CPU step time / images-per-sec (a grounded lower anchor),
  * the number of distinct ATen ops dispatched per train step (torch
    profiler) — the kernel-launch count that bounds the same eager script
    on ANY GPU, H100 included,
  * per-step FLOPs (profiler `with_flops`), for the compute-bound roofline.

These are the measured inputs to BASELINE.md's H100-equivalent derivation
(reference: /root/reference/src/train_vanilla_gan_signatures.py:486-635,
vanilla_gan_model.py:180-336). Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/reference/src")

import torch  # noqa: E402


def main() -> None:
    torch.manual_seed(0)
    from vanilla_gan_model import VanillaGAN  # reference, executed in place

    gan = VanillaGAN(latent_dim=100, image_size=64, image_channels=1,
                     device="cpu")
    batch = torch.randn(64, 1, 64, 64).clamp(-1, 1)

    # Warmup (threading pools, lazy init).
    for _ in range(3):
        gan.train_step(batch)

    # Measured CPU step time.
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        gan.train_step(batch)
    dt = (time.perf_counter() - t0) / n
    cpu_img_s = 64 / dt

    # Op-dispatch count + FLOPs for one step. On a GPU every one of these
    # ATen calls is >=1 kernel launch; eager small-conv steps are
    # launch-bound, so this count x per-launch overhead bounds H100 step
    # time from below.
    from torch.profiler import ProfilerActivity, profile
    with profile(activities=[ProfilerActivity.CPU], with_flops=True) as prof:
        gan.train_step(batch)
    events = prof.key_averages()
    # key_averages() flattens the dispatch chain (aten::conv2d ->
    # aten::convolution -> aten::_convolution -> kernel), so summing every
    # aten::* event OVERCOUNTS real kernel launches by the wrapper depth.
    # Report both: the flat total (what earlier rounds recorded) and the
    # LEAF count (events with no aten child in the call tree) — the honest
    # launch-bound input. Leaves come from the un-averaged event tree.
    aten = [e for e in events if e.key.startswith("aten::")]
    n_ops = sum(e.count for e in aten)
    tree = prof.events()
    n_leaf = sum(
        1 for e in tree
        if e.name.startswith("aten::")
        and not any(c.name.startswith("aten::") for c in e.cpu_children))
    flops = sum(e.flops for e in events if e.flops)

    out = {
        "metric": "reference_torch_cpu_train_step",
        "cpu_step_ms": round(dt * 1000, 2),
        "cpu_images_per_sec": round(cpu_img_s, 1),
        "aten_dispatches_per_step": int(n_ops),
        "aten_leaf_dispatches_per_step": int(n_leaf),
        "profiler_flops_per_step": int(flops),
        "batch": 64,
        "image_size": 64,
        "dtype": "float32-eager",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
