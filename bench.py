"""Headline benchmark: fused GAN train-step throughput (images/sec/chip).

Measures the reference training recipe (64x64 grayscale, global batch 64,
z=100, BCE + label smoothing, Adam) as one fused jitted D+G step with donated
state, on whatever accelerator is visible (TPU v5e in CI; CPU fallback works
but is meaningless for the numbers).

Baseline ("vs_baseline"): MEASURED derivation, see BASELINE.md "H100-
equivalent baseline". Summary: running the actual reference train step
in-env (scripts/bench_reference_torch.py — torch-CPU, exact recipe) counts
1,065 LEAF ATen dispatches per step (1,872 flat, incl. composite wrappers);
eager fp32 PyTorch with no compile/graphs is launch-bound on any GPU at
3.5-6 us/launch => 3.7-6.4 ms/step => 10.0k-17.2k img/s H100-equivalent IF
launches were the only constraint — but both cross-checks bind far lower
(the reference's own "2-4 h on GPU" claim => 37-73 img/s; its host-side
input pipeline => low thousands). H100_EQUIV_IMG_S = 10_000 sits at the
bottom of the launch-bound range, 3-5x above the binding pipeline bound.
vs_baseline >= 5.0 meets the north star.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

H100_EQUIV_IMG_S = 10_000.0


def main() -> None:
    import jax

    from siggan_tpu.core.config import TrainConfig
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_resident_multi_step

    cfg = TrainConfig()  # reference recipe, incl. device-side augmentation
    state = create_train_state(cfg)

    import numpy as np

    rs = np.random.RandomState(0)
    # HBM-resident dataset, as the trainer runs it: batch selection, shuffle,
    # augmentation, and a device-side lax.scan loop all inside one dispatch
    # (full-pipeline number).
    images = jax.numpy.asarray(
        (rs.rand(2048, cfg.model.image_size, cfg.model.image_size,
                 cfg.model.image_channels) * 2 - 1).astype(np.float32))

    # 512 steps (16 epochs) per dispatch: amortizes the lax.scan/dispatch
    # bookkeeping (measured 1.577 ms @ K=64 -> 1.543 @ K=128 -> 1.502 @ K=256
    # -> 1.423 @ K=512, saturated at K=1024, at 64px/b64). Epoch semantics
    # are exact for any K — the scan body indexes a per-epoch permutation/
    # augmentation table (see make_resident_multi_step). The trainer uses
    # epoch-aligned windows for per-epoch observability; this measures the
    # engine at its dispatch floor.
    K = 512
    step_fn, _ = make_resident_multi_step(cfg, images.shape[0], K)
    from siggan_tpu.core.platform import tpu_compiler_options
    step = jax.jit(step_fn, donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())

    def sync(s):
        jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])

    # Compile + warmup.
    state, metrics = step(state, images)
    sync(state)

    # Timed region.
    n_iters = 8
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step(state, images)
    sync(state)
    dt = time.perf_counter() - t0

    img_s = cfg.batch_size * K * n_iters / dt
    result = {
        "metric": "gan_train_images_per_sec_per_chip_64px_b64",
        "value": round(img_s, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / H100_EQUIV_IMG_S, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
