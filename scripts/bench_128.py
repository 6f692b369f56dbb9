"""128px train-step throughput probe (VERDICT r4 #6).

Same measurement discipline as bench.py (resident scan window, donated
state, wall-clock over n_iters dispatches, block once at the end) at the
v1.1 recipe's shapes: 128x128, spectral norm, global batch 64.

Prints ONE JSON line {"metric", "value", "unit"}.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import numpy as np

    from siggan_tpu.core.config import ModelConfig, TrainConfig
    from siggan_tpu.core.platform import tpu_compiler_options
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_resident_multi_step

    cfg = TrainConfig(model=ModelConfig(image_size=128,
                                        use_spectral_norm=True))
    state = create_train_state(cfg)
    rs = np.random.RandomState(0)
    images = jax.numpy.asarray(
        (rs.rand(2048, 128, 128, 1) * 2 - 1).astype(np.float32))
    K = 256
    step_fn, _ = make_resident_multi_step(cfg, images.shape[0], K)
    step = jax.jit(step_fn, donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())

    def sync(s):
        jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])

    state, _m = step(state, images)
    sync(state)
    n_iters = 4
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, _m = step(state, images)
    sync(state)
    dt = time.perf_counter() - t0
    img_s = cfg.batch_size * K * n_iters / dt
    print(json.dumps({
        "metric": "train_throughput_128px_sn",
        "value": round(img_s, 1), "unit": "images/sec/chip",
        "ms_per_step": round(1000 * dt / (K * n_iters), 4),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
