"""XLA flag sweep for the headline train step (round 3c perf hunt).

Usage: python scripts/flag_sweep.py "<xla flags string>" [K]

Sets XLA_FLAGS before importing jax, runs the bench.py core (64px, b64,
resident multi-step), prints one JSON line with ms/step. Driven by a shell
loop so each config gets a fresh process (XLA flags are process-global).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    flags = sys.argv[1] if len(sys.argv) > 1 else ""
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    # NOTE: flags go through jit(...).lower().compile(compiler_options=...)
    # below, NOT XLA_FLAGS — the axon client's flag parser rejects TPU
    # backend flags, but compiler_options reach the real TPU compiler.

    import jax
    import numpy as np

    from siggan_tpu.core.config import TrainConfig
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_resident_multi_step

    cfg = TrainConfig()
    state = create_train_state(cfg)
    rs = np.random.RandomState(0)
    images = jax.numpy.asarray(
        (rs.rand(2048, cfg.model.image_size, cfg.model.image_size,
                 cfg.model.image_channels) * 2 - 1).astype(np.float32))

    step_fn, _ = make_resident_multi_step(cfg, images.shape[0], K)
    # Flags reach the (possibly remote) TPU compiler via compiler_options,
    # not XLA_FLAGS: parse "--name=value ..." into a dict.
    opts = {}
    for tok in flags.split():
        name, _, val = tok.lstrip("-").partition("=")
        opts[name] = val
    jitted = jax.jit(step_fn, donate_argnums=(0,))
    if opts:
        step = jitted.lower(state, images).compile(compiler_options=opts)
    else:
        step = jitted

    def sync(s):
        jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])

    t_c0 = time.perf_counter()
    state, _ = step(state, images)
    sync(state)
    compile_s = time.perf_counter() - t_c0

    n_iters = 6
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, _ = step(state, images)
    sync(state)
    dt = time.perf_counter() - t0
    ms_step = dt / (n_iters * K) * 1e3
    print(json.dumps({
        "flags": flags, "K": K, "ms_step": round(ms_step, 4),
        "img_s": round(cfg.batch_size * 1e3 / ms_step, 1),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
