"""Round-3 continuation throughput A/Bs: g_final_cvjp, K=512 windows.

Each arm times the full resident multi-step program (the bench
configuration) over 8 dispatches after warmup. Usage:
    python scripts/exp_r3b.py [arm ...]
"""
from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def bench(cfg, images, K, iters=8, label=""):
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_resident_multi_step

    state = create_train_state(cfg)
    fn, _ = make_resident_multi_step(cfg, images.shape[0], K)
    step = jax.jit(fn, donate_argnums=(0,))
    state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{label:32s} K={K:4d}  {dt*1e3:7.3f} ms  "
          f"{cfg.batch_size/dt:8.0f} img/s", flush=True)
    return dt


def main():
    from siggan_tpu.core.config import TrainConfig

    cfg = TrainConfig()
    rs = np.random.RandomState(0)
    images = jax.numpy.asarray(
        (rs.rand(2048, 64, 64, 1) * 2 - 1).astype(np.float32))

    arms = sys.argv[1:] or ["base", "cvjp", "k512", "cvjp_k512"]
    for arm in arms:
        if arm == "base":
            bench(cfg, images, 256, label="base")
        elif arm == "cvjp":
            c = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, g_final_cvjp=True))
            bench(c, images, 256, label="g_final_cvjp")
        elif arm == "k512":
            bench(cfg, images, 512, label="base")
        elif arm == "cvjp_k512":
            c = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, g_final_cvjp=True))
            bench(c, images, 512, label="g_final_cvjp")
        elif arm == "k1024":
            bench(cfg, images, 1024, label="base")
        elif arm == "packp":
            c = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, g_pack_pallas=True))
            bench(c, images, 256, label="g_pack_pallas")
        elif arm == "unroll2":
            import functools
            orig_scan = jax.lax.scan
            def scan_u(*a, **k):
                k.setdefault("unroll", 2)
                return orig_scan(*a, **k)
            jax.lax.scan = scan_u
            try:
                bench(cfg, images, 256, label="unroll2")
            finally:
                jax.lax.scan = orig_scan
        elif arm == "dconv1":
            c = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, d_conv1_matmul=True))
            bench(c, images, 256, label="d_conv1_matmul")
        elif arm == "bf16mom":
            c = dataclasses.replace(
                cfg, optim=dataclasses.replace(cfg.optim,
                                               moment_dtype="bfloat16"))
            bench(c, images, 512, label="bf16 moments")
        elif arm == "rbg":
            # Process-global PRNG impl swap: rbg generates 4x32-bit blocks on
            # the vector unit in one pass vs threefry's 20-round mix. Must run
            # in its own process (keys are typed at creation).
            jax.config.update("jax_default_prng_impl", "rbg")
            bench(cfg, images, 512, label="rbg prng")
        elif arm == "rbg_bf16mom":
            jax.config.update("jax_default_prng_impl", "rbg")
            c = dataclasses.replace(
                cfg, optim=dataclasses.replace(cfg.optim,
                                               moment_dtype="bfloat16"))
            bench(c, images, 512, label="rbg + bf16 moments")
        else:
            print(f"unknown arm {arm}", flush=True)


if __name__ == "__main__":
    main()
