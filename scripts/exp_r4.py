"""Round-4 throughput A/Bs: the hunt for the last ~27 us to 50k img/s.

Starting point (round 3c): 1.305 ms/step = 49.0k img/s at 64px/b64/K=512.
Candidate levers from the round-3 xprof residual budget (BASELINE.md):
  - g_convt_cvjp: adjoint-form ConvT backward (built in r3, never A/B'd
    end-to-end) — kills the reverse(dy) materialization + add_any pass
    (~9 us by op self-time).
  - d_dgrad_phases: 2x2 output-phase dgrad for D's stride-2 convs (the
    G-step's b64 dgrad through D conv2 runs at 89 GF/s vs 140-180 dense).
  - unroll2 / K=1024: re-measures under the round-3c graph (both flat on
    older graphs).

Each arm times the full resident multi-step program (the bench
configuration) over `iters` dispatches after warmup. Usage:
    python scripts/exp_r4.py [arm ...]
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
    t0 = time.perf_counter()
    state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    print(f"  [{label}] compile+warm {time.perf_counter()-t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{label:32s} K={K:4d}  {dt*1e3:7.3f} ms  "
          f"{cfg.batch_size/dt:8.0f} img/s", flush=True)
    return dt


def _model(cfg, **kw):
    return dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, **kw))


def main():
    from siggan_tpu.core.config import TrainConfig

    cfg = TrainConfig()
    rs = np.random.RandomState(0)
    images = jax.numpy.asarray(
        (rs.rand(2048, 64, 64, 1) * 2 - 1).astype(np.float32))

    arms = sys.argv[1:] or ["base", "convt", "phases", "convt_phases"]
    for arm in arms:
        if arm == "base":
            bench(cfg, images, 512, label="base (r3c defaults)")
        elif arm == "convt":
            bench(_model(cfg, g_convt_cvjp=True), images, 512,
                  label="g_convt_cvjp")
        elif arm == "phases":
            bench(_model(cfg, d_dgrad_phases=True), images, 512,
                  label="d_dgrad_phases")
        elif arm == "convt_phases":
            bench(_model(cfg, g_convt_cvjp=True, d_dgrad_phases=True),
                  images, 512, label="convt+phases")
        elif arm == "k1024":
            bench(cfg, images, 1024, iters=4, label="base K=1024")
        elif arm == "convt_k1024":
            bench(_model(cfg, g_convt_cvjp=True), images, 1024, iters=4,
                  label="g_convt_cvjp K=1024")
        elif arm in ("unroll2", "convt_unroll2", "convt_unroll4"):
            orig_scan = jax.lax.scan
            n = 4 if arm.endswith("4") else 2

            def scan_u(*a, **k):
                k.setdefault("unroll", n)
                return orig_scan(*a, **k)

            c = _model(cfg, g_convt_cvjp=True) if "convt" in arm else cfg
            jax.lax.scan = scan_u
            try:
                bench(c, images, 512, label=arm)
            finally:
                jax.lax.scan = orig_scan
        else:
            print(f"unknown arm {arm}", flush=True)


if __name__ == "__main__":
    main()
