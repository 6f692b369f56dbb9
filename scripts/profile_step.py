"""Ablation profile of the fused train step: where do the 2.27 ms go?

Times K-step scan dispatches for several variants on the real device and
prints ms/step for each. Used to target round-2 optimization work
(VERDICT r1 #2b).
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from siggan_tpu.core.config import TrainConfig
from siggan_tpu.core.state import create_train_state
from siggan_tpu.train import train_step as ts


def time_multi(cfg: TrainConfig, n_images=2048, K=32, iters=8, label=""):
    state = create_train_state(cfg)
    rs = np.random.RandomState(0)
    images = jnp.asarray((rs.rand(
        n_images, cfg.model.image_size, cfg.model.image_size,
        cfg.model.image_channels) * 2 - 1).astype(np.float32))
    fn, _ = ts.make_resident_multi_step(cfg, n_images, K)
    step = jax.jit(fn, donate_argnums=(0,))
    state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{label:42s} {dt*1e3:7.3f} ms/step  "
          f"{cfg.batch_size/dt:10.0f} img/s")
    return dt


def main():
    base = TrainConfig()
    print(f"device: {jax.devices()[0]}")
    time_multi(base, label="full step (baseline)")
    time_multi(dataclasses.replace(base, augment=False), label="no augment")
    time_multi(dataclasses.replace(base, n_critic=0) if hasattr(base, "n_critic") else base,
               label="G step only (n_critic=0)") if False else None

    # D-only / G-only: hack via n_critic
    try:
        time_multi(dataclasses.replace(base, compute_dtype=None),
                   label="fp32 compute")
    except Exception as e:
        print("fp32 variant failed:", e)
    for bs in (128, 256, 512):
        time_multi(dataclasses.replace(base, batch_size=bs),
                   label=f"batch {bs}")


if __name__ == "__main__":
    main()
