"""Quick throughput experiments: bf16 resident storage, scan unroll."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from siggan_tpu.core.config import TrainConfig
from siggan_tpu.core.state import create_train_state
from siggan_tpu.train.train_step import make_resident_multi_step
import siggan_tpu.train.train_step as ts


def bench(cfg, images, K=32, iters=8, unroll=1, label=""):
    state = create_train_state(cfg)
    fn, _ = make_resident_multi_step(cfg, images.shape[0], K)
    if unroll != 1:
        # monkey-style: rebuild with unroll by patching lax.scan call
        import functools
        orig_scan = jax.lax.scan
        def scan_u(*a, **k):
            k.setdefault("unroll", unroll)
            return orig_scan(*a, **k)
        jax.lax.scan = scan_u
        try:
            fn, _ = make_resident_multi_step(cfg, images.shape[0], K)
            step = jax.jit(fn, donate_argnums=(0,))
            state, m = step(state, images)
        finally:
            jax.lax.scan = orig_scan
    else:
        step = jax.jit(fn, donate_argnums=(0,))
        state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, images)
    jax.block_until_ready(m["g_loss"])
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{label:40s} {dt*1e3:7.3f} ms  {cfg.batch_size/dt:8.0f} img/s",
          flush=True)


def main():
    cfg = TrainConfig()
    rs = np.random.RandomState(0)
    raw = (rs.rand(2048, 64, 64, 1) * 2 - 1).astype(np.float32)
    img32 = jnp.asarray(raw)
    img16 = jnp.asarray(raw, jnp.bfloat16)
    print(f"device: {jax.devices()[0]}")
    bench(cfg, img32, label="baseline f32 resident")
    bench(cfg, img16, label="bf16 resident")
    bench(cfg, img16, unroll=2, label="bf16 + unroll 2")
    bench(cfg, img16, unroll=4, label="bf16 + unroll 4")


if __name__ == "__main__":
    main()
