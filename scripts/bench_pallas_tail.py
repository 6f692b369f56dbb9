"""Pallas fused train-tail vs XLA packed tail — the VERDICT r1 #8 kill
criterion. Times the TRAIN-mode tail forward (entry + interior ConvTs +
final conv + tanh, batch stats included) both ways, at 64px and 128px,
batch 64, bf16, as K-iteration scanned programs on the real device.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from siggan_tpu.core.config import ModelConfig
from siggan_tpu.models import generator as gen
from siggan_tpu.ops.conv import conv2d, conv_transpose2d
from siggan_tpu.ops.norm import batch_norm_packed
from siggan_tpu.ops.packed import (pack_conv3_kernel_both_mc,
                                   pack_convt_kernel_both_mc,
                                   pack_convt_kernel_out_mc)
from siggan_tpu.ops.pallas.train_tail import tail_forward_train


def xla_tail(params, state, h0, cfg, cdt):
    _, blocks = gen.channel_schedule(cfg)
    start = min(i for i, (_, co) in enumerate(blocks) if co <= 64)
    y = conv2d(h0, pack_convt_kernel_out_mc(params["blocks"][start]["w"]),
               stride=1, padding=1, compute_dtype=cdt)
    sts = []
    y, st = batch_norm_packed(
        y, params["blocks"][start]["bn"]["scale"],
        params["blocks"][start]["bn"]["offset"], state["blocks"][start],
        train=True)
    sts.append(st)
    y = jax.nn.relu(y)
    for i in range(start + 1, len(blocks)):
        p = params["blocks"][i]
        y = conv_transpose2d(y, pack_convt_kernel_both_mc(p["w"]),
                             stride=2, padding=1, compute_dtype=cdt)
        y, st = batch_norm_packed(y, p["bn"]["scale"], p["bn"]["offset"],
                                  state["blocks"][i], train=True)
        sts.append(st)
        y = jax.nn.relu(y)
    wf = pack_conv3_kernel_both_mc(params["final"]["w"])
    img = jnp.tanh(conv2d(y, wf, jnp.broadcast_to(params["final"]["b"], (4,)),
                          stride=1, padding=1, compute_dtype=cdt))
    return img, sts


def bench(image_size, batch=64, K=32, iters=8):
    cfg = ModelConfig(image_size=image_size)
    params, state = gen.init_fn(jax.random.key(0), cfg)
    _, blocks = gen.channel_schedule(cfg)
    start = min(i for i, (_, co) in enumerate(blocks) if co <= 64)
    h_sp = 4 * 2 ** start
    ci = blocks[start][0]
    rs = np.random.RandomState(0)
    h0 = jnp.asarray(rs.rand(batch, h_sp, h_sp, ci).astype(np.float32))
    cdt = jnp.bfloat16

    def scan_of(fn):
        def multi(x):
            def body(c, _):
                # Thread the carry into the INPUT too: with a loop-invariant
                # fn(x), XLA can hoist the whole forward out of the scan
                # (and does so only for the non-opaque XLA arm, biasing the
                # comparison). + 0*c keeps the body iteration-dependent at
                # zero arithmetic cost.
                img, sts = fn(x + (0.0 * c).astype(x.dtype))
                # fold outputs into the carry so nothing is dead code
                return c + jnp.float32(img.astype(jnp.float32).mean()) \
                    + sts[0]["mean"][0], None
            return jax.lax.scan(body, jnp.float32(0), None, length=K)[0]
        return jax.jit(multi)

    for label, fn in [
        ("xla packed tail", lambda x: xla_tail(params, state, x, cfg, cdt)),
        ("pallas fused tail", lambda x: tail_forward_train(
            params, state, x, cfg, compute_dtype=cdt)),
    ]:
        try:
            f = scan_of(fn)
            out = f(h0)
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(h0)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / (iters * K)
            print(f"{image_size}px {label:22s} {dt*1e6:8.1f} us/fwd", flush=True)
        except Exception as e:
            print(f"{image_size}px {label:22s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    bench(64)
    bench(128)
