"""Decompose the fused train step: time each sub-program in isolation.

Each part is timed as its own K-step scanned, donated, jitted program on the
real device (whole-program timing per the tunnel rules). Parts overlap
(d_step contains a G forward), so the numbers don't sum to the full step —
they bound where the time goes.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from siggan_tpu.core import rng as rnglib
from siggan_tpu.core.config import TrainConfig
from siggan_tpu.core.state import create_train_state, make_optimizers
from siggan_tpu.models import discriminator, generator
from siggan_tpu.train import train_step as ts


def timed_scan(label, body, state_fn, iters=8, K=32):
    state = state_fn() if callable(state_fn) else state_fn
    def multi(s):
        return jax.lax.scan(lambda c, i: (body(c, i), None), s,
                            jnp.arange(K))[0]

    fn = jax.jit(multi, donate_argnums=(0,))
    s = fn(state)
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    jax.block_until_ready(jax.tree_util.tree_leaves(s)[0])
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{label:44s} {dt*1e3:7.3f} ms", flush=True)
    return dt


def main():
    cfg = TrainConfig()
    print(f"device: {jax.devices()[0]}")
    g_tx, d_tx = make_optimizers(cfg)
    mk_state = lambda: create_train_state(cfg)
    root = rnglib.root_key(0)
    cdt = jnp.dtype(cfg.compute_dtype)
    b = cfg.batch_size
    rs = np.random.RandomState(0)
    real = jnp.asarray((rs.rand(b, 64, 64, 1) * 2 - 1).astype(np.float32))
    packed = ts._packed(cfg)
    if packed:
        from siggan_tpu.ops.packed import space_to_depth
        real_p = space_to_depth(real)

    # Full fused step for reference.
    full = ts.make_train_step(cfg)
    timed_scan("full step", lambda s, i: full(s, real)[0], mk_state)

    # d_step alone / g_step alone.
    timed_scan("d_step only", lambda s, i: ts.d_step(
        s, real, jax.random.fold_in(root, i), jax.random.fold_in(root, i + 1),
        cfg, d_tx)[0], mk_state)
    timed_scan("g_step only", lambda s, i: ts.g_step(
        s, b, jax.random.fold_in(root, i), jax.random.fold_in(root, i + 1),
        cfg, g_tx)[0], mk_state)

    # G forward only (train mode, packed), no grad: the fake-gen part of d_step.
    def g_fwd(s, i):
        z = generator.generate_latent(jax.random.fold_in(root, i), b, cfg.model)
        fake, g_bn = generator.apply_fn(
            s.g_params, s.g_bn, z, cfg.model, train=True, compute_dtype=cdt,
            packed_output=packed)
        return s.replace(g_bn=jax.tree_util.tree_map(
            lambda a, bb: a + 0 * bb, s.g_bn, g_bn))
    timed_scan("G fwd (train, no grad)", g_fwd, mk_state)

    # D fwd only on 2b concat (no grad).
    def d_fwd(s, i):
        x = jnp.concatenate([real_p.astype(cdt) if packed else real.astype(cdt)] * 2, 0)
        logits, d_state = discriminator.apply_fn(
            s.d_params, s.d_state, x, cfg.model, train=True,
            rng=jax.random.fold_in(root, i), compute_dtype=cdt,
            packed_input=packed)
        leaf = jnp.sum(logits) * 0
        return s.replace(d_params=jax.tree_util.tree_map(
            lambda p: p + leaf.astype(p.dtype), s.d_params))
    timed_scan("D fwd 2b (train, no grad)", d_fwd, mk_state)

    # Adam-only: apply zero grads through both optimizers.
    def opt_only(s, i):
        zg = jax.tree_util.tree_map(jnp.zeros_like, s.g_params)
        zd = jax.tree_util.tree_map(jnp.zeros_like, s.d_params)
        gu, g_opt = g_tx.update(zg, s.g_opt, s.g_params)
        du, d_opt = d_tx.update(zd, s.d_opt, s.d_params)
        import optax
        return s.replace(
            g_params=optax.apply_updates(s.g_params, gu), g_opt=g_opt,
            d_params=optax.apply_updates(s.d_params, du), d_opt=d_opt)
    timed_scan("2x Adam update only", opt_only, mk_state)

    # Resident gather + augment (data path).
    images = jnp.asarray((rs.rand(2048, 64, 64, 1) * 2 - 1).astype(np.float32))
    from siggan_tpu.data.augment import augment_batch_inner
    def data_only(s, i):
        perm = jax.random.permutation(jax.random.fold_in(root, i), 2048)
        idx = jax.lax.dynamic_slice(perm, (0,), (b,))
        x = jnp.take(images, idx, axis=0)
        x = augment_batch_inner(x, jax.random.fold_in(root, i), hflip=False,
                                dtype=cdt)
        leaf = jnp.sum(x) * 0
        return s.replace(step=s.step + 1 + leaf.astype(s.step.dtype))
    timed_scan("gather+augment only", data_only, mk_state)


if __name__ == "__main__":
    main()
