"""Pallas TPU kernels: fused TRAIN-mode packed generator tail (VERDICT r1 #8).

The round-2 packed tail (ops/packed.py) runs the generator's small-channel
blocks as 128-lane packed convs under XLA. This module is the one-shot
Pallas attempt at beating that: the whole tail forward — entry conv,
interior packed ConvT blocks, final conv+tanh — as chained kernels where
each activation makes exactly ONE HBM round trip:

  K_entry:    x (pixel space)          -> y_0 raw   + batch stats_0
  K_interior: y_{k-1} raw + affine_(k-1)+ReLU fused in-flight
              -> packed ConvT          -> y_k raw   + stats_k
  K_final:    y_last raw + affine+ReLU -> conv3+bias+tanh -> packed image

Batch statistics accumulate across the (sequential) batch grid into a tiny
f32 output; the per-block normalize AFFINE is computed between calls (in-jit,
on (C,) vectors) and fused into the NEXT kernel's prologue — no separate
normalize pass over any activation. Train-mode BN semantics (biased batch
var for normalization, EMA of unbiased var into running stats) match
ops/norm.py exactly; stats for canonical channel c reduce over the 4 packed
phases (planar order).

Convs use the phases-as-matmul formulation from upsample.py: ConvT(4,2,1)
(packed form included, ops/packed.py) decomposes into 4 stride-1 2x2-kernel
phases over a shared 3x3 neighborhood -> patches(h*w, 9Ci) @ W9(9Ci, 4Co);
the entry/final k3s1p1 convs are the same patches form with a single phase.

MEASURED VERDICT: see BASELINE.md "Pallas train-path attempt" (round 2) —
filled in from scripts/bench_pallas_tail.py at 64px and 128px.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from siggan_tpu.core.config import ModelConfig
from siggan_tpu.models import generator as gen
from siggan_tpu.ops.norm import EPS, MOMENTUM
from siggan_tpu.ops.packed import (pack_conv3_kernel_both_mc,
                                   pack_convt_kernel_both_mc,
                                   pack_convt_kernel_out_mc)
from siggan_tpu.ops.pallas.upsample import pack_w9


def pack_w9_conv3(w: jax.Array) -> jax.Array:
    """(3,3,Ci,Co) s1p1 conv kernel -> (9*Ci, Co) patches matrix, tap-major
    rows t = 3*(a+1)+(b+1) for input offset (a,b) in {-1,0,1}^2."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    # patches use x[i+a-1, j+b-1] in tap order t=3a+b — exactly the
    # row-major flattening of the (cross-correlation) kernel.
    return w.reshape(9 * ci, co)


def _matmul_conv3(xp, w9, h, w, ci):
    """xp: padded (h+2, w+2, ci) -> (h*w, co) via 9-tap patches matmul."""
    taps = [xp[a:a + h, b:b + w, :].reshape(h * w, ci)
            for a in range(3) for b in range(3)]
    return jnp.dot(jnp.concatenate(taps, axis=1), w9,
                   preferred_element_type=jnp.float32)


def _entry_kernel(x_ref, w9_ref, sum_ref, sq_ref, y_ref, *,
                  h: int, w: int, ci: int, co: int):
    """k3s1p1 conv (tail entry embedding) + stats accumulation."""
    i = pl.program_id(0)
    x = x_ref[0]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    y = _matmul_conv3(xp, w9_ref[...], h, w, ci).reshape(h, w, co)
    y_ref[0] = y.astype(y_ref.dtype)
    yf = y.astype(jnp.float32)
    s = jnp.sum(yf, axis=(0, 1))[None]
    q = jnp.sum(yf * yf, axis=(0, 1))[None]

    @pl.when(i == 0)
    def _():
        sum_ref[...] = s
        sq_ref[...] = q

    @pl.when(i > 0)
    def _():
        sum_ref[...] += s
        sq_ref[...] += q


def _interior_kernel(y_ref, a_ref, b_ref, w9_ref, sum_ref, sq_ref, out_ref, *,
                     h: int, w: int, ci: int, co: int):
    """affine+ReLU on the previous RAW conv output, then packed ConvT(4,2,1)
    as 4 phase matmuls, + stats accumulation (packed channels ci -> co)."""
    i = pl.program_id(0)
    z = jnp.maximum(y_ref[0] * a_ref[0] + b_ref[0], 0.0).astype(y_ref.dtype)
    zp = jnp.pad(z, ((1, 1), (1, 1), (0, 0)))
    taps = [zp[a:a + h, b:b + w, :].reshape(h * w, ci)
            for a in range(3) for b in range(3)]
    patches = jnp.concatenate(taps, axis=1)
    phase = []
    ssum = jnp.zeros((co,), jnp.float32)
    ssq = jnp.zeros((co,), jnp.float32)
    for p in range(4):
        yp = jnp.dot(patches, w9_ref[p], preferred_element_type=jnp.float32)
        ssum = ssum + jnp.sum(yp, axis=0)
        ssq = ssq + jnp.sum(yp * yp, axis=0)
        phase.append(yp.reshape(h, w, co))
    col0 = jnp.stack([phase[0], phase[2]], axis=1).reshape(2 * h, w, co)
    col1 = jnp.stack([phase[1], phase[3]], axis=1).reshape(2 * h, w, co)
    y = jnp.stack([col0, col1], axis=2).reshape(2 * h, 2 * w, co)
    out_ref[0] = y.astype(out_ref.dtype)

    @pl.when(i == 0)
    def _():
        sum_ref[...] = ssum[None]
        sq_ref[...] = ssq[None]

    @pl.when(i > 0)
    def _():
        sum_ref[...] += ssum[None]
        sq_ref[...] += ssq[None]


def _final_kernel(y_ref, a_ref, b_ref, w9_ref, bias_ref, img_ref, *,
                  h: int, w: int, ci: int, co: int):
    """affine+ReLU + k3s1p1 conv (packed final embedding) + bias + tanh."""
    z = jnp.maximum(y_ref[0] * a_ref[0] + b_ref[0], 0.0).astype(y_ref.dtype)
    zp = jnp.pad(z, ((1, 1), (1, 1), (0, 0)))
    img = _matmul_conv3(zp, w9_ref[...], h, w, ci) + bias_ref[0]
    img_ref[0] = jnp.tanh(img).reshape(h, w, co).astype(img_ref.dtype)


def _stats_to_affine(ssum, ssq, scale, offset, state, count):
    """Packed-channel sums -> canonical BN stats (reduce the 4 phases),
    train-mode affine (a4, b4) over packed channels + new running state."""
    c = scale.shape[0]
    mean_p = ssum / count
    mean = jnp.mean(mean_p.reshape(4, c), axis=0)
    # var over union of phases: E[y^2] - E[y]^2 with phase-pooled moments
    ey2 = jnp.mean((ssq / count).reshape(4, c), axis=0)
    var = ey2 - mean * mean
    n = count * 4
    unbiased = var * (n / max(n - 1, 1))
    new_state = {
        "mean": (1 - MOMENTUM) * state["mean"] + MOMENTUM * mean,
        "var": (1 - MOMENTUM) * state["var"] + MOMENTUM * unbiased,
    }
    a = scale * jax.lax.rsqrt(var + EPS)
    b = offset - mean * a
    return jnp.tile(a, 4), jnp.tile(b, 4), new_state


def tail_forward_train(
    params: Dict, state: Dict, h0: jax.Array, cfg: ModelConfig, *,
    interpret: bool = False, compute_dtype=jnp.float32,
) -> Tuple[jax.Array, List[Dict]]:
    """Run the packed tail in train mode from the last pixel-space
    activation ``h0`` (N, H, W, C_pre) (output of the last wide block's
    ReLU). Returns (packed image (N, H', W', 4), new tail BN states).

    Mirrors generator.apply_fn's packed path for the blocks with
    Cout <= 64; numerical parity is tested in tests/test_pallas.py.
    """
    _, blocks = gen.channel_schedule(cfg)
    start = min(i for i, (_, co) in enumerate(blocks) if co <= 64)
    n, h, w, ci = h0.shape
    cdt = jnp.dtype(compute_dtype)
    x = h0.astype(cdt)

    new_states: List[Dict] = []
    # --- entry: conv2d(x, pack_out(w), s1, p1) + stats ---
    p = params["blocks"][start]
    k_entry = pack_convt_kernel_out_mc(p["w"]).astype(cdt)   # (3,3,ci,4co)
    co4 = k_entry.shape[3]
    w9 = pack_w9_conv3(k_entry)
    kern = functools.partial(_entry_kernel, h=h, w=w, ci=ci, co=co4)
    ssum, ssq, y = pl.pallas_call(
        kern, grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w9.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, co4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, co4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, co4), jnp.float32),
            jax.ShapeDtypeStruct((1, co4), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w, co4), cdt),
        ],
        interpret=interpret,
    )(x, w9)
    count = n * h * w
    a4, b4, st = _stats_to_affine(
        ssum[0], ssq[0], p["bn"]["scale"], p["bn"]["offset"],
        state["blocks"][start], count)
    new_states.append(st)

    # --- interior packed ConvT blocks ---
    for bi in range(start + 1, len(blocks)):
        p = params["blocks"][bi]
        kp = pack_convt_kernel_both_mc(p["w"]).astype(cdt)   # (4,4,4ci,4co)
        ci4, c = kp.shape[2], kp.shape[3]
        w9i = pack_w9(kp)                                    # (4, 9*4ci, 4co)
        kern = functools.partial(_interior_kernel, h=h, w=w, ci=ci4, co=c)
        ssum, ssq, y = pl.pallas_call(
            kern, grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w, ci4), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ci4), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ci4), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w9i.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * h, 2 * w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((1, c), jnp.float32),
                jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), cdt),
            ],
            interpret=interpret,
        )(y, a4.astype(cdt)[None], b4.astype(cdt)[None], w9i)
        h, w = 2 * h, 2 * w
        a4, b4, st = _stats_to_affine(
            ssum[0], ssq[0], p["bn"]["scale"], p["bn"]["offset"],
            state["blocks"][bi], n * h * w)
        new_states.append(st)

    # --- final conv + tanh ---
    kf = pack_conv3_kernel_both_mc(params["final"]["w"]).astype(cdt)
    ci4, co4 = kf.shape[2], kf.shape[3]
    w9f = pack_w9_conv3(kf)
    bias = jnp.broadcast_to(params["final"]["b"], (co4 // 4,))
    bias4 = jnp.tile(bias, 4).astype(jnp.float32)
    kern = functools.partial(_final_kernel, h=h, w=w, ci=ci4, co=co4)
    img = pl.pallas_call(
        kern, grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, ci4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w9f.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, co4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co4), cdt),
        interpret=interpret,
    )(y, a4.astype(cdt)[None], b4.astype(cdt)[None], w9f, bias4[None])
    return img, new_states
