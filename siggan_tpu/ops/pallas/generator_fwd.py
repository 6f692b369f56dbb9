"""Pallas TPU kernel: the ENTIRE generator forward in one kernel.

The XLA generator forward at 64px/batch-64 spreads ~20 kernels over HBM
round-trips; here the whole network — fc -> reshape -> 4x (ConvT+BN+ReLU)
-> 3x3 conv -> tanh — runs per batch-tile with every intermediate resident
in VMEM. One HBM read of z + weights, one HBM write of images.

Mosaic-shaped choices:
 - ConvT(4,2,1) = 4 output phases, each accumulated TAP-WISE as
   shifted-view @ K matmuls (no im2col patch tensor -> no VMEM blowup, and
   no lane-dimension splits, which Mosaic cannot lower);
 - the fc is pre-split into 16 per-pixel (zdim, C0) matrices so its output
   materializes directly as (T, 4, 4, C0) without splitting lanes;
 - depth-to-space uses lane-preserving stack+merge reshapes only;
 - eval-mode BN is folded into per-block (scale, offset) affines.

Inference-path kernel (train mode needs batch statistics across the full
batch, which stays in XLA). Allclose-tested against the XLA path in
``tests/test_pallas.py`` (interpret mode) and exact on real TPU v5e
(maxdiff 6e-6 at the full 64px architecture).

MEASURED VERDICT (TPU v5e, batch 64, f32): this kernel runs 1.47 ms vs
0.34 ms for the jitted XLA forward — the tap-wise unrolled chain produces
~126 MB of register-allocator spill slots, and tile=16 exceeds the 128 MB
VMEM budget outright. XLA's conv pipeline is simply better at this
small-activation network than a monolithic hand fusion, so the XLA path
remains the default (``use_pallas=False``); the kernel stays as working,
tested infrastructure for shapes where fusion wins (larger resolutions /
channel counts) and as the ConvT-phase-decomposition reference.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from siggan_tpu.core.config import ModelConfig
from siggan_tpu.models.generator import channel_schedule
from siggan_tpu.ops.pallas.upsample import fold_bn_affine


def pack_block_taps(w: jax.Array) -> jax.Array:
    """(4,4,Cin,Cout) ConvT weight -> (4 phases, 2, 2, Cin, Cout) tap kernels.

    Phase (di,dj) output: y[i,j] = sum_{a',b'} x[i+di-1+a', j+dj-1+b'] @
    K[phase, a', b'] with K[phase, a', b'] = wf[di+2a', dj+2b'],
    wf the spatially flipped kernel (validated vs ops/conv.py).
    """
    wf = w[::-1, ::-1, :, :]
    phases = []
    for di in range(2):
        for dj in range(2):
            phases.append(jnp.stack(
                [jnp.stack([wf[di + 2 * a, dj + 2 * b] for b in range(2)])
                 for a in range(2)]))
    return jnp.stack(phases)  # (4, 2, 2, cin, cout)


def pack_generator(g_params: Dict, g_bn: Dict, cfg: ModelConfig) -> Dict:
    """Fold BN + restructure all generator weights for the kernel."""
    c0, blocks = channel_schedule(cfg)
    fc_s, fc_o = fold_bn_affine(g_params["fc_bn"], g_bn["fc_bn"])
    wfc = g_params["fc"]["w"] * fc_s[None, :]           # fold BN scale
    bfc = (g_params["fc"]["b"] * fc_s + fc_o)           # fold BN offset
    # per-pixel fc chunks: feature index ((a*4+b)*c0 + c)
    wfc16 = wfc.reshape(cfg.latent_dim, 16, c0).transpose(1, 0, 2)
    bfc16 = bfc.reshape(16, c0)
    packed = {"wfc16": wfc16, "bfc16": bfc16, "blocks": []}
    for p, st in zip(g_params["blocks"], g_bn["blocks"]):
        s, o = fold_bn_affine(p["bn"], st)
        packed["blocks"].append({
            "taps": pack_block_taps(p["w"]),
            "scale": s.reshape(1, -1), "offset": o.reshape(1, -1),
        })
    # final 3x3 conv packed tap-wise: (3, 3, cin, 1)
    packed["wfin"] = g_params["final"]["w"]
    packed["bfin"] = g_params["final"]["b"]
    return packed


def _block(x: jax.Array, taps: jax.Array, scale: jax.Array, offset: jax.Array,
           relu: bool = True) -> jax.Array:
    """x: (T, h, w, cin) -> (T, 2h, 2w, cout), tap-wise ConvT + affine (+relu)."""
    t, h, w, cin = x.shape
    cout = taps.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    phase: List[jax.Array] = []
    for di in range(2):
        for dj in range(2):
            acc = None
            for a in range(2):
                for b in range(2):
                    xi = xp[:, di + a:di + a + h, dj + b:dj + b + w, :]
                    m = jnp.dot(xi.reshape(t * h * w, cin),
                                taps[2 * di + dj, a, b],
                                preferred_element_type=jnp.float32)
                    acc = m if acc is None else acc + m
            y = acc * scale + offset
            if relu:
                y = jnp.maximum(y, 0.0)
            phase.append(y.reshape(t, h, w, cout))
    col0 = jnp.stack([phase[0], phase[2]], axis=2).reshape(t, 2 * h, w, cout)
    col1 = jnp.stack([phase[1], phase[3]], axis=2).reshape(t, 2 * h, w, cout)
    return jnp.stack([col0, col1], axis=3).reshape(t, 2 * h, 2 * w, cout)


def _gen_kernel(z_ref, wfc_ref, bfc_ref, b1_ref, s1_ref, o1_ref, b2_ref,
                s2_ref, o2_ref, b3_ref, s3_ref, o3_ref, b4_ref, s4_ref,
                o4_ref, wfin_ref, bfin_ref, out_ref, *, tile: int, c0: int):
    z = z_ref[...]
    # fc as 16 per-pixel matmuls + relu -> (T, 4, 4, c0)
    pix = [jnp.maximum(
        jnp.dot(z, wfc_ref[i], preferred_element_type=jnp.float32)
        + bfc_ref[i], 0.0) for i in range(16)]
    h = jnp.stack(pix, axis=1).reshape(tile, 4, 4, c0)

    h = _block(h, b1_ref[...], s1_ref[...], o1_ref[...])
    h = _block(h, b2_ref[...], s2_ref[...], o2_ref[...])
    h = _block(h, b3_ref[...], s3_ref[...], o3_ref[...])
    h = _block(h, b4_ref[...], s4_ref[...], o4_ref[...])

    # final 3x3 conv (cin -> 1) + tanh, tap-wise
    t, hh, ww, cin = h.shape
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for a in range(3):
        for b in range(3):
            xi = hp[:, a:a + hh, b:b + ww, :]
            m = jnp.dot(xi.reshape(t * hh * ww, cin), wfin_ref[a, b],
                        preferred_element_type=jnp.float32)
            acc = m if acc is None else acc + m
    img = jnp.tanh(acc + bfin_ref[0])
    out_ref[...] = img.reshape(t, hh, ww, 1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def generator_forward(packed: Dict, z: jax.Array, *, tile: int = 8,
                      interpret: bool = False) -> jax.Array:
    """Fused inference forward: z (N, zdim) -> images (N, S, S, 1) in [-1,1].

    N must be a multiple of ``tile`` (pad z and slice if not — see
    ``generate`` wrappers). Image size is inferred from the packed weights.
    """
    n, zdim = z.shape
    assert n % tile == 0, f"batch {n} not a multiple of tile {tile}"
    c0 = packed["wfc16"].shape[-1]
    n_blocks = len(packed["blocks"])
    size = 4 * (2 ** n_blocks)
    blocks = packed["blocks"]
    assert n_blocks == 4, "kernel is specialized for the 64px generator"

    kern = functools.partial(_gen_kernel, tile=tile, c0=c0)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                                      memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((tile, zdim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                full(packed["wfc16"].shape), full(packed["bfc16"].shape)]
    args = [z, packed["wfc16"], packed["bfc16"]]
    for blk in blocks:
        in_specs += [full(blk["taps"].shape), full(blk["scale"].shape),
                     full(blk["offset"].shape)]
        args += [blk["taps"], blk["scale"], blk["offset"]]
    in_specs += [full(packed["wfin"].shape), full((1, 1))]
    args += [packed["wfin"], packed["bfin"].reshape(1, 1)]

    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, size, size, 1), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, size, size, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args) if not interpret else pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, size, size, 1), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, size, size, 1), jnp.float32),
        interpret=True,
    )(*args)
