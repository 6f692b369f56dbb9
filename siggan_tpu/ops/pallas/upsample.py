"""Pallas TPU kernel: fused generator upsample block.

Fuses ConvTranspose(4,2,1) + BatchNorm-affine + ReLU — the generator's hot
block (SURVEY §7 stage 4) — into one kernel: inputs stream HBM->VMEM once,
the transposed conv runs as a single MXU matmul, and the affine+ReLU epilogue
happens in-register before the only HBM write.

Formulation (no gathers, no lhs_dilation):
  ConvT(4,2,1) decomposes into 4 output phases, each a 2x2-kernel stride-1
  conv over the input (validated exactly in tests/test_pallas.py). All four
  phases read from the same 3x3 input neighborhood, so the whole block is
    patches(T*H*W, 9*Cin) @ W9(9*Cin, 4*Cout)
  with W9 zero where a phase does not use a tap (5/9 positions) — 2.25x
  padded FLOPs, but one dense MXU pass beats many small convs at these
  sizes. Depth-to-space interleaving to (2H, 2W, Cout) happens in-kernel.

The BN affine covers both eval mode (running stats folded in) and the
normalize-apply stage of train mode (stats computed outside); `relu=False`
gives the raw conv for the final layer. Gated by TrainConfig.use_pallas with
the XLA path as fallback; numerics are allclose-tested against the XLA
reference implementation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_w9(w: jax.Array) -> jax.Array:
    """(4,4,Cin,Cout) ConvT weight -> (4, 9*Cin, Cout) phase-packed matrices.

    Output column block p = 2*di+dj holds phase (di, dj); row block
    t = 3*(a+1) + (b+1) holds input tap offset (a, b) in {-1,0,1}^2.
    Phase (di,dj) uses kernel entry wf[di+2a', dj+2b'] at input offset
    (di-1+a', dj-1+b') for a',b' in {0,1}, where wf is the spatially
    flipped kernel (see ops/conv.py conv_transpose2d).
    """
    kh, kw, cin, cout = w.shape
    assert kh == 4 and kw == 4
    wf = w[::-1, ::-1, :, :]
    w9 = jnp.zeros((9, cin, 4, cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            for ap in range(2):
                for bp in range(2):
                    a = di - 1 + ap  # input row offset in {-1,0,1}
                    b = dj - 1 + bp
                    t = 3 * (a + 1) + (b + 1)
                    w9 = w9.at[t, :, 2 * di + dj, :].set(wf[di + 2 * ap, dj + 2 * bp])
    # (4 phases, 9*cin, cout): one matrix per output phase
    return jnp.transpose(w9, (2, 0, 1, 3)).reshape(4, 9 * cin, cout)


def _kernel(x_ref, w9_ref, scale_ref, offset_ref, out_ref, *, h: int, w: int,
            cin: int, cout: int, relu: bool):
    """One batch element per grid step. x: (h, w, cin) -> out (2h, 2w, cout)."""
    x = x_ref[0]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    # 9-tap patches: (h*w, 9*cin), tap-major to match pack_w9 rows.
    # Lane-dim concat is fine on Mosaic; lane-dim SPLITS are not, so the
    # phases run as 4 separate (h*w, 9cin)@(9cin, cout) matmuls and the
    # depth-to-space uses only lane-preserving stack+merge reshapes.
    taps = [xp[a:a + h, b:b + w, :].reshape(h * w, cin)
            for a in range(3) for b in range(3)]
    patches = jnp.concatenate(taps, axis=1)

    phase = []
    for p in range(4):
        yp = jnp.dot(patches, w9_ref[p], preferred_element_type=jnp.float32)
        yp = yp * scale_ref[0] + offset_ref[0]        # BN affine, (cout,) bcast
        if relu:
            yp = jnp.maximum(yp, 0.0)
        phase.append(yp.reshape(h, w, cout))
    # rows: interleave di=0/1 -> (2h, w, c); cols: interleave dj=0/1
    col0 = jnp.stack([phase[0], phase[2]], axis=1).reshape(2 * h, w, cout)
    col1 = jnp.stack([phase[1], phase[3]], axis=1).reshape(2 * h, w, cout)
    y = jnp.stack([col0, col1], axis=2).reshape(2 * h, 2 * w, cout)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def upsample_block(x: jax.Array, w9: jax.Array, scale: jax.Array,
                   offset: jax.Array, *, relu: bool = True,
                   interpret: bool = False) -> jax.Array:
    """x: (N, H, W, Cin), w9: (9*Cin, 4*Cout) from pack_w9,
    w9 from pack_w9 has shape (4, 9*Cin, Cout);
    scale/offset: (Cout,) BN affine -> (N, 2H, 2W, Cout)."""
    n, h, w, cin = x.shape
    cout = w9.shape[2]
    kern = functools.partial(_kernel, h=h, w=w, cin=cin, cout=cout, relu=relu)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w9.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * h, 2 * w, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, cout), x.dtype),
        interpret=interpret,
    )(x.reshape(n, h, w, cin), w9,
      scale.reshape(1, cout), offset.reshape(1, cout))


def fold_bn_affine(bn_params, bn_state, eps: float = 1e-5
                   ) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode BN -> (scale, offset) for the kernel epilogue."""
    inv = jax.lax.rsqrt(bn_state["var"] + eps)
    s = inv * bn_params["scale"]
    return s, bn_params["offset"] - bn_state["mean"] * s
