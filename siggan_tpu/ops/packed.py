"""Space-to-depth packed training I/O — no C=1 tensors in the hot graph.

Single-channel 64x64 images are pathological for TPU tiling: every
elementwise op on a (N,H,W,1) tensor runs at ~1/16 lane/sublane utilization
under the layouts XLA picks for the adjacent convs (measured: tanh epilogue
58 us, BCE epilogue 90 us, final-conv weight-grad 103 us per step at b64 —
~20% of the whole train step spent shuffling one 1 MB image tensor).

Fix: keep train-time images in 2x2 space-to-depth form (N, H/2, W/2, 4) and
absorb the repacking into the adjacent convolutions EXACTLY:

 * G's final Conv(3x3, C->1, s1, p1) followed by space_to_depth(2) equals a
   Conv(4x4, C->4, s2, p1) whose kernel embeds shifted copies of the 3x3
   weights: K[dy+di, dx+dj, c, 2dy+dx] = W[di, dj, c, 0].
 * D's first Conv(4x4, 1->Co, s2, p1) on pixels equals a Conv(3x3, 4->Co,
   s1, p1) on the packed tensor: K2[a, b, 2py+px, o] = W[2a+py-1, 2b+px-1,
   0, o] (zero where the index leaves [0,4)).

Both identities are pure kernel re-indexing — the functions below build the
embedded kernels from the CANONICAL parameters (checkpoints keep the
reference shapes (3,3,C,1)/(4,4,1,Co)), so autodiff flows gradients back to
the canonical weights and every other consumer (eval, export, torch-parity
tests) is untouched. Equality is tested in tests/test_packed.py.

Reference ops these correspond to: generator_vanilla_gan.py:153-163 (final
conv) and discriminator_vanilla_gan.py:133-140 (first block).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["space_to_depth", "depth_to_space", "pack_final_conv_kernel",
           "pack_first_conv_kernel", "space_to_depth_mc", "depth_to_space_mc",
           "pack_convt_kernel_out_mc", "pack_convt_kernel_both_mc",
           "pack_conv3_kernel_both_mc"]


def space_to_depth(x: jax.Array) -> jax.Array:
    """(N, H, W, 1) -> (N, H/2, W/2, 4); channel order (2*py + px)."""
    n, h, w, c = x.shape
    if c != 1 or h % 2 or w % 2:
        raise ValueError(f"space_to_depth expects (N, even, even, 1), got {x.shape}")
    x = x.reshape(n, h // 2, 2, w // 2, 2)
    return x.transpose(0, 1, 3, 2, 4).reshape(n, h // 2, w // 2, 4)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(N, H/2, W/2, 4) -> (N, H, W, 1). Inverse of space_to_depth."""
    n, h2, w2, c = x.shape
    if c != 4:
        raise ValueError(f"depth_to_space expects 4 channels, got {x.shape}")
    x = x.reshape(n, h2, w2, 2, 2).transpose(0, 1, 3, 2, 4)
    return x.reshape(n, h2 * 2, w2 * 2, 1)


def pack_final_conv_kernel(w: jax.Array) -> jax.Array:
    """(3, 3, C, 1) -> (4, 4, C, 4) with conv(x, out, s2, p1) ==
    space_to_depth(conv(x, w, s1, p1))."""
    kh, kw, cin, cout = w.shape
    if (kh, kw, cout) != (3, 3, 1):
        raise ValueError(f"expected (3,3,C,1) final kernel, got {w.shape}")
    out = jnp.zeros((4, 4, cin, 4), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            out = out.at[dy:dy + 3, dx:dx + 3, :, 2 * dy + dx].set(w[..., 0])
    return out


def pack_first_conv_kernel(w: jax.Array) -> jax.Array:
    """(4, 4, 1, Co) -> (3, 3, 4, Co) with conv(space_to_depth(x), out, s1,
    p1) == conv(x, w, s2, p1)."""
    kh, kw, cin, cout = w.shape
    if (kh, kw, cin) != (4, 4, 1):
        raise ValueError(f"expected (4,4,1,Co) first kernel, got {w.shape}")
    out = jnp.zeros((3, 3, 4, cout), w.dtype)
    for a in range(3):
        for py in (0, 1):
            u = 2 * a + py - 1
            if not 0 <= u < 4:
                continue
            for b in range(3):
                for px in (0, 1):
                    v = 2 * b + px - 1
                    if not 0 <= v < 4:
                        continue
                    out = out.at[a, b, 2 * py + px, :].set(w[u, v, 0, :])
    return out


# ---------------------------------------------------------------------------
# Multi-channel packed tail (round 2).
#
# The generator's small-channel tail (Cout <= 64 at 16x16..64x64) is where the
# 64px step spends most of its G time: C=32 NHWC tensors occupy 32/128 lanes
# of every (8,128) tile, so convs run at ~11% MXU and even the BN normalize
# pass is 3x off the HBM roofline (measured round 2, see BASELINE.md). Fix:
# run the tail in 2x2 space-to-depth form — (N, H/2, W/2, 4C) puts 128
# channels on the lane dimension — with the canonical ConvT(4,2,1) kernels
# re-indexed EXACTLY into packed-space convolutions:
#
#  * tail entry (normal in, packed out):
#      conv2d(x, Kout, s1, p1) == s2d_mc(conv_transpose2d(x, w, s2, p1))
#    with Kout[a, b, ci, q*Co+co] = w[u, v, ci, co], u = 3 - 2a + q_row
#    (rows; columns identical), zero where u leaves [0, 4).
#  * interior (packed in and out) — self-similar: the packed form of
#    ConvT(4,2,1) is again a ConvT(4,2,1), with
#      Kboth[A, B, p*Ci+ci, q*Co+co] = w[u, v, ci, co],
#      u = 2A + q_row - 2p_row - 1.
#  * final Conv(3,1,1) (packed in and out):
#      Kfin[a, b, p*Ci+ci, q*Co+co] = w[du+1, dv+1, ci, co],
#      du = 2(a-1) - q_row + p_row, zero where |du| > 1.
#
# Channel order everywhere: PLANAR — packed index = (2*p_row + p_col)*C + c,
# which reduces to the existing single-channel order for C=1 (so the packed
# image form stays compatible with D's packed first conv). Planar order makes
# each embedded kernel a 4x4 BLOCK MATRIX over (in-phase, out-phase) whose
# blocks are strided slices of the zero-padded canonical kernel — built with
# plain pad/slice/concat in the conv's natural layout. (A first
# implementation used an einsum over an interleaved order; XLA materialized
# ~0.36 ms/step of 6-D transposes for it. The block-concat form measures at
# noise level.) Autodiff flows through the slicing, so backward convs run on
# the packed (128-lane) tensors too. Exactness: tests/test_packed.py.
# ---------------------------------------------------------------------------


def space_to_depth_mc(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C); channel order (2*p_row+p_col)*C + c."""
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"space_to_depth_mc expects even H, W, got {x.shape}")
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space_mc(x: jax.Array) -> jax.Array:
    """Inverse of space_to_depth_mc."""
    n, h2, w2, c4 = x.shape
    if c4 % 4:
        raise ValueError(f"depth_to_space_mc expects 4k channels, got {x.shape}")
    x = x.reshape(n, h2, w2, 2, 2, c4 // 4)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h2, 2 * w2, c4 // 4)


def _phase_block(wp: jax.Array, r0: int, c0: int, kk: int) -> jax.Array:
    """Stride-2 spatial slice of a zero-padded kernel: rows r0, r0+2, ...;
    structural zeros fall out of the padding."""
    return wp[r0:r0 + 2 * kk:2, c0:c0 + 2 * kk:2]


def pack_convt_kernel_out_mc(w: jax.Array) -> jax.Array:
    """(4,4,Ci,Co) -> (3,3,Ci,4Co): conv2d(x, out, s1, p1) ==
    space_to_depth_mc(conv_transpose2d(x, w, s2, p1)).

    Derivation (rows; cols identical): out[a, :, ci, q*Co+co] = w[u, :, ci, co]
    with u = 3 - 2a + q_row, zero where u leaves [0, 4).
    """
    kh, kw, ci, co = w.shape
    if (kh, kw) != (4, 4):
        raise ValueError(f"expected (4,4,Ci,Co), got {w.shape}")
    wrev = w[::-1, ::-1]                      # u = 3+q-2a -> rev index 2a-q
    wp = jnp.pad(wrev, ((2, 2), (2, 2), (0, 0), (0, 0)))
    qs = []
    for qr in (0, 1):
        for qc in (0, 1):
            qs.append(_phase_block(wp, 2 - qr, 2 - qc, 3))
    return jnp.concatenate(qs, axis=3)


def pack_convt_kernel_both_mc(w: jax.Array) -> jax.Array:
    """(4,4,Ci,Co) -> (4,4,4Ci,4Co): conv_transpose2d(X, out, s2, p1) ==
    s2d_mc(conv_transpose2d(d2s_mc(X), w, s2, p1)) for packed X.

    The packed form of ConvT(4,2,1) is again a ConvT(4,2,1):
    out[A, :, p*Ci+ci, q*Co+co] = w[u, :, ci, co], u = 2A + q_row - 2p_row - 1.
    """
    kh, kw, ci, co = w.shape
    if (kh, kw) != (4, 4):
        raise ValueError(f"expected (4,4,Ci,Co), got {w.shape}")
    wp = jnp.pad(w, ((4, 4), (4, 4), (0, 0), (0, 0)))
    ps = []
    for pr in (0, 1):
        for pc in (0, 1):
            qs = []
            for qr in (0, 1):
                for qc in (0, 1):
                    qs.append(_phase_block(
                        wp, 4 + qr - 2 * pr - 1, 4 + qc - 2 * pc - 1, 4))
            ps.append(jnp.concatenate(qs, axis=3))
    return jnp.concatenate(ps, axis=2)


def pack_conv3_kernel_both_mc(w: jax.Array) -> jax.Array:
    """(3,3,Ci,Co) -> (3,3,4Ci,4Co): conv2d(X, out, s1, p1) ==
    s2d_mc(conv2d(d2s_mc(X), w, s1, p1)) for packed X.

    out[a, :, p*Ci+ci, q*Co+co] = w[du+1, :, ci, co],
    du = 2(a-1) - q_row + p_row, zero where |du| > 1.
    """
    kh, kw, ci, co = w.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"expected (3,3,Ci,Co), got {w.shape}")
    wp = jnp.pad(w, ((3, 3), (3, 3), (0, 0), (0, 0)))
    ps = []
    for pr in (0, 1):
        for pc in (0, 1):
            qs = []
            for qr in (0, 1):
                for qc in (0, 1):
                    # index du+1 = 2a - 1 - q + p  ->  start (a=0): p - q - 1
                    qs.append(_phase_block(
                        wp, 3 + pr - qr - 1, 3 + pc - qc - 1, 3))
            ps.append(jnp.concatenate(qs, axis=3))
    return jnp.concatenate(ps, axis=2)


# ---------------------------------------------------------------------------
# 4x4 packed IMAGE boundary (round 2, second pass).
#
# After the packed tail, xprof still showed ~0.2 ms/step in ops touching the
# C=4 packed image (final-conv forwards at 12 TF/s, D's first conv at
# 6.4 TF/s, their backwards): a 4-channel tensor still wastes 124/128 lanes.
# Pack the image 4x4 instead — (N, S/4, S/4, 16), channel = 4*p_row + p_col —
# and re-index the two boundary convs again:
#
#  * G final: conv2d(H2, Kfin4, s2, p1) == s2d4(conv3s1p1(d2s_mc(H2)))
#    for the 2x2-packed internal activation H2;
#      Kfin4[A, B, p2*C+ci, 4qr+qc] = w[dr+1, dc+1, ci, 0],
#      dr = 2(A-1) - qr + p2_row, zero unless |dr| <= 1.
#  * D first conv: conv2d(X4, K1, s1, p1) gives the 2x2-packed form of
#    conv(4,2,1)(image): K1[a, b, 4pi_r+pi_c, qo*Co+co] = w[u, v, 0, co],
#      u = 4(a-1) + pi_r - 2qo_r + 1, zero outside [0, 4).
#  * D second conv consumes that 2x2-packed activation and returns to pixel
#    space: K2[a, b, p2*Ci+ci, co] = w[u, v, ci, co], u = 2a + p2_row - 1
#    (the existing pack_first_conv_kernel law, generalized to Ci > 1).
#
# All exact re-indexings (tests/test_packed.py); 2x2 packing of C=1 images
# remains for the Pallas investigation record and primitive tests.
# ---------------------------------------------------------------------------


def space_to_depth4(x: jax.Array) -> jax.Array:
    """(N, H, W, 1) -> (N, H/4, W/4, 16); channel order 4*p_row + p_col."""
    n, h, w, c = x.shape
    if c != 1 or h % 4 or w % 4:
        raise ValueError(f"space_to_depth4 expects (N, 4k, 4k, 1), got {x.shape}")
    x = x.reshape(n, h // 4, 4, w // 4, 4)
    return x.transpose(0, 1, 3, 2, 4).reshape(n, h // 4, w // 4, 16)


def depth_to_space4(x: jax.Array) -> jax.Array:
    """Inverse of space_to_depth4."""
    n, h4, w4, c = x.shape
    if c != 16:
        raise ValueError(f"depth_to_space4 expects 16 channels, got {x.shape}")
    x = x.reshape(n, h4, w4, 4, 4).transpose(0, 1, 3, 2, 4)
    return x.reshape(n, 4 * h4, 4 * w4, 1)


def _phase_block_s(wp: jax.Array, r0: int, c0: int, kk: int,
                   stride: int) -> jax.Array:
    """Strided spatial slice of a zero-padded kernel (stride 2 or 4)."""
    return wp[r0:r0 + stride * kk:stride, c0:c0 + stride * kk:stride]


def pack_final_conv_p4(w: jax.Array) -> jax.Array:
    """(3,3,C,1) -> (4,4,4C,16): conv2d(H2, out, s2, p1) ==
    space_to_depth4(conv2d(d2s_mc(H2), w, s1, p1)) for 2x2-packed H2."""
    kh, kw, ci, co = w.shape
    if (kh, kw, co) != (3, 3, 1):
        raise ValueError(f"expected (3,3,C,1), got {w.shape}")
    wsq = w[..., 0]                                   # (3,3,C)
    wp = jnp.pad(wsq, ((8, 8), (8, 8), (0, 0)))
    ps = []
    for pr in (0, 1):
        for pc in (0, 1):
            qs = []
            for qr in range(4):
                for qc in range(4):
                    # index dr+1 = 2A - 1 - qr + pr; start (A=0) at -1-qr+pr
                    blk = _phase_block_s(wp, 8 - 1 - qr + pr,
                                         8 - 1 - qc + pc, 4, 2)
                    qs.append(blk[..., None])
            ps.append(jnp.concatenate(qs, axis=3))    # (4,4,C,16)
    return jnp.concatenate(ps, axis=2)                # (4,4,4C,16)


def pack_first_conv_p4(w: jax.Array) -> jax.Array:
    """(4,4,1,Co) -> (3,3,16,4Co): conv2d(s2d4(x), out, s1, p1) ==
    s2d_mc(conv2d(x, w, s2, p1))."""
    kh, kw, cin, co = w.shape
    if (kh, kw, cin) != (4, 4, 1):
        raise ValueError(f"expected (4,4,1,Co), got {w.shape}")
    wsq = w[:, :, 0, :]                               # (4,4,Co)
    wp = jnp.pad(wsq, ((8, 8), (8, 8), (0, 0)))
    ps = []
    for pi_r in range(4):
        for pi_c in range(4):
            qs = []
            for qo_r in (0, 1):
                for qo_c in (0, 1):
                    # u = 4(a-1) + pi - 2qo + 1; start (a=0): pi - 2qo - 3
                    blk = _phase_block_s(wp, 8 + pi_r - 2 * qo_r - 3,
                                         8 + pi_c - 2 * qo_c - 3, 3, 4)
                    qs.append(blk)
            ps.append(jnp.concatenate(qs, axis=2)[:, :, None, :])
    return jnp.concatenate(ps, axis=2)                # (3,3,16,4Co)


def pack_conv_p2_in(w: jax.Array) -> jax.Array:
    """(4,4,Ci,Co) -> (3,3,4Ci,Co): conv2d(P2, out, s1, p1) ==
    conv2d(d2s_mc(P2), w, s2, p1) for a 2x2-packed input P2."""
    kh, kw, ci, co = w.shape
    if (kh, kw) != (4, 4):
        raise ValueError(f"expected (4,4,Ci,Co), got {w.shape}")
    wp = jnp.pad(w, ((4, 4), (4, 4), (0, 0), (0, 0)))
    ps = []
    for pr in (0, 1):
        for pc in (0, 1):
            # u = 2a + p - 1; start (a=0): p - 1
            ps.append(_phase_block_s(wp, 4 + pr - 1, 4 + pc - 1, 3, 2))
    return jnp.concatenate(ps, axis=2)                # (3,3,4Ci,Co)


def pack_first_conv_p4_pixel(w: jax.Array) -> jax.Array:
    """(4,4,1,Co) -> (4,4,16,Co): conv_transpose2d(s2d4(x), out, s2, p1) ==
    conv2d(x, w, s2, p1) — 4x4-packed image in, PIXEL-space activation out.

    (A first cut emitted a 2x2-packed activation and re-indexed D's second
    conv to consume it; measured SLOWER — the second conv's 2.25x embedded-
    kernel FLOP inflation outweighed the layout win, see BASELINE.md. Going
    straight to pixels keeps every later D conv canonical.)

    Derivation (rows): out[A, :, 4*pi_r+pi_c, co] = w[u, :, 0, co] with
    u = pi_r + 3 - 2A, zero where u leaves [0, 4).
    """
    kh, kw, cin, co = w.shape
    if (kh, kw, cin) != (4, 4, 1):
        raise ValueError(f"expected (4,4,1,Co), got {w.shape}")
    wrev = w[::-1, ::-1, 0, :]                # u = pi+3-2A -> rev idx 2A-pi
    wp = jnp.pad(wrev, ((4, 4), (4, 4), (0, 0)))
    ps = []
    for pi_r in range(4):
        for pi_c in range(4):
            ps.append(_phase_block_s(wp, 4 - pi_r, 4 - pi_c, 4, 2)[:, :, None, :])
    return jnp.concatenate(ps, axis=2)        # (4,4,16,Co)


def conv3_mc_as_matmul(h: jax.Array, wp: jax.Array,
                       b: jax.Array | None = None,
                       compute_dtype=None) -> jax.Array:
    """conv2d(h, wp, b, stride=1, padding=1) for a packed-mc 3x3 kernel,
    reformulated as [one K-dense 1x1 matmul to kh*kw*Q merged taps] + a
    9-shift stencil sum.

    Rationale (xprof, TPU v5e, 64px/b64): the direct (3,3,128,4) conv runs at
    12 TF/s / 318 GiB/s — 4 output channels waste 124/128 MXU lanes and force
    a pathological output layout; its dgrad (4 INPUT channels) measured
    6.4 TF/s. Here the MXU contraction is K=128-dense with 36 output lanes
    (Y = h @ W3), and the remaining work is an elementwise 9-slice sum the
    fusion reads once. The backward inherits the good shapes: dh is a
    36->128 matmul, the kernel grad a (128, 36) reduction.

    Numerics: per-tap products accumulate in f32 inside the dot (MXU) and
    across the 9 taps (explicit f32 sum); under compute_dtype=bfloat16 the
    tap tensor Y is rounded to bf16 once — one more rounding than the fused
    conv's single output rounding, bounded by bf16 eps on tap partial sums
    (exactness vs the canonical pixel conv tested in tests/test_packed.py).
    """
    kh, kw, K, Q = wp.shape
    n, R, S, K2 = h.shape
    if K2 != K:
        raise ValueError(f"channel mismatch: {h.shape} vs {wp.shape}")
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
        wp = wp.astype(compute_dtype)
    W3 = jnp.transpose(wp, (2, 0, 1, 3)).reshape(K, kh * kw * Q)
    y = jax.lax.dot_general(
        h, W3, (((3,), (0,)), ((), ())),
        preferred_element_type=(h.dtype if compute_dtype is not None
                                else jnp.float32))
    yp = jnp.pad(y, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    out = None
    for dr in range(kh):
        for dc in range(kw):
            m0 = (dr * kw + dc) * Q
            sl = yp[:, dr:dr + R, dc:dc + S, m0:m0 + Q].astype(jnp.float32)
            out = sl if out is None else out + sl
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(y.dtype)


def conv3_mc_as_matmul_cvjp(compute_dtype=None):
    """``conv3_mc_as_matmul`` with a hand-written backward that builds ONE
    merged-tap tensor of the output cotangent and feeds BOTH gradient dots.

    Autodiff on the forward's [dot -> 9-shift sum] transposes the shift-sum
    into 9 pad-accumulates over a (N, R+2, S+2, 9Q) tap buffer before the dh
    and dW3 dots (xprof at 64px/b64: ~30 us of tap-build pads + ~17 us of
    dot-layout copies per step). Both gradients are correlations of the SAME
    shifted copies of ``dy``:

        dh[n,u,v,k]    = sum_{e,q} T[n,u,v,(e,q)] * wp[flip(e), k, q]
        dwp[d,k,q]     = sum_{n,u,v} h[n,u,v,k] * T[n,u,v,(flip(d),q)]

    with T = merged_taps(dy) (9 shifted copies of the Q=4-channel cotangent,
    built with one pad + 9 slices). So the backward is: build T once, one
    (36 -> K) dot for dh, one (N*R*S)-contraction dot for dW3 — no 9Q-channel
    scatter buffer, no layout copies between the sum transpose and the dots.
    Same math as the autodiff VJP up to fp reassociation (tested in
    tests/test_packed.py).
    """

    @jax.custom_vjp
    def conv(h, wp, b):
        return conv3_mc_as_matmul(h, wp, b, compute_dtype=compute_dtype)

    def fwd(h, wp, b):
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
            wp = wp.astype(compute_dtype)
        return conv(h, wp, b), (h, wp)

    def bwd(res, dy):
        h, wp = res
        kh, kw, K, Q = wp.shape
        dyc = dy if compute_dtype is None else dy.astype(compute_dtype)
        T = _merged_taps(dyc)                             # (N, R, S, 9Q)
        # dh: contract the 9Q tap axis against the flipped kernel.
        wb = jnp.transpose(wp[::-1, ::-1], (0, 1, 3, 2)).reshape(kh * kw * Q, K)
        dh = jax.lax.dot_general(
            T, wb, (((3,), (0,)), ((), ())),
            preferred_element_type=(T.dtype if compute_dtype is not None
                                    else jnp.float32)).astype(h.dtype)
        # dW3: contract batch x space; un-flip the tap axis back to (dr, dc).
        dwt = jax.lax.dot_general(
            h, T, (((0, 1, 2), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32)           # (K, 9Q)
        dwp = jnp.transpose(
            dwt.reshape(K, kh, kw, Q)[:, ::-1, ::-1, :], (1, 2, 0, 3)
        ).astype(wp.dtype)
        db = jnp.sum(dy, axis=(0, 1, 2)).astype(jnp.float32)
        return dh, dwp, db

    conv.defvjp(fwd, bwd)
    return conv


def conv3s1p1_matmul_dgrad(compute_dtype=None):
    """Build a conv(x, wp, b, stride=1, padding=1) whose INPUT gradient is
    computed in the merged-tap matmul form.

    Target: the discriminator's first packed conv (3,3,4,Co). Its forward is
    MXU-fine (Co lanes), but the autodiff input-gradient is a conv with 4
    OUTPUT channels — measured 6.5 TF/s / 50 us at 64px/b64, the single
    slowest op left in the train step. Routing dx through
    ``conv3_mc_as_matmul(dy, flip(wp)^T)`` keeps the contraction K-dense
    (K=Co) with 36 merged output lanes. dw/db keep the standard VJP.

    Same math as the plain conv VJP up to fp reassociation.
    """
    from siggan_tpu.ops.conv import conv2d

    @jax.custom_vjp
    def conv(x, wp, b):
        return conv2d(x, wp, b, stride=1, padding=1,
                      compute_dtype=compute_dtype)

    def fwd(x, wp, b):
        return conv(x, wp, b), (x, wp)

    def bwd(res, dy):
        x, wp = res
        # dx: full correlation of dy with the spatially-flipped,
        # in/out-transposed kernel — as a K-dense matmul.
        wt = jnp.transpose(wp[::-1, ::-1], (0, 1, 3, 2))
        dx = conv3_mc_as_matmul(dy, wt, None,
                                compute_dtype=compute_dtype).astype(x.dtype)
        dw = jax.vjp(lambda w_: conv2d(x, w_, None, stride=1, padding=1,
                                       compute_dtype=compute_dtype), wp
                     )[1](dy)[0]
        db = jnp.sum(dy, axis=(0, 1, 2)).astype(jnp.float32)
        return dx, dw, db

    conv.defvjp(fwd, bwd)
    return conv


def _merged_taps(x: jax.Array) -> jax.Array:
    """(B, R, S, C) -> (B, R, S, 9C): the 3x3/p=1 neighbourhood of every
    position, channels-fastest within each tap ((dr*3+dc)*C + c)."""
    b, r, s, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [xp[:, dr:dr + r, dc:dc + s, :] for dr in range(3) for dc in range(3)],
        axis=-1)


def conv3s1p1_matmul_both(compute_dtype=None):
    """``conv3s1p1_matmul_dgrad`` with the FORWARD also in merged-tap matmul
    form: y = taps(x) @ W36 + b, W36[(dr*3+dc)*C + q, co] = wp[dr,dc,q,co].

    Target: the same first packed D conv (3,3,4,Co). Its direct forward
    contracts only Cin=4 channels per tap (xprof: 18-38 GF/s on the b64/b128
    forwards); merging the 9 taps makes the MXU contraction K=36 with Co
    dense output lanes — the exact transpose of the trick the backward
    already uses. dw becomes a (9C, Co) dot over batchxspace; dx keeps the
    K-dense matmul form. Same math up to fp reassociation (tested).
    """
    from siggan_tpu.ops.conv import conv2d  # noqa: F401  (docstring parity)

    def forward(x, wp, b):
        kh, kw, cin, co = wp.shape
        xc = x if compute_dtype is None else x.astype(compute_dtype)
        wc = wp if compute_dtype is None else wp.astype(compute_dtype)
        acc = jnp.float32 if compute_dtype is None else jnp.dtype(compute_dtype)
        taps = _merged_taps(xc)
        w36 = wc.reshape(kh * kw * cin, co)
        y = jax.lax.dot_general(taps, w36, (((3,), (0,)), ((), ())),
                                preferred_element_type=acc)
        return y + b.astype(y.dtype)

    @jax.custom_vjp
    def conv(x, wp, b):
        return forward(x, wp, b)

    def fwd(x, wp, b):
        return conv(x, wp, b), (x, wp)

    def bwd(res, dy):
        x, wp = res
        kh, kw, cin, co = wp.shape
        wt = jnp.transpose(wp[::-1, ::-1], (0, 1, 3, 2))
        dx = conv3_mc_as_matmul(dy, wt, None,
                                compute_dtype=compute_dtype).astype(x.dtype)
        xc = x if compute_dtype is None else x.astype(compute_dtype)
        dyc = dy if compute_dtype is None else dy.astype(compute_dtype)
        taps = _merged_taps(xc)
        dw36 = jax.lax.dot_general(
            taps, dyc, (((0, 1, 2), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32)
        dw = dw36.reshape(kh, kw, cin, co).astype(wp.dtype)
        db = jnp.sum(dy, axis=(0, 1, 2)).astype(jnp.float32)
        return dx, dw, db

    conv.defvjp(fwd, bwd)
    return conv


# ---------------------------------------------------------------------------
# All tail kernel packs in ONE Pallas program.
#
# The pack_* constructors lower inside the train step as ~2.2 us strided-
# slice micro-fusions — 16 per interior kernel, ~50-60 us/step of pure
# launch latency at 64px/b64 (xprof round 3b; the bytes are trivial). All
# packed tail kernels together are <2 MB, so one Pallas program can load
# every canonical kernel into VMEM, run the exact same pad/slice/concat
# placement (traced jnp, compiled by Mosaic as ONE kernel), and write all
# packed forms in a single launch. Backward keeps the existing XLA
# transpose (jax.linear_transpose of the same placement), so gradients are
# bit-identical to the slice/concat form.
# ---------------------------------------------------------------------------


def _tail_pack_fns(n_both: int):
    """The per-kernel pack constructors for [entry, n_both interiors, final]."""
    return ([pack_convt_kernel_out_mc]
            + [pack_convt_kernel_both_mc] * n_both
            + [pack_conv3_kernel_both_mc])


def pack_tail_kernels_pallas(ws, out_dtype=None, interpret=None):
    """Pack the generator tail's canonical kernels in one Pallas launch.

    ``ws``: [w_entry (4,4,Ci,Co), *w_both (4,4,Ci,Co)..., w_final (3,3,C,1)].
    Returns the same tuple ``tuple(pack_fn(w) for ...)`` (cast to
    ``out_dtype`` when given) — equality with the XLA constructors is
    tested. The backward is a second one-launch Pallas kernel (the exact
    placement transpose); gradient equivalence to the slice/concat form is
    tested in tests/test_packed.py.
    """
    import jax.experimental.pallas as pl

    ws = tuple(ws)
    n_both = len(ws) - 2
    fns = _tail_pack_fns(n_both)
    odt = jnp.dtype(out_dtype) if out_dtype is not None else ws[0].dtype
    if interpret is None:
        # Interpret (host) mode only where Mosaic cannot compile — the CPU
        # test backend. Any accelerator platform gets the real kernel.
        interpret = jax.default_backend() == "cpu"

    def xla_pack(*ws_):
        return tuple(f(w.astype(odt)) for f, w in zip(fns, ws_))

    out_shapes = jax.eval_shape(xla_pack, *ws)

    # Mosaic lowers neither `rev` nor strided slices (they become >2-D
    # gathers), so the trivial-byte preprocessing stays in XLA — reverse the
    # entry kernel, zero-pad each spatial window to EVEN extent — and the
    # kernel does what actually costs launches in the XLA form: the 4/16/16
    # per-phase block extractions, as parity reshapes + contiguous slices
    # written straight into sub-regions of the packed output refs.
    #
    # A stride-2 slice rows [r0, r0+2, ...] of a padded kernel equals, on
    # wp6 = wp.reshape(H/2, 2, W/2, 2, Ci, Co), the contiguous window
    # wp6[r0//2 : r0//2+kk, r0%2, c0//2 : c0//2+kk, c0%2].

    def _write_blocks(o_ref, wp6, starts, kk, ci, co):
        for bi, (r0, c0) in enumerate(starts):
            blk = wp6[r0 // 2:r0 // 2 + kk, r0 % 2,
                      c0 // 2:c0 // 2 + kk, c0 % 2]
            p, q = bi // 4, bi % 4
            o_ref[:, :, p * ci:(p + 1) * ci, q * co:(q + 1) * co] = blk

    # (r0, c0) start tables, in (p-major, q-minor) block order matching the
    # planar concat of the XLA constructors.
    def _starts_entry():
        return [(2 - qr, 2 - qc) for qr in (0, 1) for qc in (0, 1)]

    def _starts_both():
        return [(4 + qr - 2 * pr - 1, 4 + qc - 2 * pc - 1)
                for pr in (0, 1) for pc in (0, 1)
                for qr in (0, 1) for qc in (0, 1)]

    def _starts_conv3():
        return [(3 + pr - qr - 1, 3 + pc - qc - 1)
                for pr in (0, 1) for pc in (0, 1)
                for qr in (0, 1) for qc in (0, 1)]

    def kernel(*refs):
        ins, outs = refs[:len(ws)], refs[len(ws):]
        for j, (f, i_ref, o_ref) in enumerate(zip(fns, ins, outs)):
            w6 = i_ref[...].astype(odt)
            h2 = w6.shape[0] // 2
            ci, co = w6.shape[-2], w6.shape[-1]
            w6 = w6.reshape(h2, 2, h2, 2, ci, co)
            if f is pack_convt_kernel_out_mc:
                # entry: 4 q-blocks, kernel pre-reversed+padded, p index 0
                for bi, (r0, c0) in enumerate(_starts_entry()):
                    blk = w6[r0 // 2:r0 // 2 + 3, r0 % 2,
                             c0 // 2:c0 // 2 + 3, c0 % 2]
                    o_ref[:, :, :, bi * co:(bi + 1) * co] = blk
            elif f is pack_convt_kernel_both_mc:
                _write_blocks(o_ref, w6, _starts_both(), 4, ci, co)
            else:
                _write_blocks(o_ref, w6, _starts_conv3(), 3, ci, co)

    def pallas_pack(*ws_):
        pre = []
        for f, w in zip(fns, ws_):
            if f is pack_convt_kernel_out_mc:
                pre.append(jnp.pad(w[::-1, ::-1],
                                   ((2, 2), (2, 2), (0, 0), (0, 0))))
            elif f is pack_convt_kernel_both_mc:
                pre.append(jnp.pad(w, ((4, 4), (4, 4), (0, 0), (0, 0))))
            else:   # conv3: pad to EVEN extent (row 9 never read: r0+4 <= 7)
                pre.append(jnp.pad(w, ((3, 4), (3, 4), (0, 0), (0, 0))))
        return pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(s.shape, s.dtype)
                            for s in out_shapes),
            interpret=interpret,
        )(*pre)

    @jax.custom_vjp
    def pack(*ws_):
        return pallas_pack(*ws_)

    w_avals = tuple(jax.ShapeDtypeStruct(w.shape, w.dtype) for w in ws)

    def fwd(*ws_):
        return pack(*ws_), None

    # Backward: ALSO one Pallas launch. The XLA transpose of the slice/
    # concat placement lowers as ~45 chained scatter-add micro-fusions
    # (16 per kernel at ~1.3 us launch latency each — ~60 us/step at
    # 64px/b64, the single largest non-conv bucket in the round-3c trace).
    # The placement transpose is the same static block map run in reverse:
    # accumulate each cotangent block into the padded parity buffer, then
    # let XLA undo the trivial-byte pre-processing (unpad slice, un-reverse,
    # cast back to the master dtype). Blocks overlap (one tap feeds several
    # phases), so accumulation association differs from XLA's scatter-add
    # chain; the kernel accumulates in f32 regardless of odt, which is
    # strictly tighter than the bf16 chain it replaces.
    # Mosaic lowers neither scatter-add nor strided slices, so the padded
    # parity buffer is emitted as FOUR separate (Hp/2, Hp/2, ci, co) plane
    # refs per kernel — one per (row, col) parity — accumulated with the
    # same contiguous-slice reads/writes the forward uses; XLA reassembles
    # the planes (transpose of the forward's parity reshape, trivial bytes).
    def _hp(f, w):
        return w.shape[0] + (4 if f is pack_convt_kernel_out_mc else
                             8 if f is pack_convt_kernel_both_mc else 7)

    plane_shapes = tuple(
        jax.ShapeDtypeStruct((_hp(f, w) // 2, _hp(f, w) // 2) + w.shape[2:],
                             jnp.float32)
        for f, w in zip(fns, w_avals) for _ in range(4))

    def _blocks(f, dp, ci, co):
        """Yield (r0, c0, kk, cotangent block) for each placement."""
        if f is pack_convt_kernel_out_mc:
            for bi, (r0, c0) in enumerate(_starts_entry()):
                yield r0, c0, 3, dp[:, :, :, bi * co:(bi + 1) * co]
        else:
            starts, kk = ((_starts_both(), 4)
                          if f is pack_convt_kernel_both_mc
                          else (_starts_conv3(), 3))
            for bi, (r0, c0) in enumerate(starts):
                p, q = bi // 4, bi % 4
                yield r0, c0, kk, dp[:, :, p * ci:(p + 1) * ci,
                                     q * co:(q + 1) * co]

    def bwd_kernel(*refs):
        dins, planes = refs[:len(ws)], refs[len(ws):]
        for j, (f, w_av, dp_ref) in enumerate(zip(fns, w_avals, dins)):
            ci, co = w_av.shape[2], w_av.shape[3]
            for pr in planes[4 * j:4 * j + 4]:
                pr[...] = jnp.zeros(pr.shape, pr.dtype)
            dp = dp_ref[...].astype(jnp.float32)
            for r0, c0, kk, blk in _blocks(f, dp, ci, co):
                pr = planes[4 * j + 2 * (r0 % 2) + (c0 % 2)]
                a, b = r0 // 2, c0 // 2
                pr[a:a + kk, b:b + kk] = pr[a:a + kk, b:b + kk] + blk

    def bwd(_, dps):
        planes = pl.pallas_call(
            bwd_kernel, out_shape=plane_shapes, interpret=interpret)(*dps)
        grads = []
        for j, (f, w_av) in enumerate(zip(fns, w_avals)):
            p4 = planes[4 * j:4 * j + 4]
            hp = p4[0].shape[0] * 2
            # dpre[2a+pr, 2b+pc] = plane[2pr+pc][a, b]
            d6 = jnp.stack(p4).reshape((2, 2) + p4[0].shape)
            d = d6.transpose(2, 0, 3, 1, 4, 5).reshape(
                (hp, hp) + p4[0].shape[2:])
            if f is pack_convt_kernel_out_mc:
                g = d[2:6, 2:6][::-1, ::-1]
            elif f is pack_convt_kernel_both_mc:
                g = d[4:8, 4:8]
            else:
                g = d[3:6, 3:6]
            grads.append(g.astype(w_av.dtype))
        return tuple(grads)

    pack.defvjp(fwd, bwd)
    return pack(*ws)


# ---------------------------------------------------------------------------
# Kernel packing as one constant-index gather — MEASURED DEAD END.
#
# The pack_* constructors above are written as pad + strided-slice concats;
# XLA lowers those INSIDE the train step as ~16 small gathers per kernel per
# forward — 61 gathers x ~0.75 us = 45.6 us/step at 64px/b64 (latency-bound,
# 27 GiB/s). Every pack function is a pure PLACEMENT of input entries, so it
# is exactly representable as a single gather of the flattened weight by a
# constant index map (derived by probing the reference implementation with a
# linear ramp; equivalence asserted on first use).
#
# VERDICT (TPU v5e, 64px/b64): catastrophic. Routing the model's kernel
# packing through this gather measured 15-20 MS/step (vs 1.58) — whole-
# kernel random gathers plus their scatter-add weight-grad transpose fall
# off XLA:TPU's fusion path entirely, at every kernel size tried. The
# utility stays for the record and for tests; model code keeps the
# slice/concat form. Do not rewire without re-measuring.
# ---------------------------------------------------------------------------

_PACK_IDX_CACHE: dict = {}


def pack_by_gather(pack_fn, w: jax.Array, max_size: int = 32768) -> jax.Array:
    """Evaluate ``pack_fn(w)`` as one constant-index gather (see above).

    Applies only to SMALL kernels (w.size <= max_size): those are the ones
    whose 16 per-phase strided slices lower as latency-bound micro-gathers.
    Large kernels keep the slice/concat form — a single whole-kernel random
    gather of a multi-MB tensor measured ~12x SLOWER than the slices."""
    import numpy as np

    if w.size > max_size:
        return pack_fn(w)
    key = (pack_fn.__name__, tuple(w.shape))
    idx = _PACK_IDX_CACHE.get(key)
    if idx is None:
        # Probe with a 1-based ramp: 0 in the output marks zero padding.
        # Values stay < 2^24 so f32 round-trips exactly. The probe runs
        # EAGERLY on CPU (it happens once per shape, usually while tracing —
        # eager dispatches to a tunneled TPU would be slow there).
        probe = np.arange(1, w.size + 1, dtype=np.float32).reshape(w.shape)
        # Force CONCRETE evaluation even when called mid-trace (without it
        # the probe output can be swept into the surrounding jit as a
        # tracer), on CPU when that backend exists (eager dispatches to a
        # tunneled TPU are slow).
        import contextlib
        ctx = contextlib.ExitStack()
        ctx.enter_context(jax.ensure_compile_time_eval())
        try:
            ctx.enter_context(jax.default_device(
                jax.local_devices(backend="cpu")[0]))
        except RuntimeError:
            pass
        with ctx:
            out = np.asarray(pack_fn(jnp.asarray(probe)))
        idx = np.rint(out).astype(np.int64)
        assert idx.min() >= 0 and idx.max() <= w.size
        idx = np.where(idx == 0, w.size, idx - 1).astype(np.int32)
        _PACK_IDX_CACHE[key] = idx
    flat = jnp.concatenate([w.reshape(-1),
                            jnp.zeros((1,), w.dtype)])
    return flat[jnp.asarray(idx)]
