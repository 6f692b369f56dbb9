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

import jax
import jax.numpy as jnp

__all__ = ["space_to_depth", "depth_to_space", "pack_final_conv_kernel",
           "pack_first_conv_kernel"]


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
