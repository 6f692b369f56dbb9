"""Device-side training augmentation — one fused batched affine warp.

The reference's per-image PIL transform chain
(``data_loader_signatures.py:154-219``: RandomRotation(±5°, fill=255) then
RandomAffine(scale 0.9-1.1, fill=255) then optional hflip then [-1,1]
normalize) costs two host-side resamples per image in 4 worker processes.
Here rotation+scale+flip compose into ONE affine matrix and one bilinear
gather, executed on device over the whole batch inside the input pipeline —
same distribution, one resample, zero host work.

Inputs are already [-1,1] (the on-disk preprocessed tensors); fill uses the
white value +1.0 accordingly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from siggan_tpu.core import rng as rnglib


def _tri(d: jax.Array) -> jax.Array:
    """Bilinear (triangle) interpolation kernel."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _affine_warp_twopass(imgs: jax.Array, mats: jax.Array, fill: float,
                         dtype=None) -> jax.Array:
    """Batched inverse-map bilinear affine warp as two dense contractions.

    TPU rationale: a gather-based bilinear warp serializes on the VPU
    (~13 ms/batch measured); the Catmull-Smith two-pass decomposition turns
    the same resample into two einsums over iota-built triangle-kernel weight
    tensors — pure MXU work, ~60x faster, no gathers anywhere.

    imgs: (N, H, W, C); mats: (N, 2, 3) inverse maps about the image center
    (torchvision convention). Out-of-source samples blend to ``fill`` via the
    weight-sum deficit. Requires |A| = |mat[0,0]| bounded away from 0 (true
    for small-angle rotation + scale + flip augmentation).

    ``dtype``: storage dtype for the dense triangle-weight tensors (the
    (N,H,H,W)-sized intermediates dominate the warp's HBM traffic — bf16
    halves it; contractions still accumulate in f32 via
    ``preferred_element_type``). None keeps everything f32.
    """
    n, h, w, c = imgs.shape
    wdt = jnp.dtype(dtype) if dtype is not None else imgs.dtype
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    # Raw-coordinate affine: sx = A j + B i + C ; sy = D j + E i + F.
    A = mats[:, 0, 0]
    B = mats[:, 0, 1]
    C = mats[:, 0, 2] + cx - mats[:, 0, 0] * cx - mats[:, 0, 1] * cy
    D = mats[:, 1, 0]
    E = mats[:, 1, 1]
    F = mats[:, 1, 2] + cy - mats[:, 1, 0] * cx - mats[:, 1, 1] * cy

    ii = jnp.arange(h, dtype=jnp.float32)
    jj = jnp.arange(w, dtype=jnp.float32)

    # Pass V (per column x): sample rows at alpha*i + beta(x).
    alpha = E - D * B / A                       # (N,)
    beta = (D / A)[:, None] * jj[None, :] + (F - D * C / A)[:, None]  # (N, W)
    sy = alpha[:, None, None] * ii[None, :, None] + beta[:, None, :]  # (N, H, W)
    wv = _tri(sy[:, :, None, :] - ii[None, None, :, None]).astype(wdt)  # (N, H, y, x)
    tmp = jnp.einsum("niyx,nyxc->nixc", wv, imgs.astype(wdt),
                     preferred_element_type=jnp.float32)
    vsum = jnp.sum(wv.astype(jnp.float32), axis=2)                     # (N, H, x)
    tmp = tmp + (1.0 - vsum)[..., None] * fill

    # Pass H: sample columns at A*j + B*i + C.
    sx = (A[:, None, None] * jj[None, None, :]
          + B[:, None, None] * ii[None, :, None] + C[:, None, None])  # (N, H, j)
    wh = _tri(sx[:, :, None, :] - jj[None, None, :, None]).astype(wdt)  # (N, H, x, j)
    out = jnp.einsum("nixj,nixc->nijc", wh, tmp.astype(wdt),
                     preferred_element_type=jnp.float32)
    hsum = jnp.sum(wh.astype(jnp.float32), axis=2)                     # (N, H, j)
    return (out + (1.0 - hsum)[..., None] * fill).astype(imgs.dtype)


def augment_batch_inner(
    batch: jax.Array,
    key: jax.Array,
    *,
    rotation_degrees: float = 5.0,
    scale_lo: float = 0.9,
    scale_hi: float = 1.1,
    hflip: bool = False,
    enabled: bool = True,
    dtype=None,
) -> jax.Array:
    """Traceable body — call this INSIDE an enclosing jit (e.g. the train
    step) so augmentation costs zero extra dispatches; ``augment_batch``
    below is the standalone jitted wrapper.

    batch: (N, H, W, C) in [-1, 1] -> augmented batch, same shape.
    """
    if not enabled:
        return batch
    n = batch.shape[0]
    k_rot, k_scale, k_flip = jax.random.split(key, 3)
    theta = jax.random.uniform(
        k_rot, (n,), minval=-rotation_degrees, maxval=rotation_degrees
    ) * (jnp.pi / 180.0)
    scale = jax.random.uniform(k_scale, (n,), minval=scale_lo, maxval=scale_hi)
    flip = (jax.random.bernoulli(k_flip, 0.5, (n,)) if hflip
            else jnp.zeros((n,), bool))

    # Inverse map: rotate by -theta then scale by 1/s (and flip x).
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    sgn = jnp.where(flip, -1.0, 1.0)
    inv_s = 1.0 / scale
    mats = jnp.stack([
        jnp.stack([sgn * cos * inv_s, -sin * inv_s, jnp.zeros_like(cos)], -1),
        jnp.stack([sgn * sin * inv_s, cos * inv_s, jnp.zeros_like(cos)], -1),
    ], axis=1)  # (N, 2, 3)

    return _affine_warp_twopass(batch, mats, fill=1.0, dtype=dtype)


augment_batch = partial(jax.jit, static_argnames=(
    "rotation_degrees", "hflip", "enabled", "dtype"))(augment_batch_inner)


def augment_key(seed: int, step: int) -> jax.Array:
    return rnglib.at_step(
        rnglib.stream(rnglib.root_key(seed), rnglib.STREAM_AUGMENT), step)
