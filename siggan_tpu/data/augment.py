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


def _affine_warp_banded(imgs: jax.Array, mats: jax.Array, fill: float,
                        band_v: int, band_h: int, dtype=None) -> jax.Array:
    """Same two-pass bilinear warp as ``_affine_warp_twopass`` but exploiting
    the triangle kernel's 2-wide support: for augmentation-sized transforms
    the source row of output row i lies within ``band_v`` rows of i (resp.
    columns for pass H), so instead of materializing dense (N,H,H)/(N,W,W)
    weight tensors and contracting on the MXU, accumulate 2*band+1 shifted
    slice-multiply taps. Identical math (all skipped taps have exactly zero
    weight by the band bound), ~5x less work at 64px — one VPU loop fusion,
    no giant intermediates. Callers must supply band radii that bound
    |sy - i| + 1 (see ``_band_radii``); flips are NOT representable as a
    small band — mirror the image first and pass flip-free mats.
    """
    n, h, w, c = imgs.shape
    wdt = jnp.dtype(dtype) if dtype is not None else imgs.dtype
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    A = mats[:, 0, 0]
    B = mats[:, 0, 1]
    C = mats[:, 0, 2] + cx - mats[:, 0, 0] * cx - mats[:, 0, 1] * cy
    D = mats[:, 1, 0]
    E = mats[:, 1, 1]
    F = mats[:, 1, 2] + cy - mats[:, 1, 0] * cx - mats[:, 1, 1] * cy

    ii = jnp.arange(h, dtype=jnp.float32)
    jj = jnp.arange(w, dtype=jnp.float32)

    # Pass V: tmp[i,x] = sum_d tri(sy(i,x) - (i+d)) * imgs[i+d, x].
    # Source rows outside [0,h) carry zero weight toward wsum, so the fill
    # deficit (1 - wsum)*fill blends them to `fill` exactly like the dense
    # contraction's weight-sum deficit.
    alpha = E - D * B / A
    beta = (D / A)[:, None] * jj[None, :] + (F - D * C / A)[:, None]
    sy = alpha[:, None, None] * ii[None, :, None] + beta[:, None, :]  # (N,H,W)
    src = (imgs[..., 0] if c == 1 else imgs).astype(wdt)
    srcp = jnp.pad(src, ((0, 0), (band_v, band_v)) + ((0, 0),) * (src.ndim - 2))
    acc = jnp.zeros(sy.shape if c == 1 else sy.shape + (c,), jnp.float32)
    wsum = jnp.zeros_like(sy)
    for d in range(-band_v, band_v + 1):
        wgt = _tri(sy - (ii[None, :, None] + d))                      # (N,H,W)
        srow = jax.lax.slice_in_dim(srcp, d + band_v, d + band_v + h, axis=1)
        rmask = jnp.asarray((0 <= ii + d) & (ii + d < h), jnp.float32)
        if c == 1:
            acc = acc + (wgt.astype(wdt) * srow).astype(jnp.float32)
        else:
            acc = acc + (wgt[..., None].astype(wdt) * srow).astype(jnp.float32)
        wsum = wsum + wgt * rmask[None, :, None]
    tmp = acc + ((1.0 - wsum) * fill if c == 1
                 else ((1.0 - wsum) * fill)[..., None])

    # Pass H: out[i,j] = sum_d tri(sx(i,j) - (j+d)) * tmp[i, j+d].
    sx = (A[:, None, None] * jj[None, None, :]
          + B[:, None, None] * ii[None, :, None] + C[:, None, None])  # (N,H,W)
    tmpd = tmp.astype(wdt)
    tmpp = jnp.pad(tmpd, ((0, 0), (0, 0), (band_h, band_h))
                   + ((0, 0),) * (tmpd.ndim - 3))
    acc2 = jnp.zeros_like(tmp)
    wsum2 = jnp.zeros_like(sx)
    for d in range(-band_h, band_h + 1):
        wgt = _tri(sx - (jj[None, None, :] + d))
        scol = jax.lax.slice_in_dim(tmpp, d + band_h, d + band_h + w, axis=2)
        cmask = jnp.asarray((0 <= jj + d) & (jj + d < w), jnp.float32)
        if c == 1:
            acc2 = acc2 + (wgt.astype(wdt) * scol).astype(jnp.float32)
        else:
            acc2 = acc2 + (wgt[..., None].astype(wdt)
                           * scol).astype(jnp.float32)
        wsum2 = wsum2 + wgt * cmask[None, None, :]
    out = acc2 + ((1.0 - wsum2) * fill if c == 1
                  else ((1.0 - wsum2) * fill)[..., None])
    out = out.astype(imgs.dtype)
    return out[..., None] if c == 1 else out


def _band_radii(h: int, w: int, rotation_degrees: float,
                scale_lo: float, scale_hi: float) -> tuple[int, int]:
    """Static band radii bounding |sy - i| / |sx - j| + 1 over the transform
    family (rotation in ±deg, scale in [lo, hi], no flip, centered)."""
    import math
    th = math.radians(rotation_degrees)
    # alpha = 1/(s cos th); A = cos th / s; |B| <= sin th / lo.
    a_dev = max(abs(1.0 / scale_hi - 1.0),
                abs(1.0 / (scale_lo * math.cos(th)) - 1.0))
    rv = a_dev * (h - 1) / 2 + math.tan(th) * (w - 1) / 2
    A_dev = max(abs(math.cos(th) / scale_hi - 1.0),
                abs(1.0 / scale_lo - 1.0))
    rh = A_dev * (w - 1) / 2 + (math.sin(th) / scale_lo) * (h - 1) / 2
    return int(math.ceil(rv)) + 1, int(math.ceil(rh)) + 1


def augment_params(
    key: jax.Array,
    n: int,
    *,
    rotation_degrees: float = 5.0,
    scale_lo: float = 0.9,
    scale_hi: float = 1.1,
    hflip: bool = False,
):
    """Draw the per-image transform parameters for a set of n images:
    (theta, scale, flip-or-None). Split out from the warp so a caller can
    draw an EPOCH's parameter table (n scalars per image — trivially cheap)
    and warp only the images it actually gathers; per-image warps are
    independent, so warp(batch[idx], params[idx]) == warp(all, params)[idx]."""
    k_rot, k_scale, k_flip = jax.random.split(key, 3)
    theta = jax.random.uniform(
        k_rot, (n,), minval=-rotation_degrees, maxval=rotation_degrees
    ) * (jnp.pi / 180.0)
    scale = jax.random.uniform(k_scale, (n,), minval=scale_lo, maxval=scale_hi)
    flip = jax.random.bernoulli(k_flip, 0.5, (n,)) if hflip else None
    return theta, scale, flip


def augment_apply(
    batch: jax.Array,
    theta: jax.Array,
    scale: jax.Array,
    flip: jax.Array | None,
    *,
    rotation_degrees: float = 5.0,
    scale_lo: float = 0.9,
    scale_hi: float = 1.1,
    dtype=None,
) -> jax.Array:
    """Warp a batch with pre-drawn per-image parameters (see
    ``augment_params``). The rotation/scale BOUNDS still select the banded
    fast path, so they must match the bounds the params were drawn with."""
    h, w = batch.shape[1:3]
    # Flips are an exact mirror — apply them to the image directly so the
    # warp's transform family stays near-identity (the banded fast path
    # requires |sx - j| small, which an x-flip violates by construction).
    if flip is not None:
        batch = jnp.where(flip[:, None, None, None], batch[:, :, ::-1, :],
                          batch)

    # Inverse map: rotate by -theta then scale by 1/s.
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    inv_s = 1.0 / scale
    mats = jnp.stack([
        jnp.stack([cos * inv_s, -sin * inv_s, jnp.zeros_like(cos)], -1),
        jnp.stack([sin * inv_s, cos * inv_s, jnp.zeros_like(cos)], -1),
    ], axis=1)  # (N, 2, 3)

    band_v, band_h = _band_radii(h, w, rotation_degrees, scale_lo, scale_hi)
    if max(band_v, band_h) <= min(h, w) // 4:
        return _affine_warp_banded(batch, mats, fill=1.0,
                                   band_v=band_v, band_h=band_h, dtype=dtype)
    return _affine_warp_twopass(batch, mats, fill=1.0, dtype=dtype)


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
    theta, scale, flip = augment_params(
        key, batch.shape[0], rotation_degrees=rotation_degrees,
        scale_lo=scale_lo, scale_hi=scale_hi, hflip=hflip)
    return augment_apply(batch, theta, scale, flip,
                         rotation_degrees=rotation_degrees,
                         scale_lo=scale_lo, scale_hi=scale_hi, dtype=dtype)


# rotation/scale bounds flow into Python-level band-radius math
# (_band_radii uses math.cos/ceil), so ALL of them must be static — a traced
# scale_lo/scale_hi raised ConcretizationTypeError (round-3 review).
augment_batch = partial(jax.jit, static_argnames=(
    "rotation_degrees", "scale_lo", "scale_hi", "hflip", "enabled",
    "dtype"))(augment_batch_inner)


def augment_key(seed: int, step: int) -> jax.Array:
    return rnglib.at_step(
        rnglib.stream(rnglib.root_key(seed), rnglib.STREAM_AUGMENT), step)
