"""DiffAugment — differentiable augmentation on the DISCRIMINATOR's inputs.

Zhao et al. 2020 ("Differentiable Augmentation for Data-Efficient GAN
Training"): apply the same stochastic, differentiable transform policy to
both real and fake images right before every D forward (including the one
inside the G step, so gradients flow through the transform). This directly
attacks D overfitting — the failure mode our showcase runs exhibit late in
training (d_acc -> 0.9+, FID degrading after its best epoch) on ~8k-image
signature sets.

This is an opt-in capability BEYOND the reference (which has no equivalent;
its augmentation is a data-loading transform on reals only,
``data_loader_signatures.py:154``). Enable with
``TrainConfig.diffaugment="color,translation,cutout"``.

TPU-native detail: the train path runs on 2x2 space-to-depth packed images
(N, H/2, W/2, 4) — see ``ops/packed.py``. All spatial policies therefore
quantize to EVEN canonical-pixel geometry (shifts in 2-px steps, cutout
boxes on even boundaries), which makes every transform a pure grid-level
operation on the packed form — phases never mix, so packed(T(x)) ==
T(packed(x)) exactly (tested in tests/test_diffaug.py). At 64-128 px the
2-px quantization is well inside the policy's own randomness.

Conventions: images in [-1, 1], background (paper) white = +1 — translation
pads with +1; cutout writes 0 (the paper's choice: mid-range gray).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: canonical-pixel shift budget as a fraction of image size (paper: 1/8)
TRANSLATION_RATIO = 0.125
#: cutout box side as a fraction of image size (paper: 0.5)
CUTOUT_RATIO = 0.5


def _grid_shape(x: jax.Array, packed: bool):
    """(rows, cols) of the even-aligned grid the spatial ops act on, and the
    number of canonical pixels per grid cell (2 when packed, 2 when
    canonical — spatial policies are even-quantized in both layouts)."""
    if packed:
        return x.shape[1], x.shape[2], 1     # already the 2x2 grid
    return x.shape[1] // 2, x.shape[2] // 2, 2


def _color(x: jax.Array, key: jax.Array) -> jax.Array:
    """Per-image brightness shift + contrast scale (saturation is a no-op on
    single-channel signatures and is omitted)."""
    kb, kc = jax.random.split(key)
    n = x.shape[0]
    shape = (n,) + (1,) * (x.ndim - 1)
    b = jax.random.uniform(kb, shape, jnp.float32, -0.5, 0.5).astype(x.dtype)
    c = jax.random.uniform(kc, shape, jnp.float32, 0.5, 1.5).astype(x.dtype)
    mean = jnp.mean(x.astype(jnp.float32), axis=tuple(range(1, x.ndim)),
                    keepdims=True).astype(x.dtype)
    return (x - mean) * c + mean + b


def _translation(x: jax.Array, key: jax.Array, packed: bool) -> jax.Array:
    """Per-image random shift up to ±size/8 canonical px (2-px quantized),
    padding with +1 (white signature background)."""
    rows, cols, _ = _grid_shape(x, packed)
    if packed:
        gx = x
    else:
        n, h, w, c = x.shape
        gx = x.reshape(n, rows, 2, cols, 2, c)
        gx = gx.transpose(0, 1, 3, 2, 4, 5).reshape(n, rows, cols, 4 * c)
    n = gx.shape[0]
    m_r = max(int(rows * TRANSLATION_RATIO), 1)   # grid units = 2 canon px
    m_c = max(int(cols * TRANSLATION_RATIO), 1)
    kr, kc = jax.random.split(key)
    tr = jax.random.randint(kr, (n,), -m_r, m_r + 1)
    tc = jax.random.randint(kc, (n,), -m_c, m_c + 1)
    gp = jnp.pad(gx, ((0, 0), (m_r, m_r), (m_c, m_c), (0, 0)),
                 constant_values=1.0)
    iy = jnp.arange(rows)[None, :] + m_r - tr[:, None]          # (N, rows)
    gy = jnp.take_along_axis(gp, iy[:, :, None, None], axis=1)
    ix = jnp.arange(cols)[None, :] + m_c - tc[:, None]          # (N, cols)
    gt = jnp.take_along_axis(gy, ix[:, None, :, None], axis=2)
    if packed:
        return gt
    gt = gt.reshape(n, rows, cols, 2, 2, x.shape[3])
    return gt.transpose(0, 1, 3, 2, 4, 5).reshape(x.shape)


def _cutout(x: jax.Array, key: jax.Array, packed: bool) -> jax.Array:
    """Per-image square cutout of side size/2 (even-aligned), set to 0."""
    rows, cols, _ = _grid_shape(x, packed)
    n = x.shape[0]
    ch = max(int(rows * CUTOUT_RATIO), 1)
    cw = max(int(cols * CUTOUT_RATIO), 1)
    kr, kc = jax.random.split(key)
    # paper: offsets allow the box to hang off the edges (partial cutouts)
    oy = jax.random.randint(kr, (n,), -(ch // 2), rows - ch + ch // 2 + 1)
    ox = jax.random.randint(kc, (n,), -(cw // 2), cols - cw + cw // 2 + 1)
    ry = jnp.arange(rows)[None, :]                               # (1, rows)
    rx = jnp.arange(cols)[None, :]
    in_y = (ry >= oy[:, None]) & (ry < oy[:, None] + ch)         # (N, rows)
    in_x = (rx >= ox[:, None]) & (rx < ox[:, None] + cw)
    cut = in_y[:, :, None] & in_x[:, None, :]                    # (N, r, c)
    if packed:
        mask = jnp.where(cut[:, :, :, None], 0.0, 1.0).astype(x.dtype)
        return x * mask
    grid = jnp.repeat(jnp.repeat(cut, 2, axis=1), 2, axis=2)     # canonical
    mask = jnp.where(grid[:, :, :, None], 0.0, 1.0).astype(x.dtype)
    return x * mask


_POLICIES = {
    "color": lambda x, k, packed: _color(x, k),
    "translation": _translation,
    "cutout": _cutout,
}


def diff_augment(x: jax.Array, key: jax.Array, policy: str,
                 packed: bool) -> jax.Array:
    """Apply the comma-separated ``policy`` to a batch, one fresh random
    draw per image per call. Differentiable; identity when policy is ""."""
    if not policy:
        return x
    for i, name in enumerate([p.strip() for p in policy.split(",") if p.strip()]):
        if name not in _POLICIES:
            raise ValueError(f"unknown diffaugment policy {name!r} "
                             f"(have {sorted(_POLICIES)})")
        x = _POLICIES[name](x, jax.random.fold_in(key, i), packed)
    return x
