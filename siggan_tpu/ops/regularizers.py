"""Dropout2d and spectral normalization as pure functions.

 - ``dropout2d`` reproduces ``nn.Dropout2d(0.25)`` (discriminator blocks,
   ``discriminator_vanilla_gan.py:74``): whole feature maps are zeroed per
   (sample, channel) and survivors scaled by 1/(1-p). The mask key is threaded
   explicitly per train step.
 - ``spectral_norm`` reproduces ``torch.nn.utils.spectral_norm``
   (``discriminator_vanilla_gan.py:61``): one power iteration per training
   step on the (out, -1)-reshaped weight; the left singular vector estimate
   ``u`` is explicit state carried in the discriminator's state pytree
   (SURVEY §7 hard part #6).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

SN_EPS = 1e-12


def dropout2d(x: jax.Array, rate: float, key: jax.Array, *, train: bool) -> jax.Array:
    """x: (N,H,W,C). Drops whole channels. Identity when not training."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype)).astype(x.dtype)


def dropout(x: jax.Array, rate: float, key: jax.Array, *, train: bool) -> jax.Array:
    """Element-wise dropout (used by the Siamese verifier head)."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype)).astype(x.dtype)


def _l2norm(v: jax.Array) -> jax.Array:
    return v / (jnp.linalg.norm(v) + SN_EPS)


def sn_init(w_out_dim: int) -> Dict[str, jax.Array]:
    """Deterministic unit init of the power-iteration vector.

    (torch draws u ~ N(0,1) then normalizes; we use a fixed unit vector —
    power iteration converges to the same sigma estimate within a few steps.)
    """
    u = jnp.zeros((w_out_dim,), jnp.float32).at[0].set(1.0)
    return {"u": u}


def spectral_norm(
    w: jax.Array,
    state: Dict[str, jax.Array],
    *,
    train: bool,
    n_iter: int = 1,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Normalize ``w`` by its largest singular value (power-iteration estimate).

    ``w`` may be any rank; it is viewed as (out, -1) like torch, where "out"
    is the LAST axis in our HWIO/(in,out) conventions.
    """
    out_dim = w.shape[-1]
    mat = jnp.reshape(jnp.moveaxis(w, -1, 0), (out_dim, -1)).astype(jnp.float32)
    u = state["u"]
    if train and n_iter > 0:
        for _ in range(n_iter):
            v = _l2norm(mat.T @ u)
            u = _l2norm(mat @ v)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    else:
        # eval — or train with the power iteration frozen (n_iter=0):
        # compute v once from the stored u.
        v = _l2norm(mat.T @ u)
    sigma = u @ (mat @ v)
    w_sn = (w.astype(jnp.float32) / sigma).astype(w.dtype)
    return w_sn, {"u": u}


def dropout2d_packed(x: jax.Array, rate: float, key: jax.Array, *,
                     train: bool, phases: int = 4) -> jax.Array:
    """Channel dropout on a phase-packed activation (N, H, W, phases*C),
    planar order (ops/packed.py): ONE bernoulli per canonical channel,
    broadcast across its phases — with the same ``key`` this drops exactly
    the channels the pixel-space ``dropout2d`` would drop."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    c = x.shape[-1] // phases
    mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1, c))
    mask = jnp.tile(mask, (1, 1, 1, phases))
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype)).astype(x.dtype)
