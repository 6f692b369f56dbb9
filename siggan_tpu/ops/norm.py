"""Functional BatchNorm with explicit, cross-replica-correct state.

The one piece of mutable state in the reference models is BatchNorm
(``generator_vanilla_gan.py:58,126``). Here BN state is an explicit pytree
carried through the train step. Because training runs under jit with the
batch dimension sharded over the ``data`` mesh axis, the ``jnp.mean`` below is
a *global* batch reduction — GSPMD inserts the ICI all-reduce — so multi-chip
training reproduces the reference's single-device global-batch BN semantics
exactly (SURVEY §7 "hard part #2": we choose synced BN, documented here).

Torch-semantics parity (momentum 0.1, eps 1e-5, biased variance for
normalization, *unbiased* variance into the running estimate) is verified in
``tests/test_torch_parity.py``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-5
MOMENTUM = 0.1


def init_state(num_features: int) -> Dict[str, jax.Array]:
    return {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }


def batch_norm(
    x: jax.Array,
    scale: jax.Array,
    offset: jax.Array,
    state: Dict[str, jax.Array],
    *,
    train: bool,
    eps: float = EPS,
    momentum: float = MOMENTUM,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Normalize over all axes except the last (channel) axis.

    Works for both NHWC activations (reduces N,H,W) and (N,F) dense
    activations (reduces N) — i.e. BatchNorm2d and BatchNorm1d.
    Statistics are computed in f32 regardless of input dtype.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=reduce_axes)
        var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
        n = 1
        for a in reduce_axes:
            n *= x.shape[a]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    # Fold normalization into one per-channel affine computed in f32, applied
    # in x's own dtype: y = x*a + b with a = scale/sqrt(var+eps),
    # b = offset - mean*a. Under bf16 this halves the normalize traffic (no
    # f32 round-trip of the full activation); statistics above stay f32.
    a = scale.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    b = offset.astype(jnp.float32) - mean * a
    if a.ndim == 2 and x.ndim == 4:
        # per-SAMPLE affine (conditional BN: rows already selected by label)
        a = a[:, None, None, :]
        b = b[:, None, None, :]
    y = x * a.astype(x.dtype) + b.astype(x.dtype)
    return y, new_state


def batch_norm_packed(
    x: jax.Array,
    scale: jax.Array,
    offset: jax.Array,
    state: Dict[str, jax.Array],
    *,
    train: bool,
    eps: float = EPS,
    momentum: float = MOMENTUM,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """BatchNorm over a 2x2 space-to-depth packed activation (N, H/2, W/2, 4C)
    with planar channel order phase*C + c (ops/packed.py): statistics for
    canonical channel c reduce over (N, H/2, W/2, phase) — the identical
    value set as canonical BN over (N, H, W) — and the affine broadcasts per
    canonical channel across its 4 phases. State stays in canonical (C,)
    shape, so checkpoints are layout-independent.
    """
    n_, h_, w_, c4 = x.shape
    c = c4 // 4
    xf = x.astype(jnp.float32).reshape(n_, h_, w_, 4, c)
    if train:
        mean = jnp.mean(xf, axis=(0, 1, 2, 3))
        var = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3)) - jnp.square(mean)
        n = n_ * h_ * w_ * 4
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    a = scale.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    b = offset.astype(jnp.float32) - mean * a
    if a.ndim == 2:
        # per-SAMPLE affine (conditional BN), tiled across the 4 phases
        a4 = jnp.tile(a, (1, 4))[:, None, None, :].astype(x.dtype)
        b4 = jnp.tile(b, (1, 4))[:, None, None, :].astype(x.dtype)
    else:
        a4 = jnp.tile(a, 4).astype(x.dtype)
        b4 = jnp.tile(b, 4).astype(x.dtype)
    return x * a4 + b4, new_state
