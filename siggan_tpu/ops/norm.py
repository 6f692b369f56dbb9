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
    groups: int = 1,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Normalize over all axes except the last (channel) axis.

    Works for both NHWC activations (reduces N,H,W) and (N,F) dense
    activations (reduces N) — i.e. BatchNorm2d and BatchNorm1d.
    Statistics are computed in f32 regardless of input dtype.

    ``groups > 1``: the batch axis holds ``groups`` contiguous equal-size
    sub-batches that semantically are SEQUENTIAL forwards under the same
    params (the fused-G-forwards train step). Each group normalizes with its
    own batch statistics and the running estimate folds the groups in order
    — bit-for-bit the state a loop of ``groups`` separate calls produces.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    if train and groups > 1:
        nb = x.shape[0]
        per = nb // groups
        xg = xf.reshape((groups, per) + x.shape[1:])
        red_g = tuple(range(1, xg.ndim - 1))
        mean_g = jnp.mean(xg, axis=red_g)                       # (G, C)
        var_g = jnp.mean(jnp.square(xg), axis=red_g) - jnp.square(mean_g)
        n = per
        for a in reduce_axes[1:]:
            n *= x.shape[a]
        unbiased_g = var_g * (n / max(n - 1, 1))
        m_run, v_run = state["mean"], state["var"]
        for i in range(groups):                                 # static tiny loop
            m_run = (1 - momentum) * m_run + momentum * mean_g[i]
            v_run = (1 - momentum) * v_run + momentum * unbiased_g[i]
        new_state = {"mean": m_run, "var": v_run}
        # per-sample stats rows so the affine fold below broadcasts uniformly
        mean = jnp.repeat(mean_g, per, axis=0)                  # (N, C)
        var = jnp.repeat(var_g, per, axis=0)
    elif train:
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
    groups: int = 1,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """BatchNorm over a 2x2 space-to-depth packed activation (N, H/2, W/2, 4C)
    with planar channel order phase*C + c (ops/packed.py): statistics for
    canonical channel c reduce over (N, H/2, W/2, phase) — the identical
    value set as canonical BN over (N, H, W) — and the affine broadcasts per
    canonical channel across its 4 phases. State stays in canonical (C,)
    shape, so checkpoints are layout-independent.

    ``groups``: as in :func:`batch_norm` — per-group batch statistics with a
    sequential running-state fold (the fused-G-forwards step).
    """
    n_, h_, w_, c4 = x.shape
    c = c4 // 4
    xf = x.astype(jnp.float32).reshape(n_, h_, w_, 4, c)
    if train and groups > 1:
        per = n_ // groups
        xg = xf.reshape(groups, per, h_, w_, 4, c)
        mean_g = jnp.mean(xg, axis=(1, 2, 3, 4))                # (G, C)
        var_g = jnp.mean(jnp.square(xg), axis=(1, 2, 3, 4)) - jnp.square(mean_g)
        n = per * h_ * w_ * 4
        unbiased_g = var_g * (n / max(n - 1, 1))
        m_run, v_run = state["mean"], state["var"]
        for i in range(groups):
            m_run = (1 - momentum) * m_run + momentum * mean_g[i]
            v_run = (1 - momentum) * v_run + momentum * unbiased_g[i]
        new_state = {"mean": m_run, "var": v_run}
        mean = jnp.repeat(mean_g, per, axis=0)                  # (N, C)
        var = jnp.repeat(var_g, per, axis=0)
    elif train:
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
