"""Minibatch discrimination (Salimans et al. 2016) — anti-mode-collapse layer.

Parity target: ``discriminator_vanilla_gan.py:285`` defines this layer but
never wires it into the Discriminator; we keep the same contract (available,
optional). Given per-sample features it appends cross-batch L1-kernel
similarity statistics, letting D detect a collapsed generator producing
near-identical samples.

Under data-parallel sharding the pairwise term is computed over the *local*
shard only by design — cross-batch statistics within a shard are sufficient
for the collapse signal and avoid an all-gather of activations.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from siggan_tpu.ops import initializers as init


def init_fn(key: jax.Array, in_features: int, out_features: int = 100,
            kernel_dims: int = 5) -> Dict:
    return {
        "T": init.linear_w(key, (in_features, out_features * kernel_dims)),
        "out_features": out_features,
        "kernel_dims": kernel_dims,
    }


def apply_fn(params: Dict, x: jax.Array) -> jax.Array:
    """x: (N, A) -> (N, A + out_features)."""
    b, c = params["out_features"], params["kernel_dims"]
    m = jnp.dot(x, params["T"], preferred_element_type=jnp.float32)
    m = m.reshape(x.shape[0], b, c)
    # (N, N, B): L1 distance between every pair of samples per kernel row.
    l1 = jnp.sum(jnp.abs(m[:, None, :, :] - m[None, :, :, :]), axis=-1)
    o = jnp.sum(jnp.exp(-l1), axis=1) - 1.0  # exclude self-distance (exp(0)=1)
    return jnp.concatenate([x, o.astype(x.dtype)], axis=-1)
