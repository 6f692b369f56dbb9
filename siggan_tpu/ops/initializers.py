"""DCGAN weight initialization.

Parity with the reference ``_init_weights`` (``generator_vanilla_gan.py:168-187``,
``discriminator_vanilla_gan.py:212-239``): conv / conv-transpose / linear
weights ~ N(0, 0.02), biases 0; BatchNorm scale ~ N(1, 0.02), offset 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DCGAN_STD = 0.02


def conv_w(key, shape, dtype=jnp.float32):
    """shape = (kh, kw, in_ch, out_ch) — HWIO, TPU-native layout."""
    return jax.random.normal(key, shape, dtype) * DCGAN_STD


def linear_w(key, shape, dtype=jnp.float32):
    """shape = (in_features, out_features)."""
    return jax.random.normal(key, shape, dtype) * DCGAN_STD


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def bn_scale(key, n, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, (n,), dtype) * DCGAN_STD


def bn_offset(n, dtype=jnp.float32):
    return jnp.zeros((n,), dtype)
