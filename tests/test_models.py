"""Shape / range / param-count tests for G and D.

Mirrors the reference's executable self-tests
(``generator_vanilla_gan.py:263-292``, ``discriminator_vanilla_gan.py:373-416``)
as real pytest units.
"""

import jax
import jax.numpy as jnp
import pytest

from siggan_tpu.core.config import ModelConfig
from siggan_tpu.models import discriminator, generator


@pytest.mark.parametrize(
    "size", [64, pytest.param(128, marks=pytest.mark.slow)])
def test_generator_shapes_and_range(size):
    cfg = ModelConfig(latent_dim=32, image_size=size, base_features=64)
    params, state = generator.init_fn(jax.random.key(0), cfg)
    z = generator.generate_latent(jax.random.key(1), 4, cfg)
    img, new_state = generator.apply_fn(params, state, z, cfg, train=True)
    assert img.shape == (4, size, size, 1)
    assert jnp.all(img >= -1.0) and jnp.all(img <= 1.0)
    # BN state must actually move in train mode
    assert not jnp.allclose(new_state["fc_bn"]["mean"], state["fc_bn"]["mean"])
    # eval mode: state unchanged
    img2, st2 = generator.apply_fn(params, new_state, z, cfg, train=False)
    assert jnp.allclose(st2["fc_bn"]["mean"], new_state["fc_bn"]["mean"])


@pytest.mark.parametrize(
    "size,sn", [(64, False), (64, True),
                pytest.param(128, False, marks=pytest.mark.slow)])
def test_discriminator_shapes(size, sn):
    cfg = ModelConfig(image_size=size, use_spectral_norm=sn)
    params, state = discriminator.init_fn(jax.random.key(0), cfg)
    x = jax.random.uniform(jax.random.key(1), (4, size, size, 1), minval=-1, maxval=1)
    logits, new_state = discriminator.apply_fn(
        params, state, x, cfg, train=True, rng=jax.random.key(2))
    assert logits.shape == (4, 1)
    assert logits.dtype == jnp.float32
    feats, _ = discriminator.apply_fn(
        params, state, x, cfg, train=False, features=True)
    assert feats.shape == (4, 512 * 4 * 4)
    if sn:
        assert not jnp.allclose(new_state["blocks"][0]["u"], state["blocks"][0]["u"])


def test_param_counts_match_reference():
    """Reference: G ~1.13M, D ~2.76M at 64px (SURVEY §2.1 #3/#4)."""
    cfg = ModelConfig()  # defaults: z=100, 64px, base 256
    gp, _ = generator.init_fn(jax.random.key(0), cfg)
    dp, _ = discriminator.init_fn(jax.random.key(0), cfg)
    assert abs(generator.param_count(gp) - 1_130_000) < 60_000
    assert abs(discriminator.param_count(dp) - 2_760_000) < 60_000


def test_generator_leaky_variant():
    cfg = ModelConfig(latent_dim=16, base_features=32, g_activation="leaky_relu")
    params, state = generator.init_fn(jax.random.key(0), cfg)
    z = generator.generate_latent(jax.random.key(1), 2, cfg)
    img, _ = generator.apply_fn(params, state, z, cfg, train=False)
    assert img.shape == (2, 64, 64, 1)


def test_dropout_requires_rng_in_train():
    cfg = ModelConfig(latent_dim=16, base_features=32)
    params, state = discriminator.init_fn(jax.random.key(0), cfg)
    x = jnp.zeros((2, 64, 64, 1))
    with pytest.raises(ValueError):
        discriminator.apply_fn(params, state, x, cfg, train=True, rng=None)
