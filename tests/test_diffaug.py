"""DiffAugment policies (ops/diffaug.py): packed-layout exactness,
per-key determinism, differentiability, and train-step integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.ops.diffaug import diff_augment
from siggan_tpu.ops.packed import depth_to_space, space_to_depth

POLICY = "color,translation,cutout"


def _imgs(n=6, size=16, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(n, size, size, 1).astype(np.float32) * 2 - 1)


def test_packed_matches_canonical():
    """T(packed(x)) == packed(T(x)) for every policy — the whole point of
    the even-quantized geometry."""
    x = _imgs()
    key = jax.random.key(3)
    for policy in ("color", "translation", "cutout", POLICY):
        a = diff_augment(space_to_depth(x), key, policy, packed=True)
        b = space_to_depth(diff_augment(x, key, policy, packed=False))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=policy)


def test_deterministic_and_random_across_keys():
    x = _imgs()
    a = diff_augment(x, jax.random.key(1), POLICY, packed=False)
    b = diff_augment(x, jax.random.key(1), POLICY, packed=False)
    c = diff_augment(x, jax.random.key(2), POLICY, packed=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a - c).max()) > 0


def test_identity_when_off_and_unknown_policy_raises():
    x = _imgs()
    assert diff_augment(x, jax.random.key(0), "", packed=False) is x
    with pytest.raises(ValueError, match="unknown diffaugment"):
        diff_augment(x, jax.random.key(0), "sepia", packed=False)


def test_translation_pads_with_background():
    """A shifted all-black image exposes the pad value: +1 (white bg)."""
    x = jnp.full((8, 16, 16, 1), -1.0)
    out = diff_augment(x, jax.random.key(0), "translation", packed=False)
    vals = np.unique(np.asarray(out).round(6))
    assert set(vals).issubset({-1.0, 1.0})
    assert 1.0 in vals  # some image in the batch actually shifted


def test_differentiable():
    x = _imgs()

    def loss(x_):
        return jnp.sum(diff_augment(x_, jax.random.key(5), POLICY,
                                    packed=False) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_train_step_with_diffaugment_runs():
    from siggan_tpu.core.config import ModelConfig, TrainConfig
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_train_step

    cfg = TrainConfig(model=ModelConfig(latent_dim=8, base_features=16),
                      batch_size=8, compute_dtype=None,
                      diffaugment=POLICY, augment=False, seed=0)
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    batch = _imgs(8, 64)
    for _ in range(2):
        state, m = step(state, batch)
    for k in ("d_loss", "g_loss"):
        assert bool(jnp.isfinite(m[k]))
