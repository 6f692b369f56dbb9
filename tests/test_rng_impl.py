"""rng_impl knob: rbg keys wire through every stream and stay reproducible.

rbg (XLA RngBitGenerator) is the default bit generator — one vector pass per
block vs threefry's 20 mixing rounds, measured -40 us/step on the 64px/b64
TPU train step. These tests pin the contract that makes that swap safe:
derived keys inherit the impl, same-seed runs replay identically, and the
two impls produce *different* (i.e. genuinely independent) streams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.core import rng as rnglib
from siggan_tpu.core.config import ModelConfig, TrainConfig
from siggan_tpu.core.state import create_train_state
from siggan_tpu.train.train_step import make_train_step


def _cfg(**kw):
    model = ModelConfig(latent_dim=16, image_size=64, base_features=16)
    return TrainConfig(model=model, batch_size=8, compute_dtype="float32",
                       seed=0, **kw)


def _fake_batch(n=8, size=64, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(n, size, size, 1).astype(np.float32) * 2 - 1)


def test_root_key_impl_inherited_by_derived_keys():
    k = rnglib.root_key(7, "rbg")
    derived = jax.random.fold_in(jax.random.split(k, 2)[0], 3)
    assert "rbg" in str(jax.random.key_impl(derived))
    k_tf = rnglib.root_key(7, "threefry2x32")
    assert "threefry" in str(jax.random.key_impl(k_tf))
    # default (None) keeps jax's default impl
    assert "threefry" in str(jax.random.key_impl(rnglib.root_key(7)))


def test_rbg_and_threefry_streams_differ_but_each_reproduces():
    draws = {}
    for impl in ("rbg", "threefry2x32"):
        k = rnglib.stream(rnglib.root_key(0, impl), rnglib.STREAM_NOISE)
        a = jax.random.normal(rnglib.at_step(k, 5), (32,))
        b = jax.random.normal(rnglib.at_step(k, 5), (32,))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        draws[impl] = np.asarray(a)
    assert not np.array_equal(draws["rbg"], draws["threefry2x32"])


def test_train_step_rng_impl_wiring():
    """One fast-lane test covering both train-step-level rng_impl contracts:
    (a) same-seed rbg runs replay identically from a FRESH trace each time
    (the reproducibility that makes rbg a safe default), and (b) the
    threefry2x32 option genuinely changes the training stream. The
    full-size two-step variant lives in the slow lane. The rng contract is
    independent of the packed/augment graph rewrites, so this traces the
    slim pixel-space step (the default packed trace costs ~8 s/trace on a
    1-core host; the slow-lane variant keeps the defaults)."""
    batch = _fake_batch()
    outs = []
    for _ in range(2):  # fresh state + fresh trace each run
        cfg = _cfg(packed_io=False, augment=False)
        assert cfg.rng_impl == "rbg"
        state = create_train_state(cfg)
        state, m = jax.jit(make_train_step(cfg))(state, batch)
        outs.append((float(m["d_loss"]), float(m["g_loss"]),
                     np.asarray(jax.tree_util.tree_leaves(state.g_params)[0])))
    assert outs[0][0] == outs[1][0] and outs[0][1] == outs[1][1]
    np.testing.assert_array_equal(outs[0][2], outs[1][2])

    cfg = _cfg(rng_impl="threefry2x32", packed_io=False, augment=False)
    state = create_train_state(cfg)
    state, m = jax.jit(make_train_step(cfg))(state, batch)
    assert np.isfinite(float(m["g_loss"]))
    assert float(m["g_loss"]) != outs[0][1]


@pytest.mark.slow
def test_train_step_same_seed_reproducible_under_rbg_two_steps():
    cfg = _cfg()  # default rng_impl="rbg"
    batch = _fake_batch()
    outs = []
    for _ in range(2):
        state = create_train_state(cfg)
        step = jax.jit(make_train_step(cfg))
        state, m = step(state, batch)
        state, m = step(state, batch)
        outs.append((float(m["d_loss"]), float(m["g_loss"]),
                     np.asarray(jax.tree_util.tree_leaves(state.g_params)[0])))
    assert outs[0][0] == outs[1][0] and outs[0][1] == outs[1][1]
    np.testing.assert_array_equal(outs[0][2], outs[1][2])


def test_rng_impl_survives_config_roundtrip():
    cfg = _cfg(rng_impl="threefry2x32")
    assert TrainConfig.from_json(cfg.to_json()).rng_impl == "threefry2x32"
    # pre-knob sidecars (no rng_impl key) load with the current default
    d = cfg.to_dict()
    del d["rng_impl"]
    assert TrainConfig.from_dict(d).rng_impl == "rbg"
