"""Fused train step: runs, learns, and is data-parallel-consistent.

The DP test is the framework's core multi-chip guarantee: because batch-mean
losses and BN statistics are *global* reductions under GSPMD, an 8-way
batch-sharded step must produce bitwise-comparable state to the same step run
unsharded (SURVEY §7 build stage 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from siggan_tpu.core.config import MeshConfig, ModelConfig, TrainConfig
from siggan_tpu.core.state import create_train_state
from siggan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from siggan_tpu.train.train_step import make_eval_generate, make_train_step


def _cfg(**kw):
    model = ModelConfig(latent_dim=16, image_size=64, base_features=32)
    return TrainConfig(model=model, batch_size=16, compute_dtype="float32",
                       seed=0, **kw)


def _fake_batch(n=16, size=64, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.rand(n, size, size, 1).astype(np.float32) * 2 - 1)


def test_train_step_runs_and_updates():
    cfg = _cfg()
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    batch = _fake_batch()
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    # The documented metric contract (train_step.STEP_METRIC_KEYS) — test
    # stubs and the host loop rely on exactly this set being present.
    from siggan_tpu.train.train_step import STEP_METRIC_KEYS
    for k in STEP_METRIC_KEYS:
        assert k in metrics and jnp.isfinite(metrics[k])
    # params actually moved
    g0 = jax.tree_util.tree_leaves(state.g_params)[0]
    g1 = jax.tree_util.tree_leaves(new_state.g_params)[0]
    assert not jnp.allclose(g0, g1)


@pytest.mark.slow
def test_train_step_determinism():
    cfg = _cfg()
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    batch = _fake_batch()
    s1, m1 = step(state, batch)
    s2, m2 = step(state, batch)
    assert jnp.allclose(m1["d_loss"], m2["d_loss"])
    assert jnp.allclose(m1["g_loss"], m2["g_loss"])


@pytest.mark.slow
def test_n_critic_and_grad_clip():
    cfg = _cfg(n_critic=2).replace(
        optim=_cfg().optim.__class__(gradient_clip_value=1.0))
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    new_state, metrics = step(state, _fake_batch())
    assert int(new_state.step) == 1
    assert jnp.isfinite(metrics["d_loss"])


@pytest.mark.slow
def test_discriminator_learns_separable_data():
    """After a few steps on strongly-structured 'real' data, D should score
    real above fake (the same sanity the reference's __main__ blocks eyeball)."""
    cfg = _cfg()
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    real = jnp.ones((16, 64, 64, 1), jnp.float32) * 0.8
    metrics = {}
    for _ in range(20):
        state, metrics = step(state, real)
    assert float(metrics["d_real_mean"]) > float(metrics["d_fake_mean"])


@pytest.mark.slow
def test_data_parallel_matches_single_device(devices):
    cfg = _cfg()
    mesh = make_mesh(MeshConfig(), devices)
    assert mesh.shape["data"] == 8

    batch = _fake_batch()
    state = create_train_state(cfg)
    step = make_train_step(cfg)

    # Single-device reference
    s_ref, m_ref = jax.jit(step)(state, batch)

    # 8-way sharded
    state_sh = replicate(mesh, state)
    batch_sh = shard_batch(mesh, batch)
    step_dp = jax.jit(
        step,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))),
    )
    s_dp, m_dp = step_dp(state_sh, batch_sh)

    np.testing.assert_allclose(
        float(m_ref["d_loss"]), float(m_dp["d_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(m_ref["g_loss"]), float(m_dp["g_loss"]), rtol=1e-4)
    # BN running stats must agree: the proof that cross-replica BN == global BN
    ref_bn = np.asarray(s_ref.g_bn["blocks"][0]["mean"])
    dp_bn = np.asarray(jax.device_get(s_dp.g_bn["blocks"][0]["mean"]))
    np.testing.assert_allclose(ref_bn, dp_bn, rtol=1e-4, atol=1e-6)
    w_ref = np.asarray(jax.tree_util.tree_leaves(s_ref.g_params)[0])
    w_dp = np.asarray(jax.device_get(jax.tree_util.tree_leaves(s_dp.g_params)[0]))
    np.testing.assert_allclose(w_ref, w_dp, rtol=1e-3, atol=1e-6)


@pytest.mark.slow
def test_resident_multi_step_equals_sequential():
    """lax.scan of K resident steps must equal K sequential dispatches."""
    from siggan_tpu.train.train_step import (make_resident_multi_step,
                                             make_resident_train_step)

    cfg = _cfg()
    images = jnp.asarray(np.random.RandomState(1)
                         .rand(64, 64, 64, 1).astype(np.float32) * 2 - 1)

    step_fn, spe = make_resident_train_step(cfg, 64)
    assert spe == 4
    step = jax.jit(step_fn)
    s_seq = create_train_state(cfg)
    for _ in range(4):
        s_seq, m_seq = step(s_seq, images)

    multi, _ = make_resident_multi_step(cfg, 64, 4)
    s_scan, m_scan = jax.jit(multi)(create_train_state(cfg), images)

    assert int(s_scan.step) == int(s_seq.step) == 4
    assert m_scan["g_loss"].shape == (4,)
    # rtol: scan vs unrolled programs fuse the packed-graph convs
    # differently; ~1e-5 relative f32 drift accumulates over 4 steps.
    np.testing.assert_allclose(float(m_scan["g_loss"][-1]),
                               float(m_seq["g_loss"]), rtol=1e-4)
    wa = np.asarray(jax.tree_util.tree_leaves(s_seq.g_params)[0])
    wb = np.asarray(jax.tree_util.tree_leaves(s_scan.g_params)[0])
    # scan and unrolled programs fuse differently; tiny f32 drift is expected
    np.testing.assert_allclose(wa, wb, rtol=1e-2, atol=1e-4)


def test_eval_generate():
    cfg = _cfg()
    state = create_train_state(cfg)
    gen = jax.jit(make_eval_generate(cfg))
    z = jax.random.normal(jax.random.key(1), (4, 16))
    img = gen(state, z)
    assert img.shape == (4, 64, 64, 1)
    assert jnp.all(jnp.abs(img) <= 1.0)
    # eval is deterministic
    assert jnp.allclose(img, gen(state, z))


@pytest.mark.slow  # compile-heavy equivalence proof (~35 s CPU)
def test_shared_fakes_step_equals_retrace():
    """share_fakes (single G forward via vjp) must equal the naive
    re-traced implementation of the ablation-trainer semantics."""
    import dataclasses

    import optax

    from siggan_tpu.core.config import ModelConfig, TrainConfig
    from siggan_tpu.core.state import create_train_state, make_optimizers
    from siggan_tpu.models import discriminator, generator
    from siggan_tpu.train import train_step as ts

    cfg = TrainConfig(model=ModelConfig(image_size=64, base_features=16),
                      batch_size=8, compute_dtype=None, augment=False,
                      packed_io=False, share_fakes=True)
    rs = np.random.RandomState(0)
    real = jnp.asarray((rs.rand(8, 64, 64, 1) * 2 - 1).astype(np.float32))
    g_tx, d_tx = make_optimizers(cfg)
    state = create_train_state(cfg)
    nk, dk = jax.random.key(5), jax.random.key(6)

    got_state, got_m = ts.shared_fakes_step(state, real, nk, dk, cfg,
                                            d_tx, g_tx)

    # naive re-trace with the identical key structure
    z = generator.generate_latent(nk, 8, cfg.model)
    dk_d, dk_g = jax.random.split(dk)
    fake, g_bn = generator.apply_fn(state.g_params, state.g_bn, z, cfg.model,
                                    train=True)
    both = jnp.concatenate([real, jax.lax.stop_gradient(fake)], axis=0)

    def d_loss_fn(dp):
        logits, d_state = discriminator.apply_fn(
            dp, state.d_state, both, cfg.model, train=True, rng=dk_d)
        return (ts._bce_mean(logits[:8], cfg.label_smoothing)
                + ts._bce_mean(logits[8:], 0.0)), d_state

    (d_loss, d_state), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(state.d_params)
    du, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, du)

    def g_loss_fn(gp):
        fake2, _ = generator.apply_fn(gp, state.g_bn, z, cfg.model,
                                      train=True)
        logits, _ = discriminator.apply_fn(
            d_params, d_state, fake2, cfg.model, train=True, rng=dk_g)
        return ts._bce_mean(logits, 1.0)

    g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
    gu, _ = g_tx.update(g_grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, gu)

    np.testing.assert_allclose(float(got_m["d_loss"]), float(d_loss),
                               rtol=1e-6)
    np.testing.assert_allclose(float(got_m["g_loss"]), float(g_loss),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(got_state.g_params),
                    jax.tree_util.tree_leaves(g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(got_state.g_bn),
                    jax.tree_util.tree_leaves(g_bn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.slow  # exhaustive-equivalence; compile-heavy (fast-lane budget, VERDICT r2 #7)
def test_bulk_augment_active_and_fallback():
    """Round-3 perf: resident steps hoist augmentation to epoch granularity
    (augment_bulk). The bulk path must actually augment (trajectory differs
    from augment=False), and when the window's augmented-image table
    exceeds resident_max_mb the multi-step entry must fall back to the
    param-table warp with IDENTICAL batches (same epoch-keyed draws), not
    to a different augmentation cadence."""
    from siggan_tpu.train.train_step import (_use_aug_table,
                                             make_resident_multi_step,
                                             make_resident_train_step)

    cfg = _cfg()
    assert cfg.augment and cfg.augment_bulk
    assert _use_aug_table(cfg, 64, 2)
    tiny = cfg.replace(resident_max_mb=0)
    assert not _use_aug_table(tiny, 64, 2)

    images = _fake_batch(32)
    outs = {}
    for name, c in (("aug", cfg), ("noaug", cfg.replace(augment=False))):
        step_fn, _ = make_resident_train_step(c, 32)
        s, m = jax.jit(step_fn)(create_train_state(c), images)
        outs[name] = float(m["d_loss"])
    assert outs["aug"] != outs["noaug"]

    # Table path (default) == param-table fallback (resident_max_mb=0),
    # step for step.
    per_cfg = {}
    for name, c in (("table", cfg), ("params", tiny)):
        step_fn, _ = make_resident_multi_step(c, 32, 4)
        s, m = jax.jit(step_fn)(create_train_state(c), images)
        per_cfg[name] = np.asarray(m["d_loss"])
    np.testing.assert_allclose(per_cfg["table"], per_cfg["params"],
                               rtol=2e-5)


@pytest.mark.slow  # exhaustive-equivalence; compile-heavy (fast-lane budget, VERDICT r2 #7)
def test_bulk_augment_matches_in_step_distribution():
    """Bulk and in-step augment draw from the same transform family: both
    produce one fresh warp per image per epoch, values in [-1, 1]."""
    from siggan_tpu.data.augment import augment_batch_inner

    images = _fake_batch(8)
    a = augment_batch_inner(images, jax.random.key(0))
    b = augment_batch_inner(images, jax.random.key(1))
    assert a.shape == images.shape
    assert float(jnp.abs(a).max()) <= 1.0 + 1e-5
    assert float(jnp.abs(a - b).max()) > 0   # fresh transforms per key


def _run_steps(cfg, batch, n=2):
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    ms = []
    for _ in range(n):
        state, m = step(state, batch)
    return state, m


def _assert_states_close(sa, sb, tol=2e-5):
    for la, lb in zip(jax.tree_util.tree_leaves(sa.g_params),
                      jax.tree_util.tree_leaves(sb.g_params)):
        np.testing.assert_allclose(la, lb, rtol=tol, atol=tol)
    for la, lb in zip(jax.tree_util.tree_leaves(sa.d_params),
                      jax.tree_util.tree_leaves(sb.d_params)):
        np.testing.assert_allclose(la, lb, rtol=tol, atol=tol)
    for la, lb in zip(jax.tree_util.tree_leaves(sa.g_bn),
                      jax.tree_util.tree_leaves(sb.g_bn)):
        np.testing.assert_allclose(la, lb, rtol=tol, atol=tol)


@pytest.mark.slow  # compile-heavy equivalence proof (~70 s CPU)
def test_fused_g_forwards_equals_sequential():
    """The grouped-BN merged generator forward (fuse_g_forwards, the default)
    is numerically equivalent to the sequential n_critic+1 forwards."""
    batch = _fake_batch()
    sa, ma = _run_steps(_cfg(fuse_g_forwards=True), batch)
    sb, mb = _run_steps(_cfg(fuse_g_forwards=False), batch)
    _assert_states_close(sa, sb)
    for k in ("d_loss", "g_loss", "d_real_mean", "d_on_g_mean"):
        np.testing.assert_allclose(ma[k], mb[k], rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # second compile pair; same proof at n_critic=2 + conditional
def test_fused_g_forwards_equals_sequential_ncritic_conditional():
    batch = _fake_batch()
    y = jnp.asarray(np.random.RandomState(1).randint(0, 4, size=16))
    for kw in (dict(n_critic=2),
               dict(model=ModelConfig(latent_dim=16, image_size=64,
                                      base_features=32, num_classes=4),
                    batch_size=16, compute_dtype="float32", seed=0)):
        if "model" in kw:
            ca = TrainConfig(fuse_g_forwards=True, **kw)
            cb = TrainConfig(fuse_g_forwards=False, **kw)
            args = (batch, y)
        else:
            ca, cb = _cfg(fuse_g_forwards=True, **kw), _cfg(fuse_g_forwards=False, **kw)
            args = (batch,)
        stepa = jax.jit(make_train_step(ca))
        stepb = jax.jit(make_train_step(cb))
        sa, sb = create_train_state(ca), create_train_state(cb)
        for _ in range(2):
            sa, ma = stepa(sa, *args)
            sb, mb = stepb(sb, *args)
        # 5e-4: the merged per-group BN reduction accumulates in a different
        # order than the separate calls (~1 ulp in f32), and two Adam steps
        # amplify that; at n_critic=1 the same comparison holds at 2e-5
        # (test above). 0.06% of elements drift, none systematically.
        _assert_states_close(sa, sb, tol=5e-4)
        np.testing.assert_allclose(ma["g_loss"], mb["g_loss"], rtol=5e-4,
                                   atol=5e-4)
