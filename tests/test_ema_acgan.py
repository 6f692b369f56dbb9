"""Round-3 additions: generator weight EMA for eval (VERDICT r2 #3) and the
AC-GAN auxiliary classifier for conditional steering (VERDICT r2 #2).
CPU, tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.core.config import ModelConfig, TrainConfig
from siggan_tpu.core.state import create_train_state, eval_generator_weights
from siggan_tpu.train.train_step import make_train_step, make_eval_generate


def _cfg(tmp_path=None, **kw):
    base = dict(
        model=ModelConfig(latent_dim=8, image_size=64, base_features=16),
        batch_size=8, compute_dtype=None, augment=False, seed=0)
    if tmp_path is not None:
        base.update(checkpoint_dir=str(tmp_path / "ckpt"),
                    sample_dir=str(tmp_path / "samples"),
                    log_dir=str(tmp_path / "logs"))
    base.update(kw)
    return TrainConfig(**base)


def _batch(n=8):
    rs = np.random.RandomState(0)
    return jnp.asarray(rs.rand(n, 64, 64, 1).astype(np.float32) * 2 - 1)


@pytest.mark.slow  # compile-heavy full-step test (fast-lane budget, VERDICT r2 #7)
def test_ema_tracks_weights_exactly():
    """After k steps the EMA shadow equals the closed-form weighted sum of
    the per-step weight trajectories."""
    cfg = _cfg(ema_decay=0.5)
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    batch = _batch()

    leaf = lambda tree: np.asarray(jax.tree_util.tree_leaves(tree)[0])
    expect = leaf(state.g_params).copy()          # ema_0 = params_0
    for _ in range(3):
        state, _ = step(state, batch)
        expect = 0.5 * expect + 0.5 * leaf(state.g_params)
    np.testing.assert_allclose(leaf(state.g_ema["params"]), expect,
                               rtol=1e-5, atol=1e-7)
    # BN running stats are shadowed too
    assert "bn" in state.g_ema


@pytest.mark.slow  # exhaustive-equivalence; compile-heavy (fast-lane budget, VERDICT r2 #7)
def test_ema_off_is_none_and_training_identical():
    """ema_decay=0 keeps g_ema None; the raw weight trajectory is identical
    with EMA on/off (the shadow never feeds back into training)."""
    batch = _batch()
    outs = []
    for decay in (0.0, 0.9):
        cfg = _cfg(ema_decay=decay)
        state = create_train_state(cfg)
        step = jax.jit(make_train_step(cfg))
        for _ in range(2):
            state, metrics = step(state, batch)
        outs.append((state, metrics))
    assert outs[0][0].g_ema is None and outs[1][0].g_ema is not None
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0].g_params),
                    jax.tree_util.tree_leaves(outs[1][0].g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # compile-heavy full-step test (fast-lane budget, VERDICT r2 #7)
def test_eval_generate_uses_ema(tmp_path):
    cfg = _cfg(ema_decay=0.999)
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    batch = _batch()
    for _ in range(2):
        state, _ = step(state, batch)
    z = jax.random.normal(jax.random.key(1), (4, 8))
    gen = make_eval_generate(cfg)
    from siggan_tpu.models import generator
    ep, eb = eval_generator_weights(state)
    direct, _ = generator.apply_fn(ep, eb, z, cfg.model, train=False)
    np.testing.assert_allclose(np.asarray(gen(state, z)),
                               np.asarray(direct), atol=1e-6)
    # and it differs from the raw-weight forward after training steps
    raw, _ = generator.apply_fn(state.g_params, state.g_bn, z, cfg.model,
                                train=False)
    assert float(jnp.abs(direct - raw).max()) > 0


@pytest.mark.slow  # compile-heavy full-step test (fast-lane budget, VERDICT r2 #7)
def test_ema_checkpoint_roundtrip_and_load_generator(tmp_path):
    from siggan_tpu.ckpt.manager import CheckpointManager, load_generator

    cfg = _cfg(tmp_path, ema_decay=0.9)
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    state, _ = step(state, _batch())
    mgr = CheckpointManager(cfg.checkpoint_dir, cfg)
    noise = jnp.zeros((cfg.fixed_noise_samples, cfg.model.latent_dim))
    mgr.save(state, epoch=0, fixed_noise=noise, g_loss=1.0)
    restored, _ = mgr.restore("latest")
    assert restored.g_ema is not None
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.g_ema["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state.g_ema["params"])[0]))
    # load_generator hands out the EMA weights for EMA-tracked runs
    g_params, g_bn, _ = load_generator(cfg.checkpoint_dir, "latest")
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(g_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.g_ema["params"])[0]))


@pytest.mark.slow  # compile-heavy full-step test (fast-lane budget, VERDICT r2 #7)
def test_acgan_aux_step_runs_and_classifier_learns_signal():
    """With aux_weight on, the fused step runs, reports aux_acc_real, and
    the D aux-head gradient is nonzero (the steering signal exists)."""
    model = ModelConfig(latent_dim=8, image_size=64, base_features=16,
                        num_classes=4, aux_classifier=True)
    cfg = _cfg(model=model, aux_weight=1.0)
    state = create_train_state(cfg)
    assert "aux" in state.d_params
    step = jax.jit(make_train_step(cfg))
    rs = np.random.RandomState(0)
    batch = _batch()
    labels = jnp.asarray(rs.randint(0, 4, 8), jnp.int32)
    aux_before = np.asarray(state.d_params["aux"]["w"]).copy()
    for _ in range(2):
        state, metrics = step(state, (batch, labels))
    assert "aux_acc_real" in metrics
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert np.abs(np.asarray(state.d_params["aux"]["w"]) - aux_before).max() > 0


@pytest.mark.slow  # exhaustive-equivalence; compile-heavy (fast-lane budget, VERDICT r2 #7)
def test_acgan_loss_reduces_to_plain_when_weight_zero():
    """aux_weight=0 with the head present must reproduce the plain
    conditional losses exactly (the head exists but contributes nothing)."""
    batch = _batch()
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 4, 8), jnp.int32)
    metrics = {}
    for aux_head in (False, True):
        model = ModelConfig(latent_dim=8, image_size=64, base_features=16,
                            num_classes=4, aux_classifier=aux_head)
        cfg = _cfg(model=model, aux_weight=0.0)
        state = create_train_state(cfg)
        step = jax.jit(make_train_step(cfg))
        state, m = step(state, (batch, labels))
        metrics[aux_head] = m
    np.testing.assert_allclose(float(metrics[False]["d_loss"]),
                               float(metrics[True]["d_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(metrics[False]["g_loss"]),
                               float(metrics[True]["g_loss"]), rtol=1e-6)


def test_class_balanced_fake_labels():
    from siggan_tpu.train.train_step import _fake_labels
    model = ModelConfig(latent_dim=8, image_size=64, base_features=16,
                        num_classes=4)
    cfg = _cfg(model=model)
    y = np.asarray(_fake_labels(jax.random.key(0), 8, cfg))
    assert sorted(y.tolist()) == [0, 0, 1, 1, 2, 2, 3, 3]
    y2 = np.asarray(_fake_labels(jax.random.key(1), 8, cfg))
    assert not np.array_equal(y, y2)  # permutation varies with the key
    cfg_u = _cfg(model=model, class_balanced_fakes=False)
    yu = np.asarray(_fake_labels(jax.random.key(0), 64, cfg_u))
    assert yu.min() >= 0 and yu.max() < 4


@pytest.mark.slow  # compile-heavy full-step test (fast-lane budget, VERDICT r2 #7)
def test_ema_state_survives_donation():
    """The EMA shadow must not alias g_params/g_bn: the trainer jits with
    donate_argnums=(0,) and aliased leaves trigger XLA's 'donate the same
    buffer twice' runtime error (caught by the round-3 verify drive)."""
    cfg = _cfg(ema_decay=0.9)
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    state, metrics = step(state, _batch())   # would raise before the fix
    assert np.isfinite(float(metrics["g_loss"]))


def test_adam_low_mem_statistically_matches_adam():
    """bf16-moment Adam (opt-in, OptimConfig.moment_dtype) must track plain
    f32 Adam to within bf16 rounding over a multi-step trajectory."""
    import optax

    from siggan_tpu.core.state import adam_low_mem

    params = {"w": jnp.asarray(np.random.RandomState(0).randn(64, 64),
                               jnp.float32) * 0.1,
              "b": jnp.zeros((64,))}
    plain = optax.adam(2e-4, b1=0.5, b2=0.999, eps=1e-8)
    low = adam_low_mem(2e-4, 0.5, 0.999)
    sp, sl = plain.init(params), low.init(params)
    p1 = p2 = params
    for i in range(10):
        g = jax.tree_util.tree_map(
            lambda x: jnp.sin(x * (i + 1)) * 0.3, p1)
        u1, sp = plain.update(g, sp, p1)
        p1 = optax.apply_updates(p1, u1)
        g2 = jax.tree_util.tree_map(
            lambda x: jnp.sin(x * (i + 1)) * 0.3, p2)
        u2, sl = low.update(g2, sl, p2)
        p2 = optax.apply_updates(p2, u2)
    # moments stored bf16
    assert sl["m"]["w"].dtype == jnp.bfloat16
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        a, b = np.asarray(a), np.asarray(b)
        # parameter drift bounded by a few lr-scale ULPs of bf16 rounding
        assert np.abs(a - b).max() < 5e-5, np.abs(a - b).max()


@pytest.mark.slow
def test_moment_dtype_config_wires_through():
    from siggan_tpu.core.config import OptimConfig
    cfg = _cfg(optim=OptimConfig(moment_dtype="bfloat16"))
    state = create_train_state(cfg)
    m_leaves = jax.tree_util.tree_leaves(state.g_opt)
    assert any(l.dtype == jnp.bfloat16 for l in m_leaves
               if hasattr(l, "dtype"))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    state, metrics = step(state, _batch())
    assert np.isfinite(float(metrics["g_loss"]))
