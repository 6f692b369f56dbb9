"""Regression tests for round-1 review findings (VERDICT.md "What's weak").

1. KeyboardInterrupt during the trainer's initial sample grid must not raise
   NameError on the unbound ``epoch`` (trainer.py except-handler).
2. The control panel's discriminator quality filter must not re-restore the
   full checkpoint on every scored generate call.
3. ``GeneratorSession.interpolate`` with the Pallas forward must pad odd
   batch sizes to the kernel's tile multiple.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.core.config import ModelConfig, TrainConfig
from siggan_tpu.core.state import create_train_state


def _cfg(tmp_path, **kw):
    base = dict(
        model=ModelConfig(latent_dim=8, image_size=64, base_features=16),
        batch_size=8, epochs=2, compute_dtype="float32", seed=0,
        sample_interval=1, checkpoint_interval=1, fixed_noise_samples=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        sample_dir=str(tmp_path / "samples"),
        log_dir=str(tmp_path / "logs"),
        augment=False, prefetch=1,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_interrupt_during_initial_grid_saves_checkpoint(tmp_path, monkeypatch):
    from siggan_tpu.train.trainer import GANTrainer

    cfg = _cfg(tmp_path)
    images = (np.random.RandomState(0).rand(16, 64, 64, 1) * 2 - 1
              ).astype(np.float32)
    tr = GANTrainer(cfg, images, use_mesh=False)

    def boom(epoch):
        raise KeyboardInterrupt

    monkeypatch.setattr(tr, "_sample_grid", boom)
    # Must neither re-raise nor NameError; the handler checkpoints epoch 0.
    tr.train(epochs=1)
    assert tr.ckpt.available()["latest"] == 0


def test_quality_filter_restores_checkpoint_once(tmp_path, monkeypatch):
    from siggan_tpu.ckpt.manager import CheckpointManager
    from siggan_tpu.serve.app import AppCore

    cfg = _cfg(tmp_path / "work",
               checkpoint_dir=str(tmp_path / "work" / "checkpoints"))
    mgr = CheckpointManager(cfg.checkpoint_dir, cfg)
    state = create_train_state(cfg)
    mgr.save(state, epoch=0, fixed_noise=jnp.zeros((4, 8)), g_loss=1.0)

    calls = {"n": 0}
    orig = CheckpointManager.restore

    def counted(self, which="latest"):
        calls["n"] += 1
        return orig(self, which)

    monkeypatch.setattr(CheckpointManager, "restore", counted)
    core = AppCore(tmp_path / "work")
    imgs = (np.random.RandomState(1).rand(4, 64, 64, 1) * 2 - 1
            ).astype(np.float32)
    core._d_scores("checkpoints", "latest", imgs)
    after_first = calls["n"]
    scores = core._d_scores("checkpoints", "latest", imgs)
    assert calls["n"] == after_first  # cached: zero new restores
    assert scores.shape == (4,)


def test_pallas_session_interpolate_pads_to_tile(monkeypatch):
    import siggan_tpu.ops.pallas.generator_fwd as gf
    from siggan_tpu.infer.generate import GeneratorSession

    orig = gf.generator_forward
    monkeypatch.setattr(
        gf, "generator_forward",
        lambda packed, z, *, tile=8, interpret=False: orig(
            packed, z, tile=tile, interpret=True))

    cfg = ModelConfig(latent_dim=8, image_size=64, base_features=16)
    state = create_train_state(TrainConfig(model=cfg, compute_dtype="float32"))
    sess = GeneratorSession(state.g_params, state.g_bn, cfg,
                            compute_dtype=None, use_pallas=True)
    # steps=10 is not a multiple of the kernel tile (8): the un-padded path
    # used to assert inside the kernel.
    frames = sess.interpolate(seed=0, steps=10)
    assert frames.shape == (10, 64, 64, 1)
    # odd sample count exercises the same padding in sample()
    out = sess.sample(5, seed=1, batch_size=5)
    assert out.shape == (5, 64, 64, 1)


def test_flatten_leaves_matches_plain_adam():
    """Kept-for-the-record optimizer wrapper must be elementwise-identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from siggan_tpu.core.state import flatten_leaves

    params = {"a": jnp.arange(12.0).reshape(3, 4) / 7,
              "b": {"w": jnp.ones((2, 2, 2)) * 0.3}}
    grads = jax.tree_util.tree_map(lambda x: jnp.sin(x) + 0.1, params)
    plain = optax.adam(1e-3, b1=0.5, b2=0.999)
    wrapped = flatten_leaves(optax.adam(1e-3, b1=0.5, b2=0.999))
    sp, sw = plain.init(params), wrapped.init(params)
    p1, p2 = params, params
    for _ in range(3):
        u1, sp = plain.update(grads, sp, p1)
        p1 = optax.apply_updates(p1, u1)
        u2, sw = wrapped.update(grads, sw, p2)
        p2 = optax.apply_updates(p2, u2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)
