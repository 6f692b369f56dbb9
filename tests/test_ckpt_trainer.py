"""Checkpoint round-trip + end-to-end trainer smoke (CPU, tiny shapes).

Mirrors the reference's strongest self-test (``vanilla_gan_model.py:663-719``
save -> reload round-trip) plus trainer behaviors it only exercises manually:
stop-file, resume, best/latest aliases.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.ckpt.manager import CheckpointManager, infer_architecture, load_generator
from siggan_tpu.core.config import ModelConfig, TrainConfig
from siggan_tpu.core.state import create_train_state
from siggan_tpu.train.trainer import GANTrainer


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


def _images(n=16):
    return (np.random.RandomState(0).rand(n, 64, 64, 1) * 2 - 1).astype(np.float32)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    mgr = CheckpointManager(cfg.checkpoint_dir, cfg)
    state = create_train_state(cfg)
    noise = jnp.ones((4, 8), jnp.float32)
    mgr.save(state, epoch=0, fixed_noise=noise, g_loss=2.0)
    mgr.save(state.replace(step=state.step + 5), epoch=1,
             fixed_noise=noise, g_loss=1.0)
    mgr.save(state.replace(step=state.step + 9), epoch=2,
             fixed_noise=noise, g_loss=3.0)

    idx = mgr.available()
    assert idx["latest"] == 2 and idx["best"] == 1

    st, extras = mgr.restore("best")
    assert int(st.step) == 5 and extras["epoch"] == 1
    st2, extras2 = mgr.restore("latest")
    assert int(st2.step) == 9 and extras2["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(extras["fixed_noise"]),
                                  np.ones((4, 8), np.float32))
    # params identical after round trip
    a = jax.tree_util.tree_leaves(state.g_params)[0]
    b = jax.tree_util.tree_leaves(st.g_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_authoritative_manager_replaces_stale_sidecar(tmp_path, capsys):
    """Reusing a checkpoint dir across runs with DIFFERENT configs must not
    leave the first run's sidecar behind: the stale config rebuilds a wrong
    restore target (optimizer tree included) for every later checkpoint —
    the exact Orbax structure-mismatch crash the 128px drive hit when its
    run dir still held a constant-lr sidecar from an earlier recipe."""
    from siggan_tpu.core.config import OptimConfig

    cfg_a = _cfg(tmp_path)
    CheckpointManager(cfg_a.checkpoint_dir, cfg_a)  # first run writes sidecar

    cfg_b = _cfg(tmp_path, optim=OptimConfig(
        d_lr=1e-4, g_lr=2e-4, lr_schedule="linear", lr_total_steps=10))
    # Non-authoritative (read-side) managers never rewrite the sidecar.
    CheckpointManager(cfg_b.checkpoint_dir, cfg_b)
    assert CheckpointManager.load_config(
        cfg_b.checkpoint_dir).optim.lr_schedule == "constant"

    # The trainer's manager is authoritative: sidecar now matches cfg_b,
    # so checkpoints saved under the new recipe restore cleanly through
    # the sidecar-driven load path.
    mgr = CheckpointManager(cfg_b.checkpoint_dir, cfg_b, authoritative=True)
    assert "previous run" in capsys.readouterr().out
    assert CheckpointManager.load_config(
        cfg_b.checkpoint_dir).optim.lr_schedule == "linear"
    mgr.save(create_train_state(cfg_b), epoch=0,
             fixed_noise=jnp.zeros((4, 8)), g_loss=1.0)
    g_params, _, loaded = load_generator(cfg_b.checkpoint_dir, "latest")
    assert loaded.optim.lr_schedule == "linear"


def test_restore_across_ema_config_change(tmp_path):
    """EMA presence must follow the CHECKPOINT: enabling ema_decay on a
    pre-EMA run (or restoring an EMA run with a default config) must not
    hit an Orbax structure mismatch."""
    # pre-EMA checkpoint, restored under an EMA-enabled config
    cfg_a = _cfg(tmp_path / "a")
    mgr_a = CheckpointManager(cfg_a.checkpoint_dir, cfg_a)
    mgr_a.save(create_train_state(cfg_a), epoch=0,
               fixed_noise=jnp.zeros((4, 8)), g_loss=1.0)
    cfg_a_ema = _cfg(tmp_path / "a", ema_decay=0.999)
    st, _ = CheckpointManager(cfg_a_ema.checkpoint_dir, cfg_a_ema).restore()
    assert st.g_ema is not None  # shadow seeded from the restored weights
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(st.g_ema["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(st.g_params)[0]))

    # EMA checkpoint, restored under an ema_decay=0 config: no structure
    # mismatch, and the shadow is DROPPED — resuming with EMA off would
    # otherwise carry a frozen shadow that train steps never update but
    # eval_generator_weights prefers forever (stale FID/best/samples).
    cfg_b = _cfg(tmp_path / "b", ema_decay=0.999)
    mgr_b = CheckpointManager(cfg_b.checkpoint_dir, cfg_b)
    mgr_b.save(create_train_state(cfg_b), epoch=0,
               fixed_noise=jnp.zeros((4, 8)), g_loss=1.0)
    cfg_b_off = _cfg(tmp_path / "b")
    st2, _ = CheckpointManager(cfg_b_off.checkpoint_dir, cfg_b_off).restore()
    assert st2.g_ema is None  # frozen-shadow resume bug (round-3 review)


def test_load_generator_and_arch_inference(tmp_path):
    cfg = _cfg(tmp_path)
    mgr = CheckpointManager(cfg.checkpoint_dir, cfg)
    state = create_train_state(cfg)
    mgr.save(state, epoch=0, fixed_noise=jnp.zeros((4, 8)), g_loss=1.0)
    g_params, g_bn, loaded_cfg = load_generator(cfg.checkpoint_dir)
    assert loaded_cfg.model.latent_dim == 8
    arch = infer_architecture(g_params)
    assert arch == {"latent_dim": 8, "image_size": 64, "base_features": 16}


@pytest.mark.slow
def test_trainer_end_to_end_with_resume_and_stop(tmp_path):
    cfg = _cfg(tmp_path)
    stop_file = tmp_path / "STOP"
    tr = GANTrainer(cfg, _images(), stop_file=str(stop_file), use_mesh=False)
    summary = tr.train(epochs=2)
    assert summary["epochs_logged"] == 2
    # artifacts exist
    assert (tmp_path / "samples" / "epoch_0000.png").exists()
    assert any((tmp_path / "logs").glob("*.json"))
    assert tr.ckpt.available()["latest"] == 1

    # resume continues from epoch 2
    tr2 = GANTrainer(cfg, _images(), use_mesh=False)
    assert tr2.resume()
    assert tr2.start_epoch == 2
    tr2.train(epochs=3)
    assert tr2.ckpt.available()["latest"] == 2

    # stop file halts immediately
    stop_file.write_text("")
    tr3 = GANTrainer(cfg, _images(), stop_file=str(stop_file), use_mesh=False)
    tr3.train(epochs=5)
    assert len(tr3.logger.metrics) == 0  # stopped before first epoch


def test_checkpoint_interval_zero_saves_only_final(tmp_path):
    # Regression: checkpoint_interval=0 used to raise ZeroDivisionError at
    # the periodic-save modulo; it means "final checkpoint only". The bug
    # lives in the host-side epoch loop, so the train step is stubbed (a
    # no-compile fake with the real metric contract) and the loop runs the
    # REAL scheduling + Orbax saves — the full-compile e2e train path is
    # covered by the slow-lane trainer tests.
    cfg = _cfg(tmp_path, checkpoint_interval=0)
    tr = GANTrainer(cfg, _images(), use_mesh=False)
    # The stub below implements the RESIDENT step contract (metrics stacked
    # to (K,), STEP_METRIC_KEYS); fail explicitly if the trainer ever takes
    # the non-resident path here instead of silently diverging.
    assert tr.resident, "stub assumes the resident scan path"
    k = tr.scan_steps

    from siggan_tpu.train.train_step import STEP_METRIC_KEYS

    def fake_step(state, images, labels=None):
        zeros = jnp.zeros((k,), jnp.float32)
        metrics = {name: zeros for name in STEP_METRIC_KEYS}
        return state.replace(step=state.step + k), metrics

    tr._step_fn = fake_step
    tr._sample_grid = lambda *a, **kw: None
    tr.train(epochs=2)
    idx = tr.ckpt.available()
    assert idx["latest"] == 1          # final save still happened
    assert idx["epochs"] == [1]        # but no per-epoch periodic saves


@pytest.mark.slow
def test_trainer_on_mesh(tmp_path, devices):
    cfg = _cfg(tmp_path, batch_size=16)
    tr = GANTrainer(cfg, _images(32), use_mesh=True)
    assert tr.mesh is not None and tr.mesh.shape["data"] == 8
    summary = tr.train(epochs=1)
    assert summary["epochs_logged"] == 1
    assert np.isfinite(summary["g_loss"]["last"])


@pytest.mark.slow
def test_logger_outputs(tmp_path):
    cfg = _cfg(tmp_path)
    tr = GANTrainer(cfg, _images(), use_mesh=False)
    tr.train(epochs=1)
    js = json.loads(next((tmp_path / "logs").glob("*.json")).read_text())
    assert js["config"]["batch_size"] == 8
    assert {"d_loss", "g_loss", "images_per_sec"} <= set(js["metrics"][0])


def test_fid_best_criterion(tmp_path):
    """Once any FID is recorded, "best" follows lowest FID, not G loss."""
    cfg = _cfg(tmp_path)
    mgr = CheckpointManager(cfg.checkpoint_dir, cfg)
    state = create_train_state(cfg)
    noise = jnp.zeros((4, 8), jnp.float32)
    mgr.save(state, epoch=0, fixed_noise=noise, g_loss=2.0, fid=300.0)
    mgr.save(state, epoch=1, fixed_noise=noise, g_loss=0.1)   # low loss, no FID
    idx = mgr.available()
    assert idx["best"] == 0 and idx["best_fid"] == 300.0      # loss ignored
    mgr.save(state, epoch=2, fixed_noise=noise, g_loss=5.0, fid=250.0)
    idx = mgr.available()
    assert idx["best"] == 2 and idx["best_fid"] == 250.0
    mgr.save(state, epoch=3, fixed_noise=noise, g_loss=5.0, fid=400.0)
    assert mgr.available()["best"] == 2


@pytest.mark.slow  # trainer + inception compile (~26 s CPU)
def test_trainer_fid_interval(tmp_path, monkeypatch):
    """fid_interval wires per-epoch FID into logs and the best alias."""
    cfg = _cfg(tmp_path, fid_interval=1, fid_samples=4)
    tr = GANTrainer(cfg, _images(), use_mesh=False)
    fids = iter([500.0, 100.0])
    monkeypatch.setattr(tr, "_compute_fid", lambda: next(fids))
    tr.train(epochs=2)
    logged = [m.get("fid") for m in tr.logger.metrics]
    assert logged == [500.0, 100.0]
    idx = tr.ckpt.available()
    assert idx["best"] == 1 and idx["best_fid"] == 100.0


def test_auto_scan_steps_prime_steps_per_epoch(tmp_path):
    """Auto scan_steps must never collapse to per-step dispatch: with a
    PRIME steps_per_epoch (no divisor <= 64) the trainer dispatches whole
    epochs instead of k=1 (round-3 review finding — k=1 reintroduces the
    per-step host round-trip the resident scan exists to amortize)."""
    cfg = _cfg(tmp_path, batch_size=8)
    tr = GANTrainer(cfg, _images(8 * 67), use_mesh=False)  # spe = 67, prime
    assert tr.scan_steps == 67
    # Divisible case keeps the <= 64 divisor behavior.
    tr2 = GANTrainer(cfg, _images(8 * 64), use_mesh=False)
    assert tr2.scan_steps == 64


def test_save_fid_without_g_loss(tmp_path):
    """FID-criterion saves need no g_loss (round-3 review: float(None))."""
    cfg = _cfg(tmp_path)
    mgr = CheckpointManager(cfg.checkpoint_dir, cfg)
    st = create_train_state(cfg)
    mgr.save(st, epoch=0, fixed_noise=jnp.zeros((4, 8)), fid=12.3)
    mgr.save(st, epoch=1, fixed_noise=jnp.zeros((4, 8)), fid=10.0)
    idx = mgr.available()
    assert idx["best"] == 1 and idx["best_fid"] == 10.0
    _, extras = mgr.restore("best")
    assert np.isinf(extras["best_g_loss"])  # running min, never None


def test_from_dict_drops_unknown_nested_keys(tmp_path):
    """Sidecars from builds with extra/renamed nested fields must load
    (checkpoints outlive field churn at every level, not just the top)."""
    d = _cfg(tmp_path).to_dict()
    d["model"]["retired_knob"] = 7
    d["optim"]["old_thing"] = "x"
    d["mesh"]["gone"] = 1
    d["top_level_unknown"] = True
    cfg = TrainConfig.from_dict(d)
    assert cfg.model.latent_dim == 8


def test_conditional_streaming_loader_trains(tmp_path):
    """Conditional + dataset over resident_max_mb streams labeled batches
    (round-5: the streaming loader gained label plumbing — the reference's
    loader has no resident-size constraint, data_loader_signatures.py:249)."""
    cfg = _cfg(tmp_path, resident_max_mb=0, epochs=1,
               model=ModelConfig(latent_dim=8, image_size=64,
                                 base_features=16, num_classes=2))
    labels = (np.arange(16) % 2).astype(np.int32)
    tr = GANTrainer(cfg, _images(16), use_mesh=False, labels=labels)
    assert not tr.resident and tr.loader is not None
    summary = tr.train()
    assert np.isfinite(summary["g_loss"]["last"])
    assert len(tr.logger.metrics) == 1


def test_conditional_streaming_missing_labels_raises(tmp_path):
    cfg = _cfg(tmp_path, resident_max_mb=0,
               model=ModelConfig(latent_dim=8, image_size=64,
                                 base_features=16, num_classes=2))
    with pytest.raises(ValueError, match="labels"):
        GANTrainer(cfg, _images(16), use_mesh=False)


def test_explicit_scan_steps_must_divide_epoch(tmp_path):
    """Explicit non-divisor scan_steps would over-train ceil(spe/K)*K steps
    per labeled epoch — rejected at construction (round-3 review)."""
    cfg = _cfg(tmp_path, scan_steps=48, batch_size=8)
    with pytest.raises(ValueError, match="must divide"):
        GANTrainer(cfg, _images(8 * 64), use_mesh=False)  # spe=64, 64%48!=0


def test_stop_before_epoch_does_not_mint_untrained_checkpoint(tmp_path):
    """Stop-file present from the start: no checkpoint may be written (the
    old code saved one labeled epoch 0 with zero training, and a stop at
    epoch N saved label N making resume SKIP epoch N — round-3 review)."""
    stop = tmp_path / "STOP"; stop.write_text("")
    cfg = _cfg(tmp_path)
    tr = GANTrainer(cfg, _images(), stop_file=str(stop), use_mesh=False)
    tr.train(epochs=3)
    assert tr.ckpt.available().get("latest") is None
