"""Conditional (v2.0) per-writer generation: the reference registry plans it
(/root/reference/model_versions.yaml:74-97); this framework implements it.
CPU, tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.core.config import ModelConfig, TrainConfig
from siggan_tpu.core.state import create_train_state
from siggan_tpu.models import discriminator, generator


def _cfg(**kw):
    model = ModelConfig(latent_dim=8, image_size=64, base_features=16,
                        num_classes=4)
    base = dict(model=model, batch_size=8, compute_dtype=None, augment=False,
                seed=0)
    base.update(kw)
    return TrainConfig(**base)


def test_conditional_forward_depends_on_label():
    cfg = _cfg().model
    g_params, g_bn = generator.init_fn(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), (4, cfg.latent_dim))
    y0 = jnp.zeros((4,), jnp.int32)
    y1 = jnp.ones((4,), jnp.int32)
    img0, _ = generator.apply_fn(g_params, g_bn, z, cfg, train=False, y=y0)
    img1, _ = generator.apply_fn(g_params, g_bn, z, cfg, train=False, y=y1)
    assert img0.shape == (4, 64, 64, 1)
    assert float(jnp.abs(img0 - img1).max()) > 0  # label changes the output

    d_params, d_state = discriminator.init_fn(jax.random.key(2), cfg)
    l0, _ = discriminator.apply_fn(d_params, d_state, img0, cfg, train=False,
                                   y=y0)
    l1, _ = discriminator.apply_fn(d_params, d_state, img0, cfg, train=False,
                                   y=y1)
    assert l0.shape == (4, 1)
    assert float(jnp.abs(l0 - l1).max()) > 0       # projection head active

    # labels are mandatory on the conditional path
    for fn in (lambda: generator.apply_fn(g_params, g_bn, z, cfg,
                                          train=False),
               lambda: discriminator.apply_fn(d_params, d_state, img0, cfg,
                                              train=False)):
        try:
            fn()
            raise AssertionError("expected ValueError without labels")
        except ValueError:
            pass


@pytest.mark.slow
def test_conditional_train_step_runs():
    from siggan_tpu.train.train_step import make_train_step

    cfg = _cfg()
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    rs = np.random.RandomState(0)
    batch = jnp.asarray(rs.rand(8, 64, 64, 1).astype(np.float32) * 2 - 1)
    labels = jnp.asarray(rs.randint(0, 4, 8), jnp.int32)
    for _ in range(2):
        state, metrics = step(state, (batch, labels))
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


@pytest.mark.slow  # full conditional trainer compile (~27 s CPU)
def test_conditional_resident_and_trainer(tmp_path):
    from siggan_tpu.data.synthetic import generate_labeled_dataset
    from siggan_tpu.train.trainer import GANTrainer

    images, labels = generate_labeled_dataset(4, 8, size=64, seed=3)
    assert images.shape == (32, 64, 64, 1) and labels.shape == (32,)
    assert set(np.unique(labels)) == {0, 1, 2, 3}
    cfg = _cfg(epochs=1, sample_interval=1, checkpoint_interval=1,
               fixed_noise_samples=4,
               checkpoint_dir=str(tmp_path / "ckpt"),
               sample_dir=str(tmp_path / "samples"),
               log_dir=str(tmp_path / "logs"))
    tr = GANTrainer(cfg, images, use_mesh=False, labels=labels)
    summary = tr.train(epochs=1)
    assert summary["epochs_logged"] == 1
    assert (tmp_path / "samples" / "epoch_0001.png").exists()

    # conditional sampling from the saved checkpoint
    from siggan_tpu.infer.generate import load_session
    sess = load_session(str(tmp_path / "ckpt"), "latest")
    per_class = sess.sample(4, seed=1, batch_size=4, class_id=2)
    mixed = sess.sample(4, seed=1, batch_size=4)
    assert per_class.shape == (4, 64, 64, 1)
    assert float(np.abs(per_class - mixed).max()) > 0


@pytest.mark.slow  # full bf16 train-step compile, ~17 s on the 1-core host
def test_projection_gradient_reaches_class_params_bf16():
    """The projection-D term's gradient must flow into the class embedding
    AND back into G's class-conditioning params under bf16 compute — the
    silent-failure mode VERDICT r2 #2 told us to rule out (a stop_gradient
    or dtype cut here would train an unconditional model that still accepts
    labels)."""
    import jax

    from siggan_tpu.core.config import ModelConfig, TrainConfig
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_train_step

    cfg = TrainConfig(
        model=ModelConfig(latent_dim=8, base_features=16, num_classes=4),
        batch_size=8, compute_dtype="bfloat16", seed=0)
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    real = jnp.asarray(np.random.RandomState(0)
                       .rand(8, 64, 64, 1).astype(np.float32) * 2 - 1)
    y = jnp.arange(8, dtype=jnp.int32) % 4
    new_state, metrics = step(state, real, y)

    def moved(before, after):
        return any(
            float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32)))) > 0
            for a, b in zip(jax.tree_util.tree_leaves(before),
                            jax.tree_util.tree_leaves(after)))

    assert moved(state.d_params["class_embed"],
                 new_state.d_params["class_embed"]), \
        "projection embedding received no gradient"
    assert moved(state.g_params["embed"], new_state.g_params["embed"]), \
        "G class embedding got no gradient"


@pytest.mark.slow
def test_share_fakes_conditional_runs():
    """share_fakes + conditional (previously a NotImplementedError guard):
    the shared-forward step must thread labels into G, D's projection, and
    the aux head, and update the class parameters."""
    import jax

    from siggan_tpu.core.config import ModelConfig, TrainConfig
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.train.train_step import make_train_step

    cfg = TrainConfig(
        model=ModelConfig(latent_dim=8, base_features=16, num_classes=4,
                          aux_classifier=True),
        share_fakes=True, batch_size=8, compute_dtype="float32", seed=0)
    state = create_train_state(cfg)
    step = jax.jit(make_train_step(cfg))
    real = jnp.asarray(np.random.RandomState(0)
                       .rand(8, 64, 64, 1).astype(np.float32) * 2 - 1)
    y = jnp.arange(8, dtype=jnp.int32) % 4
    new_state, metrics = step(state, real, y)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    emb_moved = float(jnp.max(jnp.abs(
        new_state.g_params["embed"] - state.g_params["embed"]))) > 0
    assert emb_moved, "G class embedding got no gradient via shared fakes"


def test_writer_labels_from_subdirs(tmp_path):
    from siggan_tpu.data.dataset import SignatureDataset
    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.infer.export import save_pngs

    for w in ("alice", "bob"):
        save_pngs(generate_dataset(3, 64, seed=hash(w) % 100),
                  tmp_path / w, prefix="sig")
    ds = SignatureDataset(tmp_path, 64, use_cache=False)
    labels, names = ds.writer_labels()
    assert names == ["alice", "bob"]
    assert labels.tolist() == [0, 0, 0, 1, 1, 1]


def test_concat_conditioning_forward_and_infer():
    """g_conditioning="concat": one-hot columns widen fc (no learnable
    conditioning params); output depends on the label; param tree has no
    embed table and no per-class BN rows."""
    cfg = ModelConfig(latent_dim=8, image_size=64, base_features=16,
                      num_classes=4, g_conditioning="concat")
    g_params, g_bn = generator.init_fn(jax.random.key(0), cfg)
    assert g_params["fc"]["w"].shape[0] == 8 + 4
    assert "embed" not in g_params
    assert g_params["fc_bn"]["scale"].ndim == 1          # plain BN
    z = jax.random.normal(jax.random.key(1), (4, cfg.latent_dim))
    img0, _ = generator.apply_fn(g_params, g_bn, z, cfg, train=False,
                                 y=jnp.zeros((4,), jnp.int32))
    img1, _ = generator.apply_fn(g_params, g_bn, z, cfg, train=False,
                                 y=jnp.ones((4,), jnp.int32))
    assert img0.shape == (4, 64, 64, 1)
    assert float(jnp.abs(img0 - img1).max()) > 0
