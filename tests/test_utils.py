"""Logger / visualizer / LR-mutation units."""

import json

import numpy as np
import pytest

from siggan_tpu.utils.logger import GANLogger
from siggan_tpu.utils import visualizer as viz


def test_logger_csv_json_summary(tmp_path):
    lg = GANLogger(tmp_path, "exp")
    lg.log_config({"batch_size": 8})
    lg.log_metrics(0, {"d_loss": 1.0, "g_loss": 2.0}, echo=False)
    lg.log_metrics(1, {"d_loss": 0.5, "g_loss": 1.5, "extra": 3.0}, echo=False)
    csv_path = lg.save_to_csv()
    js_path = lg.save_to_json()
    assert "extra" in csv_path.read_text().splitlines()[0]
    data = json.loads(js_path.read_text())
    assert data["config"]["batch_size"] == 8 and len(data["metrics"]) == 2
    s = lg.get_summary()
    assert s["epochs_logged"] == 2 and s["d_loss"]["min"] == 0.5


def test_grid_and_panels(tmp_path):
    rs = np.random.RandomState(0)
    imgs = (rs.rand(10, 16, 16, 1) * 2 - 1).astype(np.float32)
    g = viz.make_grid(viz.to_uint8(imgs), nrow=4)
    assert g.shape == (3 * 18 + 2, 4 * 18 + 2, 1)
    assert viz.save_sample_grid(imgs, tmp_path / "g.png").exists()
    assert viz.save_real_vs_fake(imgs, imgs, tmp_path / "rf.png").exists()
    assert viz.save_interpolation_strip(imgs[:5], tmp_path / "i.png").exists()


def test_plots_and_gif_and_montage(tmp_path):
    metrics = [{"epoch": i, "d_loss": 1.0 / (i + 1), "g_loss": 0.5 + i}
               for i in range(5)]
    assert viz.plot_losses(metrics, tmp_path / "loss.png").exists()
    assert viz.plot_run_comparison({"a": metrics, "b": metrics},
                                   tmp_path / "cmp.png").exists()
    rs = np.random.RandomState(0)
    sample_dir = tmp_path / "samples"
    for e in range(4):
        viz.save_sample_grid((rs.rand(4, 16, 16, 1) * 2 - 1).astype(np.float32),
                             sample_dir / f"epoch_{e:04d}.png", nrow=2)
    assert viz.create_training_gif(sample_dir, tmp_path / "t.gif").exists()
    assert viz.save_progress_montage(sample_dir, tmp_path / "m.png").exists()
    assert viz.create_training_gif(tmp_path / "empty", tmp_path / "n.gif") is None


@pytest.mark.slow
def test_set_learning_rates_preserves_opt_state():
    import jax
    from siggan_tpu.core.config import ModelConfig, TrainConfig
    from siggan_tpu.core.state import (create_train_state, make_optimizers,
                                       set_learning_rates)
    cfg = TrainConfig(model=ModelConfig(latent_dim=8, base_features=16),
                      compute_dtype="float32")
    state = create_train_state(cfg)
    cfg2 = set_learning_rates(cfg, g_lr=1e-5)
    assert cfg2.optim.g_lr == 1e-5 and cfg2.optim.d_lr == cfg.optim.d_lr
    # the adam state tree is lr-independent: new tx accepts the old state
    g_tx, _ = make_optimizers(cfg2)
    grads = jax.tree_util.tree_map(lambda x: x * 0 + 1e-3, state.g_params)
    updates, _ = g_tx.update(grads, state.g_opt, state.g_params)
    assert jax.tree_util.tree_structure(updates) == \
        jax.tree_util.tree_structure(state.g_params)
