"""Ablation harness: grid construction, short names, one tiny run."""

import numpy as np
import pytest

from siggan_tpu.train.ablation import (AblationConfig, AblationStudyManager,
                                       make_ablation_train_step)


def test_short_name_scheme():
    assert AblationConfig(latent_dim=50).short_name == "z50_relu_sn0"
    assert AblationConfig(latent_dim=200, g_activation="leaky_relu",
                          use_spectral_norm=True).short_name == "z200_lrelu_sn1"


def test_grid_size(tmp_path):
    mgr = AblationStudyManager(np.zeros((8, 64, 64, 1), np.float32), tmp_path)
    assert len(mgr.grid()) == 3 * 2 * 2
    small = mgr.grid({"latent_dim": [8], "g_activation": ["relu"],
                      "use_spectral_norm": [False, True]})
    assert [c.short_name for c in small] == ["z8_relu_sn0", "z8_relu_sn1"]


@pytest.mark.slow
def test_ablation_run_tiny(tmp_path):
    rs = np.random.RandomState(0)
    images = (rs.rand(32, 64, 64, 1) * 2 - 1).astype(np.float32)
    mgr = AblationStudyManager(images, tmp_path, epochs=2, batch_size=16,
                               compute_dtype="float32", fid_samples=8)
    results = mgr.run_all({"latent_dim": [8], "g_activation": ["relu"],
                           "use_spectral_norm": [False]}, compute_fid=False)
    assert len(results) == 1
    r = results[0]
    assert np.isfinite(r.final_d_loss) and np.isfinite(r.final_g_loss)
    assert r.g_params > 0
    assert (tmp_path / "results.csv").exists()
    assert (tmp_path / "results.md").exists()
    assert (tmp_path / "results.json").exists()
    assert (tmp_path / "samples" / "z8_relu_sn0.png").exists()
    assert (tmp_path / "loss_curves.png").exists()
