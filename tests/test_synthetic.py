"""Synthetic signature dataset generator: contract + diversity."""

import numpy as np

from siggan_tpu.data.synthetic import generate_dataset, save_dataset_pngs


def test_contract_and_determinism():
    a = generate_dataset(8, size=64, seed=3)
    b = generate_dataset(8, size=64, seed=3)
    assert a.shape == (8, 64, 64, 1) and a.dtype == np.float32
    assert a.min() >= -1.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)
    c = generate_dataset(8, size=64, seed=4)
    assert np.abs(a - c).mean() > 0.01  # different seed, different data


def test_ink_ratio_passes_reference_validity_gate():
    # is_valid_signature (preprocess_signatures.py:316): 1%..95% ink.
    x = generate_dataset(32, seed=0)
    dens = ((x + 1) / 2 < 0.5).reshape(32, -1).mean(axis=1)
    assert dens.min() > 0.01 and dens.max() < 0.5


def test_dataset_is_diverse():
    # Mode-collapse diagnosis needs the DATA itself to be diverse: mean
    # pairwise L1 well above zero and per-image densities spread out.
    x = generate_dataset(32, seed=1).reshape(32, -1)
    pair = np.abs(x[:16] - x[16:]).mean()
    assert pair > 0.05
    dens = ((x + 1) / 2 < 0.5).mean(axis=1)
    assert dens.std() > 0.01


def test_save_pngs(tmp_path):
    save_dataset_pngs(4, tmp_path / "d", seed=0)
    assert len(list((tmp_path / "d").glob("sig_*.png"))) == 4
