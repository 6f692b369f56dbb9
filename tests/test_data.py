"""Dataset / loader / augmentation tests (reference loader __main__ parity)."""

import numpy as np
import pytest
from PIL import Image

from siggan_tpu.data.augment import augment_batch, augment_key
from siggan_tpu.data.dataset import SignatureDataset, train_val_split
from siggan_tpu.data.loader import BatchLoader


@pytest.fixture()
def image_dir(tmp_path):
    rs = np.random.RandomState(0)
    for i in range(12):
        arr = np.full((80, 100), 255, np.uint8)
        arr[20:60, 10 + i * 5:40 + i * 5] = rs.randint(0, 100)
        Image.fromarray(arr).save(tmp_path / f"sig_{i:02d}.png")
    (tmp_path / "notes.txt").write_text("ignored")
    return tmp_path


def test_dataset_decodes_and_normalizes(image_dir):
    ds = SignatureDataset(image_dir, image_size=64)
    assert len(ds) == 12
    assert ds.images.shape == (12, 64, 64, 1)
    assert ds.images.min() >= -1.0 and ds.images.max() <= 1.0
    stats = ds.statistics()
    assert stats["num_images"] == 12


def test_dataset_cache_roundtrip(image_dir):
    ds1 = SignatureDataset(image_dir, image_size=64)
    ds2 = SignatureDataset(image_dir, image_size=64)  # hits .npy cache
    np.testing.assert_array_equal(ds1.images, ds2.images)


def test_dataset_corrupt_file_fallback(image_dir):
    (image_dir / "broken.png").write_bytes(b"not a png at all")
    ds = SignatureDataset(image_dir, image_size=64, use_cache=False)
    assert len(ds) == 13  # zero image substituted, not dropped


def test_train_val_split(image_dir):
    ds = SignatureDataset(image_dir, image_size=64)
    tr, va = train_val_split(ds, val_fraction=0.25, seed=1)
    assert len(tr) == 9 and len(va) == 3


def test_loader_determinism_and_drop_last(image_dir):
    ds = SignatureDataset(image_dir, image_size=64)
    loader = BatchLoader(ds.images, batch_size=5, seed=3)
    assert len(loader) == 2  # 12 // 5, drop_last
    a = [np.asarray(b) for b in loader.epoch(0)]
    b = [np.asarray(b) for b in loader.epoch(0)]
    np.testing.assert_array_equal(a[0], b[0])
    c = [np.asarray(b) for b in loader.epoch(1)]
    assert not np.array_equal(a[0], c[0])  # different epoch, different order


def test_loader_yields_aligned_labels():
    """Streaming label plumbing: (images, labels) pairs stay aligned under
    the per-epoch shuffle (each image's pixel value encodes its index)."""
    n = 12
    imgs = np.repeat(np.arange(n, dtype=np.float32)[:, None, None, None],
                     4, axis=1).repeat(4, axis=2)
    labels = np.arange(n, dtype=np.int32)
    loader = BatchLoader(imgs, batch_size=4, labels=labels, seed=5)
    seen = []
    for xb, yb in loader.epoch(0):
        xb, yb = np.asarray(xb), np.asarray(yb)
        np.testing.assert_array_equal(xb[:, 0, 0, 0].astype(np.int32), yb)
        seen.extend(yb.tolist())
    assert len(set(seen)) == n  # full permutation, no repeats

    with pytest.raises(ValueError, match="lengths"):
        BatchLoader(imgs, batch_size=4, labels=labels[:-1])


def test_augment_shapes_and_white_fill():
    import jax.numpy as jnp
    batch = jnp.full((4, 64, 64, 1), -0.5)
    out = augment_batch(batch, augment_key(0, 0))
    assert out.shape == batch.shape
    # rotation corners must be filled white (+1), so max is exactly 1
    assert float(out.max()) == 1.0
    # disabled path is identity
    out2 = augment_batch(batch, augment_key(0, 0), enabled=False)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(batch))


def test_augment_deterministic_per_step():
    import jax.numpy as jnp
    batch = jnp.ones((2, 64, 64, 1)) * 0.3
    a = augment_batch(batch, augment_key(0, 5))
    b = augment_batch(batch, augment_key(0, 5))
    c = augment_batch(batch, augment_key(0, 6))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow  # exhaustive-equivalence; compile-heavy (fast-lane budget, VERDICT r2 #7)
def test_banded_warp_equals_dense():
    """The banded slice-tap warp must be numerically identical to the dense
    two-pass contraction it replaces (the band bound makes every skipped tap
    exactly zero-weight)."""
    import jax.numpy as jnp

    from siggan_tpu.data.augment import (_affine_warp_banded,
                                         _affine_warp_twopass, _band_radii)

    rs = np.random.RandomState(0)
    for h, w in [(64, 64), (32, 48)]:
        imgs = jnp.asarray((rs.rand(6, h, w, 1) * 2 - 1).astype(np.float32))
        theta = rs.uniform(-5, 5, 6) * np.pi / 180
        scale = rs.uniform(0.9, 1.1, 6)
        cos, sin, inv_s = np.cos(theta), np.sin(theta), 1 / scale
        mats = jnp.asarray(np.stack([
            np.stack([cos * inv_s, -sin * inv_s, np.zeros(6)], -1),
            np.stack([sin * inv_s, cos * inv_s, np.zeros(6)], -1),
        ], axis=1).astype(np.float32))
        bv, bh = _band_radii(h, w, 5.0, 0.9, 1.1)
        dense = np.asarray(_affine_warp_twopass(imgs, mats, 1.0))
        band = np.asarray(_affine_warp_banded(imgs, mats, 1.0, bv, bh))
        np.testing.assert_allclose(band, dense, atol=1e-5)
