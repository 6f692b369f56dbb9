"""Native C++ decoder: build, decode parity vs PIL, failure statuses."""

import numpy as np
import pytest
from PIL import Image

from siggan_tpu.data.native import loader as native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native decoder unavailable (no g++/libpng/libjpeg)")
    return True


@pytest.fixture()
def images(tmp_path):
    rs = np.random.RandomState(0)
    paths = []
    for i, size in enumerate([(80, 120), (64, 64), (200, 150)]):
        arr = (rs.rand(*size) * 255).astype(np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
    # a JPEG and an RGB PNG too
    rgb = (rs.rand(90, 110, 3) * 255).astype(np.uint8)
    pj = tmp_path / "img_rgb.jpg"
    Image.fromarray(rgb).save(pj, quality=95)
    paths.append(pj)
    prgb = tmp_path / "img_rgb.png"
    Image.fromarray(rgb).save(prgb)
    paths.append(prgb)
    return paths


def test_decode_matches_pil(lib_ok, images):
    for p in images:
        ours = native.decode_one(p, 64)
        assert ours is not None, p
        with Image.open(p) as im:
            ref = np.asarray(
                im.convert("L").resize((64, 64), Image.BILINEAR), np.uint8)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # identical antialiased-triangle scheme; PIL's fixed-point coefficient
        # arithmetic leaves off-by-one rounding, and libjpeg's IDCT adds
        # another +-1 on JPEG sources
        tol = 2 if p.suffix == ".jpg" else 1
        assert diff.max() <= tol, (p, diff.max())
        assert np.mean(diff) < 0.5, (p, np.mean(diff))


def test_decode_batch_threaded(lib_ok, images):
    out, statuses = native.decode_batch(images, 64, n_threads=4)
    assert out.shape == (len(images), 64, 64)
    assert (statuses == 0).all()
    # threaded result equals single decode
    one = native.decode_one(images[0], 64)
    np.testing.assert_array_equal(out[0], one)


def test_decode_failure_statuses(lib_ok, tmp_path, images):
    bad = tmp_path / "broken.png"
    bad.write_bytes(b"not an image")
    missing = tmp_path / "missing.png"
    out, statuses = native.decode_batch([images[0], bad, missing], 64)
    assert statuses[0] == 0
    assert statuses[1] != 0 and statuses[2] != 0
    assert (out[1] == 0).all()  # zero-filled on failure


def test_dataset_uses_native_with_pil_fallback(lib_ok, tmp_path):
    rs = np.random.RandomState(1)
    for i in range(4):
        Image.fromarray((rs.rand(70, 90) * 255).astype(np.uint8)).save(
            tmp_path / f"s{i}.png")
    (tmp_path / "corrupt.png").write_bytes(b"junk")
    from siggan_tpu.data.dataset import SignatureDataset
    ds = SignatureDataset(tmp_path, 64, use_cache=False)
    assert ds.images.shape == (5, 64, 64, 1)
    # corrupt file followed the zero-image contract (PIL fallback -> zeros)
    idx = [p.name for p in ds.paths].index("corrupt.png")
    assert float(np.abs(ds.images[idx]).max()) <= 1.0
