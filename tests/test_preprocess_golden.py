"""Golden tests: device preprocessing vs OpenCV reference semantics.

cv2 is used here ONLY as the oracle (the reference implements its pipeline on
cv2, so FID-relevant distribution parity means matching cv2's outputs —
SURVEY §7 hard part #3). Borders and CLAHE redistribution are documented
deviations, so comparisons use interiors / tolerances.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.data import preprocess as pp


def synth_signature(h=120, w=200, seed=0):
    """White page with a few dark strokes, like a cleaned scan."""
    rs = np.random.RandomState(seed)
    img = np.full((h, w), 255, np.uint8)
    # several thick wandering strokes: >5% ink so the reference's
    # white_ratio<=0.95 validity gate passes
    for s in range(4):
        y = h // 2 + (s - 2) * h // 8
        for x in range(10, w - 10):
            y = int(np.clip(y + rs.randn() * 1.5, 8, h - 8))
            img[y - 2:y + 3, x] = rs.randint(0, 80)
    img[15:25, 25:95] = 40
    return img


def test_gaussian_blur3_matches_cv2_interior():
    img = synth_signature().astype(np.float32)
    ours = np.asarray(pp.gaussian_blur3(jnp.asarray(img)))
    ref = cv2.GaussianBlur(img, (3, 3), 0)
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-3)


def test_morph_open2_matches_cv2_interior():
    img = synth_signature(seed=1).astype(np.float32)
    ours = np.asarray(pp.morph_open2(jnp.asarray(img)))
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2, 2))
    ref = cv2.morphologyEx(img, cv2.MORPH_OPEN, kernel)
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-3)


def test_crop_resize_pad_matches_cv2_inter_area():
    img = synth_signature(130, 210, seed=2).astype(np.float32)
    # bbox covering the strokes, even dimensions for a clean comparison
    bbox = (20, 10, 180, 100)  # x, y, w, h
    ours = np.asarray(pp.crop_resize_pad(
        jnp.asarray(img), jnp.asarray(bbox, jnp.float32), 64))
    # cv2 reference chain: crop -> INTER_AREA -> paste centered on white
    x, y, w, h = bbox
    crop = img[y:y + h, x:x + w]
    scale = min(64 / w, 64 / h)
    nw, nh = int(w * scale), int(h * scale)
    resized = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_AREA)
    canvas = np.full((64, 64), 255, np.float32)
    ox, oy = (64 - nw) // 2, (64 - nh) // 2
    canvas[oy:oy + nh, ox:ox + nw] = resized
    assert np.mean(np.abs(ours - canvas)) < 1.0
    assert np.max(np.abs(ours - canvas)) < 16.0  # INTER_AREA uses separable approximations


def test_center_signature_matches_cv2_moments():
    img = np.full((64, 64), 255, np.float32)
    img[5:15, 40:60] = 0.0  # off-center blob
    ours = np.asarray(pp.center_signature(jnp.asarray(img)))
    inv = 255 - img.astype(np.uint8)
    m = cv2.moments(inv)
    cx, cy = int(m["m10"] / m["m00"]), int(m["m01"] / m["m00"])
    M = np.float32([[1, 0, 32 - cx], [0, 1, 32 - cy]])
    ref = cv2.warpAffine(img.astype(np.uint8), M, (64, 64), borderValue=255)
    assert np.mean(np.abs(ours - ref.astype(np.float32))) < 2.0


def test_clahe_close_to_cv2():
    img = cv2.resize(synth_signature(seed=3), (64, 64),
                     interpolation=cv2.INTER_AREA).astype(np.uint8)
    ours = np.asarray(pp.clahe(jnp.asarray(img.astype(np.float32))))
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(img)
    diff = np.abs(ours - ref.astype(np.float32))
    assert np.mean(diff) < 6.0, f"mean CLAHE diff {np.mean(diff)}"
    assert np.percentile(diff, 90) < 14.0


def test_adaptive_binarize_mostly_matches_cv2():
    img = cv2.resize(synth_signature(seed=4), (64, 64),
                     interpolation=cv2.INTER_AREA).astype(np.uint8)
    ours = np.asarray(pp.adaptive_binarize(jnp.asarray(img.astype(np.float32))))
    ref = cv2.adaptiveThreshold(img, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                cv2.THRESH_BINARY, 11, 2)
    inner_ours, inner_ref = ours[6:-6, 6:-6], ref[6:-6, 6:-6].astype(np.float32)
    mismatch = np.mean(inner_ours != inner_ref)
    assert mismatch < 0.03, f"adaptive threshold mismatch ratio {mismatch}"


def test_find_bbox_and_validity():
    canvas = np.full((256, 256), 255, np.float32)
    canvas[50:90, 30:170] = 20.0
    hw = jnp.asarray([200, 220], jnp.int32)  # true extent inside canvas
    bbox = np.asarray(pp.find_bbox(jnp.asarray(canvas), hw))
    x, y, w, h = bbox
    assert x == 30 - 5 and y == 50 - 5
    assert w == 140 + 10 and h == 40 + 10
    assert bool(pp.is_valid_signature(jnp.asarray(canvas), hw))
    blank = jnp.full((256, 256), 255.0)
    assert not bool(pp.is_valid_signature(blank, hw))  # too empty


def test_full_pipeline_runs_and_matches_cv2_chain():
    img = synth_signature(150, 240, seed=5)
    canvas = np.full((256, 256), 255, np.float32)
    canvas[:150, :240] = img
    out, valid = pp.preprocess_batch_device(
        jnp.asarray(canvas)[None], jnp.asarray([[150, 240]], jnp.int32))
    out = np.asarray(out[0])
    assert bool(valid[0])
    assert out.shape == (64, 64)
    assert out.min() >= -1.0 and out.max() <= 1.0

    # cv2 oracle chain (reference preprocess_single_image order)
    g = cv2.GaussianBlur(img, (3, 3), 0)
    g = cv2.morphologyEx(g, cv2.MORPH_OPEN,
                         cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2, 2)))
    _, binary = cv2.threshold(g, 127, 255, cv2.THRESH_BINARY_INV)
    ys, xs = np.where(binary > 0)
    x0, y0 = max(0, xs.min() - 5), max(0, ys.min() - 5)
    w = min(g.shape[1] - x0, (xs.max() - xs.min() + 1) + 10)
    h = min(g.shape[0] - y0, (ys.max() - ys.min() + 1) + 10)
    crop = g[y0:y0 + h, x0:x0 + w]
    scale = min(64 / w, 64 / h)
    nw, nh = int(w * scale), int(h * scale)
    resized = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_AREA)
    ref = np.full((64, 64), 255, np.uint8)
    ox, oy = (64 - nw) // 2, (64 - nh) // 2
    ref[oy:oy + nh, ox:ox + nw] = resized
    inv = 255 - ref
    m = cv2.moments(inv)
    if m["m00"] > 0:
        cx, cy = int(m["m10"] / m["m00"]), int(m["m01"] / m["m00"])
        M = np.float32([[1, 0, 32 - cx], [0, 1, 32 - cy]])
        ref = cv2.warpAffine(ref, M, (64, 64), borderValue=255)
    ref = cv2.createCLAHE(2.0, (8, 8)).apply(ref)
    ref = (ref.astype(np.float32) / 255.0) * 2 - 1

    assert np.mean(np.abs(out - ref)) < 0.08, \
        f"pipeline deviation {np.mean(np.abs(out - ref))}"
