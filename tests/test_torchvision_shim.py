"""Golden tests for the torchvision shim used by the parity experiment.

VERDICT r2 weak #5: the "siggan_tpu beats torch" headline in
docs/parity/REPORT.md depends on this shim faithfully reproducing
torchvision's augmentation semantics for the reference's transform stack
(/root/reference/src/data_loader_signatures.py:154-248). These fixtures are
HAND-COMPUTED from torchvision's documented conventions, not computed with
PIL (which would be tautological — the shim runs on PIL):

 - Resize: PIL-convention bilinear with filter support scaled by the
   downscale factor. For 2x downscale the triangle kernel weights the four
   source pixels [3, 3, 1, 0]/7 per axis (derived in each test).
 - RandomRotation/RandomAffine: NEAREST resampling (torchvision default),
   inverse-matrix-about-center convention, `fill` paints exposed area.
 - ToTensor: uint8 HWC -> float32 CHW in [0,1]. Normalize: (x - mean)/std.
"""
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                       / "scripts" / "torchvision_shim"))
from torchvision import transforms as T  # noqa: E402


def _img(a):
    return Image.fromarray(np.asarray(a, np.uint8), "L")


def test_resize_2to1_is_mean_of_four():
    # Downscale 2x: triangle filter of support 2 covers both pixels per axis
    # with equal weight -> the single output is the plain mean.
    out = np.asarray(T.Resize(1)(_img([[0, 100], [200, 40]])))
    assert out.shape == (1, 1) and out[0, 0] == 85


def test_resize_4to2_triangle_weights():
    # Output centers sit at input coords 0.5/2.5; scaled triangle weights for
    # input pixels 0..3 are (1-|d|/2) = [0.75, 0.75, 0.25, 0] -> [3,3,1,0]/7.
    # For b(i,j) = 16*(4i+j) the separable expectation E[idx] = 5/7 gives
    # out(0,0) = 16*25/7 = 57.14 -> 57 after uint8 rounding, etc.
    b = (np.arange(16).reshape(4, 4) * 16).astype(np.uint8)
    out = np.asarray(T.Resize(2)(_img(b)))
    np.testing.assert_array_equal(out, [[57, 83], [157, 183]])


def test_resize_upscale_constant():
    out = np.asarray(T.Resize(3)(_img([[7]])))
    np.testing.assert_array_equal(out, np.full((3, 3), 7))


def test_rotation_90_matches_rot90():
    # Positive angles rotate counter-clockwise (PIL & torchvision convention).
    c = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = np.asarray(T.RandomRotation((90, 90), fill=255)(_img(c)))
    np.testing.assert_array_equal(out, np.rot90(c))


def test_rotation_fill_paints_corners_not_center():
    z = np.zeros((8, 8), np.uint8)
    out = np.asarray(T.RandomRotation((45, 45), fill=255)(_img(z)))
    assert out[0, 0] == out[0, -1] == out[-1, 0] == out[-1, -1] == 255
    assert out[4, 4] == 0
    # zero-degree rotation is the identity (no fill anywhere)
    ident = np.asarray(T.RandomRotation((0, 0), fill=255)(
        _img(np.arange(16, dtype=np.uint8).reshape(4, 4))))
    np.testing.assert_array_equal(ident, np.arange(16).reshape(4, 4))


def test_affine_scale2_nearest_golden():
    # degrees=0, scale=2 (zoom in about the center cx=cy=2.0 of a 4x4):
    # inverse map in = c + (out-c)/2, NEAREST = floor of the sample coord:
    # in_x = floor(0.5*x + 1) -> columns [1,1,2,2], same for rows.
    d = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = np.asarray(T.RandomAffine(degrees=0, scale=(2.0, 2.0),
                                    fill=77)(_img(d)))
    exp = d[[1, 1, 2, 2]][:, [1, 1, 2, 2]]
    np.testing.assert_array_equal(out, exp)


def test_affine_scale_half_fills_border():
    # scale=0.5 (zoom out): inverse map in = c + (out-c)*2 leaves the outer
    # ring sampling outside the image -> painted with `fill`.
    d = np.full((8, 8), 10, np.uint8)
    out = np.asarray(T.RandomAffine(degrees=0, scale=(0.5, 0.5),
                                    fill=255)(_img(d)))
    assert out[0, 0] == 255 and out[0, 4] == 255
    assert out[4, 4] == 10


def test_affine_identity():
    d = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = np.asarray(T.RandomAffine(degrees=0, scale=(1.0, 1.0),
                                    fill=0)(_img(d)))
    np.testing.assert_array_equal(out, d)


def test_hflip_deterministic_endpoints():
    d = np.arange(16, dtype=np.uint8).reshape(4, 4)
    np.testing.assert_array_equal(
        np.asarray(T.RandomHorizontalFlip(p=1.0)(_img(d))), d[:, ::-1])
    np.testing.assert_array_equal(
        np.asarray(T.RandomHorizontalFlip(p=0.0)(_img(d))), d)


def test_totensor_and_normalize_golden():
    d = np.array([[0, 51], [102, 255]], np.uint8)
    t = T.ToTensor()(_img(d))
    assert t.shape == (1, 2, 2) and t.dtype == torch.float32
    np.testing.assert_allclose(t.numpy()[0], d / 255.0, atol=1e-7)
    n = T.Normalize([0.5], [0.5])(t)
    np.testing.assert_allclose(n.numpy()[0], d / 255.0 * 2 - 1, atol=1e-6)
    assert float(n.min()) >= -1.0 and float(n.max()) <= 1.0


def test_reference_train_stack_shapes_and_range():
    """The exact transform stack the reference builds at
    data_loader_signatures.py:154-248, end to end on a synthetic scan."""
    rs = np.random.RandomState(0)
    scan = (rs.rand(90, 130) * 255).astype(np.uint8)
    stack = T.Compose([
        T.Grayscale(num_output_channels=1),
        T.Resize((64, 64)),
        T.RandomRotation(5, fill=255),
        T.RandomAffine(degrees=0, scale=(0.9, 1.1), fill=255),
        T.ToTensor(),
        T.Normalize([0.5], [0.5]),
    ])
    out = stack(Image.fromarray(scan, "L"))
    assert out.shape == (1, 64, 64)
    assert -1.0 <= float(out.min()) and float(out.max()) <= 1.0
