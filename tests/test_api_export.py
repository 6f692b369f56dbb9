"""API core (validation, 503s, payload formats) and export helpers —
socket-free unit tests against the same logic the HTTP server serves."""

import io
import json
import zipfile

import numpy as np
import pytest
from PIL import Image

from siggan_tpu.infer.export import (contact_sheet, png_bytes,
                                     postprocess_binarize, save_pngs, zip_bytes)
from siggan_tpu.serve.api import ApiCore, ApiError, ModelState


class FakeSession:
    class cfg:
        latent_dim = 8
        image_size = 64
        image_channels = 1

    params = {"fc": {"w": np.zeros((8, 16))}}

    def sample(self, n, *, seed=42, noise_scale=1.0, batch_size=64,
               progress=None):
        rs = np.random.RandomState(seed)
        return (rs.rand(n, 64, 64, 1) * 2 - 1).astype(np.float32)


@pytest.fixture()
def core():
    c = ApiCore(ModelState())
    c.state.session = FakeSession()
    c.state.checkpoint_path = "/fake"
    return c


def test_health_reports_loaded(core):
    h = core.health()
    assert h["status"] == "ok" and h["model_loaded"] is True


def test_generate_base64_roundtrip(core):
    payload, ctype = core.generate({"n": 2, "seed": 7, "format": "base64"})
    assert ctype == "application/json"
    data = json.loads(payload)
    assert data["n"] == 2 and len(data["images"]) == 2
    import base64
    img = Image.open(io.BytesIO(base64.b64decode(data["images"][0])))
    assert img.size == (64, 64)


def test_generate_zip(core):
    payload, ctype = core.generate({"n": 3, "format": "zip"})
    assert ctype == "application/zip"
    zf = zipfile.ZipFile(io.BytesIO(payload))
    assert len(zf.namelist()) == 3


def test_generate_single_png(core):
    payload, ctype = core.generate_single({"seed": 1})
    assert ctype == "image/png"
    assert Image.open(io.BytesIO(payload)).size == (64, 64)


def test_seed_determinism(core):
    p1, _ = core.generate({"n": 1, "seed": 5, "format": "base64"})
    p2, _ = core.generate({"n": 1, "seed": 5, "format": "base64"})
    p3, _ = core.generate({"n": 1, "seed": 6, "format": "base64"})
    assert p1 == p2 and p1 != p3


@pytest.mark.parametrize("body,msg", [
    ({"n": 0}, "n must be in"),
    ({"n": 1001}, "n must be in"),
    ({"n": "lots"}, "n must be an integer"),
    ({"n": 1, "format": "webp"}, "format must be"),
])
def test_validation_errors(core, body, msg):
    with pytest.raises(ApiError) as ei:
        core.generate(body)
    assert ei.value.status == 422 and msg in ei.value.message


def test_503_when_unloaded():
    core = ApiCore(ModelState())
    with pytest.raises(ApiError) as ei:
        core.generate({"n": 1})
    assert ei.value.status == 503
    with pytest.raises(ApiError) as ei2:
        core.info()
    assert ei2.value.status == 503


# -- export helpers -----------------------------------------------------

def test_save_pngs_and_naming(tmp_path):
    imgs = np.zeros((3, 16, 16, 1), np.float32)
    paths = save_pngs(imgs, tmp_path, prefix="sig", start_index=5)
    assert [p.name for p in paths] == [
        "sig_000005.png", "sig_000006.png", "sig_000007.png"]


def test_zip_and_contact_sheet(tmp_path):
    rs = np.random.RandomState(0)
    imgs = (rs.rand(4, 16, 16, 1) * 2 - 1).astype(np.float32)
    z = zipfile.ZipFile(io.BytesIO(zip_bytes(imgs)))
    assert len(z.namelist()) == 4
    p = contact_sheet(imgs, tmp_path / "sheet.png", nrow=2)
    assert p.exists()


def test_postprocess_binarize_and_transparency():
    imgs = np.asarray([[[[200], [50]], [[255], [0]]]], np.uint8)
    b = postprocess_binarize(imgs, threshold=128)
    assert set(np.unique(b)) <= {0, 255}
    rgba = postprocess_binarize(imgs, threshold=128, transparent=True)
    assert rgba.shape[-1] == 4
    # white background -> alpha 0; ink -> alpha 255
    assert rgba[0, 0, 0, 3] == 0 and rgba[0, 0, 1, 3] == 255


class FakeConditionalSession(FakeSession):
    class cfg:
        latent_dim = 8
        image_size = 64
        image_channels = 1
        num_classes = 4

    def sample(self, n, *, seed=42, noise_scale=1.0, batch_size=64,
               progress=None, class_id=None):
        self.last_class_id = class_id
        return super().sample(n, seed=seed, noise_scale=noise_scale)


def test_generate_class_id_unconditional_is_422(core):
    with pytest.raises(ApiError) as e:
        core.generate({"n": 1, "class_id": 0})
    assert e.value.status == 422 and "unconditional" in e.value.message


def test_generate_class_id_conditional_roundtrip():
    c = ApiCore(ModelState())
    c.state.session = FakeConditionalSession()
    c.state.checkpoint_path = "/fake"
    assert c.info()["num_classes"] == 4
    payload, ctype = c.generate({"n": 2, "class_id": 3, "format": "base64"})
    assert ctype == "application/json"
    assert c.state.session.last_class_id == 3
    # out of range / wrong type -> 422
    for bad in (4, -1, "2", True):
        with pytest.raises(ApiError) as e:
            c.generate({"n": 1, "class_id": bad})
        assert e.value.status == 422
    # single-PNG path threads it too
    c.generate_single({"class_id": 1})
    assert c.state.session.last_class_id == 1


def test_noise_scale_validation_is_422(core):
    for bad in ("abc", float("nan"), -1.0, 100.0):
        with pytest.raises(ApiError) as e:
            core.generate({"n": 1, "noise_scale": bad})
        assert e.value.status == 422, bad
