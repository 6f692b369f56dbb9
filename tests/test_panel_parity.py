"""Control-panel parity flows (reference app_vanilla_gan_signatures.py):
cancelable batch-per-poll generation with partial keep (:1124-1389),
quality-filter top-K finalize (:1306-1326), paginated gallery + selection
export (:1398-1629, :706-764), save-to-folder (:661-699), contact sheet
(:827), binarize/transparency post-processing (:863-904), unsafe-mode
checkpoint override (:153-179), and the multi-run comparison chart (:349).

Core flows are tested socket-free on AppCore; one test drives the real HTTP
server end-to-end.
"""

import io
import json
import time
import zipfile

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from siggan_tpu.core.config import ModelConfig, TrainConfig
from siggan_tpu.core.state import create_train_state
from siggan_tpu.serve.app import AppCore


def _make_checkpoint(workdir):
    from siggan_tpu.ckpt.manager import CheckpointManager
    cfg = TrainConfig(
        model=ModelConfig(latent_dim=8, image_size=64, base_features=16),
        batch_size=8, compute_dtype="float32", seed=0,
        checkpoint_dir=str(workdir / "checkpoints"))
    mgr = CheckpointManager(cfg.checkpoint_dir, cfg)
    mgr.save(create_train_state(cfg), epoch=0,
             fixed_noise=jnp.zeros((4, 8)), g_loss=1.0)
    return cfg


def _wait_job(core, job_id, timeout=120):
    t0 = time.time()
    while time.time() - t0 < timeout:
        st = core.generate_status(job_id)
        if st.get("finished"):
            return st
        time.sleep(0.1)
    raise TimeoutError(core.generate_status(job_id))


def _sample_dir(workdir, name="gen_t", n=5):
    d = workdir / "samples" / name
    d.mkdir(parents=True)
    for i in range(n):
        Image.fromarray(np.full((8, 8), 30 * i, np.uint8)).save(
            d / f"signature_{i:06d}.png")
    return d


def test_generation_job_runs_to_completion(tmp_path):
    _make_checkpoint(tmp_path)
    core = AppCore(tmp_path)
    r = core.generate_start({"checkpoint": "checkpoints", "n": 6,
                             "batch_size": 3, "seed": 1})
    st = _wait_job(core, r["job"])
    assert st["error"] is None
    assert st["done"] == 6 and st["kept"] == 6
    assert st["n_files"] == 6 and len(st["thumbnails"]) == 6


def test_generation_job_cancel_keeps_partials(tmp_path):
    _make_checkpoint(tmp_path)
    core = AppCore(tmp_path)
    r = core.generate_start({"checkpoint": "checkpoints", "n": 1000,
                             "batch_size": 1, "seed": 1})
    # Cancel immediately: the worker stops at the next batch boundary and
    # keeps whatever completed.
    out = core.generate_cancel({"job": r["job"]})
    assert out["cancelled"] is True
    st = _wait_job(core, r["job"])
    assert st["cancelled"] and st["finished"]
    assert st["done"] < 1000
    assert st["n_files"] == st["done"]  # partials kept on disk


def test_generation_job_quality_filter_top_k(tmp_path):
    _make_checkpoint(tmp_path)
    core = AppCore(tmp_path)
    r = core.generate_start({"checkpoint": "checkpoints", "n": 4,
                             "batch_size": 4, "quality_filter": True,
                             "keep_fraction": 0.5})
    assert r["n_target"] == 8  # oversampled
    st = _wait_job(core, r["job"])
    assert st["error"] is None
    assert st["kept"] == 4 and st["n_files"] == 4  # losers deleted
    assert len(st["scores"]) == 4
    assert st["scores"] == sorted(st["scores"], reverse=True)


def test_gallery_pagination_and_selection_zip(tmp_path):
    _sample_dir(tmp_path, n=5)
    core = AppCore(tmp_path)
    g0 = core.gallery("samples/gen_t", page=0, page_size=2)
    assert g0["total"] == 5 and g0["pages"] == 3 and len(g0["items"]) == 2
    g2 = core.gallery("samples/gen_t", page=2, page_size=2)
    assert len(g2["items"]) == 1
    # page clamped
    assert core.gallery("samples/gen_t", page=99, page_size=2)["page"] == 2

    sel = [g0["items"][0]["name"], g2["items"][0]["name"]]
    z = zipfile.ZipFile(io.BytesIO(core.gallery_zip(
        {"dir": "samples/gen_t", "names": sel})))
    assert sorted(z.namelist()) == sorted(sel)
    # traversal through names is ignored, not served
    z2 = zipfile.ZipFile(io.BytesIO(core.gallery_zip(
        {"dir": "samples/gen_t", "names": ["../../etc/passwd"]})))
    assert z2.namelist() == []
    with pytest.raises(PermissionError):
        core.gallery("runs", 0, 2)


def test_save_to_folder_with_binarize_transparency(tmp_path):
    _sample_dir(tmp_path, n=3)
    core = AppCore(tmp_path)
    r = core.save_to_folder({"dir": "samples/gen_t", "dest": "exports/out",
                             "binarize": True, "threshold": 100,
                             "transparent": True})
    assert r["saved"] == 3
    img = Image.open(tmp_path / "exports" / "out" / r["names"][0])
    assert img.mode == "RGBA"  # white -> transparent post-processing applied


def test_contact_sheet(tmp_path):
    _sample_dir(tmp_path, n=4)
    core = AppCore(tmp_path)
    png = core.contact_sheet_png("samples/gen_t")
    sheet = Image.open(io.BytesIO(png))
    assert sheet.size[0] > 8 and sheet.size[1] > 8
    with pytest.raises(FileNotFoundError):
        core.contact_sheet_png("samples/empty_nope")


def test_unsafe_mode_override(tmp_path):
    core = AppCore(tmp_path)
    outside = tmp_path / "elsewhere" / "ckpt"
    outside.mkdir(parents=True)
    with pytest.raises(PermissionError):
        core._validate_checkpoint("elsewhere/ckpt")
    with pytest.raises(ValueError):
        core.set_unsafe_mode({"enabled": True})  # needs acknowledgement
    assert core.set_unsafe_mode(
        {"enabled": True, "acknowledge": True})["unsafe_mode"] is True
    assert core._validate_checkpoint("elsewhere/ckpt") == outside.resolve()
    core.set_unsafe_mode({"enabled": False})
    with pytest.raises(PermissionError):
        core._validate_checkpoint("elsewhere/ckpt")


def test_runs_compare_chart(tmp_path):
    for name, g in (("a", 1.0), ("b", 2.0)):
        logs = tmp_path / "runs" / name / "logs"
        logs.mkdir(parents=True)
        (logs / "m.json").write_text(json.dumps({"metrics": [
            {"epoch": 0, "g_loss": g}, {"epoch": 1, "g_loss": g / 2}]}))
    core = AppCore(tmp_path)
    png = core.runs_compare_png(["a", "b"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    with pytest.raises(FileNotFoundError):
        core.runs_compare_png(["nope"])


def test_http_surface_end_to_end(tmp_path):
    """Drive the new endpoints over a real HTTP socket."""
    import threading
    import urllib.request

    from siggan_tpu.serve.app import serve
    _sample_dir(tmp_path, n=3)
    server = serve(host="127.0.0.1", port=0, workdir=tmp_path)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=30) as r:
            return r.headers.get("Content-Type"), r.read()

    def post(path, body):
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.headers.get("Content-Type"), r.read()

    try:
        ct, body = get("/api/about")
        about = json.loads(body)
        assert "memory" in about and "unsafe_mode" in about

        ct, body = get("/api/gallery?dir=samples/gen_t&page=0&page_size=2")
        assert json.loads(body)["total"] == 3

        ct, body = get("/api/contact_sheet?dir=samples/gen_t")
        assert ct == "image/png"

        ct, body = post("/api/gallery/zip", {"dir": "samples/gen_t"})
        assert ct == "application/zip"
        assert len(zipfile.ZipFile(io.BytesIO(body)).namelist()) == 3

        ct, body = post("/api/save", {"dir": "samples/gen_t"})
        assert json.loads(body)["saved"] == 3

        ct, body = post("/api/unsafe_mode",
                        {"enabled": True, "acknowledge": True})
        assert json.loads(body)["unsafe_mode"] is True

        # error mapping: 422 without acknowledgement
        req = urllib.request.Request(
            base + "/api/unsafe_mode", data=json.dumps({"enabled": True}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTP 422")
        except urllib.error.HTTPError as e:
            assert e.code == 422
    finally:
        server.shutdown()


def test_generate_conditional_class_id(tmp_path):
    """Panel generate threads class_id into conditional sessions; blank /
    absent means unconditional; bad class on an unconditional checkpoint
    surfaces as the job error, not a crash."""
    from siggan_tpu.ckpt.manager import CheckpointManager

    cfg = TrainConfig(
        model=ModelConfig(latent_dim=8, image_size=64, base_features=16,
                          num_classes=3),
        batch_size=8, compute_dtype="float32", seed=0,
        checkpoint_dir=str(tmp_path / "checkpoints"))
    mgr = CheckpointManager(cfg.checkpoint_dir, cfg)
    mgr.save(create_train_state(cfg), epoch=0,
             fixed_noise=jnp.zeros((4, 8)), g_loss=1.0)
    core = AppCore(tmp_path)
    r = core.generate({"checkpoint": "checkpoints", "n": 2, "class_id": 2})
    assert r["count"] == 2
    # per-class outputs differ (conditioning reaches the generator)
    r0 = core.generate({"checkpoint": "checkpoints", "n": 2, "seed": 7,
                        "class_id": 0})
    r1 = core.generate({"checkpoint": "checkpoints", "n": 2, "seed": 7,
                        "class_id": 1})
    assert r0["thumbnails"] != r1["thumbnails"]
    # blank string = unconditional request on a conditional ckpt -> the
    # session itself decides (conditional models require a class; error
    # message, not crash)
    with pytest.raises(ValueError):
        core.generate({"checkpoint": "checkpoints", "n": 1, "class_id": 99})
