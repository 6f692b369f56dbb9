"""Filesystem monitoring protocol + control-panel core (socket-free)."""

import json
import os
import sys
import time

import numpy as np
import pytest

from siggan_tpu.serve import monitor
from siggan_tpu.serve.app import AppCore


def test_pid_liveness():
    assert monitor.pid_alive(os.getpid())
    assert not monitor.pid_alive(2 ** 22 + 12345)  # far beyond pid_max default
    assert not monitor.pid_alive(-1)


def test_training_state_roundtrip_and_stale_gc(tmp_path):
    monitor.write_training_state(tmp_path, {"pid": os.getpid(), "run_dir": "x",
                                            "stop_file": str(tmp_path / "S"),
                                            "log_file": str(tmp_path / "l")})
    st = monitor.read_training_state(tmp_path)
    assert st["alive"] is True
    assert not monitor.clear_stale_state(tmp_path)  # alive -> kept

    monitor.write_training_state(tmp_path, {"pid": 2 ** 22 + 1, "run_dir": "x",
                                            "stop_file": "s", "log_file": "l"})
    assert monitor.clear_stale_state(tmp_path)      # dead -> removed
    assert monitor.read_training_state(tmp_path) is None


def test_request_stop_writes_stop_file(tmp_path):
    stop = tmp_path / "STOP"
    monitor.write_training_state(tmp_path, {
        "pid": os.getpid(), "run_dir": str(tmp_path),
        "stop_file": str(stop), "log_file": str(tmp_path / "log")})
    assert monitor.request_stop(tmp_path)
    assert stop.exists()


def test_metrics_discovery_cascade(tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    # 3) log-parse fallback
    (logs / "training_output.log").write_text(
        "noise\nEpoch 0 | d_loss: 1.2 | g_loss: 0.7\n"
        "Epoch 1 | d_loss: 1.1 | g_loss: 0.8\n")
    m = monitor.discover_metrics(tmp_path)
    assert [e["epoch"] for e in m] == [0, 1] and m[1]["g_loss"] == 0.8
    # 2) CSV beats log parse
    (logs / "run.csv").write_text("epoch,d_loss,g_loss\n0,9.0,8.0\n")
    m = monitor.discover_metrics(tmp_path)
    assert m[0]["d_loss"] == 9.0
    # 1) JSON beats CSV
    (logs / "run.json").write_text(json.dumps(
        {"metrics": [{"epoch": 0, "d_loss": 5.0, "g_loss": 4.0}]}))
    m = monitor.discover_metrics(tmp_path)
    assert m[0]["d_loss"] == 5.0


def test_tail_file(tmp_path):
    p = tmp_path / "f.log"
    p.write_text("\n".join(f"line{i}" for i in range(100)))
    assert monitor.tail_file(p, 3) == ["line97", "line98", "line99"]
    assert monitor.tail_file(tmp_path / "missing.log") == []


def test_list_runs(tmp_path):
    runs = tmp_path / "runs"
    (runs / "a" / "logs").mkdir(parents=True)
    (runs / "a" / "logs" / "x.json").write_text(json.dumps(
        {"metrics": [{"epoch": 0, "g_loss": 1.0}]}))
    (runs / "a" / "samples").mkdir()
    out = monitor.list_runs(runs)
    assert out[0]["name"] == "a" and out[0]["epochs"] == 1
    assert monitor.list_runs(tmp_path / "nope") == []


# -- app core -----------------------------------------------------------

def test_checkpoint_trust_model(tmp_path):
    core = AppCore(tmp_path)
    with pytest.raises(PermissionError):
        core._validate_checkpoint("../outside")
    with pytest.raises(PermissionError):
        core._validate_checkpoint("/etc")
    (tmp_path / "checkpoints").mkdir()
    p = core._validate_checkpoint("checkpoints/foo")
    assert str(p).startswith(str(tmp_path))


def test_find_checkpoints_reads_index(tmp_path):
    ckpt = tmp_path / "runs" / "r1" / "checkpoints"
    ckpt.mkdir(parents=True)
    (ckpt / "index.json").write_text(json.dumps(
        {"epochs": [1, 3], "latest": 3, "best": 1}))
    # a non-checkpoint index.json must be ignored
    other = tmp_path / "runs" / "r2"
    other.mkdir()
    (other / "index.json").write_text(json.dumps({"something": 1}))
    core = AppCore(tmp_path)
    found = core.find_checkpoints()
    assert len(found) == 1
    assert found[0]["latest"] == 3 and found[0]["path"].endswith("checkpoints")


def test_train_start_rejects_double_start(tmp_path, monkeypatch):
    core = AppCore(tmp_path)
    monitor.write_training_state(tmp_path, {
        "pid": os.getpid(), "run_dir": str(tmp_path), "stop_file": "s",
        "log_file": "l"})
    out = core.train_start({"data_dir": "x"})
    assert "error" in out and "already active" in out["error"]


def test_train_start_forwards_round3_flags(tmp_path, monkeypatch):
    """The panel must pass the round-3 training knobs through to the CLI."""
    core = AppCore(tmp_path)
    captured = {}

    def fake_launch(run_dir, data_dir, extra, workdir):
        captured["extra"] = extra
        return {"pid": 1}

    monkeypatch.setattr(monitor, "launch_training", fake_launch)
    core.train_start({"data_dir": "x", "epochs": 5, "fid_interval": 10,
                      "lr_schedule": "linear", "ema_decay": 0.999,
                      "diffaugment": "translation,cutout",
                      "g_conditioning": "concat", "num_classes": 4,
                      "spectral_norm": True})
    extra = captured["extra"]
    for flag, val in (("--lr_schedule", "linear"),
                      ("--diffaugment", "translation,cutout"),
                      ("--ema_decay", "0.999"),
                      ("--fid_interval", "10"),
                      ("--g_conditioning", "concat"),
                      ("--num_classes", "4")):
        assert val == extra[extra.index(flag) + 1]
    assert "--spectral_norm" in extra


def test_export_zip_trust_and_content(tmp_path):
    from PIL import Image
    core = AppCore(tmp_path)
    gen = tmp_path / "samples" / "gen_x"
    gen.mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(gen / "a.png")
    payload = core.export_zip("samples/gen_x")
    import io
    import zipfile
    assert zipfile.ZipFile(io.BytesIO(payload)).namelist() == ["a.png"]
    with pytest.raises(PermissionError):
        core.export_zip("../etc")
    with pytest.raises(PermissionError):
        core.export_zip("runs")  # outside samples/
    with pytest.raises(FileNotFoundError):
        core.export_zip("samples/nope")
