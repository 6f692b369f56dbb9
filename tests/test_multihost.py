"""Multi-host (multi-process) integration: 2 subprocess workers join via
``jax.distributed.initialize`` (coordinator on localhost), build a global
4-device CPU mesh (2 virtual devices per process), assemble per-process
input shards into one global batch, and run the fused train step. Both
processes must report the SAME finite losses — the proof that gradients and
BN statistics are global reductions across hosts (SURVEY §2.2 comm-backend
plan).

These tests spawn their own jax processes, so they are independent of the
conftest's in-process jax configuration.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

_CHILD = textwrap.dedent("""
    import json, os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from siggan_tpu.core.platform import init_distributed

    pid = int(sys.argv[1]); port = sys.argv[2]
    assert init_distributed(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4          # global
    assert len(jax.local_devices()) == 2    # per process

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from siggan_tpu.core.config import MeshConfig, ModelConfig, TrainConfig
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.parallel.mesh import make_mesh, replicate, shard_host_local
    from siggan_tpu.train.train_step import make_train_step

    cfg = TrainConfig(
        model=ModelConfig(latent_dim=8, image_size=64, base_features=16),
        batch_size=8, compute_dtype="float32", seed=0)
    mesh = make_mesh(cfg.mesh)
    assert mesh.shape["data"] == 4

    # Per-process input sharding: each process contributes 4 of the global 8
    # rows (deterministic per-process content so the run is reproducible).
    local = (np.random.RandomState(100 + pid)
             .rand(4, 64, 64, 1).astype(np.float32) * 2 - 1)
    batch = shard_host_local(mesh, local)
    assert batch.shape == (8, 64, 64, 1)

    state = replicate(mesh, create_train_state(cfg))
    step = jax.jit(make_train_step(cfg),
                   in_shardings=(NamedSharding(mesh, P()),
                                 NamedSharding(mesh, P("data"))))
    for _ in range(2):
        state, metrics = step(state, batch)
    out = {k: float(v) for k, v in metrics.items()}
    out["step"] = int(state.step)
    print("RESULT " + json.dumps(out, sort_keys=True), flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_agrees():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    # The children force the CPU platform themselves; scrub any inherited
    # device-count flags so each sees exactly 2 local virtual devices.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _CHILD, str(i), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out
        outs.append(out)

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[-1][len("RESULT "):]))

    a, b = results
    assert a == b, (a, b)  # identical global metrics on every host
    assert a["step"] == 2
    import math
    assert math.isfinite(a["d_loss"]) and math.isfinite(a["g_loss"])


_CHILD_TRAINER = textwrap.dedent("""
    import json, os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from siggan_tpu.core.platform import init_distributed

    pid = int(sys.argv[1]); port = sys.argv[2]; workdir = sys.argv[3]
    assert init_distributed(f"localhost:{port}", 2, pid)

    import numpy as np
    from siggan_tpu.core.config import ModelConfig, TrainConfig
    from siggan_tpu.train.trainer import GANTrainer

    cfg = TrainConfig(
        model=ModelConfig(latent_dim=8, image_size=64, base_features=16),
        batch_size=8, compute_dtype="float32", seed=0, augment=False,
        scan_steps=2, sample_interval=100, checkpoint_interval=1,
        fixed_noise_samples=4,
        checkpoint_dir=workdir + "/ckpt", sample_dir=workdir + "/samples",
        log_dir=workdir + "/logs_p" + str(pid))

    # This process's shard of a DETERMINISTIC global 16-image set: the
    # single-process reference run uses the identical concatenation.
    full = (np.random.RandomState(7).rand(16, 64, 64, 1)
            .astype(np.float32) * 2 - 1)
    local = full[pid * 8:(pid + 1) * 8]

    # Phase 1: one epoch, checkpoint (only process 0 writes; barrier inside).
    tr = GANTrainer(cfg, local)
    tr.train(epochs=1)

    # Phase 2: fresh trainer, resume under sharding, one more epoch.
    tr2 = GANTrainer(cfg, local)
    assert tr2.resume("latest"), "resume failed"
    assert tr2.start_epoch == 1
    assert int(jax.device_get(tr2.state.step)) == 2
    tr2.train(epochs=2)
    m = tr2.logger.metrics[-1]
    out = {"d_loss": m["d_loss"], "g_loss": m["g_loss"],
           "step": int(jax.device_get(tr2.state.step))}
    print("RESULT " + json.dumps(out, sort_keys=True), flush=True)
""")


@pytest.mark.slow
def test_two_process_train_checkpoint_resume(tmp_path):
    """VERDICT r2 #8: the FULL training contract under 2 processes — resident
    scan training, an Orbax checkpoint written under sharding (process-0
    write + cross-process barrier), resume, continue — and the resumed
    2-process run must match a straight single-process run of the same
    global data (same seed-derived RNG, global reductions)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env.pop("XLA_FLAGS", None)
    workdir = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD_TRAINER, str(i), str(port), workdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out
        outs.append(out)
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[-1][len("RESULT "):]))
    a, b = results
    assert a == b, (a, b)        # both hosts saw identical global metrics
    assert a["step"] == 4        # 2 epochs x 2 steps, through the resume

    # Single-process reference: same global data, 2 uninterrupted epochs on a
    # 4-device mesh (the children's world size).
    single = subprocess.run(
        [sys.executable, "-c", textwrap.dedent("""
            import json, os, sys
            os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=4").strip()
            import jax
            jax.config.update("jax_platforms", "cpu")
            import numpy as np
            from siggan_tpu.core.config import ModelConfig, TrainConfig
            from siggan_tpu.train.trainer import GANTrainer
            workdir = sys.argv[1]
            cfg = TrainConfig(
                model=ModelConfig(latent_dim=8, image_size=64,
                                  base_features=16),
                batch_size=8, compute_dtype="float32", seed=0, augment=False,
                scan_steps=2, sample_interval=100, checkpoint_interval=100,
                fixed_noise_samples=4,
                checkpoint_dir=workdir + "/ckpt_s",
                sample_dir=workdir + "/samples_s",
                log_dir=workdir + "/logs_s")
            full = (np.random.RandomState(7).rand(16, 64, 64, 1)
                    .astype(np.float32) * 2 - 1)
            tr = GANTrainer(cfg, full)
            tr.train(epochs=2)
            m = tr.logger.metrics[-1]
            print("RESULT " + json.dumps(
                {"d_loss": m["d_loss"], "g_loss": m["g_loss"]},
                sort_keys=True), flush=True)
        """), workdir],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=600)
    assert single.returncode == 0, single.stdout + single.stderr
    ref = json.loads([ln for ln in single.stdout.splitlines()
                      if ln.startswith("RESULT ")][-1][len("RESULT "):])
    assert abs(a["d_loss"] - ref["d_loss"]) < 1e-3, (a, ref)
    assert abs(a["g_loss"] - ref["g_loss"]) < 1e-3, (a, ref)
