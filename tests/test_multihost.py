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
