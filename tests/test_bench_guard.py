"""Throughput regression tripwire (VERDICT r4 #7).

The 5.01x north star (50.1k images/sec/chip, BENCH_r04.json) must not be
silently given back by a future graph edit.  This slow-lane test runs the
REAL headline bench (`bench.py`, the resident-scan hot path) in a child
process on the actual TPU and fails below the guard threshold.

The guard is 48,000 img/s — ~4% under the three-run-stable 50.1k headline
(runs 5.010/5.007/5.008, BASELINE.md), far above ordinary run-to-run noise
but below nothing that ever shipped.

Off-TPU behavior: the fast-lane conftest pins pytest itself to the CPU
platform, so the bench child is launched with that pin removed; if the
child still lands on a non-TPU backend (no chip on this host) the test
SKIPS cleanly instead of asserting a meaningless CPU number.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
GUARD_IMG_S = 48_000.0


@pytest.mark.slow  # full bench on the real chip (~2 min incl. compile)
def test_headline_bench_throughput_guard():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print('BACKEND=' + jax.default_backend())"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300)
    backend = next((l.split("=", 1)[1] for l in probe.stdout.splitlines()
                    if l.startswith("BACKEND=")), "unknown")
    if backend != "tpu":
        pytest.skip(f"no TPU visible (backend={backend}); guard is TPU-only")

    run = subprocess.run(
        [sys.executable, "bench.py"], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900)
    assert run.returncode == 0, f"bench.py failed:\n{run.stdout}\n{run.stderr}"
    line = next(l for l in run.stdout.splitlines() if l.startswith("{"))
    result = json.loads(line)
    assert result["value"] >= GUARD_IMG_S, (
        f"throughput regression: {result['value']:.0f} img/s < guard "
        f"{GUARD_IMG_S:.0f} (headline 50.1k, BENCH_r04.json) — a graph "
        f"edit gave back the 5x north star")
