"""Platform setup: persistent compilation cache, device info.

XLA compiles of the fused train step cost tens of seconds (more over a
tunneled device link); every CLI entrypoint calls ``setup()`` so repeat
invocations hit the persistent jit cache instead of recompiling.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_CACHE = os.environ.get(
    "SIGGAN_JIT_CACHE",
    str(Path.home() / ".cache" / "siggan_tpu" / "jit"))

_done = False


def setup(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    import jax

    # Persistent jit cache ONLY on the CPU backend. On the experimental
    # tunneled 'axon' TPU backend the compilation-cache path stalls compiles
    # indefinitely (measured: 70 s compile without the cache, >7 min hang
    # with it), so remote TPU processes always compile fresh.
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "cpu":
        path = Path(cache_dir or _DEFAULT_CACHE)
        try:
            path.mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(path))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # cache is an optimization, never a hard dependency
    _done = True


# Default XLA:TPU compiler options for the hot training path. The
# latency-hiding scheduler overlaps the step's DMA (augment-table gathers,
# Adam state traffic) with MXU compute across the scan body: measured
# 1.284 -> 1.2795 ms/step at 64px/b64/K=512 on TPU v5e (round-4 flag sweep,
# scripts/flag_sweep.py). scoped_vmem 16/48/64 MiB variants measured flat
# or slower (1.285 / 1.302 / 1.343). Applied via jit(compiler_options=...)
# because the axon client rejects TPU flags in XLA_FLAGS while
# compiler_options reach the real TPU compiler.
DEFAULT_TPU_COMPILER_OPTIONS = {
    "xla_tpu_enable_latency_hiding_scheduler": True,
}


def tpu_compiler_options() -> dict | None:
    """The default TPU compiler options, or None off-TPU (CPU XLA rejects
    TPU-only flag names). Pass directly to ``jax.jit(compiler_options=)``."""
    import jax

    try:
        if jax.default_backend() != "cpu":
            return dict(DEFAULT_TPU_COMPILER_OPTIONS)
    except Exception:
        pass
    return None


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host entry point (SURVEY §2.2 comm-backend plan).

    Wraps ``jax.distributed.initialize`` so every CLI can join a multi-host
    job. Parameters fall back to the environment
    (``SIGGAN_COORDINATOR``, ``SIGGAN_NUM_PROCS``, ``SIGGAN_PROC_ID``) and,
    when neither is present, to JAX's own auto-detection on TPU pods (where
    ``initialize()`` needs no arguments). Returns True when a multi-process
    runtime was initialized, False for the common single-process case.

    Call BEFORE any other jax API (backend init is one-shot). After this,
    ``jax.devices()`` is the GLOBAL device list and the standard mesh/GSPMD
    path in ``parallel/mesh.py`` spans hosts; gradients/BN stats reduce over
    ICI within a slice and DCN across slices with no code changes.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "SIGGAN_COORDINATOR")
    if num_processes is None and os.environ.get("SIGGAN_NUM_PROCS"):
        num_processes = int(os.environ["SIGGAN_NUM_PROCS"])
    if process_id is None and os.environ.get("SIGGAN_PROC_ID"):
        process_id = int(os.environ["SIGGAN_PROC_ID"])

    if coordinator_address is None and num_processes is None:
        return False  # single-process run (the default everywhere)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return jax.process_count() > 1


def device_info() -> dict:
    import jax

    devs = jax.devices()
    return {
        "platform": devs[0].platform if devs else "none",
        "device_kind": devs[0].device_kind if devs else "none",
        "num_devices": len(devs),
    }
