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


def device_info() -> dict:
    import jax

    devs = jax.devices()
    return {
        "platform": devs[0].platform if devs else "none",
        "device_kind": devs[0].device_kind if devs else "none",
        "num_devices": len(devs),
    }
