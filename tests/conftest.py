"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not needed: ``xla_force_host_platform_device_count=8``
gives 8 fake CPU devices, enough to exercise every sharding/collective path
(SURVEY §4's designed test strategy). Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's axon TPU wrapper overrides JAX_PLATFORMS from the shell;
# config.update is authoritative (must run before first backend init).
jax.config.update("jax_platforms", "cpu")

# Host-local persistent compilation cache: XLA compiles dominate the suite's
# wall time. CPU backend only (the TPU cache pathology documented in
# core/platform.py) and rooted next to the suite so it is compiled on THIS
# machine. Caveat (measured round 4): XLA:CPU's AOT loader rejects its own
# entries for the big train-step graphs on hosts whose CPUID lacks the
# prefer-no-scatter/gather pseudo-features stamped at compile time, so those
# recompile every run — the cache only pays for the many small graphs, and
# the fast lane's cold time is compile-bound either way (see STATUS.md).
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
# Threshold 0: the suite's wall time is dominated by hundreds of SMALL op
# compiles (unjitted applies, init fns — ~50-100 ms each, measured 80 ops /
# 7.4 s in create_train_state alone), which a 0.5 s threshold exempts from
# the cache entirely. Caching them all trades ~MBs of gitignored disk for
# the bulk of the lane's compile time on warm runs.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {devs}"
    return devs


@pytest.fixture(scope="session")
def tiny_model_cfg():
    """A miniature model config so CPU tests stay fast."""
    from siggan_tpu.core.config import ModelConfig
    return ModelConfig(latent_dim=16, image_size=64, base_features=32)


@pytest.fixture(scope="session")
def tiny_train_cfg(tiny_model_cfg):
    from siggan_tpu.core.config import TrainConfig
    return TrainConfig(model=tiny_model_cfg, batch_size=16, epochs=1,
                       compute_dtype="float32", seed=0)
