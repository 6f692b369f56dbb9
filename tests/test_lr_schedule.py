"""LR decay schedules (optim.lr_schedule) — step-indexed inside the scan."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
from siggan_tpu.core.state import _lr_schedule, make_optimizers


def test_linear_schedule_shape():
    cfg = TrainConfig(optim=OptimConfig(
        lr_schedule="linear", lr_total_steps=100, lr_decay_start_frac=0.5,
        lr_end_frac=0.0))
    sched = _lr_schedule(cfg, 2e-4)
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(50)) == pytest.approx(2e-4)
    assert float(sched(75)) == pytest.approx(1e-4, rel=0.05)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)


def test_cosine_schedule_endpoints():
    cfg = TrainConfig(optim=OptimConfig(
        lr_schedule="cosine", lr_total_steps=100, lr_decay_start_frac=0.0,
        lr_end_frac=0.1))
    sched = _lr_schedule(cfg, 1e-3)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-4, rel=0.01)


def test_schedule_requires_total_steps():
    cfg = TrainConfig(optim=OptimConfig(lr_schedule="linear"))
    with pytest.raises(ValueError):
        _lr_schedule(cfg, 1e-3)


def test_optimizer_updates_shrink_under_decay():
    cfg = TrainConfig(optim=OptimConfig(
        lr_schedule="linear", lr_total_steps=20, lr_decay_start_frac=0.0,
        lr_end_frac=0.0))
    g_tx, _ = make_optimizers(cfg)
    params = {"w": jnp.ones((4,))}
    opt = g_tx.init(params)
    grads = {"w": jnp.ones((4,))}
    mags = []
    for _ in range(20):
        upd, opt = g_tx.update(grads, opt, params)
        mags.append(float(jnp.abs(upd["w"]).max()))
    assert mags[-1] < 0.2 * mags[2]          # decayed near the end
    assert mags[2] > 0                        # but real updates early


def test_n_critic_stretches_d_schedule():
    cfg = TrainConfig(n_critic=2, optim=OptimConfig(
        lr_schedule="linear", lr_total_steps=50, lr_decay_start_frac=0.0,
        lr_end_frac=0.0))
    g = _lr_schedule(cfg, 1e-3)
    d = _lr_schedule(cfg, 1e-3, step_mult=2)
    # at G's end-of-run step count, D (2 updates/iter) is only halfway.
    assert float(g(50)) == pytest.approx(0.0, abs=1e-9)
    assert float(d(50)) == pytest.approx(5e-4, rel=0.05)


def test_bf16_adam_respects_schedule():
    cfg = TrainConfig(optim=OptimConfig(
        moment_dtype="bfloat16", lr_schedule="linear", lr_total_steps=10,
        lr_decay_start_frac=0.0, lr_end_frac=0.0))
    g_tx, _ = make_optimizers(cfg)
    params = {"w": jnp.ones((4,))}
    opt = g_tx.init(params)
    grads = {"w": jnp.ones((4,))}
    mags = []
    for _ in range(10):
        upd, opt = g_tx.update(grads, opt, params)
        mags.append(float(jnp.abs(upd["w"]).max()))
    assert mags[-1] < 0.3 * mags[1]
