"""Train-state pytree.

Everything the fused train step reads or writes is in this one pytree:
generator/discriminator params, explicit BatchNorm and spectral-norm state,
both optax optimizer states, and the step counter. RNG is *not* state — noise
and dropout keys are derived per step from (seed, stream, step) in
``siggan_tpu.core.rng`` so a resumed run replays the same randomness.

Replaces the reference's mutable ``VanillaGAN`` nn.Module + two
``optim.Adam`` objects (``vanilla_gan_model.py:28-129``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from siggan_tpu.core import rng as rnglib
from siggan_tpu.core.config import TrainConfig
from siggan_tpu.models import discriminator, generator


@struct.dataclass
class TrainState:
    step: jax.Array                 # global optimizer-step counter (int32)
    g_params: Any
    g_bn: Any                       # generator BatchNorm running stats
    d_params: Any
    d_state: Any                    # spectral-norm power-iteration vectors
    g_opt: Any
    d_opt: Any
    # EMA shadow of (g_params, g_bn) for evaluation, None when
    # cfg.ema_decay == 0 (jax treats None as an empty subtree, so the pytree
    # structure stays jit/scan-stable either way).
    g_ema: Any = None


def flatten_leaves(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run ``inner`` over per-leaf 1-D views of grads/params.

    Elementwise-identical to ``inner`` (each leaf is only reshaped, never
    concatenated — unlike ``optax.flatten``). Hypothesis was that 1-D moment
    layouts beat the conv kernels' tiled layouts; MEASURED A/B on TPU v5e
    said otherwise (37.35k vs 37.92k img/s at 64px/b64 — the per-use
    reshapes cost more than the layout win), so make_optimizers does NOT
    use this. Kept for the record with its test.
    """
    def ravel(tree):
        return jax.tree_util.tree_map(lambda x: x.reshape(-1), tree)

    def init(params):
        return inner.init(ravel(params))

    def update(grads, state, params=None):
        shapes = jax.tree_util.tree_map(lambda g: g.shape, grads)
        upd, state = inner.update(
            ravel(grads), state, ravel(params) if params is not None else None)
        upd = jax.tree_util.tree_map(
            lambda u, s: u.reshape(s), upd, shapes)
        return upd, state

    return optax.GradientTransformation(init, update)


def adam_low_mem(lr: float, b1: float, b2: float, eps: float = 1e-8,
                 moment_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """Adam with both moments STORED in ``moment_dtype`` (bf16 halves the
    optimizer state's HBM round trip, the roofline cost of the update at
    small-model scale). All arithmetic runs in f32: moments are upcast,
    updated, applied, then downcast once for storage. bf16 keeps f32's
    exponent range, so ``v`` cannot underflow where f16 would; the only
    difference vs optax.adam is ~8-bit mantissa rounding of the stored
    moments (statistical equivalence tested)."""
    def init(params):
        z = lambda p: jnp.zeros(p.shape, moment_dtype)
        return {"count": jnp.zeros((), jnp.int32),
                "m": jax.tree_util.tree_map(z, params),
                "v": jax.tree_util.tree_map(z, params)}

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(jnp.float32(b1), c)
        bc2 = 1.0 - jnp.power(jnp.float32(b2), c)
        # lr may be an optax schedule (lr_schedule config); schedules index
        # by the number of PREVIOUS updates, matching optax's convention.
        lr_t = lr(state["count"]) if callable(lr) else lr

        def upd(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            u = -lr_t * (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            return u, m32.astype(moment_dtype), v32.astype(moment_dtype)

        out = jax.tree_util.tree_map(upd, grads, state["m"], state["v"])
        treedef = jax.tree_util.tree_structure(grads)
        flat = jax.tree_util.tree_leaves(out, is_leaf=lambda x: isinstance(x, tuple))
        updates = jax.tree_util.tree_unflatten(treedef, [t[0] for t in flat])
        new_m = jax.tree_util.tree_unflatten(treedef, [t[1] for t in flat])
        new_v = jax.tree_util.tree_unflatten(treedef, [t[2] for t in flat])
        return updates, {"count": count, "m": new_m, "v": new_v}

    return optax.GradientTransformation(init, update)


def _lr_schedule(cfg: TrainConfig, lr: float, step_mult: int = 1):
    """Resolve the configured LR schedule to an optax schedule (or the
    constant lr). Step-indexed: lives inside the jitted scan for free.
    ``step_mult`` stretches the span for nets that update more than once
    per training iteration (D with n_critic > 1)."""
    if cfg.optim.lr_schedule == "constant":
        return lr
    total_steps = cfg.optim.lr_total_steps * step_mult
    if not total_steps:
        raise ValueError("optim.lr_schedule requires optim.lr_total_steps "
                         "> 0 (GANTrainer fills it in automatically)")
    start = int(total_steps * cfg.optim.lr_decay_start_frac)
    end = max(total_steps - start, 1)
    if cfg.optim.lr_schedule == "linear":
        tail = optax.linear_schedule(lr, lr * cfg.optim.lr_end_frac, end)
    elif cfg.optim.lr_schedule == "cosine":
        tail = optax.cosine_decay_schedule(lr, end,
                                           alpha=cfg.optim.lr_end_frac)
    else:
        raise ValueError(f"unknown lr_schedule {cfg.optim.lr_schedule!r}")
    return optax.join_schedules([optax.constant_schedule(lr), tail], [start])


def make_optimizers(cfg: TrainConfig):
    """Adam(lr, (beta1, beta2)) with optional global-norm clipping, matching
    ``vanilla_gan_model.py:110-120`` + ``train_vanilla_gan_signatures.py:262``
    (torch clips grads before the Adam update; optax.chain does the same).

    ``optim.moment_dtype="bfloat16"`` (default) swaps in ``adam_low_mem``;
    ``optim.lr_schedule`` swaps the constant lr for a decay schedule."""
    def chain(lr, step_mult=1):
        lr = _lr_schedule(cfg, lr, step_mult)
        tx = [optax.clip_by_global_norm(cfg.optim.gradient_clip_value)] \
            if cfg.optim.gradient_clip_value else []
        if cfg.optim.moment_dtype == "bfloat16":
            tx.append(adam_low_mem(lr, cfg.optim.beta1, cfg.optim.beta2))
        else:
            tx.append(optax.adam(lr, b1=cfg.optim.beta1, b2=cfg.optim.beta2,
                                 eps=1e-8))
        # NOTE: two optimizer-layout experiments both measured SLOWER than
        # plain per-tensor Adam on v5e at 64px/b64 and were reverted:
        # optax.flatten (31.2k vs 35.0k img/s) and per-leaf flatten_leaves
        # (37.35k vs 37.92k). XLA's per-tensor fusions win.
        return optax.chain(*tx)
    return (chain(cfg.optim.g_lr),
            chain(cfg.optim.d_lr, step_mult=max(cfg.n_critic, 1)))


def create_train_state(cfg: TrainConfig) -> TrainState:
    root = rnglib.root_key(cfg.seed, cfg.rng_impl)
    g_params, g_bn = generator.init_fn(rnglib.stream(root, rnglib.STREAM_INIT_G), cfg.model)
    d_params, d_state = discriminator.init_fn(rnglib.stream(root, rnglib.STREAM_INIT_D), cfg.model)
    g_tx, d_tx = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_bn=g_bn,
        d_params=d_params,
        d_state=d_state,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        # The shadow starts as a COPY of the weights (tree_map(jnp.array)),
        # never an alias: the trainer donates the whole state to the jitted
        # step, and aliased leaves would put the same buffer in the donation
        # list twice (XLA "donate the same buffer twice" runtime error).
        g_ema=(jax.tree_util.tree_map(
            jnp.array, {"params": g_params, "bn": g_bn})
            if cfg.ema_decay > 0 else None),
    )


def ema_update(g_ema: Any, g_params: Any, g_bn: Any, decay: float) -> Any:
    """shadow <- decay * shadow + (1 - decay) * current, for params AND BN
    running stats. Called from the generator update inside the fused step."""
    new = {"params": g_params, "bn": g_bn}
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, g_ema, new)


def eval_generator_weights(state: TrainState):
    """(params, bn) to use for evaluation: the EMA shadow when tracked."""
    if state.g_ema is not None:
        return state.g_ema["params"], state.g_ema["bn"]
    return state.g_params, state.g_bn


def set_learning_rates(cfg: TrainConfig, g_lr: float | None = None,
                       d_lr: float | None = None) -> TrainConfig:
    """Mid-training learning-rate mutation (``vanilla_gan_model.py:562``).

    optax.adam keeps its moments independent of the lr, so rebuilding the
    transforms from an updated config and continuing with the SAME optimizer
    state reproduces torch's in-place ``param_group['lr'] = x`` exactly.
    Usage: ``cfg = set_learning_rates(cfg, g_lr=1e-4)`` then rebuild the
    (jitted) step with ``make_train_step(cfg)`` and keep the TrainState.
    """
    import dataclasses
    new_optim = dataclasses.replace(
        cfg.optim,
        g_lr=cfg.optim.g_lr if g_lr is None else g_lr,
        d_lr=cfg.optim.d_lr if d_lr is None else d_lr)
    return cfg.replace(optim=new_optim)


def state_summary(state: TrainState, cfg: TrainConfig) -> Dict[str, Any]:
    return {
        "step": int(state.step),
        "g_params": generator.param_count(state.g_params),
        "d_params": discriminator.param_count(state.d_params),
        "image_size": cfg.model.image_size,
        "latent_dim": cfg.model.latent_dim,
    }
