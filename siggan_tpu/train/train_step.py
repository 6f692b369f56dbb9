"""The fused adversarial train step.

One jitted function performs what the reference spreads over
``VanillaGAN.train_discriminator_step`` (``vanilla_gan_model.py:180``),
``train_generator_step`` (``:254``) and ``GANTrainer._train_*``
(``train_vanilla_gan_signatures.py:262-376``): n_critic discriminator updates
followed by one generator update, all inside a single XLA program so the
G-forward/D-forward/backward/Adam chain fuses and the batch never leaves HBM.

Faithful semantic details (each checked against the reference):
 - one-sided label smoothing: real labels = 0.9, fake = 0.0, G targets = 1.0
   (``vanilla_gan_model.py:152-178``);
 - D loss = mean BCE(real) + mean BCE(fake), summed (``:231``);
 - non-saturating G loss (``:288``);
 - fresh noise for every D step and for the G step;
 - G runs in train mode during the D step (under stop_gradient), so its
   BatchNorm running stats update there too — exactly what torch's
   ``no_grad`` forward does in the reference (``:314-315``);
 - D's dropout and spectral-norm power iteration are active in both the D and
   G steps (torch modules stay in train mode for both);
 - metrics: d_real_mean / d_fake_mean / per-side accuracy at threshold 0.5
   (``:236-249``).

Numerics: BCE is computed from logits (the reference's Sigmoid+BCELoss is
mathematically identical but unstable); convs run in ``cfg.compute_dtype``
(bf16 on TPU) with f32 accumulation, losses/stats in f32.

Data parallelism: jit this with the batch sharded over the mesh ``data`` axis
and the state replicated — batch-mean losses and BatchNorm statistics become
global reductions and GSPMD emits the ICI all-reduces; no pmap/psum
boilerplate, and the single-device semantics are preserved exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from siggan_tpu.core import rng as rnglib
from siggan_tpu.core.config import TrainConfig
from siggan_tpu.core.state import (TrainState, ema_update,
                                   eval_generator_weights, make_optimizers)
from siggan_tpu.models import discriminator, generator

Metrics = Dict[str, jax.Array]


def _bce_mean(logits: jax.Array, label: float) -> jax.Array:
    labels = jnp.full_like(logits, label)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


def _ce_mean(logits: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), y))


# Metric keys every train-step variant (fused / shared-fakes / resident
# scan) is guaranteed to emit — the host loop (trainer.py) and any step
# stub in tests must stay within this contract.  The resident scan stacks
# each of these to shape (K,).
STEP_METRIC_KEYS = ("d_loss", "g_loss", "d_real_mean", "d_fake_mean",
                    "d_acc_real", "d_acc_fake", "d_on_g_mean", "d_accuracy")


def _aux_on(cfg: TrainConfig) -> bool:
    return (cfg.model.num_classes > 0 and cfg.model.aux_classifier
            and cfg.aux_weight > 0)


def _fake_labels(key: jax.Array, b: int, cfg: TrainConfig) -> jax.Array:
    """Labels for this step's fakes: class-balanced permutation by default
    (every class gets gradient signal every step), iid uniform otherwise."""
    if cfg.class_balanced_fakes:
        return jax.random.permutation(
            key, jnp.arange(b, dtype=jnp.int32) % cfg.model.num_classes)
    return jax.random.randint(key, (b,), 0, cfg.model.num_classes)


def _dtype(cfg: TrainConfig):
    return jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None


def _packed(cfg: TrainConfig) -> bool:
    return (cfg.packed_io and cfg.model.image_channels == 1
            and cfg.model.image_size % 2 == 0)


def d_step(
    state: TrainState, real: jax.Array, noise_key: jax.Array,
    drop_key: jax.Array, cfg: TrainConfig, d_tx,
    y_real: jax.Array | None = None,
    real_packed: bool = False,
    fake: jax.Array | None = None,
    y_fake: jax.Array | None = None,
) -> Tuple[TrainState, Metrics]:
    """One discriminator update on a real batch + freshly generated fakes.

    Conditional (cfg.model.num_classes > 0): ``y_real`` labels the real
    batch; fake labels are drawn uniformly and fed to both G and D.

    ``real_packed``: the real batch is ALREADY in 2x2 space-to-depth form
    (the resident pipeline packs in bulk at epoch granularity).

    ``fake`` (+ ``y_fake``): precomputed stop-gradient fakes from the fused
    grouped generator forward (``fused_iteration``); the in-step G forward
    and its g_bn update are skipped — the caller owns the BN state fold.
    """
    cdt = _dtype(cfg)
    packed = _packed(cfg)
    b = real.shape[0]
    conditional = cfg.model.num_classes > 0
    g_bn = None
    if fake is None:
        if conditional:
            noise_key, yk = jax.random.split(noise_key)
            y_fake = _fake_labels(yk, b, cfg)
        z = generator.generate_latent(noise_key, b, cfg.model)
        fake, g_bn = generator.apply_fn(
            state.g_params, state.g_bn, z, cfg.model, train=True,
            compute_dtype=cdt, packed_output=packed, y=y_fake)
        fake = jax.lax.stop_gradient(fake)
    if packed and not real_packed:
        from siggan_tpu.ops.packed import space_to_depth
        real = space_to_depth(real)

    # One concatenated D forward over [real; fake] instead of two: exactly
    # equivalent for this architecture (no BatchNorm in D, dropout masks are
    # per-sample) and halves the number of launched kernels — worth ~30% of
    # the step at batch 64 where the program is small-kernel-bound. With
    # spectral norm this runs ONE power iteration per D step where the
    # reference's two sequential forwards ran two — same fixed point.
    both = jnp.concatenate([real.astype(fake.dtype), fake], axis=0)
    if cfg.diffaugment:
        from siggan_tpu.ops.diffaug import diff_augment
        both = diff_augment(both, jax.random.fold_in(drop_key, 7),
                            cfg.diffaugment, packed)

    y_both = (jnp.concatenate([y_real, y_fake], axis=0)
              if conditional else None)

    aux_on = _aux_on(cfg)

    def loss_fn(d_params):
        out, d_state = discriminator.apply_fn(
            d_params, state.d_state, both, cfg.model,
            train=True, rng=drop_key, compute_dtype=cdt, packed_input=packed,
            y=y_both, aux=aux_on)
        logits, aux_logits = out if aux_on else (out, None)
        logits_r, logits_f = logits[:b], logits[b:]
        loss = _bce_mean(logits_r, cfg.label_smoothing) + _bce_mean(logits_f, 0.0)
        aux_acc = None
        if aux_on:
            # AC-GAN: D learns the writer of reals (Odena et al. 2017); the
            # fake-side term is an opt-in (cfg.aux_d_on_fakes) — rewarding D
            # for classifying fakes as their intended class removes the
            # pressure on G to make classes distinct.
            aux_loss = _ce_mean(aux_logits[:b], y_real)
            if cfg.aux_d_on_fakes:
                aux_loss = aux_loss + _ce_mean(aux_logits[b:], y_fake)
            loss = loss + cfg.aux_weight * aux_loss
            aux_acc = jnp.mean(
                (jnp.argmax(aux_logits[:b], -1) == y_real).astype(jnp.float32))
        return loss, (d_state, logits_r, logits_f, aux_acc)

    (loss, (d_state, logits_r, logits_f, aux_acc)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.d_params)
    updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, updates)

    p_real, p_fake = jax.nn.sigmoid(logits_r), jax.nn.sigmoid(logits_f)
    metrics = {
        "d_loss": loss,
        "d_real_mean": jnp.mean(p_real),
        "d_fake_mean": jnp.mean(p_fake),
        "d_acc_real": jnp.mean((p_real > 0.5).astype(jnp.float32)),
        "d_acc_fake": jnp.mean((p_fake < 0.5).astype(jnp.float32)),
    }
    if cfg.log_grad_norms:
        metrics["d_grad_norm"] = optax.global_norm(grads)
    if aux_acc is not None:
        metrics["aux_acc_real"] = aux_acc
    metrics["d_accuracy"] = 0.5 * (metrics["d_acc_real"] + metrics["d_acc_fake"])
    new_state = state.replace(
        d_params=d_params, d_state=d_state, d_opt=d_opt)
    if g_bn is not None:
        new_state = new_state.replace(g_bn=g_bn)
    return new_state, metrics


def g_step(
    state: TrainState, batch_size: int, noise_key: jax.Array,
    drop_key: jax.Array, cfg: TrainConfig, g_tx,
) -> Tuple[TrainState, Metrics]:
    """One generator update (non-saturating loss through a train-mode D)."""
    cdt = _dtype(cfg)
    packed = _packed(cfg)
    aux_on = _aux_on(cfg)
    y = None
    if cfg.model.num_classes > 0:
        noise_key, yk = jax.random.split(noise_key)
        y = _fake_labels(yk, batch_size, cfg)
    z = generator.generate_latent(noise_key, batch_size, cfg.model)

    def loss_fn(g_params):
        fake, g_bn = generator.apply_fn(
            g_params, state.g_bn, z, cfg.model, train=True,
            compute_dtype=cdt, packed_output=packed, y=y)
        if cfg.diffaugment:
            from siggan_tpu.ops.diffaug import diff_augment
            fake = diff_augment(fake, jax.random.fold_in(drop_key, 7),
                                cfg.diffaugment, packed)
        out, d_state = discriminator.apply_fn(
            state.d_params, state.d_state, fake, cfg.model,
            train=True, rng=drop_key, compute_dtype=cdt, packed_input=packed,
            y=y, aux=aux_on)
        logits, aux_logits = out if aux_on else (out, None)
        loss = _bce_mean(logits, 1.0)
        if aux_on:
            # G is rewarded when D's classifier assigns the fake to its
            # conditioned class — the steering signal.
            loss = loss + cfg.aux_weight * _ce_mean(aux_logits, y)
        return loss, (g_bn, d_state, logits)

    (loss, (g_bn, d_state, logits)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.g_params)
    updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, updates)

    metrics = {
        "g_loss": loss,
        "d_on_g_mean": jnp.mean(jax.nn.sigmoid(logits)),
    }
    if cfg.log_grad_norms:
        metrics["g_grad_norm"] = optax.global_norm(grads)
    new_state = state.replace(
        g_params=g_params, g_bn=g_bn, d_state=d_state, g_opt=g_opt)
    if cfg.ema_decay > 0:
        new_state = new_state.replace(g_ema=ema_update(
            state.g_ema, g_params, g_bn, cfg.ema_decay))
    return new_state, metrics


def fused_iteration(
    state: TrainState, real: jax.Array, nkeys: jax.Array, dkeys: jax.Array,
    cfg: TrainConfig, d_tx, g_tx,
    y_real: jax.Array | None = None,
    real_packed: bool = False,
) -> Tuple[TrainState, Metrics]:
    """n_critic D updates + one G update with every generator forward merged
    into ONE grouped-batch forward — numerically exact vs the sequential path.

    All n_critic+1 G forwards in an iteration run under the SAME G params
    (only D changes between sub-steps), so they batch into one
    ``(n_critic+1)*b`` forward with per-group BatchNorm statistics
    (``ops/norm.py groups=``): each group normalizes with its own batch
    stats — identical outputs row-for-row — and the running estimate folds
    the groups in their sequential order. The G-step gradient comes out of
    the merged forward's VJP with zero cotangents on the stop-gradient
    groups (those rows contribute exactly nothing to the param gradient
    because no BN statistic crosses group boundaries). Noise/label key
    derivation matches the sequential path draw-for-draw, so the two modes
    produce identical trajectories (tests/test_train_step.py).

    Why: at b64 the generator's convs are small; one 2x-batch forward keeps
    the MXU fed where two half-size launches stall on overheads, and the
    packed-kernel re-indexing of ops/packed.py is shared by all groups.
    """
    cdt = _dtype(cfg)
    packed = _packed(cfg)
    b = real.shape[0]
    k = cfg.n_critic + 1
    conditional = cfg.model.num_classes > 0
    aux_on = _aux_on(cfg)

    zs, ys = [], []
    for i in range(k):
        nk = nkeys[i]
        y_i = None
        if conditional:
            nk, yk = jax.random.split(nk)
            y_i = _fake_labels(yk, b, cfg)
        zs.append(generator.generate_latent(nk, b, cfg.model))
        ys.append(y_i)
    z_all = jnp.concatenate(zs, axis=0)
    y_all = jnp.concatenate(ys, axis=0) if conditional else None

    def g_fwd(g_params):
        return generator.apply_fn(
            g_params, state.g_bn, z_all, cfg.model, train=True,
            compute_dtype=cdt, packed_output=packed, y=y_all, bn_groups=k)

    (fake_all, g_bn), g_vjp = jax.vjp(g_fwd, state.g_params)
    fake_sg = jax.lax.stop_gradient(fake_all)

    metrics: Metrics = {}
    for i in range(cfg.n_critic):
        state, metrics = d_step(
            state, real, nkeys[i], dkeys[i], cfg, d_tx, y_real,
            real_packed=real_packed,
            fake=jax.lax.slice_in_dim(fake_sg, i * b, (i + 1) * b, axis=0),
            y_fake=ys[i])

    # G update: loss head through the freshly updated D on the last group;
    # the fake cotangent (zeros elsewhere) flows back through the merged
    # forward. Mirrors g_step exactly, including the AC-GAN steering term.
    y_g = ys[-1]
    fake_g = jax.lax.slice_in_dim(fake_all, (k - 1) * b, k * b, axis=0)

    def g_head(fake_):
        if cfg.diffaugment:
            from siggan_tpu.ops.diffaug import diff_augment
            fake_ = diff_augment(fake_, jax.random.fold_in(dkeys[k - 1], 7),
                                 cfg.diffaugment, packed)
        out, d_state = discriminator.apply_fn(
            state.d_params, state.d_state, fake_, cfg.model,
            train=True, rng=dkeys[k - 1], compute_dtype=cdt,
            packed_input=packed, y=y_g, aux=aux_on)
        logits, aux_logits = out if aux_on else (out, None)
        loss = _bce_mean(logits, 1.0)
        if aux_on:
            loss = loss + cfg.aux_weight * _ce_mean(aux_logits, y_g)
        return loss, (d_state, logits)

    (g_loss, (d_state, logits_g)), dfake_g = jax.value_and_grad(
        g_head, has_aux=True)(jax.lax.stop_gradient(fake_g))
    cot = jnp.concatenate(
        [jnp.zeros(((k - 1) * b,) + fake_all.shape[1:], fake_all.dtype),
         dfake_g.astype(fake_all.dtype)], axis=0)
    (g_grads,) = g_vjp((cot, jax.tree_util.tree_map(jnp.zeros_like, g_bn)))
    g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_updates)

    metrics["g_loss"] = g_loss
    metrics["d_on_g_mean"] = jnp.mean(jax.nn.sigmoid(logits_g))
    if cfg.log_grad_norms:
        metrics["g_grad_norm"] = optax.global_norm(g_grads)
    new_state = state.replace(
        g_params=g_params, g_bn=g_bn, d_state=d_state, g_opt=g_opt)
    if cfg.ema_decay > 0:
        new_state = new_state.replace(g_ema=ema_update(
            state.g_ema, g_params, g_bn, cfg.ema_decay))
    return new_state, metrics


def shared_fakes_step(
    state: TrainState, real: jax.Array, noise_key: jax.Array,
    drop_key: jax.Array, cfg: TrainConfig, d_tx, g_tx,
    real_packed: bool = False, y_real: jax.Array | None = None,
) -> Tuple[TrainState, Metrics]:
    """One D update + one G update sharing a SINGLE generator forward.

    The reference's ablation trainer semantics
    (``ablation_vanilla_gan_signatures.py:434,444``): one latent batch per
    iteration, D trains on the detached fakes, G reuses the same fakes
    through the updated D. Here the reuse is literal — the G forward runs
    once under ``jax.vjp`` and its residuals back-propagate the G update, so
    the step saves an entire generator forward vs the faithful default
    (fresh noise per sub-step). Opt in with ``cfg.share_fakes``.

    Conditional (num_classes > 0): the same label threading as the faithful
    path — sampled fake labels condition G, ``[y_real; y_fake]`` feed D's
    projection/aux heads, and the G head scores the SAME fakes/labels
    through the updated D.
    """
    cdt = _dtype(cfg)
    packed = _packed(cfg)
    b = real.shape[0]
    conditional = cfg.model.num_classes > 0
    aux_on = _aux_on(cfg)
    y_fake = None
    if conditional:
        noise_key, yk = jax.random.split(noise_key)
        y_fake = _fake_labels(yk, b, cfg)
    z = generator.generate_latent(noise_key, b, cfg.model)
    dk_d, dk_g = jax.random.split(drop_key)

    (fake, g_bn), g_vjp = jax.vjp(
        lambda p: generator.apply_fn(p, state.g_bn, z, cfg.model, train=True,
                                     compute_dtype=cdt, packed_output=packed,
                                     y=y_fake),
        state.g_params)
    if packed and not real_packed:
        from siggan_tpu.ops.packed import space_to_depth
        real = space_to_depth(real)
    both = jnp.concatenate(
        [real.astype(fake.dtype), jax.lax.stop_gradient(fake)], axis=0)
    if cfg.diffaugment:
        from siggan_tpu.ops.diffaug import diff_augment
        both = diff_augment(both, jax.random.fold_in(dk_d, 7),
                            cfg.diffaugment, packed)

    y_both = (jnp.concatenate([y_real, y_fake], axis=0)
              if conditional else None)

    def d_loss_fn(d_params):
        out, d_state = discriminator.apply_fn(
            d_params, state.d_state, both, cfg.model,
            train=True, rng=dk_d, compute_dtype=cdt, packed_input=packed,
            y=y_both, aux=aux_on)
        logits, aux_logits = out if aux_on else (out, None)
        logits_r, logits_f = logits[:b], logits[b:]
        loss = _bce_mean(logits_r, cfg.label_smoothing) + _bce_mean(logits_f, 0.0)
        if aux_on:
            aux_loss = _ce_mean(aux_logits[:b], y_real)
            if cfg.aux_d_on_fakes:
                aux_loss = aux_loss + _ce_mean(aux_logits[b:], y_fake)
            loss = loss + cfg.aux_weight * aux_loss
        return loss, (d_state, logits_r, logits_f)

    (d_loss, (d_state, logits_r, logits_f)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True)(state.d_params)
    d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)

    # G update: loss head through the UPDATED D on the SAME fakes; the fake
    # cotangent flows back through the saved forward (one zero cotangent for
    # the aux g_bn output).
    def g_head(fake_):
        if cfg.diffaugment:
            from siggan_tpu.ops.diffaug import diff_augment
            fake_ = diff_augment(fake_, jax.random.fold_in(dk_g, 7),
                                 cfg.diffaugment, packed)
        out, d_state2 = discriminator.apply_fn(
            d_params, d_state, fake_, cfg.model, train=True, rng=dk_g,
            compute_dtype=cdt, packed_input=packed, y=y_fake, aux=aux_on)
        logits, aux_logits = out if aux_on else (out, None)
        loss = _bce_mean(logits, 1.0)
        if aux_on:
            loss = loss + cfg.aux_weight * _ce_mean(aux_logits, y_fake)
        return loss, (d_state2, logits)

    (g_loss, (d_state, logits_g)), dfake = jax.value_and_grad(
        g_head, has_aux=True)(fake)
    (g_grads,) = g_vjp((dfake, jax.tree_util.tree_map(jnp.zeros_like, g_bn)))
    g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_updates)

    p_real, p_fake = jax.nn.sigmoid(logits_r), jax.nn.sigmoid(logits_f)
    metrics = {
        "d_loss": d_loss,
        "g_loss": g_loss,
        "d_real_mean": jnp.mean(p_real),
        "d_fake_mean": jnp.mean(p_fake),
        "d_acc_real": jnp.mean((p_real > 0.5).astype(jnp.float32)),
        "d_acc_fake": jnp.mean((p_fake < 0.5).astype(jnp.float32)),
        "d_on_g_mean": jnp.mean(jax.nn.sigmoid(logits_g)),
    }
    metrics["d_accuracy"] = 0.5 * (metrics["d_acc_real"] + metrics["d_acc_fake"])
    new_state = state.replace(
        g_params=g_params, g_bn=g_bn, d_params=d_params, d_state=d_state,
        g_opt=g_opt, d_opt=d_opt)
    if cfg.ema_decay > 0:
        new_state = new_state.replace(g_ema=ema_update(
            state.g_ema, g_params, g_bn, cfg.ema_decay))
    return new_state, metrics


def make_train_step(cfg: TrainConfig, real_pre_packed: bool = False):
    """Build the fused (n_critic x D) + G step.

    Returned fn: ``(state, real_batch) -> (state, metrics)``; jit it with the
    batch sharded on the data axis. RNG derives from (cfg.seed, stream, step)
    — no key threading through the caller.

    ``real_pre_packed``: the caller supplies real batches already in 2x2
    space-to-depth (and compute-dtype) form — the resident pipeline's bulk
    augment+pack path.
    """
    g_tx, d_tx = make_optimizers(cfg)
    root = rnglib.root_key(cfg.seed, cfg.rng_impl)
    noise_stream = rnglib.stream(root, rnglib.STREAM_NOISE)
    drop_stream = rnglib.stream(root, rnglib.STREAM_DROPOUT)
    aug_stream = rnglib.stream(root, rnglib.STREAM_AUGMENT)

    conditional = cfg.model.num_classes > 0
    if real_pre_packed and cfg.augment:
        raise ValueError("real_pre_packed implies augmentation was applied "
                         "in bulk — build with cfg.replace(augment=False)")

    def train_step(state: TrainState, real, y_real: jax.Array | None = None
                   ) -> Tuple[TrainState, Metrics]:
        if conditional and y_real is None:
            real, y_real = real          # accept a (images, labels) pair
        if cfg.augment:
            # Augmentation lives INSIDE the fused step: one dispatch per batch
            # matters on high-latency device links, and XLA overlaps the warp
            # with the optimizer tail of the previous step.
            from siggan_tpu.data.augment import augment_batch_inner
            real = augment_batch_inner(
                real, rnglib.at_step(aug_stream, state.step), hflip=cfg.hflip,
                dtype=_dtype(cfg))
        nk = rnglib.at_step(noise_stream, state.step)
        dk = rnglib.at_step(drop_stream, state.step)

        if cfg.share_fakes:
            if cfg.n_critic != 1:
                raise ValueError("share_fakes requires n_critic == 1 "
                                 "(ablation-trainer semantics)")
            state, metrics = shared_fakes_step(
                state, real, nk, dk, cfg, d_tx, g_tx,
                real_packed=real_pre_packed, y_real=y_real)
            return state.replace(step=state.step + 1), metrics

        nkeys = jax.random.split(nk, cfg.n_critic + 1)
        dkeys = jax.random.split(dk, cfg.n_critic + 1)

        if cfg.fuse_g_forwards:
            state, metrics = fused_iteration(
                state, real, nkeys, dkeys, cfg, d_tx, g_tx, y_real,
                real_packed=real_pre_packed)
            return state.replace(step=state.step + 1), metrics

        metrics: Metrics = {}
        for i in range(cfg.n_critic):  # static unroll; n_critic is tiny
            state, metrics = d_step(state, real, nkeys[i], dkeys[i], cfg,
                                    d_tx, y_real,
                                    real_packed=real_pre_packed)
        state, g_metrics = g_step(
            state, real.shape[0], nkeys[-1], dkeys[-1], cfg, g_tx)
        metrics.update(g_metrics)
        state = state.replace(step=state.step + 1)
        return state, metrics

    return train_step


def _use_aug_table(cfg: TrainConfig, n_images: int, n_aug: int) -> bool:
    """Whether to MATERIALIZE the window's augmented-image table (the fast
    path): only when it fits comfortably in HBM (compute-dtype sized).
    Epoch-keyed augmentation itself (``cfg.augment_bulk``) never depends on
    this — when the table is too big the batch is warped after the gather
    with the same per-(epoch, image) parameters (see ``_warp_gathered``),
    so both resident entry points produce identical batches in every
    config."""
    if not (cfg.augment and cfg.augment_bulk):
        return False
    itemsize = 2 if cfg.compute_dtype == "bfloat16" else 4
    table_mb = (n_aug * n_images * cfg.model.image_size ** 2
                * cfg.model.image_channels * itemsize) / 2 ** 20
    return table_mb <= cfg.resident_max_mb


def _warp_gathered(cfg: TrainConfig, real: jax.Array, theta, scale, flip,
                   idx: jax.Array) -> jax.Array:
    """Warp an already-gathered batch with its epoch's per-image parameter
    table, then cast + pack exactly as ``_bulk_augment_epoch``'s table
    would. Per-image warps are independent, so
    ``warp(images[idx], params[idx]) == warp(all, params)[idx]`` (tested in
    test_train_step.py)."""
    from siggan_tpu.data.augment import augment_apply
    real = augment_apply(
        real, jnp.take(theta, idx), jnp.take(scale, idx),
        None if flip is None else jnp.take(flip, idx),
        dtype=_dtype(cfg))
    dt = _dtype(cfg)
    if dt is not None:
        real = real.astype(dt)
    if _packed(cfg):
        from siggan_tpu.ops.packed import space_to_depth
        real = space_to_depth(real)
    return real


def _bulk_augment_epoch(cfg: TrainConfig, images: jax.Array, epoch,
                        aug_stream) -> jax.Array:
    """Augment (and pack) the WHOLE resident dataset for one epoch.

    Keying: one key per (epoch), split per image inside the warp — each image
    gets a fresh transform each epoch, the same cadence as the reference's
    per-draw torchvision transforms (data_loader_signatures.py:154) and as
    the per-step in-step augment it replaces. Doing it at N=dataset instead
    of N=batch moves the warp's band-tap loop from half-lane 64-image ops
    (measured 52 us/step at 32-50 GiB/s) to full-lane bulk ops amortized
    over an epoch of steps.
    """
    from siggan_tpu.data.augment import augment_batch_inner
    out = augment_batch_inner(images, rnglib.at_step(aug_stream, epoch),
                              hflip=cfg.hflip, dtype=_dtype(cfg))
    dt = _dtype(cfg)
    if dt is not None:
        out = out.astype(dt)
    if _packed(cfg):
        from siggan_tpu.ops.packed import space_to_depth
        out = space_to_depth(out)
    return out


def make_resident_train_step(cfg: TrainConfig, n_images: int):
    """Fused train step over an HBM-RESIDENT dataset — the TPU-native input
    pipeline for datasets that fit device memory (signature sets easily do).

    The whole dataset lives on device; batch selection happens INSIDE the
    step from the step counter: epoch = step // steps_per_epoch, a per-epoch
    on-device permutation (same "each image once per epoch, drop remainder"
    semantics as torch's shuffled drop_last DataLoader), and a dynamic-slice
    gather. Per-step host->device traffic is ZERO — on tunneled/high-latency
    links this is the difference between ~20 ms/step and ~3 ms/step.

    Augmentation is keyed at EPOCH granularity (one key per epoch, one
    transform per image per epoch — the cadence the reference's DataLoader
    produces): this entry point draws the epoch's per-image parameter table
    (n scalars per image) and warps only the gathered batch, producing
    exactly the batches ``make_resident_multi_step``'s bulk-augmented table
    yields. Set ``cfg.augment_bulk=False`` for the per-step in-step augment.

    Returned fn: ``(state, images) -> (state, metrics)`` with images the
    full (N, H, W, C) resident array (shard it over the data axis; the
    gather's collective rides ICI).
    """
    steps_per_epoch = n_images // cfg.batch_size
    if steps_per_epoch < 1:
        raise ValueError(
            f"dataset ({n_images}) smaller than global batch ({cfg.batch_size})")
    bulk = bool(cfg.augment and cfg.augment_bulk)
    inner_cfg = cfg.replace(augment=False) if bulk else cfg
    base_step = make_train_step(inner_cfg,
                                real_pre_packed=bulk and _packed(cfg))
    root = rnglib.root_key(cfg.seed, cfg.rng_impl)
    data_stream = rnglib.stream(root, rnglib.STREAM_DATA)
    aug_stream = rnglib.stream(root, rnglib.STREAM_AUGMENT)

    def train_step(state: TrainState, images: jax.Array,
                   labels: jax.Array | None = None):
        epoch = state.step // steps_per_epoch
        bidx = state.step % steps_per_epoch
        perm = jax.random.permutation(rnglib.at_step(data_stream, epoch), n_images)
        idx = jax.lax.dynamic_slice(
            perm, (bidx * cfg.batch_size,), (cfg.batch_size,))
        real = jnp.take(images, idx, axis=0)
        if bulk:
            # Same per-(epoch, image) transforms as the multi-step path's
            # bulk table, but warp ONLY the gathered batch: the epoch table
            # is just n_images scalars per parameter (no memory gate
            # needed), without re-warping the whole resident set every step.
            from siggan_tpu.data.augment import augment_params
            theta, scale, flip = augment_params(
                rnglib.at_step(aug_stream, epoch), n_images, hflip=cfg.hflip)
            real = _warp_gathered(cfg, real, theta, scale, flip, idx)
        if cfg.model.num_classes > 0:
            return base_step(state, real, jnp.take(labels, idx, axis=0))
        return base_step(state, real)

    return train_step, steps_per_epoch


def _build_aug_table(cfg: TrainConfig, images: jax.Array, e0, aug_stream,
                     n_aug: int) -> jax.Array:
    """The scan window's flattened augmented-image table: n_aug epochs of
    the resident set, each warped with its epoch's parameter draws.

    vmap (not lax.map) over the epoch axis: the whole build fuses into one
    full-lane warp over n_aug * n_images images, and XLA lays the result out
    for the scan body's row gather directly — the lax.map form left a
    ~134 MB layout copy between the map's while-loop buffer and the gather
    (xprof: copy.517, 6.1 us/step at 64px/b64/K=256). Peak memory is the
    f32 warp intermediates over the whole window (~6x the bf16 table);
    ``_use_aug_table`` gates table sizes long before that matters."""
    n_images = images.shape[0]
    itemsize = 2 if cfg.compute_dtype == "bfloat16" else 4
    table_mb = (n_aug * n_images * cfg.model.image_size ** 2
                * cfg.model.image_channels * itemsize) / 2 ** 20
    if table_mb * 12 > cfg.resident_max_mb:
        # Big window: bound peak memory at one epoch of f32 intermediates
        # (the vmapped warp holds ~6x the bf16 table in f32 scratch).
        augs = jax.lax.map(
            lambda e: _bulk_augment_epoch(cfg, images, e0 + e, aug_stream),
            jnp.arange(n_aug))
    else:
        augs = jax.vmap(
            lambda e: _bulk_augment_epoch(cfg, images, e0 + e, aug_stream)
        )(jnp.arange(n_aug))
    return augs.reshape((n_aug * n_images,) + augs.shape[2:])


def make_resident_multi_step(cfg: TrainConfig, n_images: int, scan_steps: int,
                             batch_sharding=None):
    """K resident train steps per dispatch via lax.scan — a device-side
    training loop. On high-latency device links one dispatch per K steps is
    the difference between ~23k and ~28k images/sec at batch 64 (the host
    can't keep a 2.3 ms step fed one call at a time); on directly-attached
    TPUs it removes host jitter entirely.

    The per-epoch shuffle is HOISTED out of the scan body: a K-step window
    touches at most K // steps_per_epoch + 2 distinct epochs, so their
    permutations are sorted once into a small table before the scan and the
    body just indexes it — identical batches to the per-step form (the
    permutation is a pure function of the epoch), but ~0.15 ms/step of
    redundant 2048-key sorting disappears at 64px/b64/K=32.

    Returned fn: ``(state, images) -> (state, metrics)`` with each metric
    stacked to shape (K,); step-exact equivalence with K sequential calls is
    tested in ``tests/test_train_step.py``.

    ``batch_sharding`` (a ``NamedSharding`` over the caller's mesh, batch
    dim on the data axis): REQUIRED for multi-device data parallelism.
    The resident dataset is sharded over the data axis, but the scan-body
    gather uses data-dependent indices, so GSPMD cannot infer a sharding
    for the gathered batch — left unconstrained it REPLICATES the batch
    and with it the entire D/G/optimizer computation on every device (one
    all-reduce to materialize the gather, zero speedup from the mesh).
    Constraining the gathered batch back onto the data axis keeps the
    whole step data-parallel: GSPMD then inserts the gradient/BN/loss
    all-reduces inside the scanned body (asserted in
    ``tests/test_multichip_hlo.py``).
    """
    steps_per_epoch = n_images // cfg.batch_size
    if steps_per_epoch < 1:
        raise ValueError(
            f"dataset ({n_images}) smaller than global batch ({cfg.batch_size})")
    # Epochs a K-step window can touch. The trainer (and bench) always
    # dispatch windows starting at epoch boundaries AND use K that divides
    # or is divided by steps_per_epoch — then the span is exactly
    # ceil(K / spe). The +1 slack only exists for misaligned direct callers
    # (the body clamps e_rel into the augment table, so a misaligned start
    # reads a valid — same-distribution — augmented epoch).
    aligned = (scan_steps % steps_per_epoch == 0
               or steps_per_epoch % scan_steps == 0)
    span = -(-scan_steps // steps_per_epoch)           # ceil
    n_epochs = span + (1 if aligned else 2)            # perm table (cheap)
    n_aug = span + (0 if aligned else 1)               # augmented-table epochs
    bulk = bool(cfg.augment and cfg.augment_bulk)
    # Fast path: materialize the window's augmented-image table when it
    # fits HBM; otherwise warp each gathered batch with the same
    # per-(epoch, image) parameter tables — identical batches either way.
    table = _use_aug_table(cfg, n_images, n_aug)
    inner_cfg = cfg.replace(augment=False) if bulk else cfg
    base_step = make_train_step(inner_cfg,
                                real_pre_packed=bulk and _packed(cfg))
    root = rnglib.root_key(cfg.seed, cfg.rng_impl)
    data_stream = rnglib.stream(root, rnglib.STREAM_DATA)
    aug_stream = rnglib.stream(root, rnglib.STREAM_AUGMENT)

    conditional = cfg.model.num_classes > 0

    def multi_step(state: TrainState, images: jax.Array,
                   labels: jax.Array | None = None):
        e0 = state.step // steps_per_epoch
        perms = jax.vmap(lambda e: jax.random.permutation(
            rnglib.at_step(data_stream, e0 + e), n_images))(
                jnp.arange(n_epochs))
        if bulk and table:
            # Hoisted augmentation: augment+pack the dataset once per epoch
            # in the window, then the scan body gathers from the flattened
            # table — zero per-step warp/convert/pack ops (keying identical
            # to make_resident_train_step; exact-equivalence tested).
            augs = _build_aug_table(cfg, images, e0, aug_stream, n_aug)
        elif bulk:
            # Table too big for HBM: draw only the window's per-image
            # PARAMETER tables (n_aug x n_images scalars) and warp each
            # gathered batch in the body — same draws as the table path.
            from siggan_tpu.data.augment import augment_params
            thetas, scales, flips = jax.vmap(
                lambda e: augment_params(
                    rnglib.at_step(aug_stream, e0 + e), n_images,
                    hflip=cfg.hflip))(jnp.arange(n_aug))

        def body(s: TrainState, _):
            e_rel = jnp.minimum(s.step // steps_per_epoch - e0, n_epochs - 1)
            bidx = s.step % steps_per_epoch
            idx = jax.lax.dynamic_slice(
                perms, (e_rel, bidx * cfg.batch_size), (1, cfg.batch_size))[0]
            ea = jnp.minimum(e_rel, n_aug - 1)
            # In-bounds by construction (idx is a slice of a permutation of
            # arange(n_images); ea is clamped above), so skip jnp.take's
            # jit-default clamp + fill-select passes: the select_n alone
            # materialized an extra (b, H/2, W/2, 4) pass + layout copy in
            # the hot loop (xprof r4: copy.722 3.2 us + select fusion/step).
            gather = lambda a, i: a.at[i].get(mode="promise_in_bounds")
            if bulk and table:
                batch = gather(augs, ea * n_images + idx)
            elif bulk:
                batch = _warp_gathered(
                    cfg, gather(images, idx),
                    thetas[ea], scales[ea],
                    None if flips is None else flips[ea], idx)
            else:
                batch = gather(images, idx)
            if batch_sharding is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, batch_sharding)
            if conditional:
                y = gather(labels, idx)
                if batch_sharding is not None:
                    y = jax.lax.with_sharding_constraint(y, batch_sharding)
                s, m = base_step(s, batch, y)
            else:
                s, m = base_step(s, batch)
            # Pack the ~8 scalar metrics into ONE vector so the scan carries
            # a single stacked (K, M) array instead of M per-step
            # dynamic-update-slices (pure bookkeeping on the hot path). The
            # names are config-static; scan traces the body exactly once, so
            # the capture below is filled before the zip runs.
            names_cell[:] = sorted(m)
            return s, jnp.stack([m[k].astype(jnp.float32) for k in names_cell])

        names_cell: list = []
        final_state, stacked = jax.lax.scan(body, state, None,
                                            length=scan_steps)
        return final_state, {k: stacked[:, i]
                             for i, k in enumerate(names_cell)}

    return multi_step, steps_per_epoch


def make_eval_generate(cfg: TrainConfig):
    """Jittable inference-mode generation: (state, z[, y]) -> images in [-1,1].

    Uses the EMA shadow weights when ``cfg.ema_decay > 0`` (sample grids,
    in-training FID and the FID-best checkpoint criterion all see the EMA
    generator, which is what ships)."""
    def generate(state: TrainState, z: jax.Array,
                 y: jax.Array | None = None) -> jax.Array:
        g_params, g_bn = eval_generator_weights(state)
        img, _ = generator.apply_fn(
            g_params, g_bn, z, cfg.model,
            train=False, compute_dtype=_dtype(cfg), y=y)
        return img.astype(jnp.float32)
    return generate
