"""Seeded batched generation — the inference engine.

Parity with ``utils/inference.py:136-194`` (generate_signatures_batch):
deterministic base seed, per-batch derived seeds (the reference's
``batch_seed = base + batch#``, ``app…py:1337``, becomes a fold_in of the
batch index), a ``noise_scale`` diversity knob (z ~ N(0, scale^2)), batched
forward passes, optional progress callback, and latent interpolation
(``vanilla_gan_model.py:374``).

TPU-shaped: one jitted generator forward reused across batches; the device
loop is dispatched fully async and synced once at the end.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from siggan_tpu.core import rng as rnglib
from siggan_tpu.core.config import ModelConfig
from siggan_tpu.models import generator
from siggan_tpu.utils.visualizer import to_uint8


class GeneratorSession:
    """A loaded generator ready for repeated batched sampling."""

    def __init__(self, g_params, g_bn, model_cfg: ModelConfig,
                 compute_dtype: Optional[str] = "bfloat16",
                 use_pallas: bool = False):
        self.params = g_params
        self.bn = g_bn
        self.cfg = model_cfg
        dt = jnp.dtype(compute_dtype) if compute_dtype else None

        if use_pallas and model_cfg.image_size == 64 and model_cfg.num_classes == 0:
            # Experimental fused whole-generator kernel (see
            # ops/pallas/generator_fwd.py for the measured XLA-vs-Pallas
            # verdict; XLA is the default for a reason).
            from siggan_tpu.ops.pallas.generator_fwd import (
                generator_forward, pack_generator)
            packed = pack_generator(g_params, g_bn, model_cfg)
            tile = 8
            raw = jax.jit(lambda z: generator_forward(packed, z, tile=tile))

            def fwd(z):
                # The kernel requires batch % tile == 0; pad odd batches
                # (e.g. interpolate's `steps`-sized ones) and slice back.
                n = z.shape[0]
                pad = (-n) % tile
                if pad:
                    z = jnp.concatenate(
                        [z, jnp.zeros((pad,) + z.shape[1:], z.dtype)], axis=0)
                return raw(z)[:n]

            self._fwd = fwd
        else:
            def fwd(z, y=None):
                img, _ = generator.apply_fn(
                    g_params, g_bn, z, model_cfg, train=False,
                    compute_dtype=dt, y=y)
                return img.astype(jnp.float32)

            self._fwd = jax.jit(fwd)

    def sample(self, n: int, *, seed: int = 42, noise_scale: float = 1.0,
               batch_size: int = 64,
               progress: Optional[Callable[[int, int], None]] = None,
               class_id: Optional[int] = None,
               ) -> np.ndarray:
        """Generate n images, (n, H, W, C) float32 in [-1, 1].

        ``class_id``: for conditional (v2.0) checkpoints, generate this
        writer's class; None draws a uniform class per image (or runs
        unconditionally for v1.x models).
        """
        conditional = self.cfg.num_classes > 0
        if class_id is not None:
            if not conditional:
                raise ValueError(
                    "class_id given but this checkpoint is unconditional "
                    "(num_classes == 0) — it would be silently ignored")
            if not 0 <= class_id < self.cfg.num_classes:
                raise ValueError(
                    f"class_id {class_id} out of range for "
                    f"num_classes={self.cfg.num_classes}")
        stream = rnglib.stream(rnglib.root_key(seed), rnglib.STREAM_EVAL)
        outs = []
        done = 0
        for bidx in range(-(-n // batch_size)):
            take = min(batch_size, n - done)
            key = rnglib.at_step(stream, bidx)
            y = None
            if conditional:
                key, yk = jax.random.split(key)
                if class_id is not None:
                    y = jnp.full((batch_size,), class_id, jnp.int32)
                else:
                    y = jax.random.randint(yk, (batch_size,), 0,
                                           self.cfg.num_classes)
            z = generator.generate_latent(key, batch_size, self.cfg, noise_scale)
            out = self._fwd(z, y) if conditional else self._fwd(z)
            outs.append(out[:take])
            done += take
            if progress is not None:
                progress(done, n)
        return np.asarray(jax.device_get(jnp.concatenate(outs, axis=0)))

    def sample_uint8(self, n: int, **kw) -> np.ndarray:
        return to_uint8(self.sample(n, **kw))

    def interpolate(self, *, seed: int = 0, steps: int = 10,
                    z1: Optional[np.ndarray] = None,
                    z2: Optional[np.ndarray] = None,
                    class_id: Optional[int] = None) -> np.ndarray:
        """Linear interpolation between two latents -> (steps, H, W, C).

        Conditional checkpoints morph within ONE writer's style: the whole
        strip uses ``class_id`` (default 0) — interpolating z with a fixed
        class is the meaningful latent walk for a class-conditional G."""
        if z1 is None or z2 is None:
            k = rnglib.stream(rnglib.root_key(seed), rnglib.STREAM_EVAL)
            k1, k2 = jax.random.split(k)
            z1 = generator.generate_latent(k1, 1, self.cfg)[0]
            z2 = generator.generate_latent(k2, 1, self.cfg)[0]
        alphas = jnp.linspace(0.0, 1.0, steps)[:, None]
        zs = (1 - alphas) * jnp.asarray(z1)[None] + alphas * jnp.asarray(z2)[None]
        if self.cfg.num_classes > 0:
            cid = 0 if class_id is None else class_id
            if not 0 <= cid < self.cfg.num_classes:
                raise ValueError(f"class_id {cid} out of range for "
                                 f"num_classes={self.cfg.num_classes}")
            y = jnp.full((steps,), cid, jnp.int32)
            return np.asarray(jax.device_get(self._fwd(zs, y)))
        if class_id is not None:
            raise ValueError("class_id given but this checkpoint is "
                             "unconditional (num_classes == 0)")
        return np.asarray(jax.device_get(self._fwd(zs)))

    def score_with_discriminator(self, images: np.ndarray, d_params, d_state,
                                 model_cfg: ModelConfig,
                                 y: Optional[np.ndarray] = None) -> np.ndarray:
        """D(x) probabilities for quality filtering (app…py:1362-1383).

        Conditional checkpoints (projection D) need the labels the images
        were generated with — callers must pass ``y``."""
        from siggan_tpu.models import discriminator
        if model_cfg.num_classes > 0 and y is None:
            raise ValueError(
                "conditional discriminator scoring requires labels y — "
                "generate with an explicit class_id to use the quality "
                "filter on a conditional checkpoint")
        logits, _ = discriminator.apply_fn(
            d_params, d_state, jnp.asarray(images), model_cfg, train=False,
            y=None if y is None else jnp.asarray(y, jnp.int32))
        return np.asarray(jax.device_get(jax.nn.sigmoid(logits)))[:, 0]


def load_session(checkpoint_dir: str, which: str | int = "latest",
                 ) -> GeneratorSession:
    from siggan_tpu.ckpt.manager import load_generator
    g_params, g_bn, cfg = load_generator(checkpoint_dir, which)
    return GeneratorSession(g_params, g_bn, cfg.model,
                            compute_dtype=cfg.compute_dtype,
                            use_pallas=cfg.use_pallas)
