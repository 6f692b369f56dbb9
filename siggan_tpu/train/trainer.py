"""The training engine — epoch loop, observability, checkpoints, recovery.

Parity with ``GANTrainer`` (``train_vanilla_gan_signatures.py:173-635``):
cooperative stop-file polling (checked each epoch and each batch), fixed-noise
sample grids every ``sample_interval`` epochs, epoch/latest/best checkpoints
every ``checkpoint_interval``, resume, epoch-averaged metric logging, mode-
collapse warnings, best-G-loss tracking, KeyboardInterrupt-safe log flushing.

TPU-shaped differences: the per-batch D/G pair is ONE jitted fused step with
donated state; augmentation runs on device; the loader keeps H2D copies ahead
of compute; throughput (images/sec, ms/step) is a first-class logged metric;
and the whole loop is mesh-aware — pass a multi-device mesh and the identical
code trains data-parallel over ICI.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from siggan_tpu.ckpt.manager import CheckpointManager
from siggan_tpu.core import rng as rnglib
from siggan_tpu.core.config import TrainConfig
from siggan_tpu.core.state import TrainState, create_train_state
from siggan_tpu.core.platform import tpu_compiler_options
from siggan_tpu.data.loader import BatchLoader
from siggan_tpu.parallel.mesh import make_mesh, replicate
from siggan_tpu.train.collapse import ModeCollapseDetector
from siggan_tpu.train.train_step import (make_eval_generate, make_resident_multi_step, make_train_step)
from siggan_tpu.utils.logger import GANLogger
from siggan_tpu.utils.visualizer import save_sample_grid


class GANTrainer:
    def __init__(self, cfg: TrainConfig, images: np.ndarray,
                 stop_file: Optional[str] = None,
                 use_mesh: bool = True,
                 experiment_name: Optional[str] = None,
                 labels: Optional[np.ndarray] = None):
        if (cfg.optim.lr_schedule != "constant"
                and cfg.optim.lr_total_steps == 0):
            # Resolve the schedule span now so the SAME optimizer (state
            # init + jitted step) is built everywhere and the span rides
            # along in every serialized config (resume keeps the schedule).
            spe = len(images) * jax.process_count() // cfg.batch_size
            cfg = cfg.replace(optim=dataclasses.replace(
                cfg.optim, lr_total_steps=cfg.epochs * spe))
        self.cfg = cfg
        self.conditional = cfg.model.num_classes > 0
        if self.conditional and labels is None:
            raise ValueError("conditional training requires labels")
        self.labels = labels
        self.stop_file = Path(stop_file) if stop_file else None
        self.mesh = make_mesh(cfg.mesh) if use_mesh else None
        self.logger = GANLogger(cfg.log_dir, experiment_name)
        self.logger.log_config(cfg.to_dict())
        self.collapse_detector = ModeCollapseDetector(
            cfg.mode_collapse_threshold, cfg.mode_collapse_window)
        self.ckpt = CheckpointManager(cfg.checkpoint_dir, cfg,
                                      authoritative=True)

        data_mb = images.nbytes / 2 ** 20
        self.resident = cfg.resident_data and data_mb <= cfg.resident_max_mb
        batch_sharding = (NamedSharding(self.mesh, P(cfg.mesh.data_axis))
                          if self.mesh is not None else None)
        if self.resident:
            # Whole dataset to HBM once; batches are gathered on device and
            # scan_steps train steps run per dispatch (device-side loop).
            # Multi-host: `images` is this process's shard; the resident
            # array is assembled per-host-local into one global jax.Array
            # and the in-step gather's collectives ride ICI.
            n_proc = jax.process_count()
            n_global = len(images) * n_proc
            if n_proc > 1:
                from siggan_tpu.parallel.mesh import shard_host_local
                if self.mesh is None:
                    raise ValueError("multi-process training requires a mesh")
                self.images_dev = shard_host_local(
                    self.mesh, images, cfg.mesh.data_axis)
                self.labels_dev = (shard_host_local(
                    self.mesh, labels, cfg.mesh.data_axis)
                    if self.conditional else None)
            else:
                self.images_dev = (jax.device_put(images, batch_sharding)
                                   if batch_sharding else jax.device_put(images))
                self.labels_dev = (jax.device_put(labels) if self.conditional
                                   else None)
            spe = n_global // cfg.batch_size
            if cfg.scan_steps:
                if spe % cfg.scan_steps:
                    # The epoch loop dispatches whole scan windows and
                    # accounts steps_per_epoch; a non-divisor K would train
                    # ceil(spe/K)*K steps per labeled epoch (silent
                    # over-training + desynced epoch keys/metrics).
                    raise ValueError(
                        f"scan_steps ({cfg.scan_steps}) must divide "
                        f"steps_per_epoch ({spe}) — or leave scan_steps=0 "
                        f"for a valid automatic choice")
                self.scan_steps = cfg.scan_steps
            else:
                # Auto: largest DIVISOR of steps_per_epoch <= 64, so every
                # dispatch starts at an epoch boundary (keeps the bulk
                # augment window exact and the per-epoch step accounting
                # honest — a non-divisor K would overshoot the epoch).
                k = max(1, min(spe, 64))
                while spe % k:
                    k -= 1
                if k < 16 and spe > k:
                    # No useful divisor <= 64 (e.g. prime steps_per_epoch):
                    # dispatch whole epochs instead. Scan length doesn't
                    # affect compile time, an epoch is already the trainer's
                    # observability granularity, and k=1 would reintroduce
                    # the per-step host round-trip this path exists to
                    # amortize.
                    k = spe
                self.scan_steps = k
            step_fn, self.steps_per_epoch = make_resident_multi_step(
                cfg, n_global, self.scan_steps,
                # Keep the scanned step data-parallel on a mesh: without
                # this the data-dependent gather makes GSPMD replicate the
                # batch (and all compute) on every device — see
                # make_resident_multi_step's docstring.
                batch_sharding=batch_sharding)
            self.loader = None
        else:
            # Streaming path — labels (if conditional) ride the loader as
            # aligned (images, labels) pairs, sharded like the images.
            self.loader = BatchLoader(
                images, cfg.batch_size, seed=cfg.seed, mesh=self.mesh,
                labels=labels if self.conditional else None,
                data_axis=cfg.mesh.data_axis, prefetch=cfg.prefetch)
            self.steps_per_epoch = len(self.loader)
            step_fn = make_train_step(cfg)

        state = create_train_state(cfg)
        if self.mesh is not None:
            state = replicate(self.mesh, state)
            shardings = [NamedSharding(self.mesh, P()), batch_sharding]
            if self.conditional:
                shardings.append(batch_sharding)   # labels shard like images
            self._step_fn = jax.jit(
                step_fn,
                in_shardings=tuple(shardings),
                donate_argnums=(0,),
                compiler_options=tpu_compiler_options())
        else:
            self._step_fn = jax.jit(step_fn, donate_argnums=(0,),
                                    compiler_options=tpu_compiler_options())
        self.state: TrainState = state
        self._generate = jax.jit(make_eval_generate(cfg))

        self.fixed_noise = jax.random.normal(
            rnglib.stream(rnglib.root_key(cfg.seed, cfg.rng_impl), rnglib.STREAM_FIXED),
            (cfg.fixed_noise_samples, cfg.model.latent_dim), jnp.float32)
        self.start_epoch = 0

        # Quality-tracked best (cfg.fid_interval > 0): fixed real subset +
        # fixed eval noise so per-epoch FIDs are comparable; the scorer
        # (random-backbone InceptionV3) is built lazily on first use.
        self._fid_scorer = None
        self._last_fid: Optional[tuple] = None   # (epoch, fid)
        if cfg.fid_interval > 0:
            if cfg.checkpoint_interval % cfg.fid_interval != 0:
                print(f"WARNING: fid_interval={cfg.fid_interval} does not "
                      f"divide checkpoint_interval={cfg.checkpoint_interval}; "
                      "checkpoints saved without a FID can never become "
                      "'best' once a FID-best exists", flush=True)
            rs = np.random.RandomState(cfg.seed)
            sel = rs.permutation(len(images))[:cfg.fid_samples]
            self._fid_real = np.asarray(images[sel], np.float32)
            self._fid_noise = jax.random.normal(
                rnglib.stream(rnglib.root_key(cfg.seed, cfg.rng_impl), rnglib.STREAM_EVAL),
                (cfg.fid_samples, cfg.model.latent_dim), jnp.float32)
            # Fixed per-sample class labels so conditional FID evals are
            # comparable epoch to epoch (and _generate gets the labels the
            # conditional generator requires).
            self._fid_labels = (
                jnp.arange(cfg.fid_samples) % cfg.model.num_classes
                if self.conditional else None)

    def _compute_fid(self) -> float:
        if self._fid_scorer is None:
            from siggan_tpu.eval.fid import FIDScorer
            # Large feature batches: the in-training FID runs every
            # fid_interval epochs over a tunneled device link where
            # per-dispatch RTT dominates — 256-sample chunks cut the round
            # trips 8x vs the eval default. The real subset is fixed for
            # the whole run, so its features are extracted once and reused
            # (identical values, see FIDScorer.fid_from_features).
            self._fid_scorer = FIDScorer(
                batch_size=min(256, self.cfg.fid_samples))
            self._fid_real_feats = self._fid_scorer.features(self._fid_real)
        fakes = []
        for s in range(0, self.cfg.fid_samples, 256):
            y = (self._fid_labels[s:s + 256] if self.conditional else None)
            fakes.append(np.asarray(jax.device_get(
                self._generate(self.state, self._fid_noise[s:s + 256], y))))
        return self._fid_scorer.fid_from_features(
            self._fid_real_feats, np.concatenate(fakes))

    # ------------------------------------------------------------------
    def _should_stop(self) -> bool:
        return self.stop_file is not None and self.stop_file.exists()

    def _sample_grid(self, epoch: int) -> Path:
        # The generate computation is global (replicated state) so every
        # process participates; only process 0 writes the PNG.
        if self.conditional:
            y = jnp.arange(self.cfg.fixed_noise_samples) % self.cfg.model.num_classes
            imgs = np.asarray(jax.device_get(
                self._generate(self.state, self.fixed_noise, y)))
        else:
            imgs = np.asarray(jax.device_get(
                self._generate(self.state, self.fixed_noise)))
        path = Path(self.cfg.sample_dir) / f"epoch_{epoch:04d}.png"
        if jax.process_index() == 0:
            save_sample_grid(imgs, path)
        return path

    def _save_checkpoint(self, epoch: int, g_loss: float) -> None:
        # Attach a FID only when it was scored for exactly this epoch's state.
        fid = self._last_fid[1] if (
            self._last_fid is not None and self._last_fid[0] == epoch) else None
        self.ckpt.save(self.state, epoch=epoch,
                       fixed_noise=self.fixed_noise, g_loss=g_loss, fid=fid)

    def resume(self, which: str | int = "latest") -> bool:
        out = self.ckpt.restore(which)
        if out is None:
            return False
        state, extras = out
        self.state = (replicate(self.mesh, state)
                      if self.mesh is not None else state)
        self.fixed_noise = extras["fixed_noise"]
        self.start_epoch = extras["epoch"] + 1
        print(f"Resumed from epoch {extras['epoch']} "
              f"(step {int(state.step)})", flush=True)
        return True

    # ------------------------------------------------------------------
    def train(self, epochs: Optional[int] = None) -> Dict:
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        stopped = False
        # Bound before any interruptible work: a KeyboardInterrupt during the
        # initial sample grid must still reach the except-handler's
        # _save_checkpoint with a valid epoch.
        epoch = self.start_epoch
        try:
            if self.start_epoch == 0:
                self._sample_grid(0)
            for epoch in range(self.start_epoch, epochs):
                if self._should_stop():
                    print("Stop file detected — stopping before epoch "
                          f"{epoch}", flush=True)
                    stopped = True
                    # Nothing trained this epoch: label the final
                    # checkpoint with the last COMPLETED epoch (a label of
                    # `epoch` would make resume skip it entirely).
                    epoch -= 1
                    break
                # Fully async epoch: steps are dispatched without any host
                # sync (a blocking round trip costs ~50 ms on tunneled TPUs);
                # per-batch metrics stay on device and are pulled once at
                # epoch end, where the collapse detector replays them.
                # Profiler hook: trace the first post-warmup epoch (epoch 1,
                # so compile noise from epoch 0 stays out of the capture).
                profiling = bool(cfg.profile_dir) and epoch == self.start_epoch + 1
                if profiling:
                    jax.profiler.start_trace(cfg.profile_dir)
                device_metrics = []
                n_steps = 0
                t_epoch = time.perf_counter()
                if self.resident:
                    # Dispatch scan_steps-sized chunks; the stop-file is
                    # polled between chunks (granularity scan_steps batches
                    # vs the reference's 1 — set scan_steps=1 to match).
                    remaining = self.steps_per_epoch
                    while remaining > 0:
                        self.state, metrics = (
                            self._step_fn(self.state, self.images_dev,
                                          self.labels_dev)
                            if self.conditional else
                            self._step_fn(self.state, self.images_dev))
                        device_metrics.append(metrics)  # each (K,) stacked
                        n_steps += min(self.scan_steps, remaining)
                        remaining -= self.scan_steps
                        if self._should_stop():
                            print("Stop file detected — stopping mid-epoch",
                                  flush=True)
                            stopped = True
                            break
                else:
                    for batch in self.loader.epoch(epoch):
                        self.state, metrics = (
                            self._step_fn(self.state, *batch)
                            if self.conditional else
                            self._step_fn(self.state, batch))
                        device_metrics.append(
                            jax.tree_util.tree_map(lambda x: x[None], metrics))
                        n_steps += 1
                        if self._should_stop():
                            print("Stop file detected — stopping mid-epoch",
                                  flush=True)
                            stopped = True
                            break
                jax.block_until_ready(device_metrics[-1]["g_loss"])
                if profiling:
                    jax.profiler.stop_trace()
                    print(f"Profiler trace written to {cfg.profile_dir}",
                          flush=True)
                dt = time.perf_counter() - t_epoch
                # One transfer per metric key (concatenated on device), not
                # one per (key, step) scalar — transfer count matters on
                # tunneled links.
                stacked = jax.device_get(jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs), *device_metrics))
                for g, dfm in zip(stacked["g_loss"], stacked["d_fake_mean"]):
                    self.collapse_detector.update(float(g), float(dfm))
                avgs = {k: float(np.mean(v)) for k, v in stacked.items()}
                avgs["images_per_sec"] = cfg.batch_size * n_steps / dt
                avgs["ms_per_step"] = dt / n_steps * 1000.0
                if cfg.fid_interval > 0 and (epoch + 1) % cfg.fid_interval == 0:
                    self._last_fid = (epoch, self._compute_fid())
                    avgs["fid"] = self._last_fid[1]
                self.logger.log_metrics(epoch, avgs)

                collapsed, reason = self.collapse_detector.check_collapse()
                if collapsed:
                    print(f"WARNING: possible mode collapse — {reason}",
                          flush=True)

                if cfg.sample_interval > 0 and (
                        epoch + 1) % cfg.sample_interval == 0:
                    self._sample_grid(epoch + 1)
                g_avg = avgs.get("g_loss", float("inf"))
                # checkpoint_interval=0: no periodic checkpoints (the
                # final/stop-file save below still happens).
                if (cfg.checkpoint_interval > 0
                        and (epoch + 1) % cfg.checkpoint_interval == 0) or stopped:
                    self._save_checkpoint(epoch, g_avg)
                if stopped:
                    break
            else:
                epoch = epochs - 1
            # Final checkpoint + grid regardless of interval alignment
            # (skipped when no epoch completed or progressed — a fresh run
            # stopped before epoch 0 must NOT save an epoch-0 checkpoint).
            if epoch >= self.start_epoch:
                self._save_checkpoint(epoch, self.logger.metrics[-1].get(
                    "g_loss", float("inf")) if self.logger.metrics else float("inf"))
                self._sample_grid(epoch + 1)
        except KeyboardInterrupt:
            print("Interrupted — saving checkpoint", flush=True)
            self._save_checkpoint(epoch, float("inf"))
        finally:
            if jax.process_index() == 0:
                self.logger.save_to_csv()
                self.logger.save_to_json()
        return self.logger.get_summary()
