"""Ablation harness — the hyperparameter grid study.

Parity with ``ablation_vanilla_gan_signatures.py`` (reference #13):
 - ``AblationConfig`` with the short-name scheme (:89) over the 3x2x2 grid
   latent in {50, 100, 200} x generator activation {relu, leaky_relu} x
   spectral norm {off, on} (:596-599);
 - a leaner trainer variant (:335-535) whose semantics differ from the main
   trainer on purpose: ONE latent batch per iteration — D trains on the
   detached fakes and the G step REUSES those same fakes (:434, :444);
   here that is a single fused jitted step with one G forward;
 - ``AblationResult`` with loss-variance stability metrics (:128);
 - FID on a cached <=512-image real subset (:690-697);
 - CSV / Markdown / JSON result tables (:714-768) and plots + sample montage.
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from siggan_tpu.core import rng as rnglib
from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
from siggan_tpu.core.state import TrainState, create_train_state, make_optimizers
from siggan_tpu.models import discriminator, generator
from siggan_tpu.train.train_step import _bce_mean, _dtype


@dataclass(frozen=True)
class AblationConfig:
    latent_dim: int = 100
    g_activation: str = "relu"          # "relu" | "leaky_relu"
    use_spectral_norm: bool = False
    image_size: int = 64
    batch_size: int = 64
    epochs: int = 20
    seed: int = 42
    compute_dtype: str = "bfloat16"

    @property
    def short_name(self) -> str:
        act = "relu" if self.g_activation == "relu" else "lrelu"
        return f"z{self.latent_dim}_{act}_sn{int(self.use_spectral_norm)}"

    def to_train_config(self) -> TrainConfig:
        return TrainConfig(
            model=ModelConfig(latent_dim=self.latent_dim,
                              image_size=self.image_size,
                              g_activation=self.g_activation,
                              use_spectral_norm=self.use_spectral_norm),
            batch_size=self.batch_size, epochs=self.epochs, seed=self.seed,
            compute_dtype=self.compute_dtype, augment=False)


@dataclass
class AblationResult:
    config: AblationConfig
    final_d_loss: float = 0.0
    final_g_loss: float = 0.0
    d_loss_variance: float = 0.0
    g_loss_variance: float = 0.0
    fid: Optional[float] = None
    wall_time_sec: float = 0.0
    g_params: int = 0
    d_params: int = 0

    def stability_score(self) -> float:
        """Lower combined loss variance = more stable (reference :128)."""
        return float(self.d_loss_variance + self.g_loss_variance)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["config"] = dataclasses.asdict(self.config)
        d["short_name"] = self.config.short_name
        d["stability"] = self.stability_score()
        return d


def make_ablation_train_step(cfg: TrainConfig):
    """Fused step with the ablation trainer's shared-fake semantics."""
    g_tx, d_tx = make_optimizers(cfg)
    root = rnglib.root_key(cfg.seed, cfg.rng_impl)
    noise_stream = rnglib.stream(root, rnglib.STREAM_NOISE)
    drop_stream = rnglib.stream(root, rnglib.STREAM_DROPOUT)
    cdt = _dtype(cfg)

    def step(state: TrainState, real: jax.Array):
        z = generator.generate_latent(
            rnglib.at_step(noise_stream, state.step), real.shape[0], cfg.model)
        dk = jax.random.split(rnglib.at_step(drop_stream, state.step), 3)

        # One latent batch per iteration; the D step sees these fakes
        # detached and the G step re-traces the same z (reference :434, :444).
        fake, g_bn = generator.apply_fn(
            state.g_params, state.g_bn, z, cfg.model, train=True,
            compute_dtype=cdt)

        # D update on real + detached fake.
        def d_loss_fn(d_params):
            logits_r, d_state = discriminator.apply_fn(
                d_params, state.d_state, real, cfg.model, train=True,
                rng=dk[0], compute_dtype=cdt)
            logits_f, d_state = discriminator.apply_fn(
                d_params, d_state, jax.lax.stop_gradient(fake), cfg.model,
                train=True, rng=dk[1], compute_dtype=cdt)
            loss = (_bce_mean(logits_r, cfg.label_smoothing)
                    + _bce_mean(logits_f, 0.0))
            return loss, (d_state, logits_f)

        (d_loss, (d_state, _)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # G update through the SAME fakes against the UPDATED D.
        def g_loss_through_fake(g_params):
            fake2, g_bn2 = generator.apply_fn(
                g_params, state.g_bn, z, cfg.model, train=True,
                compute_dtype=cdt)
            logits, d_state2 = discriminator.apply_fn(
                d_params, d_state, fake2, cfg.model, train=True, rng=dk[2],
                compute_dtype=cdt)
            return _bce_mean(logits, 1.0), (g_bn2, d_state2)

        (g_loss, (g_bn, d_state)), g_grads = jax.value_and_grad(
            g_loss_through_fake, has_aux=True)(state.g_params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = state.replace(
            step=state.step + 1, g_params=g_params, g_bn=g_bn,
            d_params=d_params, d_state=d_state, g_opt=g_opt, d_opt=d_opt)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss}

    return step


class AblationStudyManager:
    """Run the grid, score each run, emit tables and plots."""

    DEFAULT_GRID = {
        "latent_dim": [50, 100, 200],
        "g_activation": ["relu", "leaky_relu"],
        "use_spectral_norm": [False, True],
    }

    def __init__(self, images: np.ndarray, output_dir: str | Path,
                 epochs: int = 20, batch_size: int = 64, seed: int = 42,
                 compute_dtype: str = "bfloat16",
                 fid_real_cap: int = 512, fid_samples: int = 256):
        self.images = images
        self.out = Path(output_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        self.epochs = epochs
        self.batch_size = batch_size
        self.seed = seed
        self.compute_dtype = compute_dtype
        # <=512 cached reals for FID (reference :690-697)
        self.fid_reals = images[:fid_real_cap]
        self.fid_samples = fid_samples
        self.results: List[AblationResult] = []
        self.histories: Dict[str, Dict[str, List[float]]] = {}

    def grid(self, overrides: Optional[Dict[str, List]] = None
             ) -> List[AblationConfig]:
        g = dict(self.DEFAULT_GRID)
        if overrides:
            g.update(overrides)
        cfgs = []
        for z in g["latent_dim"]:
            for act in g["g_activation"]:
                for sn in g["use_spectral_norm"]:
                    cfgs.append(AblationConfig(
                        latent_dim=z, g_activation=act, use_spectral_norm=sn,
                        epochs=self.epochs, batch_size=self.batch_size,
                        seed=self.seed, compute_dtype=self.compute_dtype))
        return cfgs

    def run_one(self, acfg: AblationConfig, compute_fid: bool = True
                ) -> AblationResult:
        cfg = acfg.to_train_config()
        state = create_train_state(cfg)
        step = jax.jit(make_ablation_train_step(cfg), donate_argnums=(0,))
        n = len(self.images)
        steps_per_epoch = max(1, n // cfg.batch_size)
        images_dev = jax.device_put(self.images)

        t0 = time.perf_counter()
        d_hist: List[float] = []
        g_hist: List[float] = []
        for epoch in range(acfg.epochs):
            order = np.random.RandomState((cfg.seed, epoch)).permutation(n)
            ms = []
            for b in range(steps_per_epoch):
                sel = jnp.asarray(order[b * cfg.batch_size:(b + 1) * cfg.batch_size])
                state, m = step(state, images_dev[sel])
                ms.append(m)
            stacked = jax.device_get(jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *ms))
            d_hist.append(float(np.mean(stacked["d_loss"])))
            g_hist.append(float(np.mean(stacked["g_loss"])))
        wall = time.perf_counter() - t0
        self.histories[acfg.short_name] = {"d_loss": d_hist, "g_loss": g_hist}

        fid_val = None
        fake = None
        from siggan_tpu.train.train_step import make_eval_generate
        gen = jax.jit(make_eval_generate(cfg))
        z = generator.generate_latent(
            jax.random.key(cfg.seed + 1), self.fid_samples, cfg.model)
        fake = np.asarray(jax.device_get(gen(state, z)))
        if compute_fid:
            from siggan_tpu.eval.fid import FIDScorer
            fid_val = FIDScorer().fid(self.fid_reals, fake)

        from siggan_tpu.utils.visualizer import save_sample_grid
        save_sample_grid(fake[:64],
                         self.out / "samples" / f"{acfg.short_name}.png")

        half = len(g_hist) // 2
        res = AblationResult(
            config=acfg,
            final_d_loss=d_hist[-1], final_g_loss=g_hist[-1],
            d_loss_variance=float(np.var(d_hist[half:])),
            g_loss_variance=float(np.var(g_hist[half:])),
            fid=fid_val, wall_time_sec=wall,
            g_params=generator.param_count(state.g_params),
            d_params=discriminator.param_count(state.d_params))
        self.results.append(res)
        return res

    def run_all(self, overrides: Optional[Dict[str, List]] = None,
                compute_fid: bool = True) -> List[AblationResult]:
        cfgs = self.grid(overrides)
        for i, acfg in enumerate(cfgs):
            print(f"[{i + 1}/{len(cfgs)}] {acfg.short_name}", flush=True)
            r = self.run_one(acfg, compute_fid)
            print(f"    d_loss {r.final_d_loss:.3f} g_loss {r.final_g_loss:.3f} "
                  f"fid {r.fid if r.fid is None else round(r.fid, 2)} "
                  f"({r.wall_time_sec:.1f}s)", flush=True)
        self.save_tables()
        self.save_plots()
        return self.results

    # -- outputs ----------------------------------------------------------
    def save_tables(self) -> None:
        rows = [r.to_dict() for r in self.results]
        (self.out / "results.json").write_text(json.dumps(rows, indent=2))
        cols = ["short_name", "final_d_loss", "final_g_loss", "stability",
                "fid", "wall_time_sec", "g_params"]
        with open(self.out / "results.csv", "w") as f:
            f.write(",".join(cols) + "\n")
            for r in rows:
                f.write(",".join(str(r.get(c, "")) for c in cols) + "\n")
        md = ["| " + " | ".join(cols) + " |",
              "|" + "---|" * len(cols)]
        for r in rows:
            md.append("| " + " | ".join(
                f"{r.get(c):.4f}" if isinstance(r.get(c), float)
                else str(r.get(c, "")) for c in cols) + " |")
        (self.out / "results.md").write_text("\n".join(md) + "\n")

    def save_plots(self) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        def saveto(fig, name):
            fig.tight_layout()
            fig.savefig(self.out / name, dpi=110)
            plt.close(fig)

        # 1) loss curves per run
        fig, axes = plt.subplots(1, 2, figsize=(12, 4.5))
        for name, h in self.histories.items():
            axes[0].plot(h["d_loss"], label=name)
            axes[1].plot(h["g_loss"], label=name)
        axes[0].set_title("D loss")
        axes[1].set_title("G loss")
        axes[1].legend(fontsize=7)
        saveto(fig, "loss_curves.png")

        names = [r.config.short_name for r in self.results]
        # 2) FID bars
        if any(r.fid is not None for r in self.results):
            fig, ax = plt.subplots(figsize=(9, 4))
            ax.bar(names, [r.fid or 0 for r in self.results])
            ax.set_ylabel("FID")
            ax.tick_params(axis="x", rotation=60)
            saveto(fig, "fid_comparison.png")
        # 3) stability bars
        fig, ax = plt.subplots(figsize=(9, 4))
        ax.bar(names, [r.stability_score() for r in self.results])
        ax.set_ylabel("loss variance (lower = more stable)")
        ax.tick_params(axis="x", rotation=60)
        saveto(fig, "stability.png")
        # 4) params vs fid scatter
        if any(r.fid is not None for r in self.results):
            fig, ax = plt.subplots(figsize=(6, 4.5))
            ax.scatter([r.g_params for r in self.results],
                       [r.fid or 0 for r in self.results])
            for r in self.results:
                ax.annotate(r.config.short_name,
                            (r.g_params, r.fid or 0), fontsize=6)
            ax.set_xlabel("G params")
            ax.set_ylabel("FID")
            saveto(fig, "params_vs_fid.png")
        # 5) wall time bars
        fig, ax = plt.subplots(figsize=(9, 4))
        ax.bar(names, [r.wall_time_sec for r in self.results])
        ax.set_ylabel("wall time (s)")
        ax.tick_params(axis="x", rotation=60)
        saveto(fig, "wall_time.png")
