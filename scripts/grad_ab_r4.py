"""One-window (4-step) resident-train A/B across code versions.

Round-4 quality attribution (VERDICT r3 #4): the 600-epoch showcase retrain
under the round-4 graph regressed (eval FID ~266 -> ~408) and the
threefry+f32 control arm on the NEW graph did not recover it, implicating
either (a) a semantic bug in one of the round-3c/4 default-on graph rewrites
(one-launch Pallas kernel pack/backward, adjoint-form ConvTranspose
backward, D-head-as-VALID-conv, promise_in_bounds gathers) or (b) plain
GAN training-seed chaos.

This script discriminates chaos-free: it runs ONE 4-step resident scan
window from an identical (init, data, rng) start and dumps the resulting
parameters.  Running it in two worktrees (HEAD vs the cfca7ef good-showcase
code) and comparing isolates the graph: exact rewrites differ only by
float rounding (~1e-6 relative in f32 over 4 steps); an algebra bug shows
up as systematic divergence.

Usage (in each worktree, CPU is fine and deterministic):
  JAX_PLATFORMS=cpu python scripts/grad_ab_r4.py --out=/tmp/ab_head.npz
  JAX_PLATFORMS=cpu python scripts/grad_ab_r4.py --out=/tmp/ab_old.npz   # from the old worktree
Compare:
  python scripts/grad_ab_r4.py --cmp /tmp/ab_head.npz /tmp/ab_old.npz
"""
from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _filter(cls, **kw):
    names = {f.name for f in dataclasses.fields(cls)}
    dropped = sorted(set(kw) - names)
    if dropped:
        print(f"  ({cls.__name__}: this code version lacks {dropped})")
    return cls(**{k: v for k, v in kw.items() if k in names})


def run(out: str, compute: str, sgd: bool, steps: int, flags: dict) -> None:
    import jax
    import jax.numpy as jnp

    from siggan_tpu.core.config import ModelConfig, OptimConfig, TrainConfig
    from siggan_tpu.core.state import create_train_state
    from siggan_tpu.data.synthetic import generate_dataset
    from siggan_tpu.train.train_step import make_resident_multi_step

    if sgd:
        # Pure-gradient mode: params after one SGD step = init - lr * grad,
        # so the cross-version param diff IS the gradient diff — no Adam
        # sign(g) amplification of rounding noise on near-zero elements.
        import optax

        from siggan_tpu.core import state as state_mod
        from siggan_tpu.train import train_step as ts_mod

        def sgd_optimizers(cfg):
            return optax.sgd(1e-2), optax.sgd(1e-2)

        state_mod.make_optimizers = sgd_optimizers
        ts_mod.make_optimizers = sgd_optimizers

    model = _filter(ModelConfig, use_spectral_norm=True, latent_dim=200,
                    **flags)
    optim = _filter(OptimConfig, d_lr=1e-4, g_lr=2e-4, lr_schedule="linear",
                    lr_decay_start_frac=0.5, lr_total_steps=2400,
                    moment_dtype="float32")
    cfg = _filter(TrainConfig, model=model, optim=optim,
                  diffaugment="translation,cutout", augment_bulk=True,
                  batch_size=64, epochs=600, seed=42,
                  rng_impl="threefry2x32", compute_dtype=compute,
                  hflip=False)

    n = 256
    images = generate_dataset(n, 64, seed=7)
    step, spe = make_resident_multi_step(cfg, n, scan_steps=steps)
    state = create_train_state(cfg)
    state, metrics = jax.jit(step)(state, jnp.asarray(images))
    flat = {}
    for tree, tag in ((state.g_params, "g"), (state.d_params, "d")):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in leaves:
            key = tag + "".join(str(p) for p in path)
            flat[key] = np.asarray(leaf, np.float32)
    for k in sorted(metrics):
        flat["metric:" + k] = np.asarray(metrics[k], np.float32)
    np.savez(out, **flat)
    print(f"wrote {out}: {len(flat)} arrays; "
          f"d_loss={flat['metric:d_loss']} g_loss={flat['metric:g_loss']}")


def cmp(a_path: str, b_path: str) -> None:
    a, b = np.load(a_path), np.load(b_path)
    keys = sorted(set(a.files) & set(b.files))
    missing = sorted(set(a.files) ^ set(b.files))
    if missing:
        print(f"keys only in one file: {missing}")
    rows = []
    for k in keys:
        x, y = a[k].astype(np.float64), b[k].astype(np.float64)
        if x.shape != y.shape:
            rows.append((np.inf, k, f"shape {x.shape} vs {y.shape}"))
            continue
        denom = np.maximum(np.abs(x), np.abs(y)).max() + 1e-12
        rel = np.abs(x - y).max() / denom
        # RMS-relative: robust to tensors whose TRUE gradient is ~0 (e.g.
        # pre-BN biases), where max-relative is pure cancellation noise.
        rms = float(np.sqrt(np.mean((x - y) ** 2))
                    / (np.sqrt(np.mean(x ** 2)) + 1e-12))
        rows.append((rms, k, f"rmsrel {rms:.3e} maxrel {rel:.3e}"))
    rows.sort(reverse=True)
    for rel, k, msg in rows[:12]:
        print(f"  {msg}  {k}")
    worst = rows[0][0] if rows else float("nan")
    print(f"WORST max-relative difference over {len(keys)} arrays: {worst:.3e}")
    print("verdict:", "EXACT-to-rounding" if worst < 1e-4 else
          "SYSTEMATIC DIVERGENCE — investigate", flush=True)


def main() -> None:
    if sys.argv[1:2] == ["--cmp"]:
        cmp(sys.argv[2], sys.argv[3])
        return
    out, compute, sgd, steps = "/tmp/grad_ab.npz", "float32", False, 4
    flags = {}
    for arg in sys.argv[1:]:
        if arg.startswith("--out="):
            out = arg.split("=", 1)[1]
        elif arg.startswith("--compute="):
            compute = arg.split("=", 1)[1]
        elif arg == "--sgd":
            sgd = True
        elif arg.startswith("--steps="):
            steps = int(arg.split("=", 1)[1])
        elif arg.startswith("--flag="):
            k, v = arg.split("=", 1)[1].split(":")
            flags[k] = v == "true"
    run(out, compute, sgd, steps, flags)


if __name__ == "__main__":
    main()
