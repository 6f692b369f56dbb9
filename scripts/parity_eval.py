"""Quality-parity experiment: reference PyTorch vs siggan_tpu, matched recipe.

Round-3 protocol (VERDICT r2 #5 — thicker than the round-2 25-epoch single
torch seed): both sides trained on the SAME data (/tmp/parity_data, 1024
synthetic signatures), SAME recipe (64px, batch 64, z=100, Adam 2e-4
b(0.5,0.999), label smoothing 0.9, n_critic 1, 50 epochs):

  torch: scripts/parity_torch_train.py --epochs 50 --seed {42,123,7}
         -> /tmp/parity_torch_s{42,123,7} (the reference's own GANTrainer,
         imported from /root/reference/src and run in-env on CPU, through
         the golden-tested torchvision shim)
  jax:   python -m siggan_tpu.cli.train -> /tmp/parity_jax_r3 (TPU)

Scoring: ONE random-init InceptionV3 FID + LPIPS-alex diversity + stroke
stats for every measurement. Variance is reported on BOTH axes — across
torch TRAINING seeds (3 runs) and across generation seeds (3 per run) —
and the verdict is evaluated in both directions (jax-better / torch-better
/ within noise). Per-side stroke-stat OVERLAP (histogram overlap
coefficient of the per-image ink fraction vs the real set) is reported as
a distribution-level check that FID alone can miss.

This is the BASELINE.json "FID within noise of the PyTorch reference at
matched epochs" evidence; reference protocol:
/root/reference/src/evaluate_vanilla_gan_signatures.py:241-340.
"""
from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent / "torchvision_shim"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, "/root/reference/src")

GEN_SEEDS = [101, 202, 303]
N = 1024
EPOCHS = 50
TORCH_RUNS = {s: f"/tmp/parity_torch_s{s}" for s in (42, 123, 7)}
JAX_RUN = "/tmp/parity_jax_r3"


def load_reals(data_dir="/tmp/parity_data"):
    from PIL import Image
    paths = sorted(pathlib.Path(data_dir).glob("*.png"))
    imgs = np.stack([
        np.asarray(Image.open(p).convert("L"), np.float32) / 127.5 - 1.0
        for p in paths])[..., None]
    return imgs


def torch_fakes(ckpt, seed, n=N):
    from utils.inference import generate_signatures_batch, load_generator
    gen, latent_dim = load_generator(ckpt, device="cpu")
    images = generate_signatures_batch(
        generator=gen, n_samples=n, latent_dim=latent_dim, device="cpu",
        batch_size=128, seed=seed)
    arr = np.stack([np.asarray(im, np.float32) for im in images])
    return (arr / 127.5 - 1.0)[..., None]


def jax_fakes(run_dir, seed, n=N):
    from siggan_tpu.infer.generate import load_session
    sess = load_session(f"{run_dir}/checkpoints", "latest")
    return sess.sample(n, seed=seed, batch_size=128)


def ink_overlap(real, fake, bins=32):
    """Histogram overlap coefficient (0..1) of per-image ink fraction."""
    from siggan_tpu.eval.stroke import _dark_fractions
    r = np.asarray(_dark_fractions(real))
    f = np.asarray(_dark_fractions(fake))
    lo, hi = min(r.min(), f.min()), max(r.max(), f.max()) + 1e-9
    hr, _ = np.histogram(r, bins=bins, range=(lo, hi), density=False)
    hf, _ = np.histogram(f, bins=bins, range=(lo, hi), density=False)
    return float(np.minimum(hr / hr.sum(), hf / hf.sum()).sum())


def score_run(label, fake_fn, src, real, scorer, lpips_params):
    from siggan_tpu.eval.evaluate import compute_metrics
    fids, lps, overlaps, metrics = [], [], [], None
    for seed in GEN_SEEDS:
        fake = np.asarray(fake_fn(src, seed), np.float32)
        metrics = compute_metrics(real, fake, scorer=scorer,
                                  lpips_params=lpips_params,
                                  lpips_backbone="random-init")
        fids.append(float(metrics["fid"]))
        lps.append(float(metrics.get("lpips_diversity", float("nan"))))
        overlaps.append(ink_overlap(real, fake))
        print(f"{label} gen-seed {seed}: FID {fids[-1]:.1f} "
              f"LPIPS {lps[-1]:.4f} ink-overlap {overlaps[-1]:.3f}",
              flush=True)
    return {
        "fid_mean": float(np.mean(fids)), "fid_std": float(np.std(fids)),
        "fid_per_seed": [float(f) for f in fids],
        "lpips_mean": float(np.nanmean(lps)),
        "ink_overlap_mean": float(np.mean(overlaps)),
        "stroke_density": metrics.get("stroke_density"),
        "foreground_ratio": metrics.get("foreground_ratio"),
    }


def main():
    from siggan_tpu.eval import lpips as lpips_mod
    from siggan_tpu.eval.fid import FIDScorer

    out_dir = pathlib.Path("docs/parity")
    out_dir.mkdir(parents=True, exist_ok=True)

    real = load_reals()
    print(f"reals: {real.shape}", flush=True)
    scorer = FIDScorer()                      # one backbone for EVERYTHING
    lpips_params = lpips_mod.init_params()
    rs = np.random.RandomState(0)
    half = rs.permutation(len(real))
    floor = scorer.fid(real[half[:512]], real[half[512:]])
    noise = rs.rand(512, 64, 64, 1).astype(np.float32) * 2 - 1
    ceiling = scorer.fid(real[:512], noise)
    # Control: overlap of the real set against its own other half (ceiling
    # for the fake-vs-real overlap numbers).
    overlap_floor = ink_overlap(real[half[:512]], real[half[512:]])
    print(f"FID floor {floor:.1f} noise {ceiling:.1f} "
          f"overlap ceiling {overlap_floor:.3f}", flush=True)

    report = {"floor_fid_real_vs_real": floor, "noise_fid": ceiling,
              "ink_overlap_real_vs_real": overlap_floor,
              "n_samples": N, "gen_seeds": GEN_SEEDS, "epochs": EPOCHS,
              "torch_train_seeds": list(TORCH_RUNS), "sides": {}}

    torch_runs = {}
    for tseed, out in TORCH_RUNS.items():
        ckpt = f"{out}/checkpoints/checkpoint_latest.pt"
        torch_runs[str(tseed)] = score_run(
            f"torch(train-seed {tseed})", torch_fakes, ckpt, real,
            scorer, lpips_params)
    t_means = [r["fid_mean"] for r in torch_runs.values()]
    report["sides"]["torch_reference"] = {
        "runs": torch_runs,
        "fid_mean": float(np.mean(t_means)),
        "fid_std_across_train_seeds": float(np.std(t_means)),
        "fid_std_across_gen_seeds": float(np.mean(
            [r["fid_std"] for r in torch_runs.values()])),
        "lpips_mean": float(np.mean(
            [r["lpips_mean"] for r in torch_runs.values()])),
        "ink_overlap_mean": float(np.mean(
            [r["ink_overlap_mean"] for r in torch_runs.values()])),
        "stroke_density": next(iter(torch_runs.values()))["stroke_density"],
    }

    j = score_run("siggan_tpu", jax_fakes, JAX_RUN, real, scorer,
                  lpips_params)
    j["fid_std_across_gen_seeds"] = j["fid_std"]
    report["sides"]["siggan_tpu"] = j

    with open(out_dir / "report.json", "w") as f:
        json.dump(report, f, indent=2)
    write_markdown(report, out_dir)


def write_markdown(report, out_dir):
    t = report["sides"]["torch_reference"]
    j = report["sides"]["siggan_tpu"]
    # Noise scale: the LARGEST spread observed on any axis (torch train-seed,
    # torch gen-seed, jax gen-seed) — the conservative yardstick for "within
    # noise" in either direction.
    sigma = max(t.get("fid_std_across_train_seeds", 0.0),
                t.get("fid_std_across_gen_seeds", 0.0),
                j.get("fid_std_across_gen_seeds", j.get("fid_std", 0.0)),
                1e-9)
    gap = abs(t["fid_mean"] - j["fid_mean"])
    if j["fid_mean"] + sigma < t["fid_mean"]:
        verdict = "siggan_tpu BEATS the torch reference at matched epochs"
    elif t["fid_mean"] + sigma < j["fid_mean"]:
        verdict = "torch reference beats siggan_tpu — investigate"
    else:
        verdict = "parity within noise (neither side separable)"
    per_run = "\n".join(
        f"| torch train-seed {s} | {r['fid_mean']:.1f} ± {r['fid_std']:.1f} "
        f"| {r['lpips_mean']:.4f} | {r['ink_overlap_mean']:.3f} |"
        for s, r in t["runs"].items())
    report_md = f"""# Torch-reference vs siggan_tpu quality parity (matched recipe)

Same data (1024 synthetic signatures), same recipe (64px, b64, z=100,
Adam 2e-4, smoothing 0.9, {report['epochs']} epochs), scored with ONE
random-init InceptionV3/LPIPS backbone ({report['n_samples']} samples x
{len(report['gen_seeds'])} generation seeds x
{len(report['torch_train_seeds'])} torch training seeds).

| | FID mean±std | LPIPS div | ink-fraction overlap vs real |
|---|---|---|---|
| real-vs-real floor | {report['floor_fid_real_vs_real']:.1f} | — | {report['ink_overlap_real_vs_real']:.3f} (ceiling) |
| uniform-noise ceiling | {report['noise_fid']:.1f} | — | — |
{per_run}
| **torch (mean of {len(t['runs'])} train seeds)** | {t['fid_mean']:.1f} ± {t['fid_std_across_train_seeds']:.1f} (train-seed) ± {t['fid_std_across_gen_seeds']:.1f} (gen-seed) | {t['lpips_mean']:.4f} | {t['ink_overlap_mean']:.3f} |
| **siggan_tpu** | {j['fid_mean']:.1f} ± {j['fid_std']:.1f} (gen-seed) | {j['lpips_mean']:.4f} | {j['ink_overlap_mean']:.3f} |

FID gap |torch − jax| = {gap:.1f} ({gap / sigma:.1f}x the largest spread on
any axis). Two-sided verdict: {verdict}
(BASELINE.json asks for FID within noise of the reference; lower is better).
"""
    (out_dir / "REPORT.md").write_text(report_md)
    print(report_md, flush=True)


if __name__ == "__main__":
    if "--render-only" in sys.argv:
        out_dir = pathlib.Path("docs/parity")
        write_markdown(json.loads((out_dir / "report.json").read_text()),
                       out_dir)
    else:
        main()
