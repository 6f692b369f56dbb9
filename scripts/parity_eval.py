"""Quality-parity experiment: reference PyTorch vs siggan_tpu, matched recipe.

Both sides trained on the SAME data (/tmp/parity_data, 1024 synthetic
signatures), SAME recipe (64px, batch 64, z=100, Adam 2e-4 b(0.5,0.999),
label smoothing 0.9, n_critic 1, 25 epochs):
  torch: scripts/parity_torch_train.py -> /tmp/parity_torch (reference's own
         GANTrainer, run in-env on CPU)
  jax:   python -m siggan_tpu.cli.train -> /tmp/parity_jax (TPU)

This script scores BOTH with the same metric stack (random-init InceptionV3
FID + LPIPS-alex diversity + stroke stats — identical backbone weights for
every measurement), multi-seed over generation, plus two controls:
real-vs-real floor and a uniform-noise ceiling. Writes docs/parity/.

This is the BASELINE.json "FID within noise of the PyTorch reference at
matched epochs" evidence (VERDICT r1 #3); reference protocol:
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

SEEDS = [101, 202, 303]
N = 1024


def load_reals(data_dir="/tmp/parity_data"):
    from PIL import Image
    paths = sorted(pathlib.Path(data_dir).glob("*.png"))
    imgs = np.stack([
        np.asarray(Image.open(p).convert("L"), np.float32) / 127.5 - 1.0
        for p in paths])[..., None]
    return imgs


def torch_fakes(ckpt, seed, n=N):
    import torch
    from utils.inference import generate_signatures_batch, load_generator
    gen, latent_dim = load_generator(ckpt, device="cpu")
    images = generate_signatures_batch(
        generator=gen, n_samples=n, latent_dim=latent_dim, device="cpu",
        batch_size=128, seed=seed)
    # list of PIL 'L' images -> (N, H, W, 1) in [-1, 1]
    arr = np.stack([np.asarray(im, np.float32) for im in images])
    return (arr / 127.5 - 1.0)[..., None]


def jax_fakes(run_dir, seed, n=N):
    from siggan_tpu.infer.generate import load_session
    sess = load_session(f"{run_dir}/checkpoints", "latest")
    return sess.sample(n, seed=seed, batch_size=128)


def main():
    from siggan_tpu.eval import lpips as lpips_mod
    from siggan_tpu.eval.evaluate import compute_metrics
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
    print(f"FID floor (real vs real): {floor:.1f}  noise ceiling: {ceiling:.1f}",
          flush=True)

    report = {"floor_fid_real_vs_real": floor, "noise_fid": ceiling,
              "n_samples": N, "seeds": SEEDS, "epochs": 25,
              "sides": {}}
    for side, fn, src in [
        ("torch_reference", torch_fakes, "/tmp/parity_torch/checkpoints/checkpoint_latest.pt"),
        ("siggan_tpu", jax_fakes, "/tmp/parity_jax"),
    ]:
        fids, lps, metrics = [], [], None
        for seed in SEEDS:
            fake = np.asarray(fn(src, seed), np.float32)
            metrics = compute_metrics(real, fake, inception_params=scorer.params
                                      if hasattr(scorer, "params") else None,
                                      lpips_params=lpips_params)
            fids.append(scorer.fid(real, fake))
            lps.append(float(metrics.get("lpips_diversity", float("nan"))))
            print(f"{side} seed {seed}: FID {fids[-1]:.1f} "
                  f"LPIPS {lps[-1]:.4f}", flush=True)
        report["sides"][side] = {
            "fid_mean": float(np.mean(fids)), "fid_std": float(np.std(fids)),
            "fid_per_seed": [float(f) for f in fids],
            "lpips_mean": float(np.nanmean(lps)),
            "stroke_density": metrics.get("stroke_density"),
            "foreground_ratio": metrics.get("foreground_ratio"),
        }

    with open(out_dir / "report.json", "w") as f:
        json.dump(report, f, indent=2)
    write_markdown(report, out_dir)


def write_markdown(report, out_dir):
    t = report["sides"]["torch_reference"]
    j = report["sides"]["siggan_tpu"]
    sigma = max(t["fid_std"], j["fid_std"], 1e-9)
    gap = abs(t["fid_mean"] - j["fid_mean"])
    report_md = f"""# Torch-reference vs siggan_tpu quality parity (matched recipe)

Same data (1024 synthetic signatures), same recipe (64px, b64, z=100,
Adam 2e-4, smoothing 0.9, 25 epochs), scored with ONE random-init
InceptionV3/LPIPS backbone ({N} samples x {len(SEEDS)} generation seeds).

| | FID mean±std | LPIPS div | stroke density (fake/real) |
|---|---|---|---|
| real-vs-real floor | {report['floor_fid_real_vs_real']:.1f} | — | — |
| uniform-noise ceiling | {report['noise_fid']:.1f} | — | — |
| torch reference | {t['fid_mean']:.1f} ± {t['fid_std']:.1f} | {t['lpips_mean']:.4f} | {t['stroke_density']['fake']['mean']:.4f} / {t['stroke_density']['real']['mean']:.4f} |
| siggan_tpu | {j['fid_mean']:.1f} ± {j['fid_std']:.1f} | {j['lpips_mean']:.4f} | {j['stroke_density']['fake']['mean']:.4f} / {j['stroke_density']['real']['mean']:.4f} |

FID gap |torch − jax| = {gap:.1f} ({gap / sigma:.1f}x the larger per-side std).
Verdict: {"siggan_tpu BEATS the torch reference at matched epochs"
          if j['fid_mean'] + sigma < t['fid_mean'] else
          ("parity within noise" if gap <= 2 * sigma else
           "siggan_tpu is WORSE — investigate")}
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
