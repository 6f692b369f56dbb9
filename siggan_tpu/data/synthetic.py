"""Synthetic signature dataset generator.

The build environment bundles no real signature scans, so quality runs and
the torch-vs-jax parity experiment (BASELINE.md) train on synthetic
signatures. These are deliberately DIVERSE — cursive-like multi-stroke paths
with varying slant, amplitude, loop structure, stroke count, thickness, and
optional underline flourishes — because a too-uniform dataset makes mode
collapse indistinguishable from convergence (round-1 lesson: LPIPS diversity
of the data itself must be well above the metric floor before generator
diversity means anything).

Output matches the offline preprocessor's contract
(``preprocess_signatures.py:402`` semantics): white background, dark ink,
[-1, 1] float32, (N, size, size, 1), ink ratio within the reference's
validity band (``is_valid_signature``, :316).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def _smooth(v: np.ndarray, k: int) -> np.ndarray:
    """Box-smooth a 1-D path (cheap spline substitute)."""
    if k <= 1:
        return v
    pad = np.pad(v, (k, k), mode="edge")
    ker = np.ones(2 * k + 1) / (2 * k + 1)
    return np.convolve(pad, ker, mode="same")[k:-k]


def _stamp(canvas: np.ndarray, px: np.ndarray, py: np.ndarray,
           ink: np.ndarray) -> None:
    """Bilinear-splat ink along a sampled path."""
    size = canvas.shape[0]
    x0 = np.floor(px).astype(np.int32)
    y0 = np.floor(py).astype(np.int32)
    fx, fy = px - x0, py - y0
    for dy in (0, 1):
        for dx in (0, 1):
            w = (fx if dx else 1 - fx) * (fy if dy else 1 - fy) * ink
            xi = np.clip(x0 + dx, 0, size - 1)
            yi = np.clip(y0 + dy, 0, size - 1)
            np.add.at(canvas, (yi, xi), w)


def make_signature(rs: np.random.RandomState, size: int = 64) -> np.ndarray:
    """One signature image, float32 (size, size, 1) in [-1, 1]."""
    canvas = np.zeros((size, size), np.float32)
    slant = rs.uniform(-0.35, 0.35)           # per-signature shear
    baseline = size * rs.uniform(0.42, 0.58)
    amp = size * rs.uniform(0.10, 0.26)       # vertical letter amplitude
    n_strokes = rs.randint(1, 4)

    for _ in range(n_strokes):
        # A cursive-ish path: oscillating y over monotone x, plus loops.
        n_ctl = rs.randint(6, 14)
        x_start = rs.uniform(0.06, 0.25) * size
        x_end = rs.uniform(0.72, 0.94) * size
        cx = np.sort(rs.uniform(x_start, x_end, n_ctl))
        cy = baseline + rs.uniform(-1.0, 1.0, n_ctl) * amp
        # occasional ascender/descender spikes (letters like l, g, y)
        spikes = rs.rand(n_ctl) < 0.25
        cy[spikes] += rs.choice([-1.0, 1.0], spikes.sum()) * amp * rs.uniform(
            1.2, 2.0, spikes.sum())
        t = np.linspace(0.0, 1.0, n_ctl)
        tt = np.linspace(0.0, 1.0, 60 * n_ctl)
        px = _smooth(np.interp(tt, t, cx), 25)
        py = _smooth(np.interp(tt, t, cy), 25)
        # loops: superimpose a small rotating component
        if rs.rand() < 0.6:
            freq = rs.uniform(2.0, 6.0) * np.pi
            phase = rs.uniform(0, 2 * np.pi)
            r = rs.uniform(0.05, 0.16) * size
            px = px + r * np.cos(freq * tt + phase) * tt * (1 - tt) * 4
            py = py + r * np.sin(freq * tt + phase) * tt * (1 - tt) * 4
        px = px + slant * (baseline - py)      # shear
        ink = np.full(px.shape, rs.uniform(0.10, 0.22), np.float32)
        # pen pressure variation along the stroke
        ink *= 0.7 + 0.3 * np.abs(np.sin(tt * rs.uniform(4, 12)))
        # pen width: splat the nib at sub-pixel offsets for thicker lines
        width = rs.uniform(0.3, 0.8)
        for ox, oy in ((0.0, 0.0), (width, 0.0), (0.0, width)):
            _stamp(canvas, px + ox, py + oy, ink)

    # underline flourish
    if rs.rand() < 0.35:
        tt = np.linspace(0.0, 1.0, 240)
        ux = (0.15 + 0.7 * tt) * size
        uy = baseline + amp * rs.uniform(1.1, 1.6) + np.sin(
            tt * np.pi * rs.uniform(1, 2)) * rs.uniform(0.5, 2.0)
        for oy in (0.0, 0.6):
            _stamp(canvas, ux, uy + oy, np.full(ux.shape, 0.25, np.float32))

    # light blur for anti-aliased pen edges (3-tap separable)
    k = np.array([0.25, 0.5, 0.25], np.float32)
    canvas = np.apply_along_axis(
        lambda r: np.convolve(r, k, mode="same"), 0, canvas)
    canvas = np.apply_along_axis(
        lambda r: np.convolve(r, k, mode="same"), 1, canvas)
    ink01 = np.clip(canvas, 0.0, 1.0) ** rs.uniform(0.7, 1.0)
    img = 1.0 - 2.0 * ink01                   # white bg (+1) .. black ink (-1)
    return img.astype(np.float32)[..., None]


def generate_dataset(n: int, size: int = 64, seed: int = 0) -> np.ndarray:
    """(n, size, size, 1) float32 in [-1, 1], deterministic in ``seed``.

    Generation draws sequentially from one RandomState, so the first k
    images of a run are identical for every n >= k (prefix property).
    With ``SIGGAN_SYNTH_CACHE=<dir>`` set, generated arrays are memoized on
    disk per (size, seed) and prefixes of a larger cached array are served
    directly — experiment drivers regenerate the same 8–16k-image sets many
    times per wave, which costs minutes per run on a contended host."""
    cache_dir = os.environ.get("SIGGAN_SYNTH_CACHE")
    if cache_dir:
        path = Path(cache_dir) / f"synth_{size}px_seed{seed}.npy"
        if path.exists():
            try:
                arr = np.load(path, mmap_mode="r")
                if len(arr) >= n:
                    return np.array(arr[:n])
            except Exception:
                pass  # corrupt/partial cache file: regenerate below
    rs = np.random.RandomState(seed)
    out = np.stack([make_signature(rs, size) for _ in range(n)])
    if cache_dir:
        path = Path(cache_dir) / f"synth_{size}px_seed{seed}.npy"
        try:
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(f".tmp{os.getpid()}.npy")
            np.save(tmp, out)
            tmp.rename(path)  # atomic: concurrent readers never see partial
        except Exception:
            pass
    return out


def make_writer_signature(rs: np.random.RandomState, style: dict,
                          size: int = 64) -> np.ndarray:
    """One signature in a consistent per-writer STYLE (slant, baseline,
    amplitude band, stroke count, loop frequency) with per-sample jitter —
    the labeled data for conditional (v2.0) training."""
    canvas = np.zeros((size, size), np.float32)
    slant = style["slant"] + rs.uniform(-0.05, 0.05)
    baseline = size * (style["baseline"] + rs.uniform(-0.02, 0.02))
    amp = size * style["amp"] * rs.uniform(0.9, 1.1)
    for _ in range(style["n_strokes"]):
        n_ctl = style["n_ctl"]
        cx = np.sort(rs.uniform(0.08 * size, 0.92 * size, n_ctl))
        cy = baseline + rs.uniform(-1.0, 1.0, n_ctl) * amp
        spikes = rs.rand(n_ctl) < style["spike_p"]
        cy[spikes] += np.sign(rs.rand(spikes.sum()) - 0.5) * amp * 1.6
        t = np.linspace(0.0, 1.0, n_ctl)
        tt = np.linspace(0.0, 1.0, 60 * n_ctl)
        px = _smooth(np.interp(tt, t, cx), 25)
        py = _smooth(np.interp(tt, t, cy), 25)
        r = style["loop_r"] * size
        px = px + r * np.cos(style["loop_f"] * tt) * tt * (1 - tt) * 4
        py = py + r * np.sin(style["loop_f"] * tt) * tt * (1 - tt) * 4
        px = px + slant * (baseline - py)
        ink = np.full(px.shape, style["ink"], np.float32)
        ink *= 0.7 + 0.3 * np.abs(np.sin(tt * style["pressure_f"]))
        for ox, oy in ((0.0, 0.0), (style["width"], 0.0), (0.0, style["width"])):
            _stamp(canvas, px + ox, py + oy, ink)
    k = np.array([0.25, 0.5, 0.25], np.float32)
    canvas = np.apply_along_axis(
        lambda r_: np.convolve(r_, k, mode="same"), 0, canvas)
    canvas = np.apply_along_axis(
        lambda r_: np.convolve(r_, k, mode="same"), 1, canvas)
    img = 1.0 - 2.0 * np.clip(canvas, 0.0, 1.0) ** style["gamma"]
    return img.astype(np.float32)[..., None]


def writer_style(rs: np.random.RandomState) -> dict:
    return {
        "slant": rs.uniform(-0.35, 0.35),
        "baseline": rs.uniform(0.42, 0.58),
        "amp": rs.uniform(0.10, 0.26),
        "n_strokes": rs.randint(1, 4),
        "n_ctl": rs.randint(6, 14),
        "spike_p": rs.uniform(0.1, 0.4),
        "loop_r": rs.uniform(0.05, 0.16),
        "loop_f": rs.uniform(2.0, 6.0) * np.pi,
        "ink": rs.uniform(0.10, 0.22),
        "pressure_f": rs.uniform(4, 12),
        "width": rs.uniform(0.3, 0.8),
        "gamma": rs.uniform(0.7, 1.0),
    }


def generate_labeled_dataset(n_writers: int, per_writer: int, size: int = 64,
                             seed: int = 0):
    """((n_writers*per_writer, size, size, 1) images, (N,) int32 labels):
    writer-consistent styles for conditional (v2.0) training.

    With ``SIGGAN_SYNTH_CACHE`` set, memoized on disk per exact
    (n_writers, per_writer, size, seed) — no prefix serving here: style
    draws interleave with image draws, so different shapes differ from
    image 0."""
    cache_dir = os.environ.get("SIGGAN_SYNTH_CACHE")
    path = None
    if cache_dir:
        path = (Path(cache_dir) /
                f"labeled_{n_writers}w{per_writer}_{size}px_seed{seed}.npz")
        if path.exists():
            try:
                z = np.load(path)
                return z["images"], z["labels"]
            except Exception:
                pass
    rs = np.random.RandomState(seed)
    imgs, labels = [], []
    for w in range(n_writers):
        style = writer_style(rs)
        for _ in range(per_writer):
            imgs.append(make_writer_signature(rs, style, size))
            labels.append(w)
    images, labels = np.stack(imgs), np.asarray(labels, np.int32)
    if path is not None:
        try:
            tmp = path.with_name(f"{path.stem}.tmp{os.getpid()}.npz")
            np.savez(tmp, images=images, labels=labels)
            tmp.rename(path)
        except Exception:
            pass
    return images, labels


def save_dataset_pngs(n: int, output_dir: str | Path, size: int = 64,
                      seed: int = 0) -> Path:
    """Materialize as PNG files (for CLIs / the torch parity run)."""
    from siggan_tpu.infer.export import save_pngs
    out = Path(output_dir)
    imgs = generate_dataset(n, size, seed)
    save_pngs(imgs, out, prefix="sig")
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--output_dir", required=True)
    a = ap.parse_args()
    out = save_dataset_pngs(a.n, a.output_dir, a.size, a.seed)
    print(f"wrote {a.n} images to {out}")
