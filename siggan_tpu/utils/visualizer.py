"""Visualization: sample grids, loss curves, progress GIFs, comparisons.

Parity with ``utils/visualizer.py:22-442`` (grid writer used by the trainer
every sample interval, loss plots from logger JSON, real-vs-fake panels,
interpolation strips, training GIFs, multi-run comparisons). Grids are pure
numpy+PIL (no torchvision); plots use matplotlib's Agg backend.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from PIL import Image  # noqa: E402


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1, 1] float (N, H, W, C) -> uint8 (N, H, W, C)."""
    x = (np.asarray(images, np.float32) + 1.0) * 127.5
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: int = 255) -> np.ndarray:
    """(N, H, W, C) uint8 -> (gh, gw, C) uint8 grid, white gutters."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.full(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        pad_value, np.uint8)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[i]
    return grid


def _save_png(arr: np.ndarray, path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
    return path


def save_sample_grid(images: np.ndarray, path: str | Path, nrow: int = 8,
                     denormalize: bool = True) -> Path:
    """Trainer hook: fixed-noise progress grid (reference :133)."""
    u8 = to_uint8(images) if denormalize else np.asarray(images, np.uint8)
    return _save_png(make_grid(u8, nrow), path)


def save_real_vs_fake(real: np.ndarray, fake: np.ndarray, path: str | Path,
                      n: int = 8) -> Path:
    """Side-by-side real|fake comparison panel (reference :180)."""
    r = to_uint8(real[:n])
    f = to_uint8(fake[:n])
    row_r = make_grid(r, nrow=n)
    row_f = make_grid(f, nrow=n)
    gap = np.full((6, row_r.shape[1], row_r.shape[2]), 128, np.uint8)
    return _save_png(np.concatenate([row_r, gap, row_f], axis=0), path)


def save_interpolation_strip(frames: np.ndarray, path: str | Path) -> Path:
    """Latent interpolation strip, one row per pair (reference :235)."""
    u8 = to_uint8(frames)
    return _save_png(make_grid(u8, nrow=u8.shape[0]), path)


def plot_losses(metrics: List[Dict], path: str | Path,
                keys: Sequence[str] = ("d_loss", "g_loss")) -> Optional[Path]:
    """Loss curves from logger entries (reference :22)."""
    if not metrics:
        return None
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    epochs = [m["epoch"] for m in metrics]
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for k in keys:
        vals = [m.get(k) for m in metrics]
        if any(v is not None for v in vals):
            ax.plot(epochs, vals, label=k)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_losses_from_json(log_json: str | Path, path: str | Path) -> Optional[Path]:
    data = json.loads(Path(log_json).read_text())
    return plot_losses(data.get("metrics", []), path)


def create_training_gif(sample_dir: str | Path, path: str | Path,
                        pattern: str = "*.png", duration_ms: int = 300,
                        max_frames: int = 100) -> Optional[Path]:
    """Animate the sample-grid progression (reference :285)."""
    files = sorted(Path(sample_dir).glob(pattern))[:max_frames]
    if not files:
        return None
    frames = [Image.open(f).convert("L") for f in files]
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=duration_ms, loop=0)
    return path


def save_progress_montage(sample_dir: str | Path, path: str | Path,
                          max_panels: int = 8) -> Optional[Path]:
    """Side-by-side strip of evenly-spaced epoch grids with epoch labels —
    the per-epoch training-progress montage (reference :400)."""
    files = sorted(Path(sample_dir).glob("epoch_*.png"))
    if not files:
        return None
    if len(files) > max_panels:
        idx = np.linspace(0, len(files) - 1, max_panels).round().astype(int)
        files = [files[i] for i in idx]
    fig, axes = plt.subplots(1, len(files), figsize=(2.2 * len(files), 2.6))
    if len(files) == 1:
        axes = [axes]
    for ax, f in zip(axes, files):
        ax.imshow(np.asarray(Image.open(f).convert("L")), cmap="gray")
        ax.set_title(f.stem.replace("epoch_", "epoch "), fontsize=8)
        ax.axis("off")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_run_comparison(runs: Dict[str, List[Dict]], path: str | Path,
                        key: str = "g_loss") -> Optional[Path]:
    """Overlay one metric across multiple runs (reference :349)."""
    if not runs:
        return None
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for name, metrics in runs.items():
        xs = [m["epoch"] for m in metrics if key in m]
        ys = [m[key] for m in metrics if key in m]
        if xs:
            ax.plot(xs, ys, label=name)
    ax.set_xlabel("epoch")
    ax.set_ylabel(key)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
