"""Image export: PNG batches, in-memory ZIPs, contact sheets, post-processing.

Parity targets: PNG batch writer (``generate_signatures.py:50-94``,
``prefix_%06d.png``), in-memory ZIP (``api…py:504-525``,
``app…py:617-658``), contact sheet (``app…py:827``), and binarize/
transparency post-processing (``app…py:863-904``).
"""

from __future__ import annotations

import io
import zipfile
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image

from siggan_tpu.utils.visualizer import make_grid, to_uint8


def _to_pil(img: np.ndarray) -> Image.Image:
    """uint8 (H, W, 1|3) -> PIL."""
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    return Image.fromarray(img)


def save_pngs(images: np.ndarray, output_dir: str | Path,
              prefix: str = "signature", start_index: int = 0,
              denormalize: bool = True) -> List[Path]:
    """Write images as ``{prefix}_{i:06d}.png``; returns the paths."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    u8 = to_uint8(images) if denormalize else np.asarray(images, np.uint8)
    paths = []
    for i, img in enumerate(u8):
        p = out / f"{prefix}_{start_index + i:06d}.png"
        _to_pil(img).save(p)
        paths.append(p)
    return paths


def png_bytes(image: np.ndarray, denormalize: bool = True) -> bytes:
    u8 = to_uint8(image[None])[0] if denormalize else np.asarray(image, np.uint8)
    buf = io.BytesIO()
    _to_pil(u8).save(buf, format="PNG")
    return buf.getvalue()


def zip_bytes(images: np.ndarray, prefix: str = "signature",
              denormalize: bool = True) -> bytes:
    """In-memory ZIP of PNGs (the API's format=zip response body)."""
    u8 = to_uint8(images) if denormalize else np.asarray(images, np.uint8)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for i, img in enumerate(u8):
            zf.writestr(f"{prefix}_{i:06d}.png", png_bytes(img, denormalize=False))
    return buf.getvalue()


def contact_sheet(images: np.ndarray, path: str | Path, nrow: int = 8,
                  denormalize: bool = True) -> Path:
    u8 = to_uint8(images) if denormalize else np.asarray(images, np.uint8)
    grid = make_grid(u8, nrow=nrow)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    _to_pil(grid).save(path)
    return path


def postprocess_binarize(images: np.ndarray, threshold: int = 128,
                         transparent: bool = False) -> np.ndarray:
    """Binarize generated uint8 images; optionally white->transparent RGBA
    (the app's export post-processing, app…py:863-904)."""
    u8 = np.asarray(images, np.uint8)
    binary = np.where(u8 > threshold, 255, 0).astype(np.uint8)
    if not transparent:
        return binary
    if binary.ndim == 4 and binary.shape[-1] == 1:
        gray = binary[..., 0]
    else:
        gray = binary
    n, h, w = gray.shape
    rgba = np.zeros((n, h, w, 4), np.uint8)
    alpha = 255 - gray  # ink opaque, background transparent
    rgba[..., 3] = alpha
    return rgba
