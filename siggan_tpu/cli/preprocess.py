"""Offline preprocessing CLI.

Parity with ``preprocess_signatures.py:481-723`` (batch driver + CLI): clean a
directory of raw signature scans into training-ready images. The compute runs
as the batched device pipeline (``siggan_tpu.data.preprocess``) — the host
only decodes and letterboxes.

Usage:
    python -m siggan_tpu.cli.preprocess --input_dir raw/ --output_dir clean/ \
        [--target_size 64] [--binarize] [--no_center] ...
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def parse_arguments(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Preprocess raw signature scans")
    p.add_argument("--input_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--target_size", type=int, default=64)
    p.add_argument("--canvas_size", type=int, default=512,
                   help="letterbox working resolution for variable-size scans")
    p.add_argument("--binarize", action="store_true")
    p.add_argument("--no_normalize", action="store_true",
                   help="write uint8 PNGs without CLAHE->[-1,1] (PNGs are "
                        "always written denormalized; this skips CLAHE)")
    p.add_argument("--no_crop", action="store_true")
    p.add_argument("--no_center", action="store_true")
    p.add_argument("--no_denoise", action="store_true")
    p.add_argument("--no_validate", action="store_true")
    p.add_argument("--batch_size", type=int, default=64)
    return p.parse_args(argv)


def load_canvas(path: Path, canvas: int) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode to grayscale and letterbox onto a white (canvas, canvas) array.
    Images larger than the canvas are downscaled (aspect preserved) first."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("L")
        w, h = im.size
        if max(w, h) > canvas:
            s = canvas / max(w, h)
            w, h = max(1, int(w * s)), max(1, int(h * s))
            im = im.resize((w, h), Image.BILINEAR)
        arr = np.asarray(im, np.float32)
    out = np.full((canvas, canvas), 255.0, np.float32)
    out[:h, :w] = arr
    return out, (h, w)


def main(argv=None) -> int:
    from siggan_tpu.core.platform import setup
    setup()
    args = parse_arguments(argv)

    import jax.numpy as jnp

    from siggan_tpu.data.dataset import list_images
    from siggan_tpu.data.preprocess import denormalize_pixels, preprocess_batch_device
    from PIL import Image

    paths = list_images(args.input_dir)
    if not paths:
        print(f"No images found under {args.input_dir}", file=sys.stderr)
        return 1
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    flags = dict(target_size=args.target_size, binarize=args.binarize,
                 normalize=not args.no_normalize,
                 remove_margin=not args.no_crop, center=not args.no_center,
                 denoise=not args.no_denoise, validate=not args.no_validate)

    n_ok = n_invalid = 0
    report = {"processed": [], "invalid": [], "flags": flags}
    B = args.batch_size
    for start in range(0, len(paths), B):
        chunk = paths[start:start + B]
        canvases, hws = zip(*(load_canvas(p, args.canvas_size) for p in chunk))
        # pad the tail chunk to the full batch so the jit shape is stable
        pad = B - len(chunk)
        canv = np.stack(canvases + (canvases[-1],) * pad)
        hw = np.asarray(list(hws) + [hws[-1]] * pad, np.int32)
        imgs, valid = preprocess_batch_device(
            jnp.asarray(canv), jnp.asarray(hw), **flags)
        imgs = np.asarray(denormalize_pixels(imgs) if not args.no_normalize
                          else np.clip(np.asarray(imgs), 0, 255).astype(np.uint8))
        valid = np.asarray(valid)
        for i, p in enumerate(chunk):
            if flags["validate"] and not valid[i]:
                n_invalid += 1
                report["invalid"].append(p.name)
                continue
            Image.fromarray(imgs[i]).save(out_dir / f"{p.stem}.png")
            report["processed"].append(p.name)
            n_ok += 1
        print(f"\r{start + len(chunk)}/{len(paths)} "
              f"(ok {n_ok}, invalid {n_invalid})", end="", flush=True)
    print()
    (out_dir / "preprocess_report.json").write_text(json.dumps(report, indent=2))
    print(f"Done: {n_ok} written, {n_invalid} rejected -> {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
