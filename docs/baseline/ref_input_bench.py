"""Measure the reference's per-image input pipeline cost (host-side).

The reference trains through ``create_data_loader``
(data_loader_signatures.py:249): per image, PIL decode -> grayscale ->
resize to 64x64 -> RandomRotation(+-5, fill=255) -> RandomAffine(scale
0.9-1.1, fill=255) -> ToTensor -> Normalize. torchvision is not installed in
this environment, so this script reproduces the transform chain with the SAME
underlying PIL calls torchvision makes (transforms.functional rotate/affine
are PIL Image.rotate / Image.transform for PIL inputs), which is what
actually burns the CPU.

The number this produces is the per-worker images/sec an H100 host would get
running the reference DataLoader (num_workers defaults to 4,
data_loader_signatures.py:302) — the input-bound ceiling of the reference's
end-to-end training throughput on ANY accelerator.

Usage: python docs/baseline/ref_input_bench.py [--n 300]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import io
import json
import time

import numpy as np
from PIL import Image


def make_png_bytes(seed: int, size: int = 300) -> bytes:
    """A synthetic signature-like scan, typical of the dataset (~300px)."""
    rs = np.random.RandomState(seed)
    img = np.full((size, size), 255, np.uint8)
    y = size // 2
    for x in range(10, size - 10):
        y += rs.randint(-2, 3)
        y = int(np.clip(y, 20, size - 20))
        img[y - 2:y + 2, x] = rs.randint(0, 80)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def reference_transform_chain(png: bytes, rs: np.random.RandomState) -> np.ndarray:
    """data_loader_signatures.py:154-219 train transforms, via the same PIL
    primitives torchvision uses for PIL inputs."""
    img = Image.open(io.BytesIO(png)).convert("L")          # :125 grayscale
    img = img.resize((64, 64), Image.BILINEAR)              # Resize(64)
    angle = rs.uniform(-5, 5)                               # RandomRotation(5)
    img = img.rotate(angle, resample=Image.BILINEAR, fillcolor=255)
    scale = rs.uniform(0.9, 1.1)                            # RandomAffine scale
    w, h = img.size
    # torchvision affine(scale) = inverse-matrix PIL Image.transform
    m = 1.0 / scale
    cx, cy = w * 0.5, h * 0.5
    img = img.transform(
        (w, h), Image.AFFINE,
        (m, 0.0, cx - m * cx, 0.0, m, cy - m * cy),
        resample=Image.BILINEAR, fillcolor=255)
    arr = np.asarray(img, np.float32) / 255.0               # ToTensor
    return (arr - 0.5) / 0.5                                # Normalize(.5,.5)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    args = ap.parse_args()

    pngs = [make_png_bytes(i) for i in range(32)]
    rs = np.random.RandomState(0)

    for i in range(20):  # warmup
        reference_transform_chain(pngs[i % 32], rs)

    t0 = time.perf_counter()
    for i in range(args.n):
        reference_transform_chain(pngs[i % 32], rs)
    dt = time.perf_counter() - t0

    per_image_ms = dt / args.n * 1000.0
    print(json.dumps({
        "what": "reference DataLoader per-image transform chain (PIL), this host",
        "n": args.n,
        "per_image_ms": round(per_image_ms, 3),
        "images_per_sec_per_worker": round(args.n / dt, 1),
        "reference_num_workers_default": 4,
    }))


if __name__ == "__main__":
    main()
