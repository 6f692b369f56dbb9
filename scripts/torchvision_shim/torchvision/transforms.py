"""PIL/torch implementations of the transforms the reference uses.

Behavior matches torchvision's documented semantics for the exact argument
combinations in `/root/reference/src/data_loader_signatures.py:154-248`,
`signature_verifier_train.py` and `signature_verifier_eval.py`:
Resize (bilinear), RandomRotation(degrees, fill) (nearest),
RandomAffine(degrees=0, scale, fill) (nearest), RandomHorizontalFlip(p),
ToTensor, Normalize(mean, std), Grayscale, Compose.
"""
from __future__ import annotations

import math
import random
from typing import Sequence, Tuple

import numpy as np
import torch
from PIL import Image


class Compose:
    def __init__(self, transforms_list):
        self.transforms = list(transforms_list)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img

    def __repr__(self):
        return f"Compose({self.transforms!r})"


class Resize:
    def __init__(self, size, interpolation=None):
        if isinstance(size, int):
            size = (size, size)
        self.size = tuple(size)  # (h, w)

    def __call__(self, img: Image.Image) -> Image.Image:
        h, w = self.size
        return img.resize((w, h), Image.BILINEAR)


class Grayscale:
    def __init__(self, num_output_channels: int = 1):
        self.num_output_channels = num_output_channels

    def __call__(self, img: Image.Image) -> Image.Image:
        out = img.convert("L")
        if self.num_output_channels == 3:
            out = out.convert("RGB")
        return out


class RandomRotation:
    """Rotate by a uniform random angle in [-degrees, +degrees].

    torchvision default interpolation is NEAREST; `fill` paints the exposed
    corners (255 = white for signature scans).
    """

    def __init__(self, degrees, interpolation=None, expand=False,
                 center=None, fill=0):
        if isinstance(degrees, (int, float)):
            degrees = (-abs(float(degrees)), abs(float(degrees)))
        self.degrees = tuple(degrees)
        self.fill = fill

    def __call__(self, img: Image.Image) -> Image.Image:
        angle = random.uniform(self.degrees[0], self.degrees[1])
        return img.rotate(angle, resample=Image.NEAREST, expand=False,
                          fillcolor=self.fill)


class RandomAffine:
    """Random affine; the reference uses degrees=0 with scale=(lo, hi).

    Implemented for the general (degrees, translate, scale, shear) signature
    but only the paths the reference exercises are golden-tested.
    """

    def __init__(self, degrees, translate=None, scale=None, shear=None,
                 interpolation=None, fill=0):
        if isinstance(degrees, (int, float)):
            degrees = (-abs(float(degrees)), abs(float(degrees)))
        self.degrees = tuple(degrees)
        self.translate = translate
        self.scale = scale
        self.shear = shear
        self.fill = fill

    def __call__(self, img: Image.Image) -> Image.Image:
        angle = random.uniform(self.degrees[0], self.degrees[1])
        scale = (random.uniform(self.scale[0], self.scale[1])
                 if self.scale is not None else 1.0)
        tx = ty = 0.0
        if self.translate is not None:
            max_dx = self.translate[0] * img.size[0]
            max_dy = self.translate[1] * img.size[1]
            tx = random.uniform(-max_dx, max_dx)
            ty = random.uniform(-max_dy, max_dy)

        # PIL's Image.transform(AFFINE, m) maps OUTPUT (x,y) -> INPUT via
        # (a x + b y + c, d x + e y + f): build the inverse map about the
        # image center, exactly torchvision's convention.
        cx = img.size[0] * 0.5
        cy = img.size[1] * 0.5
        a_rad = math.radians(angle)
        cos_a, sin_a = math.cos(a_rad), math.sin(a_rad)
        inv_s = 1.0 / scale
        a = cos_a * inv_s
        b = sin_a * inv_s
        d = -sin_a * inv_s
        e = cos_a * inv_s
        c = cx - a * (cx + tx) - b * (cy + ty)
        f = cy - d * (cx + tx) - e * (cy + ty)
        return img.transform(img.size, Image.AFFINE, (a, b, c, d, e, f),
                             resample=Image.NEAREST, fillcolor=self.fill)


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img: Image.Image) -> Image.Image:
        if random.random() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class ToTensor:
    """PIL (H, W) or (H, W, C) uint8 -> torch float32 (C, H, W) in [0, 1]."""

    def __call__(self, img) -> torch.Tensor:
        if isinstance(img, torch.Tensor):
            return img
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[None, :, :]
        else:
            arr = arr.transpose(2, 0, 1)
        return torch.from_numpy(arr.astype(np.float32) / 255.0)


class Normalize:
    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = torch.tensor(list(mean), dtype=torch.float32)
        self.std = torch.tensor(list(std), dtype=torch.float32)

    def __call__(self, t: torch.Tensor) -> torch.Tensor:
        return (t - self.mean[:, None, None]) / self.std[:, None, None]


__all__ = [
    "Compose", "Resize", "Grayscale", "RandomRotation", "RandomAffine",
    "RandomHorizontalFlip", "ToTensor", "Normalize",
]
