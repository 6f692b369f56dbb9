"""`make_grid` / `save_image` with torchvision's documented semantics
(the argument combinations `/root/reference/src/utils/visualizer.py:120-130`
and `data_loader_signatures.py:509` use)."""
from __future__ import annotations

import math
from typing import Optional, Tuple

import torch


def make_grid(tensor: torch.Tensor, nrow: int = 8, padding: int = 2,
              normalize: bool = False,
              value_range: Optional[Tuple[float, float]] = None,
              scale_each: bool = False, pad_value: float = 0.0,
              **_ignored) -> torch.Tensor:
    """(N, C, H, W) -> (C, H_grid, W_grid) image grid."""
    t = tensor.detach().cpu().float().clone()
    if t.dim() == 3:
        t = t[None]
    if normalize:
        lo, hi = (value_range if value_range is not None
                  else (float(t.min()), float(t.max())))
        t = ((t - lo) / max(hi - lo, 1e-12)).clamp_(0.0, 1.0)
    n, c, h, w = t.shape
    ncol = min(nrow, n)
    nrows = int(math.ceil(n / ncol))
    grid = torch.full(
        (c, nrows * (h + padding) + padding, ncol * (w + padding) + padding),
        float(pad_value))
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[:, y:y + h, x:x + w] = t[idx]
    return grid


def save_image(tensor: torch.Tensor, fp, nrow: int = 8, padding: int = 2,
               normalize: bool = False,
               value_range: Optional[Tuple[float, float]] = None,
               pad_value: float = 0.0, **_ignored) -> None:
    import numpy as np
    from PIL import Image

    grid = make_grid(tensor, nrow=nrow, padding=padding, normalize=normalize,
                     value_range=value_range, pad_value=pad_value)
    arr = (grid.clamp(0, 1) * 255).round().byte().numpy()
    if arr.shape[0] == 1:
        img = Image.fromarray(arr[0], mode="L")
    else:
        img = Image.fromarray(arr.transpose(1, 2, 0))
    img.save(fp)
