"""Host-side dataset: glob -> decode -> memory-resident [-1,1] arrays.

Replaces ``data_loader_signatures.py:42-151`` (SignatureDataset). Signature
datasets are small (thousands of 64/128px grayscale images), so the whole set
is decoded once into a contiguous float32 array — after which the *entire*
epoch pipeline (shuffle, batch, augment) is device-side. A ``.npy`` cache
beside the data directory makes re-runs decode-free. Corrupt files fall back
to a zero image with a warning, exactly like the reference (:139), so a bad
file never kills a long run.
"""

from __future__ import annotations

import hashlib
import logging
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)

# Reference extension list (data_loader_signatures.py:39).
IMAGE_EXTENSIONS = {".png", ".jpg", ".jpeg", ".bmp", ".tiff", ".tif"}


def list_images(data_dir: str | Path, recursive: bool = True) -> List[Path]:
    root = Path(data_dir)
    if not root.is_dir():
        raise FileNotFoundError(f"data_dir does not exist: {root}")
    it = root.rglob("*") if recursive else root.glob("*")
    return sorted(p for p in it if p.suffix.lower() in IMAGE_EXTENSIONS)


def decode_image(path: Path, image_size: int) -> np.ndarray:
    """Grayscale decode + bilinear resize to (s, s), scaled to [-1, 1]."""
    try:
        with Image.open(path) as im:
            im = im.convert("L")
            if im.size != (image_size, image_size):
                im = im.resize((image_size, image_size), Image.BILINEAR)
            arr = np.asarray(im, np.float32)
    except Exception as e:  # zero-image fallback (reference :139)
        logger.warning("failed to decode %s (%s); using zero image", path, e)
        return np.zeros((image_size, image_size, 1), np.float32)
    return (arr / 255.0 * 2.0 - 1.0)[:, :, None]


class SignatureDataset:
    """All images resident as one (N, s, s, 1) float32 array in [-1, 1]."""

    def __init__(self, data_dir: str | Path, image_size: int = 64,
                 use_cache: bool = True, max_images: Optional[int] = None):
        self.data_dir = Path(data_dir)
        self.image_size = image_size
        self.paths = list_images(data_dir)
        if max_images is not None:
            self.paths = self.paths[:max_images]
        if not self.paths:
            raise ValueError(f"no images found under {data_dir}")
        self.images = self._load(use_cache)

    def writer_labels(self):
        """(labels (N,) int32, class_names) from per-user SUBDIRECTORIES of
        data_dir — the grouping convention the verifier pipelines already use
        (``signature_verifier_train.py:261-316``). Conditional (v2.0)
        training consumes these. Raises if images sit directly in data_dir.
        """
        names = sorted({p.parent.name for p in self.paths
                        if p.parent != self.data_dir})
        direct = [p for p in self.paths if p.parent == self.data_dir]
        if direct or not names:
            raise ValueError(
                "conditional training expects per-writer subdirectories "
                f"under {self.data_dir}")
        index = {n: i for i, n in enumerate(names)}
        labels = np.asarray([index[p.parent.name] for p in self.paths],
                            np.int32)
        return labels, names

    def _cache_path(self) -> Path:
        sig = hashlib.sha1(
            ("|".join(f"{p.name}:{p.stat().st_size}" for p in self.paths)
             + f"@{self.image_size}").encode()).hexdigest()[:16]
        return self.data_dir / f".siggan_cache_{self.image_size}_{sig}.npy"

    def _load(self, use_cache: bool) -> np.ndarray:
        cache = self._cache_path()
        if use_cache and cache.exists():
            arr = np.load(cache)
            if arr.shape[0] == len(self.paths):
                return arr
        arr = self._decode_all()
        if use_cache:
            try:
                np.save(cache, arr)
            except OSError as e:
                logger.warning("could not write dataset cache: %s", e)
        return arr

    def _decode_all(self) -> np.ndarray:
        """Prefer the threaded native C++ decoder; PIL per-file fallback.

        Failed native decodes fall back to PIL individually, which applies
        the zero-image contract for genuinely corrupt files.
        """
        from siggan_tpu.data.native import loader as native

        if native.available():
            try:
                u8, statuses = native.decode_batch(self.paths, self.image_size)
                arr = (u8.astype(np.float32) / 255.0 * 2.0 - 1.0)[..., None]
                for i in np.nonzero(statuses != 0)[0]:
                    arr[i] = decode_image(self.paths[i], self.image_size)
                return arr
            except (RuntimeError, OSError) as e:
                logger.warning("native decode failed (%s); using PIL", e)
        return np.stack([decode_image(p, self.image_size) for p in self.paths])

    def __len__(self) -> int:
        return len(self.paths)

    def statistics(self) -> dict:
        """Dataset stats (reference loader's get_dataset_statistics helper)."""
        x = self.images
        return {
            "num_images": len(self),
            "image_size": self.image_size,
            "mean": float(x.mean()), "std": float(x.std()),
            "min": float(x.min()), "max": float(x.max()),
        }


def train_val_split(ds: SignatureDataset, val_fraction: float = 0.1,
                    seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic shuffled split (reference create_train_val_loaders:324)."""
    n = len(ds)
    idx = np.random.RandomState(seed).permutation(n)
    n_val = int(n * val_fraction)
    return ds.images[idx[n_val:]], ds.images[idx[:n_val]]
