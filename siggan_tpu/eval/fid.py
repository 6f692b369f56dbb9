"""Frechet Inception Distance.

Parity with ``utils/metrics.py:49-78``: InceptionV3 pooled features for real
and fake sets, mean/cov, Frechet distance with the matrix sqrt on host
(scipy.linalg.sqrtm — O(2048^3) once, not a hot path). Feature extraction is
batched and jitted on device.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from siggan_tpu.eval import inception


class FIDScorer:
    def __init__(self, params: Optional[Dict] = None, batch_size: int = 32):
        self.backbone = "torchvision" if params is not None else "random-init"
        self.params = params if params is not None else inception.init_params()
        self.batch_size = batch_size
        self._extract = jax.jit(
            lambda x: inception.apply(self.params, inception.prepare_images(x)))

    def features(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 1|3) in [-1, 1] -> (N, 2048)."""
        imgs = jnp.asarray(images, jnp.float32)
        outs = []
        n = imgs.shape[0]
        b = self.batch_size
        pad = (-n) % b
        if pad:
            imgs = jnp.concatenate([imgs, jnp.zeros((pad,) + imgs.shape[1:])],
                                   axis=0)
        for s in range(0, imgs.shape[0], b):
            outs.append(self._extract(imgs[s:s + b]))
        feats = np.asarray(jax.device_get(jnp.concatenate(outs, axis=0)))
        return feats[:n]

    def fid(self, real: np.ndarray, fake: np.ndarray) -> float:
        fr, ff = self.features(real), self.features(fake)
        if self.backbone == "random-init":
            # Standardize both sets by the REAL set's per-dim stats: a fixed
            # affine transform (still a valid Frechet metric, 0 for identical
            # sets) that conditions random features — without it the
            # random backbone compresses real-vs-fake and real-vs-noise
            # distances into a narrow band. Values are comparable across
            # runs of this backbone but NOT against torchvision-FID bands.
            mu, sd = fr.mean(axis=0), fr.std(axis=0) + 1e-6
            fr = (fr - mu) / sd
            ff = (ff - mu) / sd
        return frechet_distance(fr, ff)


def frechet_distance(feat1: np.ndarray, feat2: np.ndarray) -> float:
    """Frechet distance via the exact factored identity.

    The textbook form (used by the reference, metrics.py:49-78) computes
    sqrtm(s1 @ s2) of 2048x2048 covariances, which is numerically unstable
    whenever n_samples < feature_dim (rank-deficient covariances — scipy's
    sqrtm returns finite garbage). With centered, 1/sqrt(n-1)-scaled data
    matrices A, B (so s_i = A^T A), the nonzero eigenvalues of s1 @ s2 are
    the squared singular values of A @ B^T, hence
        tr sqrtm(s1 @ s2) = sum svdvals(A @ B^T)
    — exact, stable at any sample count, and an (n1 x n2) SVD instead of a
    2048^2 matrix square root. Identical sets give exactly 0.
    """
    feat1 = np.asarray(feat1, np.float64)
    feat2 = np.asarray(feat2, np.float64)
    mu1, mu2 = feat1.mean(axis=0), feat2.mean(axis=0)
    a = (feat1 - mu1) / np.sqrt(max(len(feat1) - 1, 1))
    b = (feat2 - mu2) / np.sqrt(max(len(feat2) - 1, 1))
    diff = mu1 - mu2
    tr1 = float(np.sum(a * a))           # tr(s1)
    tr2 = float(np.sum(b * b))           # tr(s2)
    tr_mean = float(np.sum(linalg.svdvals(a @ b.T)))
    fid = float(diff @ diff) + tr1 + tr2 - 2.0 * tr_mean
    return max(fid, 0.0)
