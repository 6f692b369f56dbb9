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
    def __init__(self, params: Optional[Dict] = None, batch_size: int = 32,
                 extract_fn=None, backbone: Optional[str] = None):
        """Default: InceptionV3 features (converted torchvision weights when
        ``params`` is given, fixed-seed random init otherwise). A custom
        ``extract_fn`` (images -> (N, D) features) with a ``backbone`` tag
        plugs in alternative feature spaces — see ``make_scorer``."""
        if extract_fn is not None:
            self.backbone = backbone or "custom"
            self._extract = jax.jit(extract_fn)
        else:
            self.backbone = "torchvision" if params is not None else "random-init"
            self.params = params if params is not None else inception.init_params()
            self._extract = jax.jit(
                lambda x: inception.apply(self.params,
                                          inception.prepare_images(x)))
        self.batch_size = batch_size

    def features(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 1|3) in [-1, 1] -> (N, D)."""
        from siggan_tpu.eval.common import batched_apply
        return batched_apply(self._extract,
                             np.asarray(images, np.float32),
                             batch_size=self.batch_size)

    def kid(self, real: np.ndarray, fake: np.ndarray) -> Dict[str, float]:
        """Kernel Inception Distance in this scorer's feature space (same
        real-set standardization as ``fid`` on the random backbone)."""
        fr, ff = self._conditioned_features(real, fake)
        return kernel_distance(fr, ff)

    def fid(self, real: np.ndarray, fake: np.ndarray) -> float:
        fr, ff = self._conditioned_features(real, fake)
        return frechet_distance(fr, ff)

    def fid_from_features(self, fr: np.ndarray, fake: np.ndarray) -> float:
        """FID against a PRE-EXTRACTED real feature matrix (``features()``
        output, un-conditioned). Identical math/value to ``fid`` — the
        real-set extraction is deterministic for a fixed set, so callers
        scoring many fake batches against one fixed real set (the trainer's
        per-epoch selection FID) can hoist it out of the loop."""
        ff = self.features(fake)
        fr, ff = self._condition(np.asarray(fr), ff)
        return frechet_distance(fr, ff)

    def _conditioned_features(self, real: np.ndarray, fake: np.ndarray):
        return self._condition(self.features(real), self.features(fake))

    def _condition(self, fr: np.ndarray, ff: np.ndarray):
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
        return fr, ff


def make_scorer(spec: str = "random-init", batch_size: int = 32) -> FIDScorer:
    """Build a FID scorer from a backbone spec string.

    - ``"random-init"`` (default): fixed-seed random InceptionV3 — relative
      metric, standardized by the real set's feature stats.
    - ``"torchvision:<state_dict.pt>"``: converted pretrained InceptionV3,
      comparable to the reference's absolute FID bands
      (``/root/reference/src/utils/metrics.py:23-46``).
    - ``"verifier:<ckpt.pkl>"``: DOMAIN-TRAINED backbone — the 512-d hidden
      features of a signature-verifier CNN encoder trained in-environment
      on real signatures (``siggan_tpu/verify``). Trained features
      rank-order quality far closer to pretrained-Inception FID than random
      features do (VERDICT r2 #4); values form their own band (report the
      real-vs-real floor alongside). Images are resized to the encoder's
      64px input when needed.
    """
    if spec in (None, "", "random-init"):
        return FIDScorer(batch_size=batch_size)
    kind, _, path = spec.partition(":")
    if kind == "torchvision":
        import torch

        from siggan_tpu.eval.inception import convert_torch_state_dict
        from siggan_tpu.eval.manifests import (INCEPTION_V3_REQUIRED,
                                               INCEPTION_V3_SD,
                                               check_state_dict)
        sd = torch.load(path, map_location="cpu", weights_only=True)
        # Fail loudly (readable key/shape diff) on a wrong/truncated file
        # before the converter touches it — see eval/manifests.py.
        check_state_dict(sd, INCEPTION_V3_SD, required=INCEPTION_V3_REQUIRED,
                         label=f"torchvision:{path}")
        return FIDScorer(params=convert_torch_state_dict(sd),
                         batch_size=batch_size)
    if kind == "verifier":
        from siggan_tpu.verify.models import encode
        from siggan_tpu.verify.train import load_verifier
        snap = load_verifier(path)
        params = jax.tree_util.tree_map(jnp.asarray, snap["params"])
        bn = jax.tree_util.tree_map(jnp.asarray, snap["bn"])

        def extract(x):
            if x.shape[-1] != 1:
                x = jnp.mean(x, axis=-1, keepdims=True)
            if x.shape[1] != 64 or x.shape[2] != 64:
                x = jax.image.resize(x, (x.shape[0], 64, 64, 1), "bilinear")
            feats, _ = encode(params, bn, x, train=False, return_hidden=True)
            return feats

        return FIDScorer(extract_fn=extract, backbone=f"verifier:{path}",
                         batch_size=batch_size)
    raise ValueError(f"unknown FID backbone spec: {spec!r}")


def feature_diversity(scorer: FIDScorer, images: np.ndarray,
                      window: int = 10) -> float:
    """Mean pairwise L2 feature distance over the reference's sliding
    window-of-10 pair scheme (``utils/metrics.py:103-115``) in the scorer's
    feature space — the trained-backbone analogue of LPIPS diversity."""
    n = len(images)
    if n < 2:
        return 0.0
    feats = scorer.features(np.asarray(images))
    dists = []
    for i in range(n):
        for j in range(i + 1, min(i + window, n)):
            dists.append(float(np.linalg.norm(feats[i] - feats[j])))
    return float(np.mean(dists))


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


def kernel_distance(feat1: np.ndarray, feat2: np.ndarray,
                    n_subsets: int = 10, subset_size: Optional[int] = None,
                    seed: int = 0) -> Dict[str, float]:
    """Kernel Inception Distance (Binkowski et al. 2018): unbiased MMD^2
    with the cubic polynomial kernel k(x, y) = (x.y/d + 1)^3, averaged over
    random subsets. Unlike FID's Gaussian assumption, the estimator is
    unbiased at ANY sample count — the right companion metric when n is
    small relative to the feature dim (the regime every in-env eval here
    runs in). Complements the reference's FID (utils/metrics.py:49-78).

    Returns {"mean", "std"} over subsets (can be slightly negative for
    identical/near-identical sets — that is the unbiasedness, not a bug).
    """
    f1 = np.asarray(feat1, np.float64)
    f2 = np.asarray(feat2, np.float64)
    if min(len(f1), len(f2)) < 2:
        # The unbiased estimator divides by m*(m-1); a single sample has
        # no within-set term at all.
        raise ValueError("kernel_distance requires >= 2 samples per set")
    d = f1.shape[1]
    m = (min(subset_size, len(f1), len(f2)) if subset_size
         else min(len(f1), len(f2), 100))
    rs = np.random.RandomState(seed)
    vals = []
    for _ in range(n_subsets):
        x = f1[rs.choice(len(f1), m, replace=False)]
        y = f2[rs.choice(len(f2), m, replace=False)]
        kxx = (x @ x.T / d + 1.0) ** 3
        kyy = (y @ y.T / d + 1.0) ** 3
        kxy = (x @ y.T / d + 1.0) ** 3
        sum_off = lambda k: (k.sum() - np.trace(k)) / (m * (m - 1))
        vals.append(sum_off(kxx) + sum_off(kyy) - 2.0 * kxy.mean())
    return {"mean": float(np.mean(vals)), "std": float(np.std(vals))}


def precision_recall(real_feats: np.ndarray, fake_feats: np.ndarray,
                     k: int = 3) -> Dict[str, float]:
    """Improved precision & recall for distributions (Kynkaanniemi et al.
    2019): k-NN-radius manifold estimates in feature space.

    precision = fraction of FAKE samples inside the real manifold (fidelity);
    recall    = fraction of REAL samples inside the fake manifold (coverage/
    diversity). Decomposes a single FID number into the two failure modes a
    GAN actually has — mode dropping shows up as low recall even when
    precision (and FID) look fine. Identical sets give 1.0/1.0.
    """
    r = np.asarray(real_feats, np.float64)
    f = np.asarray(fake_feats, np.float64)

    def pairwise(a, b):
        return np.sqrt(np.maximum(
            (a * a).sum(1)[:, None] + (b * b).sum(1)[None] - 2 * a @ b.T, 0))

    def knn_radius(a):
        d = pairwise(a, a)
        np.fill_diagonal(d, np.inf)
        return np.sort(d, axis=1)[:, k - 1]          # distance to k-th NN

    r_rad, f_rad = knn_radius(r), knn_radius(f)
    d_fr = pairwise(f, r)                             # fake x real
    precision = float((d_fr <= r_rad[None]).any(axis=1).mean())
    recall = float((d_fr.T <= f_rad[None]).any(axis=1).mean())
    return {"precision": precision, "recall": recall}
