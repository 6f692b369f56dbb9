"""LPIPS (AlexNet backbone) in JAX — perceptual diversity metric.

Port target: the ``lpips.LPIPS(net='alex')`` usage in
``utils/metrics.py:81-115`` — pairwise perceptual distance over a sliding
window of 10 following images; higher mean distance = more diverse samples.

Structure (richzhang/PerceptualSimilarity): input scaling layer, AlexNet conv
stack, features tapped after relu1..relu5, per-layer channel unit-
normalization, squared difference, learned 1x1 linear weights, spatial mean,
sum over layers.

Weights: ``convert_torch_state_dict`` ingests the lpips checkpoint when
available; the environment default is a FIXED-SEED random backbone with
uniform linear weights (valid as a relative diversity score; reports tag the
backbone used).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from siggan_tpu.ops.conv import conv2d

# (kh, cin, cout, stride, pad, pool_after)
_ALEX = [
    (11, 3, 64, 4, 2, True),
    (5, 64, 192, 1, 2, True),
    (3, 192, 384, 1, 1, False),
    (3, 384, 256, 1, 1, False),
    (3, 256, 256, 1, 1, False),
]

# lpips scaling layer constants
_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])


def init_params(seed: int = 0) -> Dict:
    key = jax.random.key(seed)
    params: Dict = {"convs": [], "lins": []}
    for k, cin, cout, _, _, _ in _ALEX:
        key, k1, k2 = jax.random.split(key, 3)
        params["convs"].append({
            "w": jax.random.normal(k1, (k, k, cin, cout)) * (1.0 / np.sqrt(k * k * cin)),
            "b": jnp.zeros((cout,)),
        })
        # lpips lin layers are non-negative 1x1 convs; uniform fallback
        params["lins"].append(jnp.full((cout,), 1.0 / cout))
    return params


from siggan_tpu.eval.inception import _maxpool3s2  # shared 3x3/s2 pool


def _features(params: Dict, x: jax.Array) -> List[jax.Array]:
    h = (x - _SHIFT) / _SCALE
    feats = []
    for p, (k, cin, cout, stride, pad, pool) in zip(params["convs"], _ALEX):
        h = jax.nn.relu(conv2d(h, p["w"], p["b"], stride=stride, padding=pad))
        feats.append(h)
        if pool:
            h = _maxpool3s2(h)
    return feats


def _unit_norm(f: jax.Array) -> jax.Array:
    return f * lax.rsqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True) + 1e-10)


def distance(params: Dict, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Batched LPIPS distance. x1, x2: (N, H, W, 3) in [-1, 1] -> (N,)."""
    f1s, f2s = _features(params, x1), _features(params, x2)
    total = 0.0
    for f1, f2, lin in zip(f1s, f2s, params["lins"]):
        d = jnp.square(_unit_norm(f1) - _unit_norm(f2))
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total


def _to_rgb(images: jax.Array) -> jax.Array:
    if images.shape[-1] == 1:
        images = jnp.repeat(images, 3, axis=-1)
    return images


def diversity(params: Dict, images: np.ndarray, window: int = 10,
              batch_pairs: int = 256) -> float:
    """Mean pairwise LPIPS over a sliding window (metrics.py:103-115):
    pairs (i, j) for j in (i, min(i+10, n))."""
    n = len(images)
    if n < 2:
        return 0.0
    idx1, idx2 = [], []
    for i in range(n):
        for j in range(i + 1, min(i + window, n)):
            idx1.append(i)
            idx2.append(j)
    from siggan_tpu.eval.common import batched_apply
    imgs = np.asarray(_to_rgb(jnp.asarray(images)))
    fn = jax.jit(lambda a, b: distance(params, a, b))
    dists = batched_apply(fn, imgs[np.asarray(idx1)], imgs[np.asarray(idx2)],
                          batch_size=batch_pairs)
    return float(np.mean(dists))


def convert_torch_state_dict(alex_sd: Dict, lin_sd: Dict) -> Dict:
    """Ingest torchvision alexnet.features.* weights + lpips lin weights."""
    def arr(v):
        return jnp.asarray(v.numpy() if hasattr(v, "numpy") else np.asarray(v))

    conv_ids = [0, 3, 6, 8, 10]  # indices in torchvision alexnet.features
    params: Dict = {"convs": [], "lins": []}
    for i, cid in enumerate(conv_ids):
        params["convs"].append({
            "w": jnp.transpose(arr(alex_sd[f"features.{cid}.weight"]), (2, 3, 1, 0)),
            "b": arr(alex_sd[f"features.{cid}.bias"]),
        })
        lin = arr(lin_sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params["lins"].append(jnp.reshape(lin, (-1,)))
    return params
