"""Shared eval plumbing.

``batched_apply`` is the one padded-batch inference loop: every feature
extractor here (Inception FID features, LPIPS distances, verifier scores)
runs a jitted forward over arbitrary-N inputs, and padding to a fixed batch
multiple keeps it at ONE compiled shape. Previously hand-rolled in three
places (fid.FIDScorer.features, lpips.diversity, verify.train.predict_scores)
— drift risk flagged by the round-3 review.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def batched_apply(fn, *arrays: np.ndarray, batch_size: int) -> np.ndarray:
    """Apply ``fn(*chunks)`` over aligned ``batch_size`` chunks of N-row
    arrays, padding the tail with zeros so every call has the same shape,
    and return the concatenated outputs trimmed back to N rows."""
    n = len(arrays[0])
    pad = (-n) % batch_size
    if pad:
        arrays = tuple(
            np.concatenate([np.asarray(a),
                            np.zeros((pad,) + a.shape[1:],
                                     np.asarray(a).dtype)])
            for a in arrays)
    else:
        arrays = tuple(np.asarray(a) for a in arrays)
    outs = []
    for s in range(0, n + pad, batch_size):
        outs.append(fn(*[jnp.asarray(a[s:s + batch_size]) for a in arrays]))
    return np.concatenate([np.asarray(jax.device_get(o)) for o in outs])[:n]
