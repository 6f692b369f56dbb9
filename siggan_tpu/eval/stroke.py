"""Stroke-statistics metrics — jitted device reductions.

Parity with ``utils/metrics.py:118-174``: stroke density (fraction of dark
pixels under a threshold after mapping to [0,1]) and foreground ratio with
percentiles, plus the MetricsTracker epoch accumulator (:177-213).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Union

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _dark_fractions(images: jax.Array, threshold: float = 0.5) -> jax.Array:
    """Every in-package producer (generator output, resident datasets,
    augmentation) works in [-1, 1], so the remap is unconditional. A
    batch-global ``min() < 0`` heuristic mis-scaled all-bright batches —
    exactly the blank/collapsed fakes the metric exists to expose (a
    near-white [-1,1] batch has every pixel >= 0 and was scored on the
    wrong scale). Callers holding [0,1] data map it themselves.
    """
    x = images.astype(jnp.float32)
    x = (x + 1.0) / 2.0                                 # [-1,1] -> [0,1]
    if x.ndim == 4 and x.shape[-1] > 1:
        x = jnp.mean(x, axis=-1, keepdims=True)
    dark = (x < threshold).astype(jnp.float32)
    return jnp.mean(dark.reshape(dark.shape[0], -1), axis=1)


def calculate_stroke_density(images: np.ndarray, threshold: float = 0.5
                             ) -> Dict[str, float]:
    """``images`` in [-1, 1] (the package-wide image range)."""
    d = np.asarray(_dark_fractions(jnp.asarray(images), threshold))
    return {"mean": float(d.mean()), "std": float(d.std()),
            "min": float(d.min()), "max": float(d.max())}


def calculate_foreground_ratio(images: np.ndarray, threshold: float = 0.5
                               ) -> Dict[str, object]:
    """``images`` in [-1, 1] (the package-wide image range)."""
    d = np.asarray(_dark_fractions(jnp.asarray(images), threshold))
    return {
        "mean": float(d.mean()), "std": float(d.std()),
        "percentiles": {"25": float(np.percentile(d, 25)),
                        "50": float(np.percentile(d, 50)),
                        "75": float(np.percentile(d, 75))},
    }


class MetricsTracker:
    """Epoch accumulator (reference MetricsTracker:177-213)."""

    def __init__(self):
        self.metrics: Dict[str, List[float]] = defaultdict(list)
        self.epoch_metrics: Dict[str, List[float]] = defaultdict(list)

    def add(self, name: str, value: Union[float, jax.Array]) -> None:
        self.epoch_metrics[name].append(float(value))

    def get_average(self, name: str) -> float:
        vals = self.epoch_metrics.get(name, [])
        return float(np.mean(vals)) if vals else 0.0

    def get_all_averages(self) -> Dict[str, float]:
        return {n: self.get_average(n) for n in self.epoch_metrics}

    def reset(self) -> None:
        for name, vals in self.epoch_metrics.items():
            if vals:
                self.metrics[name].append(float(np.mean(vals)))
        self.epoch_metrics.clear()

    def get_history(self, name: str) -> List[float]:
        return self.metrics.get(name, [])

    def get_last(self, name: str, default: float = 0.0) -> float:
        h = self.metrics.get(name, [])
        return h[-1] if h else default
