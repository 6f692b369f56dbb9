"""Batch iteration with asynchronous device prefetch.

Replaces torch's multi-process DataLoader (``data_loader_signatures.py:249``)
with the TPU-shaped design: the dataset is already a device-friendly array,
so an "epoch" is a seeded permutation + a stream of device_put'd slices, kept
``prefetch`` batches ahead of the consumer so H2D copies overlap the train
step. Batches land either on a single device or sharded over the mesh's
``data`` axis (per-shard slices placed directly on their device — no full
replication then reshard).
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class BatchLoader:
    """Seeded, epoch-aware batch iterator over a resident (N, ...) array."""

    def __init__(self, images: np.ndarray, batch_size: int, *,
                 labels: Optional[np.ndarray] = None,
                 shuffle: bool = True, drop_last: bool = True, seed: int = 0,
                 mesh: Optional[Mesh] = None, data_axis: str = "data",
                 prefetch: int = 2):
        self.images = images
        if labels is not None and len(labels) != len(images):
            raise ValueError(
                f"labels ({len(labels)}) and images ({len(images)}) lengths "
                "differ")
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        if not drop_last and mesh is not None:
            # A partial final batch cannot shard over the data axis (its
            # leading dim isn't divisible by the device count) — placement
            # would fail mid-epoch, after prefetched batches already
            # yielded. Sharded loading always drops the remainder, the same
            # semantics the resident path uses.
            drop_last = True
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self.sharding = (NamedSharding(mesh, P(data_axis))
                         if mesh is not None else None)
        # Multi-host: `images` is THIS PROCESS's shard of the dataset and
        # `batch_size` stays the GLOBAL batch; each process contributes
        # batch_size/process_count rows per step (per-host input sharding,
        # SURVEY §2.2). Requires a mesh (the global batch must have a
        # sharding to assemble into).
        self.n_proc = jax.process_count()
        if self.n_proc > 1:
            if self.sharding is None:
                raise ValueError("multi-process BatchLoader requires a mesh")
            if batch_size % self.n_proc:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"{self.n_proc} processes")
        self.local_bs = batch_size // self.n_proc
        # Size guard against the PER-PROCESS batch: each host only needs
        # local_bs rows per step (a global-batch comparison wrongly rejected
        # valid multi-host configs — round-3 review).
        if drop_last and len(images) < self.local_bs:
            raise ValueError(
                f"dataset shard ({len(images)}) smaller than the "
                f"per-process batch ({self.local_bs})")

    def __len__(self) -> int:
        n = len(self.images) // self.local_bs
        if not self.drop_last and len(self.images) % self.local_bs:
            n += 1
        return n

    def epoch(self, epoch_idx: int) -> Iterator[jax.Array]:
        """Deterministic per-epoch order: permutation seeded by (seed, epoch).

        With ``labels`` the iterator yields aligned ``(images, labels)``
        pairs (both sharded on the data axis) — the streaming counterpart of
        the resident path's label plumbing, matching the reference loader's
        label support (``data_loader_signatures.py:249``).
        """
        n = len(self.images)
        if self.shuffle:
            order = np.random.RandomState((self.seed, epoch_idx)).permutation(n)
        else:
            order = np.arange(n)
        steps = len(self)

        def host_batches():
            for b in range(steps):
                sel = order[b * self.local_bs:(b + 1) * self.local_bs]
                if self.labels is not None:
                    yield self.images[sel], self.labels[sel]
                else:
                    yield self.images[sel]

        def put_one(x: np.ndarray) -> jax.Array:
            if self.n_proc > 1:
                return jax.make_array_from_process_local_data(self.sharding, x)
            if self.sharding is not None:
                return jax.device_put(x, self.sharding)
            return jax.device_put(x)

        def put(x):
            if isinstance(x, tuple):
                return tuple(put_one(v) for v in x)
            return put_one(x)

        # Keep `prefetch` device copies in flight ahead of the consumer.
        queue: collections.deque = collections.deque()
        it = host_batches()
        for x in itertools.islice(it, self.prefetch):
            queue.append(put(x))
        while queue:
            nxt = next(it, None)
            if nxt is not None:
                queue.append(put(nxt))
            yield queue.popleft()
