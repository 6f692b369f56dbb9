"""Device mesh construction and sharding helpers.

The communication backend of this framework: a ``jax.sharding.Mesh`` over the
TPU slice, with batch dimensions sharded on the ``data`` axis and parameters
replicated. XLA/GSPMD inserts the ICI collectives (psum for gradients, global
reductions for cross-replica BatchNorm statistics) — there is no hand-written
NCCL-equivalent layer, by design (SURVEY §2.2: the reference has no
distributed backend at all; this module is its first-class TPU replacement).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from siggan_tpu.core.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh.

    ``num_data == -1`` uses every visible device on the data axis. The model
    axis defaults to size 1 (the GAN at 64/128px fits trivially per chip);
    it exists so 2-D layouts stay expressible without API churn.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    num_model = max(1, cfg.num_model)
    num_data = cfg.num_data if cfg.num_data > 0 else len(devs) // num_model
    need = num_data * num_model
    if need > len(devs):
        raise ValueError(
            f"mesh ({num_data} data x {num_model} model = {need} devices) "
            f"exceeds the {len(devs)} visible devices")
    if need < len(devs):
        # Explicit sizes that underuse the slice are legal (e.g. power-of-2
        # meshes on odd slices) but must not pass silently.
        print(f"NOTE: mesh uses {need} of {len(devs)} visible devices",
              flush=True)
    use = devs[:need].reshape(num_data, num_model)
    return Mesh(use, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, data_axis: str = "data"):
    """Place a host batch onto the mesh, sharded over the data axis."""
    s = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def shard_host_local(mesh: Mesh, local, data_axis: str = "data"):
    """Per-process input sharding (multi-host): each process supplies ITS OWN
    slice of a globally batch-sharded array; the result is one global
    jax.Array whose addressable shards are exactly this host's data (no
    cross-host data movement). Single-process: identical to ``shard_batch``.
    """
    s = batch_sharding(mesh, data_axis)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), local)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        local)


def local_batch_size(global_batch: int, mesh: Mesh, data_axis: str = "data") -> int:
    n = mesh.shape[data_axis]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-axis size {n}"
        )
    return global_batch // n
