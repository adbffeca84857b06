"""Device mesh + sharding for data-parallel training over ICI.

The reference's only parallelism is single-node `nn.DataParallel`
(SURVEY.md §2.3); the TPU-native equivalent is a 1-D `data` mesh: the batch is
sharded over it, params/opt-state are replicated, and XLA inserts the gradient
all-reduce during jit compilation (sharding propagation — no hand-written
collectives needed at this model scale). The mesh axis abstraction means
multi-host DP works unchanged; model-parallel axes can be appended later.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place array leaves with the batch axis sharded over `data`; leaves whose
    leading dim does not divide the mesh are replicated."""
    n = mesh.devices.size
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, batch)
