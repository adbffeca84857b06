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


_warned_replication = set()


def shard_batch(batch, mesh: Mesh):
    """Place array leaves with the batch axis sharded over `data`; leaves whose
    leading dim does not divide the mesh are replicated WITH A LOUD WARNING
    (replication forfeits data parallelism — pad the batch with `pad_batch`
    and mask instead; the trainer does this automatically).

    Multi-host: each process passes its LOCAL slice of the batch; the global
    array is assembled host-locally (global leading dim = local x processes).
    """
    import warnings

    n_proc = jax.process_count()
    n = mesh.devices.size // max(n_proc, 1)  # local devices on the data axis
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        x = np.asarray(x)
        if n_proc > 1:
            if x.ndim >= 1 and x.shape[0] % n == 0:
                return jax.make_array_from_process_local_data(bs, x)
            # replicated leaf: every process must pass identical data —
            # a divergent per-host leaf yields a silently inconsistent
            # "replicated" global array (ADVICE r2 #4), so warn as loudly
            # as the single-host path does.
            key = (x.shape[0] if x.ndim else 0, n, "mh")
            if x.ndim >= 1 and key not in _warned_replication:
                _warned_replication.add(key)
                warnings.warn(
                    f"shard_batch (multi-host): leading dim {x.shape[0]} "
                    f"does not divide the {n} local devices — REPLICATING; "
                    "every process MUST pass identical data for this leaf "
                    "(use pad_batch() to pad-and-mask instead).",
                    stacklevel=3)
            return jax.make_array_from_process_local_data(rep, x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, bs)
        key = (x.shape[0] if x.ndim else 0, n)
        if x.ndim >= 1 and key not in _warned_replication:
            _warned_replication.add(key)
            warnings.warn(
                f"shard_batch: leading dim {x.shape[0]} does not divide the "
                f"{n}-device mesh — REPLICATING (no data parallelism for "
                f"this array). Use pad_batch() to pad-and-mask instead.",
                stacklevel=3)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, batch)


def pad_batch(batch, n: int):
    """Pad every leaf's leading dim up to a multiple of `n` by repeating the
    last sample; returns (padded_batch, weights) where weights is a float32
    [B_padded] vector with 1.0 for real samples and 0.0 for padding."""
    leaves = jax.tree_util.tree_leaves(batch)
    b = int(np.asarray(leaves[0]).shape[0])
    pad = (-b) % n

    def place(x):
        x = np.asarray(x)
        if pad == 0:
            return x
        return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)

    weights = np.concatenate(
        [np.ones(b, np.float32), np.zeros(pad, np.float32)])
    return jax.tree_util.tree_map(place, batch), weights
