"""Multi-host data-parallel launch support.

The reference's only parallelism is single-node `nn.DataParallel`
(SURVEY.md §2.3, `/root/reference/src/train_pt.py`). The TPU-native scale-out
story is SPMD over a GLOBAL device mesh spanning hosts: every host runs the
same trainer, `jax.distributed.initialize()` wires the PJRT coordination
service, `parallel.mesh.get_mesh()` then sees all chips in the slice, and the
gradient all-reduce rides ICI exactly as in the single-host case — nothing in
the jitted train step changes.

Per-host responsibilities handled here:
- `maybe_initialize_distributed()` — env-driven coordination bring-up
  (`SB_COORDINATOR`, `SB_NUM_PROCESSES`, `SB_PROCESS_ID`), or the TPU-pod /
  SLURM auto-detect path of `jax.distributed.initialize()`.
- `ShardedDataset` — each host reads a strided shard of the corpus so the
  global batch is disjoint (torch's DistributedSampler role).
- `local_to_global()` — assemble a globally-sharded jax.Array from this
  host's slice of the batch (`jax.make_array_from_process_local_data`).
- `is_primary()` — gate checkpoint/metric writes to host 0.

Launcher story: start the same command on every host, e.g.

  for i in 0 1 2 3; do
    ssh "host$i" SB_COORDINATOR=host0:8476 SB_NUM_PROCESSES=4 \
        SB_PROCESS_ID=$i python src/train_pt.py --config C --run_dir R &
  done

On Cloud TPU pod slices, the runtime sets the coordination env itself, so
plain `jax.distributed.initialize()` (no SB_* vars) suffices.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

_initialized = False


def maybe_initialize_distributed(verbose: bool = True) -> tuple[int, int]:
    """Initialize jax.distributed from the environment, once.

    Returns (process_index, process_count). No-op (0, 1) when the env names
    no coordinator and no pod runtime is detected.
    """
    global _initialized
    coord = os.environ.get("SB_COORDINATOR")
    nproc = os.environ.get("SB_NUM_PROCESSES")
    pid = os.environ.get("SB_PROCESS_ID")
    if not _initialized:
        if coord and nproc and int(nproc) > 1:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(pid or 0))
            _initialized = True
        elif os.environ.get("SB_AUTO_DISTRIBUTED"):
            # TPU pod slices / SLURM: the runtime provides coordination info
            # and jax.distributed.initialize() auto-detects everything.
            jax.distributed.initialize()
            _initialized = True
    idx, cnt = jax.process_index(), jax.process_count()
    if verbose and cnt > 1:
        print(f"[launch] process {idx}/{cnt}, "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices", flush=True)
    return idx, cnt


def is_primary() -> bool:
    """True on the host that owns checkpoint/metric writes."""
    return jax.process_index() == 0


class ShardedDataset:
    """Strided per-process view of a dataset (DistributedSampler semantics:
    process p sees items p, p+P, p+2P, ...; every host sees the same length
    so epoch boundaries align — the last items of an uneven corpus are
    dropped, like DistributedSampler(drop_last=True))."""

    def __init__(self, dataset, process_index: int | None = None,
                 process_count: int | None = None):
        self.dataset = dataset
        self.p = jax.process_index() if process_index is None else process_index
        self.n = jax.process_count() if process_count is None else process_count
        self._len = len(dataset) // self.n

    def __len__(self):
        return self._len

    def __getitem__(self, i):
        if not 0 <= i < self._len:
            raise IndexError(i)
        return self.dataset[i * self.n + self.p]

    def __getattr__(self, name):  # forward dataset attributes (sr, etc.)
        return getattr(self.dataset, name)


def shard_dataset(dataset):
    """Wrap `dataset` in a per-process shard when running multi-host;
    returns it unchanged single-host."""
    return ShardedDataset(dataset) if jax.process_count() > 1 else dataset


def local_to_global(local_batch, mesh):
    """Assemble globally-sharded arrays from this process's local slice.

    Every leaf's leading dim is this host's portion of the global batch
    (global batch = local * process_count); 0-d leaves are replicated.
    Single-process this is plain sharded device_put.
    """
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def place(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, rep)
        if jax.process_count() == 1:
            return jax.device_put(x, data)
        return jax.make_array_from_process_local_data(data, x)

    return jax.tree_util.tree_map(place, local_batch)
