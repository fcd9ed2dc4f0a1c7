"""Device mesh + sharding utilities (the reference's DDP/NCCL, TPU-native).

The reference's only parallelism is data parallelism via PyTorch DDP over
NCCL with env/SLURM rank discovery
(``/root/reference/retrieval/tools/utils.py:109-137``). On TPU this becomes
a 1-D ``data`` mesh: inputs are sharded batch-wise with ``NamedSharding``,
parameters are replicated, and XLA inserts the gradient all-reduce over ICI
(intra-slice) / DCN (cross-slice) automatically — no hand-written
collectives. Multi-host process-level utilities (rank-0 logging, per-host
data sharding offsets) mirror the reference's helpers.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "process_count",
    "process_index",
    "is_main_process",
    "local_batch_slice",
    "allgather_by_index",
]


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over (up to) all available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_for_batch(batch_size: int, axis: str = "data") -> Mesh:
    """1-D data mesh using the most devices that evenly divide the batch."""
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n, axis)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding for input arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays with the leading dim sharded over data."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """The reference's rank-0 check (tools/utils.py:105)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """Per-host slice of a global batch (replaces DistributedSampler's
    rank-offset sharding, datamodule.py:52-54).

    The global batch must divide evenly: a floored share would silently
    drop the tail rows of EVERY batch (and uneven shards cannot tile a
    batch-sharded global array anyway)."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} must be divisible by "
            f"process_count {n} for per-host sharding"
        )
    per = global_batch // n
    start = per * jax.process_index()
    return slice(start, start + per)


def _reassemble(gathered_index: np.ndarray, gathered_arrays):
    """Merge process-allgathered, -1-padded (index, array) pairs back into
    global index order. Pure so it is unit-testable without multiple
    processes (tests/test_multihost.py)."""
    gi = np.asarray(gathered_index).reshape(-1)
    keep = gi >= 0
    order = np.argsort(gi[keep], kind="stable")
    out = []
    for a in gathered_arrays:
        a = np.asarray(a)
        flat = a.reshape(-1, *a.shape[2:])
        out.append(flat[keep][order])
    return tuple(out)


def allgather_by_index(index: np.ndarray, *arrays: np.ndarray):
    """Gather per-host (index, arrays) shards onto every host, reassembled
    in global index order — the eval-metric aggregation the reference does
    on rank 0 only (``/root/reference/retrieval/pretrain.py:208-230``; its
    DDP path evaluates on rank 0 without gathering at all). Handles unequal
    per-host counts by padding with index -1 before the allgather."""
    index = np.asarray(index, np.int64)
    if jax.process_count() == 1:
        order = np.argsort(index, kind="stable")
        return tuple(np.asarray(a)[order] for a in arrays)
    from jax.experimental import multihost_utils as mhu

    m = int(np.max(mhu.process_allgather(np.asarray([index.shape[0]]))))

    def pad(a, fill=0):
        w = [(0, m - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, w, constant_values=fill)

    gi = mhu.process_allgather(pad(index, -1))
    gas = [mhu.process_allgather(pad(np.asarray(a))) for a in arrays]
    return _reassemble(gi, gas)
