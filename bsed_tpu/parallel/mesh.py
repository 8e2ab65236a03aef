"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.3 — no DataParallel /
torch.distributed anywhere); its TPU-native equivalent is SPMD data
parallelism over ICI: a 1-D ``Mesh(('data',))``, batch arrays sharded on
axis 0, parameters replicated. Reductions inside the jitted train step
(loss means, BatchNorm batch statistics) are global reductions over the
sharded batch axis, so GSPMD inserts the cross-chip ``psum``s — the DP
"communication backend" is XLA collectives, not NCCL.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()``
and feed each host its own shard via ``host_local_batch``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def auto_data_mesh(*batch_sizes: int,
                   devices: Optional[Sequence] = None) -> Optional[Mesh]:
    """Largest 1-D data mesh whose size divides every batch stream.

    GSPMD batch sharding needs axis 0 divisible by the mesh size, and the
    three-stream batch carries streams of different static sizes (SYN =
    batch_size, real = 2·(batch_size//2)), so the mesh uses the largest
    device count that divides them all — e.g. batch 12 on an 8-chip host →
    a 6-chip mesh (set batch_size to a multiple of the chip count to use
    every chip). Returns None when only one device would qualify."""
    devices = list(devices) if devices is not None else jax.devices()
    # multi-process: the loaders are process-strided, so the GLOBAL batch
    # axis is per-host batch × process_count — that is what must divide
    scale = jax.process_count()
    sizes = [b * scale for b in batch_sizes if b > 0]
    n = len(devices)
    while n > 1 and any(b % n for b in sizes):
        n -= 1
    return Mesh(np.array(devices[:n]), ("data",)) if n > 1 else None


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _place(tree: Any, sharding: NamedSharding) -> Any:
    """device_put in single-process runs; in multi-process runs each host
    contributes its process-local data to the global array
    (``jax.make_array_from_process_local_data`` — plain device_put cannot
    address other hosts' devices). For a replicated sharding every process
    passes the full (identical) array; for a batch sharding each process
    passes its own loader shard and the global batch is their union."""
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Place every array in the batch pytree with axis 0 sharded over the
    data axis (padding is the caller's job: static shapes, global batch
    divisible by mesh size)."""
    return _place(batch, batch_sharding(mesh, axis_name))


def replicate(mesh: Mesh, tree: Any) -> Any:
    return _place(tree, replicated(mesh))


def host_local_batch(global_batch_size: int) -> slice:
    """This host's slice of a globally-indexed batch
    (deterministic host data sharding by jax.process_index)."""
    n = jax.process_count()
    per_host = global_batch_size // n
    i = jax.process_index()
    return slice(i * per_host, (i + 1) * per_host)
