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


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = "data") -> Any:
    """Place every array in the batch pytree with axis 0 sharded over the
    data axis (padding is the caller's job: static shapes, batch divisible
    by mesh size)."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def host_local_batch(global_batch_size: int) -> slice:
    """This host's slice of a globally-indexed batch
    (deterministic host data sharding by jax.process_index)."""
    n = jax.process_count()
    per_host = global_batch_size // n
    i = jax.process_index()
    return slice(i * per_host, (i + 1) * per_host)
