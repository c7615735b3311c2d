"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL
(src/misc/dist_utils.py:75-133). The TPU-native equivalent: a 1-D ``data``
mesh; batches sharded over it, params replicated. XLA inserts the gradient
all-reduce (psum over ICI) automatically, and because batch-norm statistics and
loss normalizers are computed with global reductions under pjit, SyncBatchNorm
(dist_utils.py:122) and the criterion's num_boxes all-reduce
(criterion.py:317-323) need no explicit collectives.

Multi-host: call jax.distributed.initialize() before make_mesh (auto on TPU
pods); the same code then spans hosts with ICI/DCN collectives.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """First-dim (batch) sharded."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
