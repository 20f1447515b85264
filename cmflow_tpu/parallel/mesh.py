"""Device mesh + sharding helpers.

The reference's only device parallelism is single-process
``nn.DataParallel`` replication (models/model.py:40-42, SURVEY.md §2.3).
The TPU-native replacement is SPMD data parallelism over a 1-D ``data``
mesh axis: the batch is sharded across chips over ICI, parameters are
replicated, and gradient all-reduce happens as XLA collectives inside the
``shard_map``-wrapped train step (``lax.pmean``).  A second (currently
size-1) ``model`` axis is plumbed through so tensor-parallel layouts can
be added without re-plumbing callers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the local devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by mp={model_parallel}")
    grid = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch dict with the batch axis sharded over
    ``data`` (the jax.device_put path uses parallel ICI transfers)."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
