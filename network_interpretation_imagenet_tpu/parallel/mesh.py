"""Mesh construction + sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """("data", "model") mesh over the given (or all) devices.

    ``model_parallel`` splits devices between batch sharding and tensor
    sharding; 1 = pure data parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        # Indivisible request (e.g. 1 real device, model_parallel=2): fall
        # back to pure data parallelism rather than crashing — the sharded
        # code paths are all valid at model=1.
        model_parallel = 1
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place an array with its leading axis sharded over ``axis``."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
