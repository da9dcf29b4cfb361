"""Device mesh helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "x") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return jax.make_mesh((len(devices),), (axis,), devices=devices)


def shard_last(mesh: Mesh, arr, axis: str = "x"):
    """Place an array sharded along its last axis."""
    spec = P(*([None] * (arr.ndim - 1) + [axis]))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
