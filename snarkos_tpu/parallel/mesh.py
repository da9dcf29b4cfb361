"""Device mesh helpers.

Note on this environment: the axon TPU plugin ignores ``JAX_PLATFORMS``
(plural). To guarantee a multi-device mesh for sharding validation, pass
``backend="cpu"`` — the CPU backend always exists and honors
``--xla_force_host_platform_device_count``. Arrays placed on a CPU mesh
run there regardless of the default backend.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "x",
              backend: str | None = None) -> Mesh:
    if backend is not None:
        devices = jax.local_devices(backend=backend)
    else:
        devices = jax.devices()
        if num_devices is not None and len(devices) < num_devices:
            # fall back to the virtual CPU devices for sharding validation
            cpu = jax.local_devices(backend="cpu")
            if len(cpu) >= num_devices:
                devices = cpu
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices; have {len(devices)} "
                f"(set --xla_force_host_platform_device_count for CPU meshes)"
            )
        devices = devices[:num_devices]
    # Pin Auto axis types: under JAX 0.9 explicit sharding, Explicit-axis
    # meshes assert on some slice lowerings inside shard_map; all kernels
    # here use explicit in_specs/out_specs so Auto is both safe and robust.
    return jax.make_mesh(
        (len(devices),), (axis,), devices=devices,
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def shard_last(mesh: Mesh, arr, axis: str = "x"):
    """Place an array sharded along its last axis."""
    spec = P(*([None] * (arr.ndim - 1) + [axis]))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
