"""Device-mesh construction and sharding helpers.

The reference has NO distributed support (SURVEY.md §2 parallelism checklist:
single cuda-vs-cpu device selection, train_nerf.py:97-100). This module is the
scale-out layer the TPU build adds: an ICI device mesh with a ray/data axis,
ray-batch sharding via NamedSharding, and replicated parameters. Rays are
embarrassingly parallel (compositing is a per-ray scan over samples, never a
cross-ray reduction), so the natural mesh is 1-D over rays ("data"), with loss
and gradient reduction as psum over ICI. Multi-host DCN comes for free by
constructing the mesh over all global devices (jax.distributed.initialize
upstream of this module).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Create a device mesh over (a prefix of) the available devices.

    Default: a 1-D ray/data-parallel mesh over all devices. Pass ``shape``
    + ``axis_names`` for higher-dimensional layouts.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 over the data axis (for flat ray batches)."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (for params / optimizer state)."""
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, *arrays, axis: str = DATA_AXIS):
    """Place arrays with axis 0 sharded across the mesh's data axis.

    Multi-host: each process passes the same (host-replicated) global array;
    its local devices receive their rows via
    ``jax.make_array_from_process_local_data`` (device_put cannot target
    non-addressable devices).
    """
    sharding = data_sharding(mesh, axis)
    if jax.process_count() > 1:
        from .distributed import process_local_rows

        out = tuple(
            jax.make_array_from_process_local_data(
                sharding, process_local_rows(a, sharding), np.shape(a)
            )
            for a in arrays
        )
    else:
        out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) onto every mesh device.

    Multi-host: ``device_put`` to a multi-process sharding runs a
    cross-process assert_equal (a Gloo allgather per leaf) that deadlines
    when processes arrive skewed (30 s timeout; one core compiling two
    processes serially can exceed it) — build each leaf from local data
    instead, which never communicates."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        import numpy as np

        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                sharding, x, x.shape
            )

        return jax.tree.map(put, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_devices(n: int, num_devices: int, multiple: int = 1) -> int:
    """Smallest size >= n divisible by num_devices * multiple."""
    quantum = num_devices * multiple
    return (n + quantum - 1) // quantum * quantum
