"""Device mesh + sharding helpers.

The reference's distributed story is vestigial DDP wrapping that is never
initialized (SURVEY.md §2.9). The TPU-native equivalent is a 1-D
jax.sharding.Mesh over all chips with batch-sharded data, psum gradient
reduction riding ICI, and multi-host via jax.distributed — this module plus
ctdd_tpu.parallel.dp is that entire comms surface.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a host batch onto the mesh, sharded along the leading axis.

    Single-host: device_put with a NamedSharding splits the array across the
    local chips. Multi-host (after initialize_multihost): each process passes
    its LOCAL shard of the global batch and we assemble the global array from
    per-process data.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bootstrap over DCN (jax.distributed).

    Counterpart of the torch.distributed init the reference never performs;
    call once per host before building the mesh in a multi-process run.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
