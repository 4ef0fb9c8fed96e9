"""Multi-host (pod-scale) initialization and global replica meshes.

Pod-scale replica ensembles span hosts: each process drives its local TPU
chips, ``jax.distributed`` links the processes, and one global 1D
"walkers" mesh spans every chip in the job (SURVEY.md section 2.6, last
row).  Replica-exchange rolls (smol_tpu.parallel.tempering) on arrays
sharded over that mesh lower to ICI ppermute within a host/slice and DCN
transfers across slices — no code changes in the MC layer.

Usage on each process of a multi-host job::

    from smol_tpu.parallel import distributed
    distributed.initialize(coordinator_address="host0:1234",
                           num_processes=N, process_id=i)
    mesh = distributed.global_walker_mesh()
    state = shard_walker_state(state, mesh)   # global-shape walker state

On a single process (or under a TPU runtime that sets the cluster env
automatically) ``initialize()`` is a no-op / auto-detect passthrough.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = [
    "initialize",
    "is_initialized",
    "global_walker_mesh",
    "pad_walker_count",
    "process_walker_slice",
]

_initialized = False


def initialize(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
) -> bool:
    """Connect this process to a multi-host JAX job.

    Thin wrapper over ``jax.distributed.initialize``: with no arguments it
    auto-detects cluster environments (TPU pods set the env vars); with
    explicit arguments it joins the given coordinator.  Returns True when
    a multi-process runtime is active afterwards.  Safe to call once per
    process, before any other jax API touches the backend.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    if not kwargs and jax.process_count() > 1:
        _initialized = True
        return True
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1


def is_initialized() -> bool:
    return _initialized or jax.process_count() > 1


def global_walker_mesh(axis_name: str = "walkers") -> Mesh:
    """A 1D mesh spanning every device of every process in the job."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def pad_walker_count(mesh: Mesh, nwalkers: int) -> int:
    """Smallest walker count >= nwalkers shardable over the mesh.

    1D jax shardings require the axis to divide evenly over the devices
    (non-divisible shapes silently produce a replicated index map, and
    array construction rejects them); pad the walker ensemble up to this
    count and ignore the tail rows in statistics.
    """
    n = int(mesh.devices.size)
    return -(-int(nwalkers) // n) * n


def process_walker_slice(mesh: Mesh, nwalkers_global: int,
                         axis_name: str = "walkers") -> slice:
    """This process's contiguous slice of the global walker axis.

    Derived from the sharding's addressable-device index map, so it is
    correct for any device-id numbering the runtime assigns.  The walker
    count must divide evenly over the mesh (see :func:`pad_walker_count`)
    — jax produces a meaningless replicated index map otherwise, which
    this function rejects instead of mis-slicing.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    if nwalkers_global % int(mesh.devices.size):
        raise ValueError(
            f"nwalkers_global={nwalkers_global} does not divide over "
            f"{mesh.devices.size} devices; pad to "
            f"pad_walker_count(mesh, nwalkers)="
            f"{pad_walker_count(mesh, nwalkers_global)} first"
        )
    sharding = NamedSharding(mesh, PartitionSpec(axis_name))
    idx_map = sharding.addressable_devices_indices_map((nwalkers_global,))
    intervals = sorted(
        (
            s[0].start or 0,
            s[0].stop if s[0].stop is not None else nwalkers_global,
        )
        for s in idx_map.values()
    )
    # with a divisible count every shard is equal; validate only that this
    # process's union is one contiguous gap-free block (device-id order is
    # runtime-assigned)
    lo, hi = intervals[0][0], intervals[-1][1]
    cur = lo
    for s, e in intervals:
        if s > cur:
            raise ValueError("process shards are not one contiguous block")
        cur = max(cur, e)
    if cur != hi:
        raise ValueError("process shards are not one contiguous block")
    return slice(lo, hi)
