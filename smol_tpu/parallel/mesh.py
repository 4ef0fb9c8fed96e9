"""Device-mesh utilities for replica-parallel MC.

The scale axis of lattice MC is the replica ensemble: walkers shard over a
1D mesh axis ("walkers"); all per-walker state arrays shard their leading
axis.  The step functions are pure jnp programs on globally-shaped arrays,
so GSPMD inserts the ICI collectives (e.g. ppermute for the replica-exchange
rolls in smol_tpu.parallel.tempering) automatically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["walker_mesh", "shard_walker_state"]


def walker_mesh(devices=None, axis_name: str = "walkers") -> Mesh:
    """A 1D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_walker_state(state: dict, mesh: Mesh, axis_name: str = "walkers") -> dict:
    """Place each per-walker leaf with its leading axis sharded over the mesh.

    Scalar/static leaves (no leading walker axis) are replicated.
    """
    nwalkers = state["enthalpy"].shape[0]

    def place(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == nwalkers:
            spec = PartitionSpec(axis_name, *([None] * (leaf.ndim - 1)))
        else:
            spec = PartitionSpec()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return {k: place(v) for k, v in state.items()}
