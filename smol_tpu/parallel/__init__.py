"""Multi-replica / multi-chip parallelism: meshes and replica exchange."""

from smol_tpu.parallel.mesh import shard_walker_state, walker_mesh
from smol_tpu.parallel.tempering import (
    make_temperature_ladder,
    make_tempering_step,
    tempering_exchange,
)

__all__ = [
    "walker_mesh",
    "shard_walker_state",
    "make_tempering_step",
    "tempering_exchange",
    "make_temperature_ladder",
]
