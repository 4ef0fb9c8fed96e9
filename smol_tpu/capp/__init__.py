"""Applications layer: structure generation tools."""

from smol_tpu.capp.generate import (
    StochasticSQSGenerator,
    enumerate_supercell_matrices,
    generate_random_ordered_occupancy,
)
from smol_tpu.capp.generate.groundstate import PeriodicGroundStateSolver

__all__ = [
    "enumerate_supercell_matrices",
    "generate_random_ordered_occupancy",
    "StochasticSQSGenerator",
    "PeriodicGroundStateSolver",
]
