"""Applications layer: structure generation tools."""

from smol_tpu.capp.generate import (
    StochasticSQSGenerator,
    enumerate_supercell_matrices,
    generate_random_ordered_occupancy,
)

__all__ = [
    "enumerate_supercell_matrices",
    "generate_random_ordered_occupancy",
    "StochasticSQSGenerator",
]
