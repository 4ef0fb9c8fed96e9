"""Structure generation: supercells, random occupancies, SQS, ground states."""

from smol_tpu.capp.generate.enumerate import enumerate_supercell_matrices
from smol_tpu.capp.generate.random import generate_random_ordered_occupancy
from smol_tpu.capp.generate.special.sqs import SQS, SQSGenerator, StochasticSQSGenerator

__all__ = [
    "enumerate_supercell_matrices",
    "generate_random_ordered_occupancy",
    "SQS",
    "SQSGenerator",
    "StochasticSQSGenerator",
]
