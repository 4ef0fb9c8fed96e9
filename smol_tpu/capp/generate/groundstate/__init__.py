"""Exact (upper-bound) periodic ground-state solving."""

from smol_tpu.capp.generate.groundstate.upper_bound import PeriodicGroundStateSolver

__all__ = ["PeriodicGroundStateSolver"]
