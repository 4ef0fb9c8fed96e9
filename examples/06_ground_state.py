"""Exact periodic ground states by mixed-integer programming.

Solves for the exact minimum-energy configuration of a cluster expansion on
a fixed supercell (pseudo-boolean optimization linearized to a MILP, solved
with HiGHS), unconstrained and at fixed composition, and validates against
brute force.

Run: python examples/06_ground_state.py
"""

from itertools import product

import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.capp.generate.groundstate import PeriodicGroundStateSolver
from smol_tpu.moca import Ensemble

expansion = random_expansion(fcc_binary_prim(), {2: 4.0, 3: 2.8}, seed=31)
ensemble = Ensemble.from_cluster_expansion(expansion, np.diag([2, 2, 2]))
n = ensemble.num_sites

solver = PeriodicGroundStateSolver(ensemble)
occu, energy = solver.solve()
print(f"unconstrained ground state: E = {energy:.6f} eV, "
      f"composition = {occu.sum()}/{n} Cu")

# brute force check (2^8 configurations)
best = min(
    float(ensemble.compute_feature_vector(np.array(c, dtype=np.int32))
          @ ensemble.natural_parameters)
    for c in product((0, 1), repeat=n)
)
print(f"brute force:               E = {best:.6f} eV")
assert abs(energy - best) < 1e-8

# fixed 50/50 composition
solver = PeriodicGroundStateSolver(ensemble, fixed_composition=[4, 4])
occu_c, energy_c = solver.solve()
print(f"fixed 50/50 ground state:  E = {energy_c:.6f} eV")
assert occu_c.sum() == 4

structure = ensemble.processor.structure_from_occupancy(occu_c)
print(f"ground-state structure: {structure.composition}, "
      f"{len(structure)} sites")
