"""Fit a cluster expansion from (synthetic) training data.

The full train-data path: define a subspace from diameter cutoffs, add
computed entries to a StructureWrangler, fit ECIs by least squares, and
check the fit. Synthetic energies from known ECIs stand in for DFT data,
so the fit must recover them exactly.

Run: python examples/01_fit_cluster_expansion.py
"""

import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.benchmarks.systems import fcc_binary_prim
from smol_tpu.capp import generate_random_ordered_occupancy
from smol_tpu.cofe import ClusterSubspace, StructureWrangler
from smol_tpu.cofe.expansion import ClusterExpansion, RegressionData
from smol_tpu.crystal.entries import ComputedStructureEntry
from smol_tpu.moca.processor.expansion import ClusterExpansionProcessor

# 1. the disordered primitive cell and a subspace from cutoffs.  A real
# workflow starts from a structure file; round-trip through CIF to demo
# the file path (CIF carries the partial occupancies; ordered cells can
# use POSCAR: Structure.from_file("POSCAR"))
import os
import tempfile

from smol_tpu.crystal import Structure

prim = fcc_binary_prim()  # FCC 50/50 Au-Cu
with tempfile.TemporaryDirectory() as td:
    cif = os.path.join(td, "prim.cif")
    prim.to(filename=cif)
    prim = Structure.from_file(cif)
subspace = ClusterSubspace.from_cutoffs(prim, {2: 5.0, 3: 3.5})
print(f"subspace: {subspace.num_orbits} orbits, "
      f"{subspace.num_corr_functions} correlation functions")

# 2. synthetic "DFT" data: random ordered structures + energies from true ECIs
rng = np.random.default_rng(42)
true_coefs = rng.normal(scale=0.1, size=subspace.num_corr_functions)
true_coefs[0] = -2.0

wrangler = StructureWrangler(subspace)
for scm in (np.diag([2, 2, 2]), np.diag([3, 2, 1]), np.diag([4, 1, 1])):
    proc = ClusterExpansionProcessor(
        subspace, scm, np.ones(subspace.num_corr_functions)
    )
    for _ in range(_bootstrap.scale(8, 3)):
        occu = generate_random_ordered_occupancy(proc, rng=rng)
        structure = proc.structure_from_occupancy(occu)
        energy = float(
            true_coefs @ subspace.corr_from_occupancy(occu, scm) * proc.size
        )
        wrangler.add_entry(
            ComputedStructureEntry(structure, energy), verbose=False
        )

X = wrangler.feature_matrix
y = wrangler.get_property_vector("energy")
print(f"training data: {wrangler.num_structures} structures, "
      f"feature matrix {X.shape}, rank {np.linalg.matrix_rank(X)}")

# 3. fit (plain lstsq; swap in any sklearn-style estimator)
coefs, *_ = np.linalg.lstsq(X, y, rcond=None)
reg_data = RegressionData(
    module="numpy.linalg", estimator_name="lstsq",
    feature_matrix=X, property_vector=y, parameters={},
)
expansion = ClusterExpansion(subspace, coefs, regression_data=reg_data)

rmse = np.sqrt(np.mean((X @ coefs - y) ** 2))
print(f"fit rmse: {rmse:.2e} eV/prim")
print(f"max |fit - true| ECI error: {np.abs(coefs - true_coefs).max():.2e}")

# 4. predict on a fresh structure
scm = np.diag([2, 2, 2])
proc = ClusterExpansionProcessor(
    subspace, scm, np.ones(subspace.num_corr_functions)
)
occu = generate_random_ordered_occupancy(proc, rng=rng)
test_structure = proc.structure_from_occupancy(occu)
pred = expansion.predict(test_structure, normalized=True)  # eV per prim
truth = float(true_coefs @ subspace.corr_from_occupancy(occu, scm))
print(f"prediction on held-out structure: {pred:.6f} vs true {truth:.6f}")
assert abs(pred - truth) < 1e-8
