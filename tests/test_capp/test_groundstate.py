"""Ground-state solver tests vs brute-force enumeration."""

from itertools import product

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.capp.generate.groundstate import PeriodicGroundStateSolver
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.moca import Ensemble


@pytest.fixture(scope="module")
def small_ensemble():
    ce = random_expansion(fcc_binary_prim(), {2: 4.0, 3: 2.8}, seed=21)
    return Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))


def brute_force_min(ensemble, configs):
    best_e, best_occ = np.inf, None
    for occ in configs:
        occ = np.asarray(occ, dtype=np.int32)
        e = float(
            ensemble.compute_feature_vector(occ) @ ensemble.natural_parameters
        )
        if e < best_e:
            best_e, best_occ = e, occ
    return best_e, best_occ


def test_ground_state_unconstrained(small_ensemble):
    ensemble = small_ensemble
    solver = PeriodicGroundStateSolver(ensemble)
    occu, energy = solver.solve()
    exact_e, _ = brute_force_min(ensemble, product((0, 1), repeat=8))
    assert energy == pytest.approx(exact_e, abs=1e-8)
    # solver energy must equal direct recomputation of its occupancy
    recomputed = ensemble.processor.compute_property(occu)
    assert energy == pytest.approx(recomputed, abs=1e-8)


def test_ground_state_fixed_composition(small_ensemble):
    ensemble = small_ensemble
    solver = PeriodicGroundStateSolver(ensemble, fixed_composition=[4, 4])
    occu, energy = solver.solve()
    assert (occu == 0).sum() == 4
    configs = [c for c in product((0, 1), repeat=8) if sum(c) == 4]
    exact_e, _ = brute_force_min(ensemble, configs)
    assert energy == pytest.approx(exact_e, abs=1e-8)


def test_ground_state_semigrand(small_ensemble):
    ce = random_expansion(fcc_binary_prim(), {2: 4.0}, seed=3)
    ensemble = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.3, "Cu": -0.3}
    )
    solver = PeriodicGroundStateSolver(ensemble)
    occu, energy = solver.solve()
    exact_e, exact_occ = brute_force_min(ensemble, product((0, 1), repeat=8))
    assert energy == pytest.approx(exact_e, abs=1e-8)


def test_ground_state_with_ewald():
    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat,
        [{"Li+": 0.5, "Mn3+": 0.5}, {"O2-": 1.0}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    ce = random_expansion(prim, {2: 3.1}, seed=4, ewald=True, ewald_coef=0.05)
    ensemble = Ensemble.from_cluster_expansion(ce, np.diag([2, 1, 1]))
    solver = PeriodicGroundStateSolver(ensemble)
    occu, energy = solver.solve()
    # brute force over the two active cation sites
    configs = []
    for c0 in (0, 1):
        for c1 in (0, 1):
            configs.append([c0, c1, 0, 0])
    exact_e, _ = brute_force_min(ensemble, configs)
    assert energy == pytest.approx(exact_e, abs=1e-6)
    recomputed = ensemble.processor.compute_property(occu)
    assert energy == pytest.approx(recomputed, abs=1e-6)


def test_groundstate_reset_and_aliases(small_ensemble):
    """reset() discards the cached solution; structure/sublattices alias
    (reference solver.py:397-482)."""
    solver = PeriodicGroundStateSolver(small_ensemble)
    occu, energy = solver.solve()
    assert solver.ground_state_structure == solver.structure
    assert solver.sublattices is small_ensemble.sublattices
    solver.reset()
    assert solver._solution is None
    occu2, energy2 = solver.solve()
    assert energy2 == energy
