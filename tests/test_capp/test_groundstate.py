"""Ground-state solver tests vs brute-force enumeration."""

from itertools import product

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.capp.generate.groundstate import PeriodicGroundStateSolver
from smol_tpu.capp.generate.groundstate.upper_bound import (
    BooleanVariables,
    ProblemCanonicals,
    get_auxiliary_variable_values,
    get_composition_space_constraints,
    get_expression_and_auxiliary_from_terms,
    get_fixed_composition_constraints,
    get_normalization_constraints,
    get_occupancy_from_variables,
    get_sublattice_indices_by_site,
    get_terms_from_chemical_potentials,
    get_terms_from_decomposition_processor,
    get_terms_from_ewald_processor,
    get_terms_from_expansion_processor,
    get_variable_indices_for_each_composition_component,
    get_variable_values_from_occupancy,
    get_variables_from_sublattices,
    map_ewald_indices_to_variable_indices,
)
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
    configs = [[c0, c1, 0, 0] for c0 in (0, 1) for c1 in (0, 1)]

    def charge(occ):
        # codes on the cation sublattice: 0 = Li+ (+1), 1 = Mn3+ (+3); O2- fixed
        return sum(1 if c == 0 else 3 for c in occ[:2]) - 4

    # default: charge-balanced ground state vs neutral-only brute force
    solver = PeriodicGroundStateSolver(ensemble)
    occu, energy = solver.solve()
    assert charge(occu) == 0
    neutral = [c for c in configs if charge(c) == 0]
    exact_e, _ = brute_force_min(ensemble, neutral)
    assert energy == pytest.approx(exact_e, abs=1e-6)
    recomputed = ensemble.processor.compute_property(occu)
    assert energy == pytest.approx(recomputed, abs=1e-6)

    # unconstrained: may pick a charged config if it is lower
    solver_free = PeriodicGroundStateSolver(ensemble, charge_balanced=False)
    _, energy_free = solver_free.solve()
    exact_free, _ = brute_force_min(ensemble, configs)
    assert energy_free == pytest.approx(exact_free, abs=1e-6)
    assert energy_free <= energy + 1e-9


def test_ground_state_other_constraints(small_ensemble):
    """String and tuple composition constraints restrict the search space
    (reference solver.py:141-145)."""
    ensemble = small_ensemble
    # counts dims: [Cu, Au] (species sort) on one active sublattice of 8
    # sites; encoding: code 0 = Cu, code 1 = Au
    solver = PeriodicGroundStateSolver(
        ensemble, other_constraints=["Au <= 2", ([1, 0], 7, "geq")]
    )
    occu, energy = solver.solve()
    n_au = int((occu == 1).sum())
    assert n_au <= 2 and (8 - n_au) >= 7
    configs = [
        c for c in product((0, 1), repeat=8)
        if sum(c) <= 2 and (8 - sum(c)) >= 7
    ]
    exact_e, _ = brute_force_min(ensemble, configs)
    assert energy == pytest.approx(exact_e, abs=1e-8)
    # an infeasible fixed-site-only constraint is rejected eagerly
    with pytest.raises(ValueError):
        PeriodicGroundStateSolver(
            ensemble, other_constraints=[(np.zeros(2), -1.0, "eq")]
        )


def test_groundstate_introspection(small_ensemble):
    """The MILP canonicals expose the real formulation (reference
    solver.py:316-395): variable layout, auxiliary products, objective,
    constraints, and post-solve variable values."""
    solver = PeriodicGroundStateSolver(small_ensemble)
    can = solver.canonicals
    assert isinstance(can, ProblemCanonicals)
    # 8 active binary sites -> 16 boolean variables, 2 entries per site
    assert solver.variables.size == 16
    assert len(solver.variable_indices) == small_ensemble.num_sites
    assert all(len(entry) == 2 for entry in solver.variable_indices)
    # every auxiliary product references >= 2 distinct boolean variables
    assert len(solver.indices_in_auxiliary_products) == len(
        solver.auxiliary_variables
    )
    assert all(
        len(prod) >= 2 and all(0 <= v < 16 for v in prod)
        for prod in solver.indices_in_auxiliary_products
    )
    assert can.num_auxiliary_constraints == sum(
        len(p) for p in solver.indices_in_auxiliary_products
    ) + len(solver.auxiliary_variables)
    # objective dimensions cover booleans + auxiliaries
    assert can.objective_function.c.shape == (
        16 + len(solver.auxiliary_variables),
    )
    assert can.problem["c"] is can.objective_function.c
    # values are populated by solve and recover the occupancy
    assert solver.variables.value is None
    occu, energy = solver.solve()
    np.testing.assert_array_equal(solver.ground_state_solution, solver.variables.value)
    sublattices = small_ensemble.sublattices
    occu_back = get_occupancy_from_variables(
        sublattices, solver.variables.value, solver.variable_indices
    )
    np.testing.assert_array_equal(occu_back, occu)
    values_back = get_variable_values_from_occupancy(
        sublattices, occu, solver.variable_indices
    )
    np.testing.assert_array_equal(values_back, solver.variables.value)
    solver.reset()
    assert solver.variables.value is None


def test_groundstate_helper_functions(small_ensemble):
    """Normalization constraints, auxiliary values, and per-component
    variable indices reconstruct the solver's own formulation."""
    solver = PeriodicGroundStateSolver(small_ensemble)
    occu, _ = solver.solve()
    sublattices = small_ensemble.sublattices
    # normalization: the solved variables satisfy the one-hot constraints
    (norm,) = get_normalization_constraints(
        solver.variables.value, solver.variable_indices
    )
    sums = norm.A @ solver.variables.value
    np.testing.assert_array_equal(sums, np.ones(len(sums)))
    # auxiliary values equal the products the solver found
    aux = get_auxiliary_variable_values(
        solver.variables.value, solver.indices_in_auxiliary_products
    )
    np.testing.assert_array_equal(aux, solver.auxiliary_variables.value)
    # per-component variables count the composition exactly
    comps = get_variable_indices_for_each_composition_component(
        sublattices, solver.variable_indices
    )
    values = solver.variables.value
    for dim, (var_list, n_fixed) in enumerate(comps):
        count = int(values[var_list].sum()) + n_fixed
        # recompute from occupancy
        from smol_tpu.moca.occu_utils import get_dim_ids_table, occu_to_counts

        table = get_dim_ids_table(sublattices)
        n = occu_to_counts(occu, len(comps), table)
        assert count == n[dim]


def test_variable_helpers_with_restriction(small_ensemble):
    """Restricted sites demand an initial occupancy and become -1/-2 marks."""
    sublattices = small_ensemble.sublattices
    active = [sl for sl in sublattices if sl.is_active][0]
    pinned_site = int(active.active_sites[0])
    active.restrict_sites([pinned_site])
    try:
        with pytest.raises(ValueError):
            get_variables_from_sublattices(sublattices)
        occu0 = np.zeros(small_ensemble.num_sites, dtype=np.int32)
        occu0[pinned_site] = int(active.encoding[1])
        variables, var_inds = get_variables_from_sublattices(
            sublattices, initial_occupancy=occu0
        )
        assert var_inds[pinned_site].count(-1) == 1
        assert var_inds[pinned_site].count(-2) == len(active.encoding) - 1
        # 7 remaining active binary sites
        assert variables.size == 14
        # round-trip honors the pinned species
        values = get_variable_values_from_occupancy(sublattices, occu0, var_inds)
        occu_back = get_occupancy_from_variables(sublattices, values, var_inds)
        assert occu_back[pinned_site] == occu0[pinned_site]
        # the solver itself refuses restricted sites without an occupancy
        with pytest.raises(ValueError):
            PeriodicGroundStateSolver(small_ensemble)
        solver = PeriodicGroundStateSolver(
            small_ensemble, initial_occupancy=occu0
        )
        occu, _ = solver.solve()
        assert occu[pinned_site] == occu0[pinned_site]
        ids = get_sublattice_indices_by_site(sublattices)
        assert len(ids) == small_ensemble.num_sites
    finally:
        active.reset_restricted_sites()


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


# ---------------- objective-term module functions ----------------
# The reference exposes its MILP formulation as module functions
# (upper_bound/objectives.py, terms.py, constraints.py, indices.py); these
# tests check the scipy-flavored equivalents assemble to the exact
# processor energies.


def _poly_value(terms, values):
    """Evaluate sum of fac1*fac2*prod(values[inds]) over terms."""
    total = 0.0
    for inds, fac1, fac2 in terms:
        total += fac1 * fac2 * float(np.prod(values[list(inds)]))
    return total


def test_decomposition_terms_match_energy(small_ensemble):
    """Terms from the decomposition processor reproduce the processor
    energy at arbitrary occupancies (reference objectives.py:128-230)."""
    proc = small_ensemble.processor
    sublattices = small_ensemble.sublattices
    _, var_inds = get_variables_from_sublattices(sublattices)
    rng = np.random.default_rng(5)
    terms = get_terms_from_decomposition_processor(
        var_inds, proc, sublattices=sublattices
    )
    grouped = get_terms_from_decomposition_processor(
        var_inds, proc, group_output_by_orbit=True, sublattices=sublattices
    )
    assert len(grouped) == proc.num_features
    for _ in range(3):
        occu = rng.integers(0, 2, size=small_ensemble.num_sites).astype(np.int32)
        values = get_variable_values_from_occupancy(sublattices, occu, var_inds)
        energy = proc.compute_property(occu)
        assert _poly_value(terms, values) == pytest.approx(energy, abs=1e-9)
        # grouped-by-orbit terms sum per orbit to coef * extensive feature
        features = proc.compute_feature_vector(occu)
        for orbit_id, orbit_terms in enumerate(grouped):
            assert _poly_value(orbit_terms, values) == pytest.approx(
                proc.coefs[orbit_id] * features[orbit_id], abs=1e-9
            )


def test_expansion_terms_match_energy():
    """Terms from the expansion processor reproduce its energy; grouped
    output resolves per correlation function (reference objectives.py:22-125)."""
    from smol_tpu.moca.processor.expansion import ClusterExpansionProcessor

    ce = random_expansion(fcc_binary_prim(), {2: 4.0, 3: 2.8}, seed=21)
    proc = ClusterExpansionProcessor(ce.cluster_subspace, np.diag([2, 2, 2]), ce.coefs)
    sublattices = proc.get_sublattices()
    _, var_inds = get_variables_from_sublattices(sublattices)
    rng = np.random.default_rng(11)
    occu = rng.integers(0, 2, size=proc.num_sites).astype(np.int32)
    values = get_variable_values_from_occupancy(sublattices, occu, var_inds)
    terms = get_terms_from_expansion_processor(var_inds, proc, sublattices=sublattices)
    assert _poly_value(terms, values) == pytest.approx(
        proc.compute_property(occu), abs=1e-9
    )
    grouped = get_terms_from_expansion_processor(
        var_inds, proc, group_output_by_function=True, sublattices=sublattices
    )
    assert len(grouped) == proc.num_features
    features = proc.compute_feature_vector(occu)
    for fn, fn_terms in enumerate(grouped):
        assert _poly_value(fn_terms, values) == pytest.approx(
            proc.coefs[fn] * features[fn], abs=1e-9
        )


def test_chemical_potential_terms():
    """-mu N point terms per (site, species) (reference objectives.py:292-329)."""
    ce = random_expansion(fcc_binary_prim(), {2: 4.0}, seed=3)
    ensemble = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.3, "Cu": -0.3}
    )
    sublattices = ensemble.sublattices
    _, var_inds = get_variables_from_sublattices(sublattices)
    table = ensemble.chemical_potential_table
    terms = get_terms_from_chemical_potentials(
        var_inds, table, sublattices=sublattices
    )
    rng = np.random.default_rng(2)
    occu = rng.integers(0, 2, size=ensemble.num_sites).astype(np.int32)
    values = get_variable_values_from_occupancy(sublattices, occu, var_inds)
    expected = -sum(table[s, occu[s]] for s in range(ensemble.num_sites))
    assert _poly_value(terms, values) == pytest.approx(expected, abs=1e-12)


def test_ewald_terms_and_row_mapping():
    """Ewald pair terms reproduce the Ewald processor energy; the row->
    variable mapping follows the EwaldTerm row convention (reference
    objectives.py:233-289, indices.py:64-104)."""
    from smol_tpu.moca.processor.ewald import EwaldProcessor

    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat,
        [{"Li+": 0.5, "Mn3+": 0.5}, {"O2-": 1.0}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    ce = random_expansion(prim, {2: 3.1}, seed=4, ewald=True, ewald_coef=0.05)
    ensemble = Ensemble.from_cluster_expansion(ce, np.diag([2, 1, 1]))
    ewald_proc = next(
        p for p in ensemble.processor.processors if isinstance(p, EwaldProcessor)
    )
    sublattices = ensemble.sublattices
    _, var_inds = get_variables_from_sublattices(sublattices)
    terms = get_terms_from_ewald_processor(
        var_inds, ewald_proc, sublattices=sublattices
    )
    for occu in ([0, 0, 0, 0], [1, 0, 0, 0], [1, 1, 0, 0]):
        occu = np.asarray(occu, dtype=np.int32)
        values = get_variable_values_from_occupancy(sublattices, occu, var_inds)
        assert _poly_value(terms, values) == pytest.approx(
            ewald_proc.compute_property(occu), rel=1e-9
        )
    # row -> variable mapping agrees with the processor's own (site, code)
    # index table
    mapping = map_ewald_indices_to_variable_indices(ewald_proc.structure, var_inds)
    inds = ewald_proc._ewald_inds
    n_rows = int(inds.max()) + 1
    assert len(mapping) == n_rows
    for site in range(inds.shape[0]):
        for code in range(inds.shape[1]):
            r = int(inds[site, code])
            if r >= 0:
                assert mapping[r] == var_inds[site][code]


def test_expression_and_auxiliary_from_terms():
    """Dedup, cutoff, linearization constraints, and objective assembly
    (reference terms.py:37-132)."""
    variables = BooleanVariables(3)
    terms = [
        ([0, 1], 2.0, 0.5),  # pair, duplicated below in other order
        ([1, 0], 1.0, 1.0),
        ([2], 1e-15, 1.0),  # below cutoff: dropped
        ([1], 0.5, 2.0),
        ([], 3.0, 2.0),  # constant
    ]
    objective, aux, aux_inds, constraints = get_expression_and_auxiliary_from_terms(
        terms, variables, coefficients_cutoff=1e-9
    )
    assert aux.size == 1 and aux_inds == [[0, 1]]
    assert objective.constant == pytest.approx(6.0)
    assert objective.c.shape == (4,)
    assert objective.c[2] == 0.0  # cut off
    # value at x = [1, 1, 0]: pair product active
    x = np.array([1, 1, 0])
    z = get_auxiliary_variable_values(x, aux_inds)
    full = np.concatenate([x, z])
    # pair coefficient 2.0 (1.0 + 1.0 deduped) + linear 1.0 + constant 6.0
    assert objective.c @ full + objective.constant == pytest.approx(9.0)
    # the implied auxiliary values satisfy the linearization constraints
    for con in constraints:
        vals = con.A @ full
        assert np.all(vals >= np.asarray(con.lb) - 1e-12)
        assert np.all(vals <= np.asarray(con.ub) + 1e-12)


def test_composition_constraint_functions():
    """Charge-balance and fixed-composition constraint rows evaluate
    correctly on neutral vs charged occupancies (reference
    constraints.py:104-246)."""
    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat,
        [{"Li+": 0.5, "Mn3+": 0.5}, {"O2-": 1.0}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    ce = random_expansion(prim, {2: 3.1}, seed=4, ewald=True, ewald_coef=0.05)
    ensemble = Ensemble.from_cluster_expansion(ce, np.diag([2, 1, 1]))
    sublattices = ensemble.sublattices
    variables, var_inds = get_variables_from_sublattices(sublattices)
    (charge_con,) = get_composition_space_constraints(
        sublattices, variables, var_inds, charge_balanced=True
    )

    def violation(occu):
        values = get_variable_values_from_occupancy(sublattices, occu, var_inds)
        val = float(charge_con.A @ values)
        return val < charge_con.lb - 1e-9 or val > charge_con.ub + 1e-9

    # codes on the cation sublattice: 0 = Li+ (+1), 1 = Mn3+ (+3); O2- fixed.
    # 2 cations + 2 O: one Li + one Mn is neutral (1 + 3 - 4 = 0)
    assert not violation(np.array([0, 1, 0, 0], dtype=np.int32))
    assert violation(np.array([0, 0, 0, 0], dtype=np.int32))
    assert violation(np.array([1, 1, 0, 0], dtype=np.int32))

    # fixed composition pins each species count
    occu = np.array([0, 1, 0, 0], dtype=np.int32)
    from smol_tpu.moca.occu_utils import get_dim_ids_table, occu_to_counts

    table = get_dim_ids_table(sublattices)
    n_dims = sum(len(list(sl.species)) for sl in sublattices)
    counts = occu_to_counts(occu, n_dims, table)
    (fixed_con,) = get_fixed_composition_constraints(
        sublattices, variables, var_inds, fixed_composition=counts
    )
    values = get_variable_values_from_occupancy(sublattices, occu, var_inds)
    vals = np.asarray(fixed_con.A @ values).ravel()
    np.testing.assert_allclose(vals, np.asarray(fixed_con.lb, dtype=float))
    other = get_variable_values_from_occupancy(
        sublattices, np.array([1, 1, 0, 0], dtype=np.int32), var_inds
    )
    assert np.any(np.asarray(fixed_con.A @ other).ravel() != np.asarray(fixed_con.lb))
