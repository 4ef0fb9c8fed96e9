"""Periodic ground-state solving as a pseudo-boolean MILP.

Re-design of the reference upper-bound solver
(smol/capp/generate/groundstate/upper_bound/): one boolean variable per
(active site, species code); the CE energy in cluster-decomposition form

    E = offset + sum_clusters H_c[tensor index of cluster occupancy]

becomes a polynomial over the booleans: each (cluster, code-combo) entry
contributes coefficient * prod_i x[site_i, v_i].  Products are linearized
with standard auxiliary variables (z <= x_i, z >= sum x_i - (k-1), z >= 0),
and the MILP is solved with scipy.optimize.milp (HiGHS), replacing the
reference's cvxpy + SCIP/Gurobi dependency.  Optional chemical potentials
(semigrand) and fixed-composition constraints are supported; an Ewald term
adds pairwise products of the occupied-row booleans.

The module-level functions mirror the reference's upper_bound package
surface (variables.py, indices.py, constraints.py, objectives.py, terms.py)
with scipy-flavored return types: "terms" are ``(variable_indices, factor_1,
factor_2)`` tuples whose product is the term coefficient, constraints are
``scipy.optimize.LinearConstraint`` objects, and the linearized objective is
a :class:`MilpObjective`.  ``PeriodicGroundStateSolver`` is assembled
entirely from these functions.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np
from scipy import sparse
from scipy.optimize import Bounds, LinearConstraint, milp
from scipy.sparse import lil_matrix

__all__ = [
    "PeriodicGroundStateSolver",
    "ProblemCanonicals",
    "BooleanVariables",
    "MilpObjective",
    "get_sublattice_indices_by_site",
    "get_variables_from_sublattices",
    "get_occupancy_from_variables",
    "get_variable_values_from_occupancy",
    "get_normalization_constraints",
    "get_composition_space_constraints",
    "get_fixed_composition_constraints",
    "get_auxiliary_variable_values",
    "get_expression_and_auxiliary_from_terms",
    "get_variable_indices_for_each_composition_component",
    "get_terms_from_expansion_processor",
    "get_terms_from_decomposition_processor",
    "get_terms_from_ewald_processor",
    "get_terms_from_chemical_potentials",
    "map_ewald_indices_to_variable_indices",
]


class BooleanVariables:
    """A minimal variable handle (the cvxpy.Variable stand-in).

    Holds the variable count and, after solving, the 0/1 ``value`` array —
    the two things reference workflows read off cvxpy variables
    (reference upper_bound/variables.py:123-139).
    """

    def __init__(self, size: int, name: str = "s"):
        self.size = int(size)
        self.name = name
        self.value = None

    def __len__(self):
        return self.size

    def __repr__(self):
        return f"BooleanVariables({self.name}, size={self.size})"


class MilpObjective(NamedTuple):
    """The linearized objective min c @ x + constant over [bool; aux] vars."""

    c: np.ndarray
    constant: float


class ProblemCanonicals(NamedTuple):
    """Canonical objects of the underlying MILP.

    The scipy-flavored analog of the reference's cvxpy canonicals
    (reference upper_bound/solver.py:41-77); fields keep the reference
    names.  ``problem`` bundles exactly the arguments passed to
    scipy.optimize.milp.
    """

    problem: dict
    variables: BooleanVariables
    variable_indices: List[List[int]]
    auxiliary_variables: BooleanVariables
    indices_in_auxiliary_products: List[List[int]]
    objective_function: MilpObjective
    constraints: list
    num_auxiliary_constraints: int


def get_sublattice_indices_by_site(sublattices) -> np.ndarray:
    """Index of the sublattice containing each site (reference indices.py:107)."""
    num_sites = sum(len(sl.sites) for sl in sublattices)
    out = np.full(num_sites, -1, dtype=int)
    for sl_id, sublatt in enumerate(sublattices):
        out[np.asarray(sublatt.sites, dtype=int)] = sl_id
    if np.any(out < 0):
        raise ValueError("Sublattices do not cover every site.")
    return out


def get_variables_from_sublattices(sublattices, structure=None, initial_occupancy=None):
    """Boolean variables + per-site variable indices for the MILP.

    Returns ``(BooleanVariables, variable_indices)`` following the reference
    convention (upper_bound/variables.py:19-121): each site gets one entry
    per species of its sublattice site space, holding the flat variable
    index, or -1 (species enforced: restricted/inactive site) or -2
    (species never allowed).  Manually restricted sites require
    initial_occupancy to know the enforced species.  ``structure`` is
    accepted for reference-signature parity; the site count and site spaces
    are taken from the sublattices (which must cover every site).
    """
    site_sublattice_ids = get_sublattice_indices_by_site(sublattices)
    num_sites = len(site_sublattice_ids)
    variable_indices: list[list[int]] = []
    n_variables = 0
    for site_id in range(num_sites):
        sublatt = sublattices[site_sublattice_ids[site_id]]
        encoding = list(np.asarray(sublatt.encoding, dtype=int))
        site_entry = []
        if len(encoding) <= 1:
            site_entry = [-1] * len(encoding)
        elif site_id in np.asarray(sublatt.active_sites, dtype=int):
            for _ in encoding:
                site_entry.append(n_variables)
                n_variables += 1
        else:
            if initial_occupancy is None:
                raise ValueError(
                    f"Site {site_id} is restricted in sub-lattice {sublatt} "
                    "but no initial occupancy was specified!"
                )
            enforced = int(initial_occupancy[site_id])
            site_entry = [-1 if code == enforced else -2 for code in encoding]
            if -1 not in site_entry:
                raise ValueError(
                    f"Initial occupancy code {enforced} of restricted site "
                    f"{site_id} is not allowed in sub-lattice {sublatt}."
                )
        variable_indices.append(site_entry)
    return BooleanVariables(n_variables), variable_indices


def _site_code_maps(variable_indices, sublattices=None):
    """Per-site ``{code: var}`` maps plus the enforced code of fixed sites.

    Positions within each ``variable_indices`` entry correspond to the
    sublattice encoding when ``sublattices`` is given, otherwise to the
    species code directly (the reference's assumption for ensembles built
    from a cluster expansion, objectives.py:313-315).
    """
    if sublattices is not None:
        site_sublatt = get_sublattice_indices_by_site(sublattices)
        encodings = [
            list(np.asarray(sublattices[site_sublatt[s]].encoding, dtype=int))
            for s in range(len(variable_indices))
        ]
    else:
        encodings = [list(range(len(entry))) for entry in variable_indices]
    site_vars, fixed_code = [], []
    for entry, encoding in zip(variable_indices, encodings):
        cmap = {}
        enforced = None
        for code, var in zip(encoding, entry):
            if var >= 0:
                cmap[int(code)] = int(var)
            elif var == -1:
                enforced = int(code)
        site_vars.append(cmap)
        fixed_code.append(enforced)
    return site_vars, fixed_code


def get_normalization_constraints(variables, variable_indices):
    """One-hot LinearConstraints: each active site's variables sum to 1.

    The scipy analog of the reference's per-site cvxpy constraints
    (upper_bound/constraints.py:21-41).
    """
    active = [
        entry for entry in variable_indices if entry and entry[0] >= 0
    ]
    ntot = len(variables)
    rows = lil_matrix((len(active), ntot))
    for r, entry in enumerate(active):
        for var in entry:
            rows[r, var] = 1
    return [LinearConstraint(rows.tocsr(), 1, 1)]


def get_variable_indices_for_each_composition_component(
    sublattices, variable_indices, structure=None
):
    """Variables + fixed-site count per "counts" composition component.

    Returns ``[(variable_indices, n_fixed), ...]`` per component in the
    moca.composition counts ordering (reference upper_bound/indices.py:14-61).
    ``structure`` is accepted for signature parity.
    """
    from smol_tpu.moca.occu_utils import get_dim_ids_by_sublattice

    bits = [list(sl.species) for sl in sublattices]
    dim_ids = get_dim_ids_by_sublattice(bits)
    n_dims = sum(len(b) for b in bits)
    out = [([], 0) for _ in range(n_dims)]
    for sublatt, dims in zip(sublattices, dim_ids):
        for code_pos, dim in enumerate(dims):
            var_list, n_fixed = out[dim]
            for site in np.asarray(sublatt.sites, dtype=int):
                entry = variable_indices[site]
                if entry and entry[code_pos] >= 0:
                    var_list.append(int(entry[code_pos]))
                elif entry and entry[code_pos] == -1:
                    n_fixed += 1
            out[dim] = (var_list, n_fixed)
    return out


def _counts_row(coefs, dim_components, num_variables):
    """One constraint row sum_dim coefs[dim]*counts[dim] + its fixed offset."""
    row = lil_matrix((1, num_variables))
    offset = 0.0
    for dim, coef in enumerate(coefs):
        if coef == 0:
            continue
        var_list, n_fixed = dim_components[dim]
        for var in var_list:
            row[0, var] += coef
        offset += coef * n_fixed
    return row.tocsr(), offset


def get_composition_space_constraints(
    sublattices,
    variables,
    variable_indices,
    processor_structure=None,
    charge_balanced=True,
    other_constraints=None,
):
    """Composition constraints over the boolean variables.

    Charge balance plus generic composition constraints in the
    moca.composition grammar — counts are per SUPER-cell (reference
    upper_bound/constraints.py:104-181).  Constraint strings are parsed
    against the sublattice site spaces; tuple entries are
    ``(coefficients, rhs, "eq"|"leq"|"geq")`` over the counts dimensions.
    ``processor_structure`` is accepted for reference-signature parity.
    """
    num_variables = len(variables)
    dim_components = get_variable_indices_for_each_composition_component(
        sublattices, variable_indices
    )
    bits = [list(sl.species) for sl in sublattices]
    constraints = []

    if charge_balanced:
        charges = np.array(
            [
                float(getattr(sp, "oxi_state", 0) or 0)
                for species in bits
                for sp in species
            ]
        )
        if np.any(charges != 0):
            row, offset = _counts_row(charges, dim_components, num_variables)
            constraints.append(LinearConstraint(row, -offset, -offset))

    for entry in other_constraints or []:
        if isinstance(entry, str):
            from smol_tpu.moca.composition.constraints import (
                parse_constraint_string,
            )

            a, b, relation = parse_constraint_string(
                entry, [sl.site_space for sl in sublattices]
            )
        else:
            a, b, relation = entry
        a = np.asarray(a, dtype=np.float64)
        row, offset = _counts_row(a, dim_components, num_variables)
        rhs = float(b) - offset
        if row.nnz == 0:
            satisfied = offset == float(b) if relation == "eq" else offset <= float(b)
            if not satisfied:
                raise ValueError(
                    f"Constraint {entry!r} touches no free variables and "
                    "is violated by the fixed sites."
                )
            continue
        if relation == "eq":
            constraints.append(LinearConstraint(row, rhs, rhs))
        elif relation == "leq":
            constraints.append(LinearConstraint(row, -np.inf, rhs))
        elif relation == "geq":
            constraints.append(LinearConstraint(row, rhs, np.inf))
        else:
            raise ValueError(f"Unknown constraint relation {relation!r}.")
    return constraints


def get_fixed_composition_constraints(
    sublattices,
    variables,
    variable_indices,
    processor_structure=None,
    fixed_composition=None,
):
    """Fix species counts in the supercell (canonical ground states).

    ``fixed_composition`` is in CompositionSpace "counts" format over the
    leading dimensions (reference upper_bound/constraints.py:184-246).
    """
    counts = np.asarray(fixed_composition)
    num_variables = len(variables)
    dim_components = get_variable_indices_for_each_composition_component(
        sublattices, variable_indices
    )
    rows = lil_matrix((len(counts), num_variables))
    fixed = np.zeros(len(counts))
    for dim in range(len(counts)):
        var_list, n_fixed = dim_components[dim]
        for var in var_list:
            rows[dim, var] = 1
        fixed[dim] = n_fixed
    return [LinearConstraint(rows.tocsr(), counts - fixed, counts - fixed)]


def get_auxiliary_variable_values(variable_values, indices_in_auxiliary_products):
    """Auxiliary slack values implied by site variables: the products.

    (reference upper_bound/terms.py:13-35)
    """
    values = np.round(np.asarray(variable_values)).astype(int)
    return np.array(
        [int(np.all(values[list(prod)] == 1)) for prod in indices_in_auxiliary_products],
        dtype=int,
    )


def get_expression_and_auxiliary_from_terms(
    cluster_terms, variables, coefficients_cutoff=0.0
):
    """Linearize polynomial boolean terms into a MILP objective.

    Deduplicates terms by their sorted variable-index tuple (summing
    ``factor_1 * factor_2``), drops non-constant terms whose summed
    coefficient falls below ``coefficients_cutoff``, and introduces one
    auxiliary variable per surviving multi-body product with the standard
    linearization constraints z <= x_i and z >= sum x_i - (k-1).

    Returns ``(MilpObjective, BooleanVariables, indices_in_auxiliary_products,
    constraints)`` — the scipy analog of the reference's
    (expression, aux variable, product indices, constraints) tuple
    (upper_bound/terms.py:37-132).  The objective ``c`` spans the
    ``len(variables) + n_aux`` columns of the full MILP variable vector, as
    do the returned LinearConstraints.
    """
    n_bool = len(variables)
    simplified: dict = {}
    for inds, fac1, fac2 in cluster_terms:
        key = tuple(sorted(set(int(i) for i in inds)))
        simplified[key] = simplified.get(key, 0.0) + float(fac1) * float(fac2)

    constant = simplified.pop((), 0.0)
    linear = np.zeros(n_bool)
    aux_keys = []
    aux_coefs = []
    for key, coef in simplified.items():
        if abs(coef) < coefficients_cutoff:
            continue
        if len(key) == 1:
            linear[key[0]] += coef
        else:
            aux_keys.append(key)
            aux_coefs.append(coef)

    n_aux = len(aux_keys)
    ntot = n_bool + n_aux
    c = np.concatenate([linear, np.asarray(aux_coefs, dtype=np.float64)])
    objective = MilpObjective(c=c, constant=float(constant))
    aux_variables = BooleanVariables(n_aux, name="z")
    indices = [list(key) for key in aux_keys]

    constraints = []
    if n_aux:
        n_upper = sum(len(k) for k in aux_keys)
        upper = lil_matrix((n_upper, ntot))
        lower = lil_matrix((n_aux, ntot))
        row = 0
        for a, key in enumerate(aux_keys):
            z = n_bool + a
            for x in key:
                upper[row, z] = 1
                upper[row, x] = -1
                row += 1
            lower[a, z] = 1
            for x in key:
                lower[a, x] = -1
        constraints.append(LinearConstraint(upper.tocsr(), -np.inf, 0))
        constraints.append(
            LinearConstraint(
                lower.tocsr(),
                np.array([1 - len(k) for k in aux_keys]),
                np.inf,
            )
        )
    return objective, aux_variables, indices, constraints


def _packed_cluster_var_sets(packed, site_vars, fixed_code):
    """Yield ``(cluster, orbit_id, t, var_tuple)`` per consistent tensor entry.

    Walks every cluster of a PackedSupercell; for each flat tensor entry
    ``t`` of the cluster's orbit, decodes the per-position species codes from
    the C-order strides and maps them onto boolean variables.  Entries whose
    codes conflict with an enforced site species are skipped (the cluster
    configuration can never occur).
    """
    n_clusters = packed.cluster_sites.shape[0]
    max_k = packed.cluster_sites.shape[1]
    for c in range(n_clusters):
        orbit_id = int(packed.cluster_orbit[c])
        tsize = int(packed.orbit_tensor_size[orbit_id])
        strides = packed.cluster_strides[c]
        sites = packed.cluster_sites[c]
        # position code-counts from the C-order stride ratios:
        # size_i = previous nonzero stride / stride_i (position 0: tsize)
        positions, sizes = [], []
        prev = tsize
        for i in range(max_k):
            s = int(strides[i])
            if s == 0:
                continue
            positions.append(i)
            sizes.append(prev // s)
            prev = s
        for t in range(tsize):
            var_set = set()
            consistent = True
            for i, size in zip(positions, sizes):
                code = (t // int(strides[i])) % size
                site = int(sites[i])
                cmap = site_vars[site]
                if cmap:
                    if code not in cmap:
                        consistent = False
                        break
                    var_set.add(cmap[code])
                elif fixed_code[site] != code:
                    consistent = False
                    break
            if consistent:
                yield c, orbit_id, t, tuple(sorted(var_set))


def _get_terms_folded(processor, variable_indices, sublattices=None):
    """Terms from a packed processor's coefficient-folded energy tables."""
    packed = processor.packed
    site_vars, fixed_code = _site_code_maps(variable_indices, sublattices)
    flat = processor._energy_flat
    weights = processor._energy_weights
    size = float(processor.size)
    terms = [([], float(flat[0]), size)]  # empty-orbit offset per prim
    offsets = packed.orbit_offset
    for _, orbit_id, t, var_set in _packed_cluster_var_sets(
        packed, site_vars, fixed_code
    ):
        fac1 = float(flat[int(offsets[orbit_id]) + t])
        if fac1 == 0.0:
            continue
        terms.append((list(var_set), fac1, float(weights[orbit_id])))
    return terms


def get_terms_from_expansion_processor(
    variable_indices,
    expansion_processor,
    group_output_by_function=False,
    sublattices=None,
):
    """Cluster terms from a ClusterExpansionProcessor.

    Each term is ``(variable_indices, factor_1, factor_2)`` with the term
    coefficient = factor_1 * factor_2; energy is per SUPER-cell (reference
    upper_bound/objectives.py:22-125).  With ``group_output_by_function``
    the result is one term list per correlation function (function 0 = the
    constant), for inspecting per-function contributions.  ``sublattices``
    optionally maps variable positions through non-trivial encodings (split
    sublattices); by default positions are species codes.
    """
    proc = expansion_processor
    if not group_output_by_function:
        return _get_terms_folded(proc, variable_indices, sublattices)

    packed = proc.packed
    site_vars, fixed_code = _site_code_maps(variable_indices, sublattices)
    coefs = proc.coefs
    size = float(proc.size)
    weights = size / np.maximum(packed.orbit_cluster_count, 1)
    orbits = proc.cluster_subspace.orbits
    flat_tensors = {o.id: np.asarray(o.flat_correlation_tensors) for o in orbits}
    bit_ids = {o.id: o.bit_id for o in orbits}
    grouped = [[] for _ in range(packed.num_corr)]
    grouped[0].append(([], float(coefs[0]), size))
    for _, orbit_id, t, var_set in _packed_cluster_var_sets(
        packed, site_vars, fixed_code
    ):
        tensors = flat_tensors[orbit_id]
        for k in range(tensors.shape[0]):
            fac1 = float(tensors[k, t])
            if fac1 == 0.0:
                continue
            fn = bit_ids[orbit_id] + k
            grouped[fn].append(
                (list(var_set), fac1, float(coefs[fn] * weights[orbit_id]))
            )
    return grouped


def get_terms_from_decomposition_processor(
    variable_indices,
    decomposition_processor,
    group_output_by_orbit=False,
    sublattices=None,
):
    """Cluster terms from a ClusterDecompositionProcessor.

    Same conventions as :func:`get_terms_from_expansion_processor`
    (reference upper_bound/objectives.py:128-230); with
    ``group_output_by_orbit`` the result is one term list per orbit (orbit
    0 = the constant offset term).
    """
    proc = decomposition_processor
    if not group_output_by_orbit:
        return _get_terms_folded(proc, variable_indices, sublattices)

    packed = proc.packed
    site_vars, fixed_code = _site_code_maps(variable_indices, sublattices)
    coefs = proc.coefs
    size = float(proc.size)
    weights = size / np.maximum(packed.orbit_cluster_count, 1)
    inter_flat = proc._inter_flat
    offsets = packed.orbit_offset
    grouped = [[] for _ in range(packed.num_orbits)]
    grouped[0].append(([], float(inter_flat[0]), float(coefs[0]) * size))
    for _, orbit_id, t, var_set in _packed_cluster_var_sets(
        packed, site_vars, fixed_code
    ):
        fac1 = float(inter_flat[int(offsets[orbit_id]) + t])
        if fac1 == 0.0:
            continue
        grouped[orbit_id].append(
            (list(var_set), fac1, float(coefs[orbit_id] * weights[orbit_id]))
        )
    return grouped


def get_terms_from_ewald_processor(
    variable_indices, ewald_processor, tol=0.0, sublattices=None
):
    """Pairwise boolean terms from an EwaldProcessor.

    E = sum_{r<=s} (2 - delta_rs) M[r,s] b_r b_s over the Ewald-row
    booleans; rows map onto site variables (always-occupied rows drop their
    factor, never-occupied rows kill the term).  Matrix elements whose
    scaled magnitude falls below ``tol`` are dropped.  (reference
    upper_bound/objectives.py:233-289)
    """
    site_vars, fixed_code = _site_code_maps(variable_indices, sublattices)
    inds = ewald_processor._ewald_inds  # [n_sites, max_codes], -1 = vacancy
    coef = float(ewald_processor.coefs[0])
    matrix = ewald_processor.ewald_matrix

    row_var, row_fixed = {}, {}
    for site in range(inds.shape[0]):
        for code in range(inds.shape[1]):
            r = int(inds[site, code])
            if r < 0:
                continue
            cmap = site_vars[site]
            if cmap:
                if code in cmap:
                    row_var[r] = cmap[code]
                else:
                    row_fixed[r] = 0
            else:
                row_fixed[r] = 1 if fixed_code[site] == code else 0

    terms = []
    n_ew = matrix.shape[0]
    for r in range(n_ew):
        for s in range(r, n_ew):
            fac1 = (1.0 if r == s else 2.0) * matrix[r, s]
            if abs(fac1 * coef) < tol:
                continue
            factors = []
            fixed_val = 1
            for row in {r, s}:
                if row in row_var:
                    factors.append(row_var[row])
                else:
                    fixed_val *= row_fixed.get(row, 0)
            if fixed_val == 0:
                continue
            terms.append((sorted(factors), fac1, coef))
    return terms


def get_terms_from_chemical_potentials(
    variable_indices, chemical_table, sublattices=None
):
    """Point terms -mu*N from a per-(site, code) chemical-potential table.

    Negation included, giving E - mu N (reference
    upper_bound/objectives.py:292-329).
    """
    chemical_table = np.asarray(chemical_table)
    site_vars, fixed_code = _site_code_maps(variable_indices, sublattices)
    terms = []
    for site, cmap in enumerate(site_vars):
        for code, var in cmap.items():
            terms.append(([var], -float(chemical_table[site, code]), 1.0))
        if not cmap and fixed_code[site] is not None:
            terms.append(([], -float(chemical_table[site, fixed_code[site]]), 1.0))
    return terms


def map_ewald_indices_to_variable_indices(structure, variable_indices):
    """Map Ewald-matrix row indices to boolean variable indices.

    Rows follow the EwaldTerm convention — one row per (site, non-vacancy
    allowed species) in site-space order.  Always-occupied rows (single
    species or the enforced species of a restricted site) map to -1;
    never-occupied rows map to -2.  (reference upper_bound/indices.py:64-104)
    """
    from smol_tpu.cofe.extern.ewald import EwaldTerm

    _, inds = EwaldTerm.get_ewald_structure(structure)
    n_rows = int(inds.max()) + 1
    out = [-2] * n_rows
    for site in range(inds.shape[0]):
        entry = variable_indices[site]
        for code in range(inds.shape[1]):
            r = int(inds[site, code])
            if r >= 0 and code < len(entry):
                out[r] = int(entry[code])
    return out


def get_occupancy_from_variables(sublattices, variable_values, variable_indices):
    """Encoded occupancy from boolean variable values.

    Inverse of get_variable_values_from_occupancy (reference
    upper_bound/variables.py:123-167).
    """
    values = np.round(np.asarray(variable_values)).astype(int)
    site_sublattice_ids = get_sublattice_indices_by_site(sublattices)
    occu = np.full(len(variable_indices), -1, dtype=np.int64)
    for site_id, indices in enumerate(variable_indices):
        sublatt = sublattices[site_sublattice_ids[site_id]]
        encoding = np.asarray(sublatt.encoding, dtype=int)
        site_indices = np.asarray(indices, dtype=int)
        var_inds = site_indices[site_indices >= 0]
        if len(var_inds) > 0:
            occupied = np.where(values[var_inds] == 1)[0]
            if len(occupied) != 1:
                raise ValueError(
                    f"Exactly one species must occupy site {site_id}; "
                    f"got {len(occupied)}."
                )
            occu[site_id] = encoding[occupied[0]]
        else:
            enforced = np.where(site_indices == -1)[0]
            if len(enforced) == 0:
                raise ValueError(
                    f"Site {site_id} has neither variables nor an enforced "
                    "species."
                )
            occu[site_id] = encoding[enforced[0]]
    return occu.astype(np.int32)


def get_variable_values_from_occupancy(sublattices, occupancy, variable_indices):
    """Boolean variable values encoding an occupancy.

    (reference upper_bound/variables.py:169-210; no constraint checks)
    """
    num_variables = max(max(sub, default=-1) for sub in variable_indices) + 1
    values = np.zeros(num_variables, dtype=int)
    site_sublattice_ids = get_sublattice_indices_by_site(sublattices)
    occupancy = np.asarray(occupancy, dtype=int)
    for site_id, indices in enumerate(variable_indices):
        sublatt = sublattices[site_sublattice_ids[site_id]]
        encoding = np.asarray(sublatt.encoding, dtype=int)
        site_indices = np.asarray(indices, dtype=int)
        var_inds = site_indices[site_indices >= 0]
        if len(var_inds) > 0:
            pos = np.where(encoding == occupancy[site_id])[0]
            if len(pos) == 0:
                raise ValueError(
                    f"Occupancy code {occupancy[site_id]} of site {site_id} "
                    f"is not in its sub-lattice encoding {encoding}."
                )
            values[var_inds[pos[0]]] = 1
    return values


def _pad_constraint(constraint, ntot):
    """Widen a LinearConstraint's matrix with zero columns to ntot."""
    mat = constraint.A
    if not sparse.issparse(mat):
        mat = sparse.csr_matrix(mat)
    extra = ntot - mat.shape[1]
    if extra > 0:
        mat = sparse.hstack(
            [mat, sparse.csr_matrix((mat.shape[0], extra))], format="csr"
        )
    return LinearConstraint(mat, constraint.lb, constraint.ub)


class PeriodicGroundStateSolver:
    """Exact ground state of a CE on a fixed supercell via MILP."""

    def __init__(
        self,
        ensemble,
        charge_balanced=True,
        fixed_composition=None,
        initial_occupancy=None,
        other_constraints=None,
        coef_tol=1e-12,
        ewald_tol=1e-8,
        solver_options=None,
    ):
        """Initialize the solver.

        Args:
            ensemble: an Ensemble whose processor defines the energy
                (expansion/decomposition, optionally composite with Ewald).
                Chemical potentials of the ensemble enter the objective.
            charge_balanced: enforce supercell charge neutrality (reference
                solver.py:122; a no-op for charge-free systems).
            fixed_composition: optional per-dim species counts ("counts"
                format over active sublattices) to fix the composition.
            initial_occupancy: encoded occupancy supplying the enforced
                species of manually restricted sites (mandatory if any site
                of an active sublattice was restricted; reference
                upper_bound/variables.py:41-44).
            other_constraints: extra composition constraints — strings in
                the moca.composition grammar (counts are per supercell, not
                per prim; reference solver.py:141-145) or
                ``(coefficients, rhs, "eq"|"leq"|"geq")`` tuples over the
                counts dimensions.
            coef_tol: drop polynomial terms with |coefficient| below this.
            ewald_tol: drop Ewald matrix elements with absolute value below.
            solver_options: passed to scipy.optimize.milp options.
        """
        self.ensemble = ensemble
        self.charge_balanced = charge_balanced
        self.fixed_composition = fixed_composition
        self.initial_occupancy = initial_occupancy
        self._other_constraints = other_constraints
        self.coef_tol = coef_tol
        self.ewald_tol = ewald_tol
        self.solver_options = solver_options or {}
        self._solution = None
        self._energy = None
        self._raw_solution = None
        self._build()

    # ---------------- problem construction ----------------

    def _iter_sub_processors(self):
        from smol_tpu.moca.processor.composite import CompositeProcessor

        processor = self.ensemble.processor
        if isinstance(processor, CompositeProcessor):
            return list(processor.processors)
        return [processor]

    def _build(self):
        from smol_tpu.moca.processor.ewald import EwaldProcessor
        from smol_tpu.moca.processor.expansion import ClusterDecompositionProcessor

        ensemble = self.ensemble
        sublattices = ensemble.sublattices

        # variable layout: one boolean per (active site, allowed code), in
        # the reference's site-major convention (-1 enforced / -2 forbidden)
        self._variables, self._variable_indices = get_variables_from_sublattices(
            sublattices, initial_occupancy=self.initial_occupancy
        )
        nvars = self._variables.size
        self._num_bool = nvars

        # polynomial terms from every sub-processor plus chemical work
        terms = []
        for sub in self._iter_sub_processors():
            if isinstance(sub, EwaldProcessor):
                terms += get_terms_from_ewald_processor(
                    self._variable_indices,
                    sub,
                    tol=self.ewald_tol,
                    sublattices=sublattices,
                )
            elif isinstance(sub, ClusterDecompositionProcessor):
                terms += get_terms_from_decomposition_processor(
                    self._variable_indices, sub, sublattices=sublattices
                )
            else:
                terms += get_terms_from_expansion_processor(
                    self._variable_indices, sub, sublattices=sublattices
                )
        mu_table = ensemble.chemical_potential_table
        if mu_table is not None:
            terms += get_terms_from_chemical_potentials(
                self._variable_indices, mu_table, sublattices=sublattices
            )

        # linearized objective + auxiliary product variables
        (
            objective,
            self._aux_variables,
            self._aux_inds,
            aux_constraints,
        ) = get_expression_and_auxiliary_from_terms(
            terms, self._variables, self.coef_tol
        )
        self._cost = objective.c
        self._constant = objective.constant
        n_aux = self._aux_variables.size
        ntot = nvars + n_aux
        self._num_aux_constraints = sum(
            c.A.shape[0] for c in aux_constraints
        )

        # constraints over the booleans, padded to the full variable vector
        bool_constraints = get_normalization_constraints(
            self._variables, self._variable_indices
        )
        bool_constraints += get_composition_space_constraints(
            sublattices,
            self._variables,
            self._variable_indices,
            processor_structure=ensemble.processor.structure,
            charge_balanced=self.charge_balanced,
            other_constraints=self._other_constraints,
        )
        if self.fixed_composition is not None:
            bool_constraints += get_fixed_composition_constraints(
                sublattices,
                self._variables,
                self._variable_indices,
                processor_structure=ensemble.processor.structure,
                fixed_composition=self.fixed_composition,
            )
        self._constraints = [
            _pad_constraint(c, ntot) for c in bool_constraints
        ] + list(aux_constraints)

        # booleans are integer in [0,1]; aux vars continuous in [0,1]
        # (with binary x the linearization forces z to be 0/1 at optimum)
        self._integrality = np.concatenate([np.ones(nvars), np.zeros(n_aux)])
        self._bounds = Bounds(np.zeros(ntot), np.ones(ntot))

    # ---------------- solving ----------------

    def solve(self):
        """Solve the MILP; returns (occupancy, energy)."""
        res = milp(
            c=self._cost,
            constraints=self._constraints,
            integrality=self._integrality,
            bounds=self._bounds,
            options=self.solver_options,
        )
        if not res.success:
            raise RuntimeError(f"Ground-state MILP failed: {res.message}")
        x = np.round(res.x[: self._num_bool]).astype(int)
        self._raw_solution = x
        self._variables.value = x
        self._aux_variables.value = np.round(res.x[self._num_bool :]).astype(int)
        self._solution = get_occupancy_from_variables(
            self.ensemble.sublattices, x, self._variable_indices
        )
        self._energy = float(res.fun + self._constant)
        return self._solution, self._energy

    @property
    def ground_state_occupancy(self):
        if self._solution is None:
            self.solve()
        return self._solution

    @property
    def ground_state_energy(self) -> float:
        if self._solution is None:
            self.solve()
        return self._energy

    @property
    def ground_state_structure(self):
        return self.ensemble.processor.structure_from_occupancy(
            self.ground_state_occupancy
        )

    # ---------------- introspection (reference solver.py:316-395) --------
    # The reference exposes its cvxpy canonicals; here the same names expose
    # the scipy-MILP formulation (cost vector, LinearConstraints, variable
    # handles with .value set after solve).

    @property
    def canonicals(self) -> ProblemCanonicals:
        """Canonical MILP objects (reference solver.py:318)."""
        return ProblemCanonicals(
            problem={
                "c": self._cost,
                "constraints": self._constraints,
                "integrality": self._integrality,
                "bounds": self._bounds,
                "options": self.solver_options,
            },
            variables=self._variables,
            variable_indices=self._variable_indices,
            auxiliary_variables=self._aux_variables,
            indices_in_auxiliary_products=self.indices_in_auxiliary_products,
            objective_function=self.objective_function,
            constraints=self._constraints,
            num_auxiliary_constraints=self._num_aux_constraints,
        )

    @property
    def problem(self) -> dict:
        """The scipy.optimize.milp argument bundle (reference solver.py:327)."""
        return self.canonicals.problem

    @property
    def variables(self) -> BooleanVariables:
        """Boolean site-species variables; .value after solve (solver.py:336)."""
        return self._variables

    @property
    def variable_indices(self) -> list:
        """Per-site variable indices, -1 enforced / -2 forbidden (solver.py:345)."""
        return self._variable_indices

    @property
    def objective_function(self) -> MilpObjective:
        """Linearized objective min c @ [x; z] + constant (solver.py:355)."""
        return MilpObjective(c=self._cost, constant=self._constant)

    @property
    def constraints(self) -> list:
        """LinearConstraints: one-hot, linearization, composition (solver.py:366)."""
        return self._constraints

    @property
    def auxiliary_variables(self) -> BooleanVariables:
        """Slack variables linearizing polynomial terms (solver.py:380)."""
        return self._aux_variables

    @property
    def indices_in_auxiliary_products(self) -> list:
        """Variable indices whose product each auxiliary equals (solver.py:389)."""
        return [list(key) for key in self._aux_inds]

    @property
    def ground_state_solution(self) -> np.ndarray:
        """Boolean variable values at the ground state (solver.py:446)."""
        if self._raw_solution is None:
            self.solve()
        return self._raw_solution

    @property
    def structure(self):
        """Alias of ground_state_structure (reference solver.py:476)."""
        return self.ground_state_structure

    @property
    def sublattices(self):
        """Sublattices of the underlying ensemble."""
        return self.ensemble.sublattices

    def reset(self):
        """Discard the stored solution so the next access re-solves."""
        self._solution = None
        self._energy = None
        self._raw_solution = None
        self._variables.value = None
        self._aux_variables.value = None
