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
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import Bounds, LinearConstraint, milp
from scipy.sparse import lil_matrix

__all__ = ["PeriodicGroundStateSolver"]


class PeriodicGroundStateSolver:
    """Exact ground state of a CE on a fixed supercell via MILP."""

    def __init__(
        self,
        ensemble,
        fixed_composition=None,
        coef_tol=1e-12,
        ewald_tol=1e-8,
        solver_options=None,
    ):
        """Initialize the solver.

        Args:
            ensemble: an Ensemble whose processor defines the energy
                (expansion/decomposition, optionally composite with Ewald).
                Chemical potentials of the ensemble enter the objective.
            fixed_composition: optional per-dim species counts ("counts"
                format over active sublattices) to fix the composition.
            coef_tol: drop polynomial terms with |coefficient| below this.
            ewald_tol: drop Ewald matrix elements with absolute value below.
            solver_options: passed to scipy.optimize.milp options.
        """
        self.ensemble = ensemble
        self.fixed_composition = fixed_composition
        self.coef_tol = coef_tol
        self.ewald_tol = ewald_tol
        self.solver_options = solver_options or {}
        self._solution = None
        self._energy = None
        self._build()

    # ---------------- problem construction ----------------

    def _build(self):
        ensemble = self.ensemble
        processor = ensemble.processor
        sublattices = ensemble.sublattices

        # variable layout: one boolean per (active site, allowed code)
        self._site_vars = {}  # site -> {code: var index}
        self._fixed_code = {}  # inactive site -> code
        nvars = 0
        for sublatt in sublattices:
            if sublatt.is_active:
                for site in sublatt.active_sites:
                    self._site_vars[int(site)] = {
                        int(code): nvars + i
                        for i, code in enumerate(sublatt.encoding)
                    }
                    nvars += len(sublatt.encoding)
            for site in np.setdiff1d(sublatt.sites, sublatt.active_sites):
                self._fixed_code[int(site)] = int(sublatt.encoding[0])
        self._num_bool = nvars

        # linear + polynomial terms from the energy tables
        linear = np.zeros(nvars)
        constant = 0.0
        poly_terms = {}  # frozenset of var indices -> coefficient

        def add_term(var_set, coef):
            if len(var_set) == 0:
                nonlocal constant
                constant += coef
            elif len(var_set) == 1:
                linear[next(iter(var_set))] += coef
            else:
                key = frozenset(var_set)
                poly_terms[key] = poly_terms.get(key, 0.0) + coef

        constant += self._add_cluster_terms(processor, add_term)
        constant += self._add_ewald_terms(processor, add_term)

        # chemical work: -mu contribution per occupied (site, code)
        mu_table = ensemble.chemical_potential_table
        if mu_table is not None:
            for site, codes in self._site_vars.items():
                for code, var in codes.items():
                    linear[var] -= mu_table[site, code]
            for site, code in self._fixed_code.items():
                constant -= mu_table[site, code]

        # auxiliary variables for products
        self._poly_keys = list(poly_terms.keys())
        n_aux = len(self._poly_keys)
        ntot = nvars + n_aux
        cost = np.concatenate([linear, np.zeros(n_aux)])
        for a, key in enumerate(self._poly_keys):
            cost[nvars + a] = poly_terms[key]
        self._constant = constant
        self._cost = cost

        constraints = []
        # one-hot per active site
        onehot = lil_matrix((len(self._site_vars), ntot))
        for row, (site, codes) in enumerate(self._site_vars.items()):
            for var in codes.values():
                onehot[row, var] = 1
        constraints.append(LinearConstraint(onehot.tocsr(), 1, 1))

        # product linearization: z - x_i <= 0 for each factor;
        # z - sum x_i >= 1 - k  (z >= sum - (k-1))
        if n_aux:
            n_upper = sum(len(k) for k in self._poly_keys)
            upper = lil_matrix((n_upper, ntot))
            lower = lil_matrix((n_aux, ntot))
            row = 0
            for a, key in enumerate(self._poly_keys):
                z = nvars + a
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
                    np.array([1 - len(k) for k in self._poly_keys]),
                    np.inf,
                )
            )

        # fixed composition constraints
        if self.fixed_composition is not None:
            from smol_tpu.moca.occu_utils import get_dim_ids_by_sublattice

            bits = [list(sl.species) for sl in sublattices]
            dim_ids = get_dim_ids_by_sublattice(bits)
            counts = np.asarray(self.fixed_composition)
            rows = lil_matrix((len(counts), ntot))
            fixed_contrib = np.zeros(len(counts))
            for sublatt, dims in zip(sublattices, dim_ids):
                for code_pos, dim in enumerate(dims):
                    code = int(sublatt.encoding[code_pos])
                    for site in sublatt.sites:
                        site = int(site)
                        if site in self._site_vars:
                            rows[dim, self._site_vars[site][code]] = 1
                        elif self._fixed_code.get(site) == code:
                            fixed_contrib[dim] += 1
            constraints.append(
                LinearConstraint(
                    rows.tocsr(), counts - fixed_contrib, counts - fixed_contrib
                )
            )

        self._constraints = constraints
        # booleans are integer in [0,1]; aux vars continuous in [0,1]
        # (with binary x the linearization forces z to be 0/1 at optimum)
        self._integrality = np.concatenate(
            [np.ones(nvars), np.zeros(n_aux)]
        )
        self._bounds = Bounds(np.zeros(ntot), np.ones(ntot))

    def _add_cluster_terms(self, processor, add_term) -> float:
        """Polynomial terms from coefficient-folded cluster energy tables."""
        from smol_tpu.moca.processor.composite import CompositeProcessor
        from smol_tpu.moca.processor.ewald import EwaldProcessor

        if isinstance(processor, CompositeProcessor):
            constant = 0.0
            for sub in processor.processors:
                if not isinstance(sub, EwaldProcessor):
                    constant += self._add_cluster_terms(sub, add_term)
            return constant

        packed = processor.packed
        energy_flat = processor._energy_flat
        weights = processor._energy_weights
        constant = float(energy_flat[0]) * processor.size  # empty-orbit term

        n_clusters = packed.cluster_sites.shape[0]
        max_k = packed.cluster_sites.shape[1]
        for c in range(n_clusters):
            orbit = packed.cluster_orbit[c]
            w = weights[orbit]
            offset = packed.orbit_offset[orbit]
            tsize = int(packed.orbit_tensor_size[orbit])
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
                coef = w * energy_flat[offset + t]
                if abs(coef) < self.coef_tol:
                    continue
                var_set = set()
                consistent = True
                for i, size in zip(positions, sizes):
                    code = (t // int(strides[i])) % size
                    site = int(sites[i])
                    if site in self._site_vars:
                        codes = self._site_vars[site]
                        if code not in codes:
                            consistent = False
                            break
                        var_set.add(codes[code])
                    else:
                        if self._fixed_code.get(site, 0) != code:
                            consistent = False
                            break
                if consistent:
                    add_term(var_set, coef)
        return constant

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
        occu = np.zeros(self.ensemble.num_sites, dtype=np.int32)
        for site, codes in self._site_vars.items():
            for code, var in codes.items():
                if x[var] == 1:
                    occu[site] = code
        for site, code in self._fixed_code.items():
            occu[site] = code
        self._solution = occu
        self._energy = float(res.fun + self._constant)
        return occu, self._energy

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

    # reference-API conveniences (solver.py:397-482).  The reference's
    # cvxpy introspection surface (problem/variables/constraints/
    # objective_function) has no scipy-MILP analog and is intentionally
    # not mirrored — see docs/MIGRATION.md.
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

    def _add_ewald_terms(self, processor, add_term) -> float:
        """Quadratic boolean terms from an Ewald sub-processor."""
        from smol_tpu.moca.processor.composite import CompositeProcessor
        from smol_tpu.moca.processor.ewald import EwaldProcessor

        ewald_proc = None
        if isinstance(processor, EwaldProcessor):
            ewald_proc = processor
        elif isinstance(processor, CompositeProcessor):
            for sub in processor.processors:
                if isinstance(sub, EwaldProcessor):
                    ewald_proc = sub
        if ewald_proc is None:
            return 0.0

        matrix = ewald_proc.ewald_matrix * float(ewald_proc.coefs[0])
        inds = ewald_proc._ewald_inds  # [n_sites, max_codes], -1 = vacancy
        constant = 0.0
        # boolean b_r for Ewald row r maps to a (site, code) variable or a
        # fixed 0/1; E = sum_{r<=s} (2 - delta_rs) M[r,s] b_r b_s
        row_var = {}
        row_fixed = {}
        for site in range(inds.shape[0]):
            for code in range(inds.shape[1]):
                r = int(inds[site, code])
                if r < 0:
                    continue
                if site in self._site_vars:
                    if code in self._site_vars[site]:
                        row_var[r] = self._site_vars[site][code]
                    else:
                        row_fixed[r] = 0
                else:
                    row_fixed[r] = 1 if self._fixed_code.get(site, 0) == code else 0
        n_ew = matrix.shape[0]
        for r in range(n_ew):
            for s in range(r, n_ew):
                coef = (1.0 if r == s else 2.0) * matrix[r, s]
                if abs(coef) < self.ewald_tol:
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
                if len(factors) == 0:
                    constant += coef
                else:
                    add_term(set(factors), coef)
        return constant
