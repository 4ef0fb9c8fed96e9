"""Orbit invariants (reference tests/test_cofe/test_orbit.py).

Checks symmetry-derived structure: cluster images, permutation closure,
bit-combo symmetry distinctness, correlation-tensor consistency with the
site bases, flat-tensor stride indexing, suborbit logic, and pruning.
"""

from itertools import product

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim, fcc_ternary_prim
from smol_tpu.cofe import ClusterSubspace


@pytest.fixture(scope="module")
def binary_subspace():
    return ClusterSubspace.from_cutoffs(fcc_binary_prim(), {2: 4.2, 3: 3.0})


@pytest.fixture(scope="module")
def ternary_subspace():
    return ClusterSubspace.from_cutoffs(fcc_ternary_prim(), {2: 4.0})


def all_orbits(subspace):
    return subspace.orbits


def test_cluster_images_are_symmetry_equivalent(binary_subspace):
    for orbit in all_orbits(binary_subspace):
        base = orbit.base_cluster
        assert orbit.multiplicity == len(orbit.clusters)
        for cluster in orbit.clusters:
            assert len(cluster) == len(base)
            # every image has identical sorted inter-site distance spectrum
            if len(base) > 1:
                def spectrum(cl):
                    coords = cl.lattice.get_cartesian_coords(cl.frac_coords)
                    d = np.linalg.norm(coords[None] - coords[:, None], axis=-1)
                    return np.sort(d[np.triu_indices(len(cl), k=1)])

                np.testing.assert_allclose(
                    spectrum(cluster), spectrum(base), atol=1e-8
                )


def test_cluster_permutations_are_closed(binary_subspace):
    for orbit in all_orbits(binary_subspace):
        perms = orbit.cluster_permutations
        n = orbit.num_sites
        assert perms.shape[1] == n
        # identity present; every row a permutation of range(n)
        assert any((p == np.arange(n)).all() for p in perms)
        for p in perms:
            assert sorted(p.tolist()) == list(range(n))


def test_bit_combos_distinct_under_permutations(ternary_subspace):
    for orbit in all_orbits(ternary_subspace):
        perms = orbit.cluster_permutations
        seen = []
        for combo_block in orbit.bit_combos:
            # within one block: all rows permutations of each other
            canon = {tuple(sorted(row)) for row in combo_block}
            assert len(canon) == 1
            # blocks must be symmetry-distinct: no row of one block can be a
            # permutation image of a row from another block
            rows = {tuple(row) for row in combo_block}
            for other in seen:
                assert not (rows & other)
            seen.append(rows)


def test_correlation_tensors_match_basis_products(binary_subspace):
    """corr_tensors[k, codes] == mean over equivalent orderings of the
    product of site-basis function values (reference orbit.py:218-249)."""
    for orbit in all_orbits(binary_subspace)[:6]:
        bases = orbit.basis_arrays  # non-constant function rows per site
        tensors = orbit.correlation_tensors
        sizes = [b.shape[1] for b in bases]
        for k, combo_block in enumerate(orbit.bit_combos):
            for codes in product(*(range(s) for s in sizes)):
                expected = np.mean(
                    [
                        np.prod([bases[i][b, codes[i]] for i, b in enumerate(row)])
                        for row in combo_block
                    ]
                )
                got = tensors[(k,) + tuple(codes)]
                assert got == pytest.approx(expected, abs=1e-12), (
                    orbit.id, k, codes
                )


def test_flat_tensor_strides(binary_subspace):
    for orbit in all_orbits(binary_subspace):
        tensors = orbit.correlation_tensors
        flat = orbit.flat_correlation_tensors
        strides = orbit.flat_tensor_indices
        sizes = tensors.shape[1:]
        assert flat.shape == (tensors.shape[0], int(np.prod(sizes)))
        for codes in product(*(range(s) for s in sizes)):
            idx = int(np.dot(strides, codes))
            np.testing.assert_allclose(flat[:, idx], tensors[(slice(None),) + codes])


def test_len_counts_corr_functions(binary_subspace, ternary_subspace):
    for subspace in (binary_subspace, ternary_subspace):
        total = 1 + sum(len(orbit) for orbit in subspace.orbits)
        assert total == subspace.num_corr_functions
        for orbit in subspace.orbits:
            assert len(orbit) == len(orbit.bit_combos)
            assert len(orbit.bit_combo_multiplicities) == len(orbit)
            # multiplicity of a combo block = number of equivalent orderings
            for mult, block in zip(
                orbit.bit_combo_multiplicities, orbit.bit_combos
            ):
                assert mult == len(block)


def test_remove_bit_combo(ternary_subspace):
    import copy

    subspace = copy.deepcopy(ternary_subspace)
    orbit = next(o for o in subspace.orbits if len(o) > 1)
    n_before = len(orbit)
    removed = orbit.bit_combos[0][0]
    orbit.remove_bit_combo(removed)
    assert len(orbit) == n_before - 1
    assert not any(
        tuple(sorted(removed)) == tuple(sorted(row))
        for block in orbit.bit_combos
        for row in block
    )
    # removing every combo must raise rather than leave an empty orbit
    last = next(o for o in subspace.orbits if len(o) == 1)
    with pytest.raises(RuntimeError):
        last.remove_bit_combos_by_inds([0])


def test_suborbit_detection(binary_subspace):
    orbits = all_orbits(binary_subspace)
    points = [o for o in orbits if o.num_sites == 1]
    pairs = [o for o in orbits if o.num_sites == 2]
    triplets = [o for o in orbits if o.num_sites == 3]
    assert pairs and points
    # point orbits are suborbits of every pair containing their site
    assert any(pair.is_sub_orbit(points[0]) for pair in pairs)
    # a pair is never a suborbit of itself or of a point
    for pair in pairs:
        assert not pair.is_sub_orbit(pair)
        assert not points[0].is_sub_orbit(pair)
    if triplets:
        trip = triplets[0]
        sub_pairs = [p for p in pairs if trip.is_sub_orbit(p)]
        assert sub_pairs
        mappings = trip.sub_orbit_mappings(sub_pairs[0])
        assert mappings.ndim == 2 and mappings.shape[1] == 2
        # mapped sites must be a subset of the triplet's sites
        assert np.all(mappings < trip.num_sites)


def test_orbit_eq_and_contains(binary_subspace):
    orbits = all_orbits(binary_subspace)
    assert orbits[0] == orbits[0]
    assert orbits[0] != orbits[1]
    for orbit in orbits[:4]:
        for cluster in orbit.clusters[:3]:
            assert cluster in orbit
