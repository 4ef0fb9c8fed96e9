"""ClusterSubspace feature tests: Potts, pruning, hierarchy, bases, MSON.

Covers the reference behaviors in smol/cofe/space/clusterspace.py:
PottsSubspace over-complete decorations (:1793), orbit/function pruning
(:1059, :1117), sub-orbit hierarchy (:517, :549), basis change/rotation
(:1001-1057), alias detection (:948), and full MSON round trips including
cached supercell orbit indices (:1634-1725).
"""

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim, fcc_ternary_prim
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.cofe.space.clusterspace import PottsSubspace
from smol_tpu.serial import dumps_obj, loads_obj


@pytest.fixture(scope="module")
def cs_binary():
    return ClusterSubspace.from_cutoffs(fcc_binary_prim(), {2: 4.2, 3: 3.0})


def _random_occu(cs, scm, seed=0):
    rng = np.random.default_rng(seed)
    n_prims = int(round(abs(np.linalg.det(scm))))
    nsites = n_prims * len(cs.expansion_structure)
    sizes = [len(sp) for sp in _site_spaces(cs)]
    return np.array(
        [rng.integers(0, sizes[i % len(sizes)]) for i in range(nsites)],
        dtype=np.int32,
    )


def _site_spaces(cs):
    from smol_tpu.cofe.space.domain import get_site_spaces

    return get_site_spaces(cs.expansion_structure)


def test_potts_overcomplete_and_point_sum(cs_binary):
    """Potts uses full indicator decorations: more functions than standard CE.

    For an indicator basis the point-orbit correlations are species
    concentrations, so they sum to 1 over the full decoration set.
    """
    prim = fcc_ternary_prim()
    potts = PottsSubspace.from_cutoffs(prim, {2: 3.0})
    std = ClusterSubspace.from_cutoffs(prim, {2: 3.0}, basis="indicator")
    assert potts.num_corr_functions > std.num_corr_functions

    scm = np.diag([2, 2, 2])
    occu = _random_occu(potts, scm, seed=3)
    corr = potts.corr_from_occupancy(occu, scm)
    # point orbit: one function per species (3); concentrations sum to 1
    point = potts.orbits[0]
    vals = corr[point.bit_id : point.bit_id + len(point.bit_combos)]
    assert len(vals) == 3
    np.testing.assert_allclose(vals.sum(), 1.0, atol=1e-12)

    # MSON round trip preserves the correlation vector
    potts2 = loads_obj(dumps_obj(potts))
    assert isinstance(potts2, PottsSubspace)
    np.testing.assert_allclose(potts2.corr_from_occupancy(occu, scm), corr)


def test_remove_corr_functions(cs_binary):
    cs = cs_binary.copy()
    n0 = cs.num_corr_functions
    scm = np.diag([2, 2, 2])
    occu = _random_occu(cs, scm, seed=1)
    corr0 = cs.corr_from_occupancy(occu, scm)

    removed = [2, n0 - 1]
    cs.remove_corr_functions(removed)
    assert cs.num_corr_functions == n0 - len(removed)
    corr1 = cs.corr_from_occupancy(occu, scm)
    keep = [i for i in range(n0) if i not in removed]
    np.testing.assert_allclose(corr1, corr0[keep], atol=1e-12)


def test_remove_orbits(cs_binary):
    cs = cs_binary.copy()
    scm = np.diag([2, 2, 2])
    occu = _random_occu(cs, scm, seed=2)
    corr0 = cs.corr_from_occupancy(occu, scm)
    # drop the last orbit entirely
    last = cs.orbits[-1]
    nfuncs = len(last.bit_combos)
    cs.remove_orbits([last.id])
    assert cs.num_corr_functions == len(corr0) - nfuncs
    corr1 = cs.corr_from_occupancy(occu, scm)
    np.testing.assert_allclose(corr1, corr0[: len(corr1)], atol=1e-12)
    # ids were re-assigned contiguously
    assert [o.id for o in cs.orbits] == list(range(1, len(cs.orbits) + 1))


def test_hierarchy_suborbits(cs_binary):
    """Every pair/triplet orbit must list the point orbit among sub-orbits."""
    hier = cs_binary.orbit_hierarchy()
    # entry 0 is the empty cluster; entry i is orbit id i (clusterspace.py:517)
    assert len(hier) == len(cs_binary.orbits) + 1
    point_ids = [o.id for o in cs_binary.orbits if len(o.base_cluster) == 1]
    pair_ids = [o.id for o in cs_binary.orbits if len(o.base_cluster) == 2]
    for orbit in cs_binary.orbits:
        subs = hier[orbit.id]
        if len(orbit.base_cluster) == 1:
            assert subs == []
        elif len(orbit.base_cluster) == 2:  # direct subs of pairs are points
            assert subs and all(s in point_ids for s in subs)
        elif len(orbit.base_cluster) == 3:  # direct subs of triplets are pairs
            assert subs and all(s in pair_ids for s in subs)
    fh = cs_binary.function_hierarchy(min_size=1)
    assert len(fh) == cs_binary.num_corr_functions


def test_change_site_bases(cs_binary):
    cs = cs_binary.copy()
    cs.change_site_bases("sinusoid", orthonormal=True)
    assert cs.basis_orthonormal
    # correlations change but the constant stays 1
    scm = np.diag([2, 2, 2])
    occu = _random_occu(cs, scm, seed=4)
    corr = cs.corr_from_occupancy(occu, scm)
    assert corr[0] == 1.0
    assert np.all(np.isfinite(corr))


def test_rotate_site_basis():
    """Basis rotation keeps the basis orthonormal and corr finite."""
    cs = ClusterSubspace.from_cutoffs(
        fcc_binary_prim(), {2: 3.0}, basis="sinusoid", orthonormal=True
    )
    assert cs.basis_orthonormal
    cs.rotate_site_basis(1, np.pi / 5)
    scm = np.diag([2, 2, 2])
    occu = _random_occu(cs, scm, seed=5)
    corr = cs.corr_from_occupancy(occu, scm)
    assert np.all(np.isfinite(corr))


def test_aliased_orbits(cs_binary):
    """A 1x1x1 supercell must alias distinct orbits (degenerate images)."""
    aliased = cs_binary.get_aliased_orbits(np.eye(3, dtype=int))
    assert len(aliased) > 0
    # a large cell should lift (most) degeneracies relative to 1x1x1
    aliased_big = cs_binary.get_aliased_orbits(np.diag([4, 4, 4]))
    assert len(aliased_big) <= len(aliased)


def test_mson_roundtrip_with_cached_indices(cs_binary):
    scm = np.diag([2, 2, 2])
    occu = _random_occu(cs_binary, scm, seed=6)
    corr0 = cs_binary.corr_from_occupancy(occu, scm)
    _ = cs_binary.get_orbit_indices(scm)  # populate the cache

    cs2 = loads_obj(dumps_obj(cs_binary))
    assert isinstance(cs2, ClusterSubspace)
    assert cs2.num_corr_functions == cs_binary.num_corr_functions
    np.testing.assert_allclose(cs2.corr_from_occupancy(occu, scm), corr0)


def test_orbits_by_cutoffs(cs_binary):
    """Diameter-window orbit selection (reference clusterspace.py:499)."""
    upper = 3.5
    within = cs_binary.orbits_by_cutoffs(upper)
    assert 0 < len(within) < len(cs_binary.orbits)
    assert all(o.base_cluster.diameter <= upper for o in within)
    outside = [o for o in cs_binary.orbits if o not in within]
    assert all(o.base_cluster.diameter > upper for o in outside)
    # lower bound excludes point orbits (diameter 0)
    pairs_up = cs_binary.orbits_by_cutoffs(upper, lower=1e-9)
    assert all(o.num_sites > 1 for o in pairs_up)


def test_get_mapped_site_properties(cs_binary):
    """Site properties map through the supercell matcher
    (reference clusterspace.py:858)."""
    from smol_tpu.crystal import Structure

    prim = fcc_binary_prim()
    scm = np.diag([2, 1, 1])
    sc = prim.make_supercell(scm)
    species = ["Au" if i % 2 else "Cu" for i in range(len(sc))]
    magmoms = [float(i) for i in range(len(sc))]
    tagged = Structure(
        sc.lattice, species, sc.frac_coords,
        site_properties={"magmom": magmoms},
    )
    mapped = cs_binary.get_mapped_site_properties(tagged, scmatrix=scm)
    assert set(mapped) == {"magmom"}
    assert sorted(mapped["magmom"]) == sorted(magmoms)


def test_cluster_interactions_from_structure(cs_binary, rng):
    """Orbit-summed interactions reproduce the predicted energy
    (reference expansion.py:290)."""
    from smol_tpu.cofe import ClusterExpansion
    from smol_tpu.crystal import Structure

    prim = fcc_binary_prim()
    coefs = rng.normal(0, 0.1, cs_binary.num_corr_functions)
    exp = ClusterExpansion(cs_binary, coefs)
    scm = np.diag([2, 2, 1])
    sc = prim.make_supercell(scm)
    ordered = Structure(
        sc.lattice,
        ["Au" if i % 2 else "Cu" for i in range(len(sc))],
        sc.frac_coords,
    )
    inter = exp.cluster_interactions_from_structure(ordered, scmatrix=scm)
    assert inter.shape == (len(cs_binary.orbits) + 1,)
    mult = np.concatenate(
        [[1.0], [o.multiplicity for o in cs_binary.orbits]]
    )
    pred = exp.predict(ordered, normalized=True, scmatrix=scm)
    assert abs(float(mult @ inter) - pred) < 1e-10
    extensive = exp.cluster_interactions_from_structure(
        ordered, normalized=False, scmatrix=scm
    )
    np.testing.assert_allclose(extensive, inter * 4, rtol=1e-12)
