"""Occupancy-utils tables and Sublattice behavior.

(reference tests/test_moca/test_occu_utils.py and test_sublattice.py)
"""

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_ternary_prim, random_expansion
from smol_tpu.cofe.space.domain import Vacancy, get_species
from smol_tpu.moca import Ensemble
from smol_tpu.moca.occu_utils import (
    delta_counts_from_step,
    get_dim_ids_by_sublattice,
    get_dim_ids_table,
    occu_to_counts,
    occu_to_species_list,
)
from smol_tpu.serial import dumps_obj, loads_obj


@pytest.fixture(scope="module")
def ensemble():
    ce = random_expansion(fcc_ternary_prim(), {2: 4.0}, seed=11)
    return Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))


def test_dim_ids_by_sublattice():
    dims = get_dim_ids_by_sublattice([["A", "B"], ["C"], ["D", "E", "F"]])
    assert dims == [[0, 1], [2], [3, 4, 5]]


def test_dim_ids_table_and_counts(ensemble, rng):
    sublattices = ensemble.sublattices
    n_dims = sum(len(s.species) for s in sublattices)
    table = get_dim_ids_table(sublattices)
    assert table.shape[0] == ensemble.num_sites
    occu = rng.integers(0, 3, size=ensemble.num_sites).astype(np.int32)
    counts = occu_to_counts(occu, n_dims, table)
    assert counts.sum() == ensemble.num_sites
    # species list partitions all sites, consistent with counts
    species_list = occu_to_species_list(occu, n_dims, table)
    assert sorted(s for sites in species_list for s in sites) == list(
        range(ensemble.num_sites)
    )
    assert [len(s) for s in species_list] == counts.tolist()
    # size mismatch is rejected
    with pytest.raises(ValueError):
        occu_to_counts(occu[:-1], n_dims, table)


def test_delta_counts_from_step(ensemble, rng):
    sublattices = ensemble.sublattices
    n_dims = sum(len(s.species) for s in sublattices)
    table = get_dim_ids_table(sublattices)
    occu = rng.integers(0, 3, size=ensemble.num_sites).astype(np.int32)
    # a two-flip step, second flip on the same site (sequential semantics)
    step = [(0, np.int32((occu[0] + 1) % 3)), (0, np.int32((occu[0] + 2) % 3))]
    delta = delta_counts_from_step(occu, step, n_dims, table)
    occu_f = occu.copy()
    for site, code in step:
        occu_f[site] = code
    np.testing.assert_array_equal(
        delta, occu_to_counts(occu_f, n_dims, table) - occu_to_counts(occu, n_dims, table)
    )
    assert delta.sum() == 0
    # active_only table rejects flips at invalid codes
    with pytest.raises(ValueError):
        delta_counts_from_step(occu, [(0, np.int32(7))], n_dims, table)


def test_sublattice_restrict_and_roundtrip(ensemble):
    sublatt = [s for s in ensemble.sublattices if s.is_active][0]
    n_active = len(sublatt.active_sites)
    pinned = sublatt.active_sites[:2].tolist()
    sublatt.restrict_sites(pinned)
    try:
        assert len(sublatt.active_sites) == n_active - 2
        assert set(pinned).issubset(set(sublatt.restricted_sites.tolist()))
        # serialization preserves the restriction
        loaded = loads_obj(dumps_obj(sublatt))
        np.testing.assert_array_equal(loaded.active_sites, sublatt.active_sites)
        np.testing.assert_array_equal(loaded.encoding, sublatt.encoding)
    finally:
        sublatt.reset_restricted_sites()
    assert len(sublatt.active_sites) == n_active


def test_split_by_species(ensemble, rng):
    sublatt = [s for s in ensemble.sublattices if s.is_active][0]
    species = list(sublatt.species)
    assert len(species) == 3
    occu = rng.integers(0, 3, size=ensemble.num_sites).astype(np.int32)
    parts = sublatt.split_by_species(occu, [[species[0]], species[1:]])
    assert len(parts) == 2
    # first partition is single-species -> frozen
    assert not parts[0].is_active
    assert parts[1].is_active
    # sites partition the original sublattice
    all_sites = sorted(
        s for part in parts for s in part.sites.tolist()
    )
    assert all_sites == sorted(sublatt.sites.tolist())
    # each partition's sites hold only its codes in occu
    for part in parts:
        codes = set(part.encoding.tolist())
        assert set(occu[part.sites].tolist()).issubset(codes)
    # split by integer codes gives the same site partition
    parts_by_code = sublatt.split_by_species(
        occu, [[int(sublatt.encoding[0])], [int(c) for c in sublatt.encoding[1:]]]
    )
    for p1, p2 in zip(parts, parts_by_code):
        np.testing.assert_array_equal(np.sort(p1.sites), np.sort(p2.sites))


def test_split_with_vacancy():
    from smol_tpu.cofe.space.domain import SiteSpace
    from smol_tpu.crystal.species import Composition
    from smol_tpu.moca.sublattice import Sublattice

    # site space with an implicit vacancy (sums to < 1)
    space = SiteSpace(Composition({"Li+": 0.5, "Mn3+": 0.25}))
    assert any(isinstance(sp, Vacancy) for sp in space)
    sublatt = Sublattice(space, np.arange(4))
    occu = np.array([0, 1, 2, 2], dtype=np.int32)
    vac_part, rest = sublatt.split_by_species(
        occu, [[Vacancy()], [get_species("Li+"), get_species("Mn3+")]]
    )
    # the vacancy partition holds exactly the vacancy-coded sites
    vac_code = sublatt.encoding[
        [isinstance(sp, Vacancy) for sp in sublatt.species].index(True)
    ]
    np.testing.assert_array_equal(
        np.sort(vac_part.sites), np.where(occu == vac_code)[0]
    )
    assert not vac_part.is_active
