"""Tests for the crystal core: lattice, species, structure, symmetry."""

import numpy as np
import pytest

from smol_tpu.crystal import (
    Composition,
    Element,
    Lattice,
    Species,
    Structure,
    Vacancy,
    coord_list_mapping_pbc,
    get_symmetry_operations,
    lattice_points_in_supercell,
)
from smol_tpu.serial import dumps_obj, loads_obj


def test_lattice_basics():
    lat = Lattice.cubic(4.0)
    assert lat.volume == pytest.approx(64.0)
    assert np.allclose(lat.lengths, 4.0)
    assert np.allclose(lat.angles, 90.0)
    f = np.array([0.5, 0.5, 0.0])
    assert np.allclose(lat.get_cartesian_coords(f), [2, 2, 0])
    assert np.allclose(lat.get_fractional_coords([2, 2, 0]), f)


def test_lattice_from_parameters_roundtrip():
    lat = Lattice.from_parameters(3.0, 4.0, 5.0, 80.0, 95.0, 110.0)
    assert np.allclose(lat.lengths, [3, 4, 5])
    assert np.allclose(lat.angles, [80, 95, 110])


def test_species_ordering_and_equality():
    li = Species("Li", 1)
    mn = Species("Mn", 4)
    o = Species("O", -2)
    vac = Vacancy()
    # electronegativity order: Li (0.98) < Mn (1.55) < O (3.44) < Vacancy
    assert sorted([o, vac, mn, li]) == [li, mn, o, vac]
    assert li == Species("Li", 1)
    assert li != Species("Li", 2)
    assert Element("Au") == Element("Au")
    assert vac == Vacancy()
    assert vac != Species("Li", 1)
    assert Species.from_str("Mn4+") == mn
    assert Species.from_str("O2-") == o
    assert str(li) == "Li+"


def test_composition():
    c = Composition({"Li+": 0.5, "Mn4+": 0.5})
    assert c.num_atoms == pytest.approx(1.0)
    assert c.charge() == pytest.approx(2.5)
    s = dumps_obj(c)
    c2 = loads_obj(s)
    assert c2 == c


def test_lattice_points_in_supercell():
    for scm in [np.eye(3) * 2, [[1, 1, 0], [0, 1, 1], [1, 0, 1]], [[2, 1, 0], [0, 1, 0], [0, 0, 3]]]:
        scm = np.array(scm, dtype=int)
        n = int(round(abs(np.linalg.det(scm))))
        pts = lattice_points_in_supercell(scm)
        assert pts.shape == (n, 3)
        assert np.all(pts >= 0) and np.all(pts < 1)


def test_structure_supercell():
    lat = Lattice.cubic(3.0)
    s = Structure(lat, [{"Au": 0.5, "Cu": 0.5}], [[0, 0, 0]])
    s.make_supercell(np.diag([2, 2, 2]))
    assert len(s) == 8
    assert s.lattice.volume == pytest.approx(8 * 27)
    # all sites distinct under pbc
    inds = coord_list_mapping_pbc(s.frac_coords, s.frac_coords)
    assert sorted(inds.tolist()) == list(range(8))


def test_sites_in_sphere():
    lat = Lattice.cubic(2.0)
    s = Structure(lat, ["Au"], [[0, 0, 0]])
    center = lat.get_cartesian_coords([0.5, 0.5, 0.5])
    hits = s.get_sites_in_sphere(center, 2.0)
    # sqrt(3) ~ 1.73 < 2 -> all 8 cube corners within radius
    assert len(hits) == 8


def test_symmetry_fcc_primitive():
    # primitive FCC cell: 1 atom, point group Oh -> 48 operations
    a = 4.0
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    s = Structure(lat, [{"Au": 0.5, "Cu": 0.5}], [[0, 0, 0]])
    ops = get_symmetry_operations(s)
    assert len(ops) == 48


def test_symmetry_rocksalt():
    # conventional-cell primitive of rocksalt: 2 atoms (Na at 0, Cl at 1/2)
    a = 5.0
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    s = Structure(lat, ["Na+", "Cl-"], [[0, 0, 0], [0.5, 0.5, 0.5]])
    ops = get_symmetry_operations(s)
    assert len(ops) == 48


def test_symmetry_perovskite():
    # cubic perovskite SrTiO3: 5 atoms, 48 ops
    lat = Lattice.cubic(3.9)
    s = Structure(
        lat,
        ["Sr2+", "Ti4+", "O2-", "O2-", "O2-"],
        [
            [0, 0, 0],
            [0.5, 0.5, 0.5],
            [0.5, 0.5, 0],
            [0.5, 0, 0.5],
            [0, 0.5, 0.5],
        ],
    )
    ops = get_symmetry_operations(s)
    assert len(ops) == 48


def test_symmetry_closure():
    lat = Lattice.cubic(3.0)
    s = Structure(lat, [{"Au": 0.5, "Cu": 0.5}], [[0, 0, 0]])
    ops = get_symmetry_operations(s)
    assert len(ops) == 48
    # group closure: composing any two ops gives another op
    subset = ops[:6]
    for o1 in subset:
        for o2 in subset:
            assert (o1 * o2) in ops


def test_structure_serialization():
    lat = Lattice.cubic(3.0)
    s = Structure(lat, [{"Li+": 0.5, "Mn4+": 0.3}, "O2-"], [[0, 0, 0], [0.5, 0.5, 0.5]])
    s2 = loads_obj(dumps_obj(s))
    assert s2 == s


def test_reduced_formula_ordering_and_zeros():
    """reduced_formula sorts elements like formula and drops zero amounts."""
    from smol_tpu.crystal.species import Composition, Species

    comp = Composition({Species("O", -2): 4.0, Species("Li", 1): 1.0})
    assert comp.formula == "Li1 O4"
    assert comp.reduced_formula == "Li1 O4"
    comp2 = Composition(
        {Species("O", -2): 2.0, Species("Li", 1): 0.0, Species("Mn", 3): 1.0}
    )
    assert "Li" not in comp2.reduced_formula
    assert comp2.reduced_formula == "Mn1 O2"
