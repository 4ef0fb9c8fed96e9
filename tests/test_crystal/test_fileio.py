"""Structure file IO: POSCAR and CIF parsing/writing.

Covers the first line of every reference user workflow
(pymatgen Structure.from_file in the reference notebooks, e.g.
/root/reference/docs/src/notebooks/creating-a-ce.ipynb).
"""

import numpy as np
import pytest

from smol_tpu.crystal import Lattice, Species, Structure

POSCAR_ROCKSALT = """\
NaCl rocksalt
1.0
0.0 2.8 2.8
2.8 0.0 2.8
2.8 2.8 0.0
Na Cl
1 1
Direct
0.0 0.0 0.0
0.5 0.5 0.5
"""

POSCAR_CARTESIAN = """\
bcc Fe
2.86
1.0 0.0 0.0
0.0 1.0 0.0
0.0 0.0 1.0
Fe
2
Selective dynamics
Cartesian
0.0 0.0 0.0 T T T
0.5 0.5 0.5 F F F
"""

CIF_ROCKSALT_P1 = """\
data_NaCl
_cell_length_a 3.95979
_cell_length_b 3.95979
_cell_length_c 3.95979
_cell_angle_alpha 60.0
_cell_angle_beta 60.0
_cell_angle_gamma 60.0
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 Na Na1 0.0 0.0 0.0
 Cl Cl1 0.5 0.5 0.5
"""

# disordered CIF with symmetry expansion and oxidation numbers: a cubic
# cell whose corner site is half Li / half vacancy-partner Mn, expanded
# from one asymmetric site by a 2-fold op
CIF_DISORDERED_SYMOPS = """\
data_test
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90.0
_cell_angle_beta 90.0
_cell_angle_gamma 90.0(0)
loop_
 _symmetry_equiv_pos_as_xyz
 'x, y, z'
 '-x, -y, z+1/2'
loop_
 _atom_type_symbol
 _atom_type_oxidation_number
 Li 1.0
 Mn 3.0
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_occupancy
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 Li Li1 0.5 0.25 0.25 0.0
 Mn Mn1 0.5 0.25 0.25 0.0
"""


def test_poscar_direct():
    s = Structure.from_str(POSCAR_ROCKSALT, "poscar")
    assert len(s) == 2
    assert s[0].specie.symbol == "Na"
    assert s[1].specie.symbol == "Cl"
    np.testing.assert_allclose(s.lattice.matrix[0], [0.0, 2.8, 2.8])
    np.testing.assert_allclose(s[1].frac_coords, [0.5, 0.5, 0.5])


def test_poscar_cartesian_scale_selective():
    s = Structure.from_str(POSCAR_CARTESIAN, "poscar")
    assert len(s) == 2
    assert all(site.specie.symbol == "Fe" for site in s)
    np.testing.assert_allclose(s.lattice.matrix, np.eye(3) * 2.86)
    # cartesian coords scale with the scale factor -> frac (0.5, 0.5, 0.5)
    np.testing.assert_allclose(s[1].frac_coords, [0.5, 0.5, 0.5], atol=1e-8)


def test_poscar_vasp4_rejected():
    bad = POSCAR_ROCKSALT.replace("Na Cl\n", "")
    with pytest.raises(ValueError, match="species line"):
        Structure.from_str(bad, "poscar")


def test_cif_p1():
    s = Structure.from_str(CIF_ROCKSALT_P1, "cif")
    assert len(s) == 2
    syms = sorted(site.specie.symbol for site in s)
    assert syms == ["Cl", "Na"]
    assert abs(s.lattice.lengths[0] - 3.95979) < 1e-5
    assert abs(s.lattice.angles[0] - 60.0) < 1e-8


def test_cif_symops_disorder_oxidation():
    s = Structure.from_str(CIF_DISORDERED_SYMOPS, "cif")
    # one asymmetric site x two symops = 2 distinct positions, each
    # holding the merged Li+/Mn3+ half-occupancies
    assert len(s) == 2
    for site in s:
        comp = dict(site.species.items())
        assert Species("Li", 1) in comp and Species("Mn", 3) in comp
        assert abs(comp[Species("Li", 1)] - 0.5) < 1e-10
        assert abs(comp[Species("Mn", 3)] - 0.5) < 1e-10
    assert not s.is_ordered
    coords = sorted(tuple(np.round(site.frac_coords, 6)) for site in s)
    assert coords == [(0.25, 0.25, 0.0), (0.75, 0.75, 0.5)]


def test_poscar_roundtrip(tmp_path):
    s = Structure.from_str(POSCAR_ROCKSALT, "poscar")
    path = tmp_path / "POSCAR"
    s.to(path)
    s2 = Structure.from_file(path)
    assert len(s2) == len(s)
    assert sorted(x.specie.symbol for x in s2) == ["Cl", "Na"]
    np.testing.assert_allclose(s2.lattice.matrix, s.lattice.matrix, atol=1e-9)


def test_cif_roundtrip_disordered(tmp_path):
    s = Structure.from_str(CIF_DISORDERED_SYMOPS, "cif")
    path = tmp_path / "test.cif"
    s.to(path)
    s2 = Structure.from_file(path)
    assert len(s2) == len(s)
    assert not s2.is_ordered
    np.testing.assert_allclose(
        sorted(s2.lattice.lengths), sorted(s.lattice.lengths), atol=1e-6
    )
    comps = sorted(str(site.species) for site in s2)
    assert comps == sorted(str(site.species) for site in s)


def test_disordered_poscar_write_rejected(tmp_path):
    s = Structure.from_str(CIF_DISORDERED_SYMOPS, "cif")
    with pytest.raises(ValueError, match="disordered"):
        s.to(tmp_path / "POSCAR")


def test_format_sniffing(tmp_path):
    # a .vasp extension and an extensionless CIF both dispatch correctly
    p1 = tmp_path / "structure.vasp"
    p1.write_text(POSCAR_ROCKSALT)
    assert len(Structure.from_file(p1)) == 2
    p2 = tmp_path / "structure_file"
    p2.write_text(CIF_ROCKSALT_P1)
    s = Structure.from_file(p2)
    assert sorted(site.specie.symbol for site in s) == ["Cl", "Na"]


def test_subspace_from_file_smoke(tmp_path):
    """A CE subspace builds straight from a file-loaded structure."""
    from smol_tpu.cofe import ClusterSubspace

    poscar = """\
AuCu disordered fcc (via CIF for partial occupancy)
"""
    cif = """\
data_AuCu
_cell_length_a 2.7
_cell_length_b 2.7
_cell_length_c 2.7
_cell_angle_alpha 60.0
_cell_angle_beta 60.0
_cell_angle_gamma 60.0
loop_
 _atom_site_type_symbol
 _atom_site_label
 _atom_site_occupancy
 _atom_site_fract_x
 _atom_site_fract_y
 _atom_site_fract_z
 Au Au1 0.5 0.0 0.0 0.0
 Cu Cu1 0.5 0.0 0.0 0.0
"""
    del poscar
    path = tmp_path / "aucu.cif"
    path.write_text(cif)
    prim = Structure.from_file(path)
    assert not prim.is_ordered
    subspace = ClusterSubspace.from_cutoffs(prim, {2: 4.0})
    assert len(subspace) > 1
