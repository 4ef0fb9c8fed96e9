"""Self-contained crystal-structure core (replaces the pymatgen dependency)."""

from smol_tpu.crystal.coord import (
    coord_list_mapping,
    coord_list_mapping_pbc,
    is_coord_subset,
    is_coord_subset_pbc,
    lattice_points_in_supercell,
    pbc_diff,
)
from smol_tpu.crystal.lattice import Lattice
from smol_tpu.crystal.species import (
    Composition,
    DummySpecies,
    Element,
    Species,
    Vacancy,
    get_species,
)
from smol_tpu.crystal.structure import PeriodicSite, Site, Structure
from smol_tpu.crystal.symmetry import SymmOp, get_symmetry_operations

__all__ = [
    "Lattice",
    "Structure",
    "PeriodicSite",
    "Site",
    "Species",
    "Element",
    "DummySpecies",
    "Vacancy",
    "Composition",
    "get_species",
    "SymmOp",
    "get_symmetry_operations",
    "pbc_diff",
    "is_coord_subset",
    "is_coord_subset_pbc",
    "coord_list_mapping",
    "coord_list_mapping_pbc",
    "lattice_points_in_supercell",
]
