"""Composition spaces with charge balance and string constraints.

Builds the constrained integer composition lattice of a two-sublattice
ionic system, enumerates allowed compositions, reads the charge-neutral
flip table (the moves TableFlip uses), and shows the constraint-string
grammar (reference notebook: setting-composition-constraints.ipynb).

Run: python examples/08_composition_constraints.py
"""

import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.cofe.space.domain import get_species
from smol_tpu.moca.composition.constraints import (
    convert_constraint_string,
    handle_side_string,
)
from smol_tpu.moca.composition.space import CompositionSpace

# 1. a rocksalt-like system: cation sublattice Li+/Mn2+/Mn4+, anion O2-/F-
cations = [get_species(s) for s in ("Li+", "Mn2+", "Mn4+")]
anions = [get_species(s) for s in ("O2-", "F-")]
space = CompositionSpace([cations, anions], charge_neutral=True)
print(f"dims: {space.num_dims}, min supercell size: {space.min_supercell_size}")

# 2. enumerate all charge-neutral compositions of a given supercell size;
#    the grid is in "coordinates" format (lattice-basis integers)
size = _bootstrap.scale(6, 4)
grid = space.get_composition_grid(supercell_size=size)
print(f"{len(grid)} charge-neutral compositions at supercell size {size}")
for x in grid[:5]:
    counts = space.translate_format(x, size, from_format="coordinates")
    comps = space.translate_format(x, size, from_format="coordinates",
                                   to_format="compositions")
    print("  counts", counts.tolist(), "->", [str(c.formula) for c in comps])

# 3. the flip table: charge-neutral composition moves for TableFlip MC
print("flip reactions:")
for reaction in space.flip_reactions:
    print("  ", reaction)

# 4. extra constraints via the string grammar; counts are per prim
constrained = CompositionSpace(
    [cations, anions],
    charge_neutral=True,
    other_constraints=["Li+ == 0.5", "Mn2+ <= 0.25"],
)
grid_c = constrained.get_composition_grid(supercell_size=size)
dims = constrained.dim_ids
li_dim = dims[0][[str(s) for s in constrained.site_spaces[0]].index("Li+")]
for x in grid_c:
    counts = constrained.translate_format(x, size, from_format="coordinates")
    assert counts[li_dim] == size // 2
print(f"with Li+ == 0.5 per prim: {len(grid_c)} compositions")

# 5. the parser is public: tokenize a side, convert a full equation
packed, intercept = handle_side_string("2 Li+(0) + Mn2+ - 1")
print("tokens:", packed, "intercept:", intercept)
vec, rhs, rel = convert_constraint_string(
    "2 Li+(0) + Mn2+ <= 3", [cations, anions]
)
print("constraint vector:", vec, rel, rhs)
print("OK")
