"""Structure matching: supercell-matrix detection and site mapping.

A pragmatic replacement for the two uses the reference makes of pymatgen's
StructureMatcher (smol/cofe/space/clusterspace.py:175-202):

- :meth:`StructureMatcher.get_supercell_matrix`: the integer matrix relating
  a (possibly ordered) structure's lattice to the prim lattice,
- :meth:`StructureMatcher.get_mapping`: the site correspondence between a
  structure and the same-size supercell of the prim.

This matcher handles exact and mildly distorted supercells (lattice must be
an integer combination of prim vectors within ``ltol`` after scaling; site
matching allows a rigid fractional translation).  Heavily relaxed/rotated
cells that pymatgen's Niggli-reduction matcher would catch are out of scope
and raise StructureMatchError.
"""

from __future__ import annotations

import numpy as np

from smol_tpu.crystal.coord import pbc_diff
from smol_tpu.utils.exceptions import StructureMatchError

__all__ = ["StructureMatcher"]


def _species_compatible(site_species, allowed) -> bool:
    """True if every species at `site_species` is allowed at the target site."""
    return all(sp in allowed for sp in site_species)


class StructureMatcher:
    """Match structures to supercells of a primitive cell."""

    def __init__(self, ltol: float = 0.2, stol: float = 0.3, angle_tol: float = 5, **_):
        self.ltol = ltol
        self.stol = stol
        self.angle_tol = angle_tol

    def get_supercell_matrix(self, structure, prim):
        """Integer supercell matrix M with structure.lattice ~ M @ prim.lattice.

        Returns None when no integer relation holds within tolerance.
        """
        m_float = structure.lattice.matrix @ prim.lattice.inv_matrix
        m_int = np.round(m_float).astype(np.int64)
        if np.abs(np.linalg.det(m_int)) < 0.5:
            return None
        if np.max(np.abs(m_float - m_int)) > self.ltol:
            return None
        return m_int

    def get_mapping(self, supercell, structure):
        """Map structure sites onto supercell sites.

        Returns an int array ``mapping`` of length ``len(structure)`` where
        ``supercell[mapping[k]]`` is the site hosting ``structure[k]`` (the
        contract of pymatgen StructureMatcher.get_mapping used by the
        reference at clusterspace.py:1183).  Allows one rigid fractional
        translation; species of each structure site must be allowed at the
        matched supercell site.
        """
        if len(structure) > len(supercell):
            return None
        sup_frac = supercell.frac_coords
        str_frac = structure.frac_coords
        allowed = [list(site.species.keys()) for site in supercell]
        # include auto-vacancy compatibility implicitly: a structure site only
        # needs its own species to be allowed at the target.
        str_species = [list(site.species.keys()) for site in structure]

        # candidate rigid translations: map structure site 0 onto each
        # compatible supercell site (plus the null translation first)
        candidates = [np.zeros(3)]
        for j in range(len(supercell)):
            if _species_compatible(str_species[0], allowed[j]):
                candidates.append(sup_frac[j] - str_frac[0])

        tol = self.stol / max(len(supercell) ** (1 / 3), 1.0)
        for t in candidates:
            shifted = str_frac + t
            diff = pbc_diff(shifted[:, None, :], sup_frac[None, :, :])
            close = np.all(np.abs(diff) < tol, axis=-1)
            mapping = np.full(len(structure), -1, dtype=np.int64)
            used = set()
            ok = True
            for k in range(len(structure)):
                hits = [
                    j
                    for j in np.nonzero(close[k])[0]
                    if j not in used and _species_compatible(str_species[k], allowed[j])
                ]
                if not hits:
                    ok = False
                    break
                # choose the closest hit
                dists = np.abs(diff[k, hits]).max(axis=-1)
                j = hits[int(np.argmin(dists))]
                mapping[k] = j
                used.add(j)
            if ok:
                return mapping
        return None

    def fit(self, s1, s2) -> bool:
        """True if two same-size structures match site-for-site."""
        if len(s1) != len(s2):
            return False
        m = self.get_supercell_matrix(s1, s2)
        if m is None or abs(abs(np.linalg.det(m)) - 1) > 0.1:
            return False
        mapping = self.get_mapping(s1, s2)
        if mapping is None:
            return False
        # also require species equality (not just compatibility)
        return all(
            s2[k].species == s1[mapping[k]].species for k in range(len(s2))
        )


def get_supercell_matrix_or_raise(structure, prim, matcher=None):
    """Convenience wrapper raising StructureMatchError on failure."""
    matcher = matcher or StructureMatcher()
    scm = matcher.get_supercell_matrix(structure, prim)
    if scm is None:
        raise StructureMatchError(
            "Supercell matrix could not be determined from structure."
        )
    if np.linalg.det(scm) < 0:
        scm = -scm
    return scm
