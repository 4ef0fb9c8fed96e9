"""Fit weighting and filtering tools.

Mirrors the reference (smol/cofe/wrangling/tools.py): unique-correlation
filtering, Ewald-energy filtering, and Boltzmann energy weights above
composition minima or above the convex hull (the pymatgen PhaseDiagram
dependency is replaced with a scipy convex hull over composition space).
"""

from __future__ import annotations

import numpy as np

from smol_tpu.constants import kB

__all__ = [
    "unique_corr_vector_indices",
    "max_ewald_energy_indices",
    "weights_energy_above_composition",
    "weights_energy_above_hull",
]


def unique_corr_vector_indices(
    wrangler, property_key, filter_by="min", cutoffs=None, return_compliment=False
):
    """Indices of structures with unique correlation vectors.

    Picks the min (or max) property value among duplicates
    (reference tools.py:19).
    """
    if filter_by not in ("max", "min"):
        raise ValueError(f"Filtering by {filter_by} is not an option.")
    choose = np.argmin if filter_by == "min" else np.argmax

    if cutoffs is not None:
        cols = wrangler.cluster_subspace.function_inds_from_cutoffs(cutoffs)
    else:
        cols = np.arange(wrangler.num_features)
    matrix = wrangler.feature_matrix[:, cols]
    properties = wrangler.get_property_vector(property_key)

    _, inverse = np.unique(np.round(matrix, 12), axis=0, return_inverse=True)
    indices = []
    for group in np.unique(inverse):
        members = np.nonzero(inverse == group)[0]
        indices.append(members[choose(properties[members])])
    indices = np.array(sorted(indices))
    if return_compliment:
        compliment = np.setdiff1d(np.arange(wrangler.num_structures), indices)
        return indices, compliment
    return indices


def max_ewald_energy_indices(wrangler, max_relative_energy, return_compliment=False):
    """Indices with Ewald energy within max_relative_energy of the minimum.

    The subspace must include an EwaldTerm (its feature is the last column).
    """
    from smol_tpu.cofe.extern import EwaldTerm

    if not any(
        isinstance(term, EwaldTerm)
        for term in wrangler.cluster_subspace.external_terms
    ):
        raise RuntimeError("The cluster subspace does not have an Ewald term.")
    ewald = wrangler.feature_matrix[:, -1]
    indices = np.nonzero(ewald - ewald.min() <= max_relative_energy)[0]
    if return_compliment:
        return indices, np.setdiff1d(np.arange(wrangler.num_structures), indices)
    return indices


def _composition_fractions(structures) -> tuple[np.ndarray, list]:
    """Fractional compositions as vectors over the union of species."""
    species = sorted(
        {sp for s in structures for sp in s.composition}, key=str
    )
    fracs = np.zeros((len(structures), len(species)))
    for i, s in enumerate(structures):
        comp = s.composition
        total = comp.num_atoms
        for j, sp in enumerate(species):
            if sp in comp:
                fracs[i, j] = comp[sp] / total
    return fracs, species


def _energies_above_composition(structures, energies) -> np.ndarray:
    """Energy above the minimum energy at identical composition."""
    fracs, _ = _composition_fractions(structures)
    e_per_atom = np.array(
        [e / s.composition.num_atoms for e, s in zip(energies, structures)]
    )
    e_above = np.zeros(len(structures))
    keys = [tuple(np.round(f, 8)) for f in fracs]
    for i, key in enumerate(keys):
        same = [j for j, k in enumerate(keys) if k == key]
        e_above[i] = e_per_atom[i] - e_per_atom[same].min()
    return e_above


def _energies_above_hull(structures, energies) -> np.ndarray:
    """Energy above the convex hull in composition space (per atom).

    Hull built with scipy over independent composition fractions; replaces
    the reference's pymatgen PhaseDiagram (tools.py:176).
    """
    from scipy.spatial import ConvexHull, QhullError

    fracs, _ = _composition_fractions(structures)
    e_per_atom = np.array(
        [e / s.composition.num_atoms for e, s in zip(energies, structures)]
    )
    # reduce to independent coordinates (drop one fraction column; remove
    # constant columns)
    coords = fracs[:, :-1]
    keep = ~np.all(np.isclose(coords, coords[0]), axis=0)
    coords = coords[:, keep]
    if coords.shape[1] == 0:
        return e_per_atom - e_per_atom.min()

    points = np.concatenate([coords, e_per_atom[:, None]], axis=1)
    try:
        hull = ConvexHull(points, qhull_options="QJ")
    except QhullError:
        return _energies_above_composition(structures, energies)

    # lower-hull facets: normal's energy component negative
    e_above = np.full(len(structures), np.inf)
    dim = points.shape[1]
    for simplex, eq in zip(hull.simplices, hull.equations):
        if eq[dim - 1] >= -1e-12:  # not a lower facet
            continue
        # hull energy at each point's composition from the facet plane:
        # eq . [x, e, 1] = 0  ->  e = -(eq[:-2] @ x + eq[-1]) / eq[dim-1]
        verts = coords[simplex]
        # check containment via barycentric solve
        for i, x in enumerate(coords):
            e_hull = -(eq[: dim - 1] @ x + eq[-1]) / eq[dim - 1]
            if e_hull <= e_per_atom[i] + 1e-9:
                e_above[i] = min(e_above[i], e_per_atom[i] - e_hull)
    e_above[~np.isfinite(e_above)] = (
        e_per_atom - e_per_atom.min()
    )[~np.isfinite(e_above)]
    return np.maximum(e_above, 0.0)


def weights_energy_above_composition(structures, energies, temperature=2000):
    """Boltzmann weights exp(-dE_comp / kT) (reference tools.py:125)."""
    e_above = _energies_above_composition(structures, energies)
    return np.exp(-e_above / (kB * temperature))


def weights_energy_above_hull(structures, energies, cs_structure=None,
                              temperature=2000):
    """Boltzmann weights exp(-dE_hull / kT) (reference tools.py:143)."""
    e_above = _energies_above_hull(structures, energies)
    return np.exp(-e_above / (kB * temperature))
