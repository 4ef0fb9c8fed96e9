"""Cluster: a set of sites (fractional coords) within a lattice.

Mirrors the reference Cluster (smol/cofe/space/cluster.py): coordinates are
centroid-normalized so symmetry-equivalent clusters compare equal after an
integer recentering translation.
"""

from __future__ import annotations

import numpy as np

from smol_tpu.constants import SITE_TOL
from smol_tpu.crystal.coord import is_coord_subset
from smol_tpu.crystal.lattice import Lattice
from smol_tpu.serial import MSONable, process_decoded

__all__ = ["Cluster"]


class Cluster(MSONable):
    """An undecorated cluster of sites in a lattice."""

    def __init__(self, site_spaces, frac_coords, lattice: Lattice):
        frac_coords = np.atleast_2d(np.array(frac_coords, dtype=np.float64))
        centroid = frac_coords.mean(axis=0)
        shift = np.floor(centroid)
        self._centroid = centroid - shift
        self._frac_coords = frac_coords - shift
        self._lattice = lattice
        self.site_spaces = list(site_spaces)
        self.id = None

    @property
    def centroid(self) -> np.ndarray:
        return self._centroid

    @property
    def frac_coords(self) -> np.ndarray:
        return self._frac_coords

    @property
    def lattice(self) -> Lattice:
        return self._lattice

    @property
    def diameter(self) -> float:
        """Maximum distance between any two sites."""
        coords = self._lattice.get_cartesian_coords(self._frac_coords)
        d2 = np.sum((coords[None] - coords[:, None]) ** 2, axis=-1)
        return float(np.sqrt(d2.max()))

    @property
    def radius(self) -> float:
        return self.diameter / 2.0

    def assign_ids(self, cluster_id: int) -> int:
        self.id = cluster_id
        return cluster_id + 1

    def __len__(self):
        return len(self._frac_coords)

    def __eq__(self, other):
        """Equality up to an integer recentering translation."""
        if self._frac_coords.shape != other._frac_coords.shape:
            return False
        othersites = other._frac_coords + np.round(self._centroid - other._centroid)
        return is_coord_subset(self._frac_coords, othersites, atol=SITE_TOL)

    def __repr__(self):
        return (
            f"Cluster(n={len(self)}, diameter={self.diameter:.4f}, "
            f"centroid={np.round(self._centroid, 4).tolist()})"
        )

    def as_dict(self) -> dict:
        return {
            "@module": type(self).__module__,
            "@class": type(self).__name__,
            "site_spaces": [s.as_dict() for s in self.site_spaces],
            "frac_coords": self._frac_coords.tolist(),
            "lattice": self._lattice.as_dict(),
        }

    @classmethod
    def from_dict(cls, d):
        return cls(
            [process_decoded(s) for s in d["site_spaces"]],
            d["frac_coords"],
            process_decoded(d["lattice"]),
        )
