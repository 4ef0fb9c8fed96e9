"""Sublattice: supercell sites sharing one site space.

Mirrors the reference (smol/moca/sublattice.py) including site restriction
(freezing) and splitting by occupied species for topotactic workflows.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

import numpy as np

from smol_tpu.cofe.space.domain import SiteSpace, Vacancy
from smol_tpu.crystal.species import Composition
from smol_tpu.serial import MSONable, process_decoded

__all__ = ["Sublattice"]


@dataclass
class Sublattice(MSONable):
    """A set of supercell sites with a common site space.

    Attributes:
        site_space: the SiteSpace of these sites.
        sites: site indices.
        active_sites: unrestricted site indices.
        encoding: integer codes of the allowed species (may be a subset
            after splitting).
    """

    site_space: SiteSpace
    sites: np.ndarray
    active_sites: np.ndarray = field(init=False)
    encoding: np.ndarray = field(init=False)

    def __post_init__(self):
        self.sites = np.unique(np.asarray(self.sites, dtype=np.int64))
        self.active_sites = self.sites.copy()
        if len(self.site_space) <= 1:
            self.restrict_sites(self.sites)
        self.encoding = np.arange(len(self.site_space), dtype=np.int32)

    @property
    def is_active(self) -> bool:
        if len(self.active_sites) == 0 and len(self.species) > 1:
            warnings.warn(
                "Sub-lattice is inactive but has multiple allowed species; "
                "consider splitting it."
            )
        return len(self.active_sites) > 0

    @property
    def species(self) -> tuple:
        return tuple(self.site_space.keys())

    @property
    def composition(self):
        return self.site_space.composition

    @property
    def restricted_sites(self) -> np.ndarray:
        return np.setdiff1d(self.sites, self.active_sites)

    def restrict_sites(self, sites):
        """Freeze the given sites (no MC step may touch them)."""
        self.active_sites = np.array(
            [i for i in self.active_sites if i not in sites], dtype=np.int64
        )

    def reset_restricted_sites(self):
        """Reactivate all sites (no-op for single-species sublattices)."""
        if len(self.site_space) > 1:
            self.active_sites = self.sites.copy()

    def split_by_species(self, occu, species_in_partitions) -> list["Sublattice"]:
        """Split into sublattices by current occupancy partitions.

        Mirrors reference sublattice.py:109-184.
        """
        if all(
            isinstance(sp, (int, np.integer))
            for part in species_in_partitions
            for sp in part
        ):
            codes_in_partitions = species_in_partitions
        else:
            def get_index(sp, species):
                if isinstance(sp, Vacancy):
                    for i, sp2 in enumerate(species):
                        if isinstance(sp2, Vacancy):
                            return i
                return species.index(sp)

            codes_in_partitions = [
                [self.encoding[get_index(sp, self.species)] for sp in part]
                for part in species_in_partitions
            ]

        parts = []
        for species_codes in codes_in_partitions:
            part_comp, part_sites, part_actives = {}, [], []
            part_codes = sorted(species_codes)
            for code in part_codes:
                sp_id = int(np.where(self.encoding == code)[0][0])
                sp = self.species[sp_id]
                part_comp[sp] = self.site_space[sp]
                part_sites.extend(self.sites[occu[self.sites] == code].tolist())
                part_actives.extend(
                    self.active_sites[occu[self.active_sites] == code].tolist()
                )
            total = sum(part_comp.values())
            part_comp = Composition(
                {
                    sp: amt / total
                    for sp, amt in part_comp.items()
                    if not isinstance(sp, Vacancy)
                }
            )
            part = Sublattice(SiteSpace(part_comp), np.array(part_sites, dtype=int))
            part.active_sites = np.array(part_actives, dtype=int)
            part.encoding = np.array(part_codes, dtype=np.int32)
            if len(part_codes) == 1:
                part.restrict_sites(part.sites)
            parts.append(part)
        return parts

    def __eq__(self, other):
        return (
            isinstance(other, Sublattice)
            and other.site_space == self.site_space
            and np.array_equal(other.encoding, self.encoding)
            and np.array_equal(other.sites, self.sites)
        )

    def __str__(self):
        return f"Sublattice({self.site_space}, n_sites={len(self.sites)})"

    def as_dict(self) -> dict:
        return {
            "@module": type(self).__module__,
            "@class": type(self).__name__,
            "site_space": self.site_space.as_dict(),
            "sites": self.sites.tolist(),
            "active_sites": self.active_sites.tolist(),
            "encoding": self.encoding.tolist(),
        }

    @classmethod
    def from_dict(cls, d):
        sublattice = cls(
            process_decoded(d["site_space"]), np.array(d["sites"], dtype=int)
        )
        sublattice.active_sites = np.array(d["active_sites"], dtype=int)
        sublattice.encoding = np.array(d["encoding"], dtype=np.int32)
        return sublattice
