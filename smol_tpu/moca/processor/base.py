"""Processor base: fixed-supercell property evaluation for MC.

Mirrors the reference Processor ABC (smol/moca/processor/base.py) at the
host API level (numpy in/out, flip lists), while every subclass also exposes
a device interface — pure JAX functions plus a data pytree — that the
sampler composes into one compiled `lax.scan` step function:

- ``features_fn(occu, data) -> [F] f64``
- ``delta_features_fn(occu, site, code, data) -> [F] f64``
- ``delta_energy_fn(occu, site, code, data) -> scalar f64`` (coefs folded)
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod

import numpy as np

from smol_tpu.cofe.space import get_allowed_species, get_site_spaces
from smol_tpu.moca.sublattice import Sublattice
from smol_tpu.serial import MSONable
from smol_tpu.utils.class_utils import get_subclasses

__all__ = ["Processor"]


class Processor(MSONable, metaclass=ABCMeta):
    """Abstract base class for fixed-supercell processors."""

    def __init__(
        self, cluster_subspace, supercell_matrix, coefficients, use_concentration=False
    ):
        self._subspace = cluster_subspace
        self._structure = cluster_subspace.structure.copy().make_supercell(
            supercell_matrix
        )
        self._scmatrix = np.array(supercell_matrix, dtype=np.int64)
        self.coefs = np.atleast_1d(np.asarray(coefficients, dtype=np.float64))

        site_spaces = set(
            get_site_spaces(self._structure, include_measure=use_concentration)
        )
        self.unique_site_spaces = tuple(sorted(site_spaces))
        self.active_site_spaces = tuple(
            space for space in self.unique_site_spaces if len(space) > 1
        )
        self.allowed_species = get_allowed_species(self._structure)
        self.size = self._subspace.num_prims_from_matrix(supercell_matrix)

    # ---------------- host API ----------------

    @property
    def cluster_subspace(self):
        return self._subspace

    @property
    def structure(self):
        """The disordered supercell structure."""
        return self._structure

    @property
    def supercell_matrix(self) -> np.ndarray:
        return self._scmatrix

    @property
    def num_sites(self) -> int:
        return len(self._structure)

    @abstractmethod
    def compute_feature_vector(self, occupancy) -> np.ndarray:
        """Extensive feature vector of an encoded occupancy."""

    @abstractmethod
    def compute_feature_vector_change(self, occupancy, flips) -> np.ndarray:
        """Feature-vector change from a list of (site, new_code) flips."""

    def compute_feature_vector_distance_change(self, feature_vector, occupancy, flips):
        """Change in |f - feature_vector| (L1 elementwise) from a flip list.

        Declared on the base for interface parity with the reference
        (smol/moca/processor/base.py:143-165); implemented by the distance
        processors (processor/distance.py).
        """
        raise NotImplementedError(
            "This processor can not be used to compute feature vector distances."
        )

    def compute_property(self, occupancy) -> float:
        return float(np.dot(self.coefs, self.compute_feature_vector(occupancy)))

    def compute_property_change(self, occupancy, flips) -> float:
        return float(
            np.dot(self.coefs, self.compute_feature_vector_change(occupancy, flips))
        )

    def occupancy_from_structure(self, structure) -> np.ndarray:
        occu = self._subspace.occupancy_from_structure(
            structure, scmatrix=self._scmatrix
        )
        return self.encode_occupancy(occu)

    def structure_from_occupancy(self, occupancy):
        from smol_tpu.cofe.space.domain import Vacancy
        from smol_tpu.crystal import PeriodicSite, Structure

        occupancy = self.decode_occupancy(occupancy)
        sites = [
            PeriodicSite(spec, site.frac_coords, self._structure.lattice)
            for spec, site in zip(occupancy, self._structure)
            if not isinstance(spec, Vacancy)
        ]
        return Structure.from_sites(sites)

    def encode_occupancy(self, occupancy) -> np.ndarray:
        return np.array(
            [
                species.index(spec)
                for species, spec in zip(self.allowed_species, occupancy)
            ],
            dtype=np.int32,
        )

    def decode_occupancy(self, encoded_occupancy) -> list:
        return [
            species[i] for i, species in zip(encoded_occupancy, self.allowed_species)
        ]

    def get_sublattices(self) -> list[Sublattice]:
        """Default sublattices: groups of sites with identical site spaces."""
        return [
            Sublattice(
                site_space,
                np.array(
                    [
                        i
                        for i, spec in enumerate(self.allowed_species)
                        if spec == list(site_space.keys())
                    ]
                ),
            )
            for site_space in self.unique_site_spaces
        ]

    def compute_average_drift(self, iterations: int = 1000):
        """Average difference between delta updates and full recomputation.

        Sanity check (reference base.py:270-312); should be ~machine eps.
        """
        rng = np.random.default_rng()
        forward_drift = 0.0
        trajectory = []
        occu = self.encode_occupancy(
            [rng.choice(species) for species in self.allowed_species]
        )
        for _ in range(iterations):
            site = rng.integers(self.num_sites)
            options = list(set(range(len(self.allowed_species[site]))) - {occu[site]})
            if not options:
                continue
            species = rng.choice(options)
            delta_prop = self.compute_property_change(occu, [(site, species)])
            new_occu = occu.copy()
            new_occu[site] = species
            prop = self.compute_property(occu)
            new_prop = self.compute_property(new_occu)
            forward_drift += (new_prop - prop) - delta_prop
            trajectory.append((prop - new_prop, new_occu, [(site, occu[site])]))
            occu = new_occu
        forward_drift /= iterations
        reverse_drift = (
            sum(dp - self.compute_property_change(o, f) for dp, o, f in trajectory)
            / iterations
        )
        return forward_drift, reverse_drift

    # ---------------- device API ----------------

    @property
    @abstractmethod
    def num_features(self) -> int:
        """Length of the feature vector."""

    @property
    @abstractmethod
    def device_data(self):
        """Pytree of device arrays consumed by the pure functions below."""

    @property
    @abstractmethod
    def features_fn(self):
        """Pure callable (occu, data) -> [F] f64 extensive features.

        Static shape metadata is closed over; ``data`` is the pytree from
        :attr:`device_data` so the sampler can pass it through `jit`.
        """

    @property
    @abstractmethod
    def delta_features_fn(self):
        """Pure callable (occu, site, code, data) -> [F] f64 flip delta."""

    @property
    @abstractmethod
    def delta_energy_fn(self):
        """Pure callable (occu, site, code, data) -> scalar f64 (coef-folded)."""

    def __len__(self):
        return self.num_sites

    def as_dict(self) -> dict:
        return {
            "@module": type(self).__module__,
            "@class": type(self).__name__,
            "cluster_subspace": self._subspace.as_dict(),
            "supercell_matrix": self._scmatrix.tolist(),
            "coefficients": self.coefs.tolist(),
        }

    @classmethod
    def from_dict(cls, d):
        try:
            subclass = get_subclasses(cls)[d["@class"]]
        except KeyError as err:
            raise NameError(f"{d['@class']} is not a Processor subclass.") from err
        return subclass.from_dict(d)
