"""Ewald electrostatic processor.

Mirrors the reference EwaldProcessor (smol/moca/processor/ewald.py): the
single feature is the occupied-submatrix Ewald energy; flips update in O(n)
via the device row-delta kernel.
"""

from __future__ import annotations

import numpy as np
from jax.tree_util import Partial

from smol_tpu.cofe.extern.ewald import EwaldTerm
from smol_tpu.crystal.ewald import EwaldSummation
from smol_tpu.moca.processor.base import Processor
from smol_tpu.ops import ewald as dev_ewald
from smol_tpu.serial import process_decoded

__all__ = ["EwaldProcessor"]


def _ewald_features(matrix, inds, occu, data):  # noqa: ARG001
    import jax.numpy as jnp

    return jnp.atleast_1d(dev_ewald.ewald_energy(occu, matrix, inds))


def _ewald_delta_features(matrix, inds, occu, site, code, data):  # noqa: ARG001
    import jax.numpy as jnp

    return jnp.atleast_1d(
        dev_ewald.delta_ewald_single_flip(occu, site, code, matrix, inds)
    )


def _ewald_delta_energy(matrix, inds, coef, occu, site, code, data):  # noqa: ARG001
    return coef * dev_ewald.delta_ewald_single_flip(occu, site, code, matrix, inds)


class EwaldProcessor(Processor):
    """Processor for the electrostatic energy of an EwaldTerm."""

    def __init__(
        self,
        cluster_subspace,
        supercell_matrix,
        ewald_term=None,
        coefficient=1.0,
        use_concentration=False,
    ):
        if ewald_term is None:
            ewald_term = EwaldTerm()
        super().__init__(
            cluster_subspace, supercell_matrix, coefficient, use_concentration
        )
        self._ewald_term = ewald_term
        struct, inds = ewald_term.get_ewald_structure(self.structure)
        self._ewald_structure = struct
        self._ewald_inds = np.ascontiguousarray(inds)
        self._ewald_summation = None
        self._ewald_matrix = None

    @property
    def ewald_summation(self) -> EwaldSummation:
        if self._ewald_summation is None:
            self._ewald_summation = EwaldSummation(
                self._ewald_structure,
                real_space_cut=self._ewald_term.real_space_cut,
                recip_space_cut=self._ewald_term.recip_space_cut,
                eta=self._ewald_term.eta,
            )
        return self._ewald_summation

    @property
    def ewald_matrix(self) -> np.ndarray:
        if self._ewald_matrix is None:
            self._ewald_matrix = np.ascontiguousarray(
                self._ewald_term.get_ewald_matrix(self.ewald_summation)
            )
        return self._ewald_matrix

    @property
    def num_features(self) -> int:
        return 1

    @property
    def device_data(self):
        return {"dummy": np.zeros(1)}

    def compute_feature_vector(self, occupancy) -> np.ndarray:
        occupancy = np.asarray(occupancy, dtype=np.int32)
        return np.atleast_1d(
            np.asarray(
                dev_ewald.ewald_energy(occupancy, self.ewald_matrix, self._ewald_inds)
            )
        )

    def compute_feature_vector_change(self, occupancy, flips) -> np.ndarray:
        occu = np.asarray(occupancy, dtype=np.int32).copy()
        delta = 0.0
        for site, code in flips:
            delta += float(
                dev_ewald.delta_ewald_single_flip(
                    occu, site, code, self.ewald_matrix, self._ewald_inds
                )
            )
            occu[site] = code
        return np.array([delta])

    def _dev_tables(self):
        if not hasattr(self, "_dev_cache"):
            import jax.numpy as jnp

            self._dev_cache = (
                jnp.asarray(self.ewald_matrix),
                jnp.asarray(self._ewald_inds),
            )
        return self._dev_cache

    @property
    def features_fn(self):
        return Partial(_ewald_features, *self._dev_tables())

    @property
    def delta_features_fn(self):
        return Partial(_ewald_delta_features, *self._dev_tables())

    @property
    def delta_energy_fn(self):
        import jax.numpy as jnp

        return Partial(
            _ewald_delta_energy, *self._dev_tables(), jnp.float64(self.coefs[0])
        )

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["ewald_term"] = self._ewald_term.as_dict()
        return d

    @classmethod
    def from_dict(cls, d):
        coefs = d["coefficients"]
        coef = coefs[0] if isinstance(coefs, list) else coefs
        return cls(
            process_decoded(d["cluster_subspace"]),
            np.array(d["supercell_matrix"]),
            ewald_term=process_decoded(d["ewald_term"]),
            coefficient=coef,
        )
