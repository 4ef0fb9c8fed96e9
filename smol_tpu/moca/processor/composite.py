"""Composite processor: concatenated sub-processor features.

Mirrors the reference CompositeProcessor (smol/moca/processor/composite.py):
the standard CE + Ewald combination concatenates feature vectors and
coefficients; scalar MC energy deltas sum over sub-processors.
"""

from __future__ import annotations

import numpy as np
from jax.tree_util import Partial

from smol_tpu.moca.processor.base import Processor
from smol_tpu.serial import process_decoded

__all__ = ["CompositeProcessor"]


def _concat_features(fns, occu, data):
    import jax.numpy as jnp

    return jnp.concatenate([f(occu, data) for f in fns])


def _concat_delta_features(fns, occu, site, code, data):
    import jax.numpy as jnp

    return jnp.concatenate([f(occu, site, code, data) for f in fns])


def _sum_delta_energy(fns, occu, site, code, data):
    total = 0.0
    for f in fns:
        total = total + f(occu, site, code, data)
    return total


class CompositeProcessor(Processor):
    """A processor summing several sub-processors' properties."""

    def __init__(self, cluster_subspace, supercell_matrix, use_concentration=False):
        super().__init__(
            cluster_subspace, supercell_matrix, coefficients=[],
            use_concentration=use_concentration,
        )
        self._processors = []
        self.coefs = np.empty(0)

    @property
    def processors(self) -> list:
        return self._processors

    def add_processor(self, processor: Processor):
        """Add a sub-processor (same subspace and supercell required)."""
        if processor.cluster_subspace != self._subspace:
            raise AttributeError("Sub-processor must share the cluster subspace.")
        if not np.array_equal(processor.supercell_matrix, self._scmatrix):
            raise AttributeError("Sub-processor must share the supercell matrix.")
        self._processors.append(processor)
        self.coefs = np.concatenate([self.coefs, np.atleast_1d(processor.coefs)])

    @property
    def num_features(self) -> int:
        return sum(p.num_features for p in self._processors)

    def compute_feature_vector(self, occupancy) -> np.ndarray:
        return np.concatenate(
            [p.compute_feature_vector(occupancy) for p in self._processors]
        )

    def compute_feature_vector_change(self, occupancy, flips) -> np.ndarray:
        return np.concatenate(
            [p.compute_feature_vector_change(occupancy, flips) for p in self._processors]
        )

    @property
    def device_data(self):
        return {"dummy": np.zeros(1)}

    @property
    def features_fn(self):
        return Partial(
            _concat_features, tuple(p.features_fn for p in self._processors)
        )

    @property
    def delta_features_fn(self):
        return Partial(
            _concat_delta_features,
            tuple(p.delta_features_fn for p in self._processors),
        )

    @property
    def delta_energy_fn(self):
        return Partial(
            _sum_delta_energy, tuple(p.delta_energy_fn for p in self._processors)
        )

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["processors"] = [p.as_dict() for p in self._processors]
        del d["coefficients"]
        return d

    @classmethod
    def from_dict(cls, d):
        composite = cls(
            process_decoded(d["cluster_subspace"]), np.array(d["supercell_matrix"])
        )
        for pd in d["processors"]:
            composite.add_processor(Processor.from_dict(pd))
        return composite
