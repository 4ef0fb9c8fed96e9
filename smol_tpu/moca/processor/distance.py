"""Distance (target-feature) processors for special-structure generation.

Mirrors the reference (smol/moca/processor/distance.py): the "energy" is

    d = -w L + || W (f - f_T) ||_1

where f is the (intensive) feature vector, f_T the target, L the largest
cluster diameter below which every feature matches the target within
match_tol, and W per-feature weights.  Used by SQS generators
(https://doi.org/10.1016/j.calphad.2013.06.006).

Device evaluation is a full feature computation per step (local deltas
cannot shortcut the L1 distance, as the reference notes, evaluator.pyx:329).
"""

from __future__ import annotations

from functools import lru_cache
from itertools import chain

import numpy as np
from jax.tree_util import Partial

from smol_tpu.moca.processor.expansion import (
    ClusterDecompositionProcessor,
    ClusterExpansionProcessor,
)
from smol_tpu.serial import process_decoded

__all__ = [
    "DistanceProcessor",
    "CorrelationDistanceProcessor",
    "ClusterInteractionDistanceProcessor",
]


@lru_cache(maxsize=None)
def _distance_features_impl(use_match: bool, size: float, match_tol: float):
    import jax.numpy as jnp

    def fn(base_fn, target, idx_pad, msk_pad, diams, occu, data):
        dist = jnp.abs(base_fn(occu, data) / size - target)
        if use_match:
            vals = dist[idx_pad]  # [G, max_g]
            matched = jnp.all(
                jnp.where(msk_pad, vals <= match_tol, True), axis=1
            )
            cummatched = jnp.cumprod(matched.astype(jnp.float64))
            ell = jnp.max(diams * cummatched, initial=0.0)
            dist = dist.at[0].set(ell)
        else:
            dist = dist.at[0].set(0.0)
        return dist

    return fn


def _distance_delta_energy(feat_fn, coefs, occu, site, code, data):
    d_i = coefs @ feat_fn(occu, data)
    occu_f = occu.at[site].set(code)
    d_f = coefs @ feat_fn(occu_f, data)
    return d_f - d_i


def _distance_delta_features(feat_fn, occu, site, code, data):
    occu_f = occu.at[site].set(code)
    return feat_fn(occu_f, data) - feat_fn(occu, data)


class DistanceProcessor:
    """Distance-from-target behavior over an underlying feature processor.

    The public base of all distance processors (reference
    smol/moca/processor/distance.py:20-209); mixed over a concrete feature
    processor by the subclasses below.
    """

    # the L1-distance "energy" is not expressible as local energy tables
    fast_path_ok = False

    def _init_distance(self, target_vector, match_weight, match_tol, target_weights):
        if len(self._subspace.external_terms) > 0:
            raise ValueError("The cluster subspace cannot have external terms.")
        if match_weight < 0:
            raise ValueError("The match weight must be a positive number.")
        if len(target_weights) != len(target_vector) - 1:
            raise ValueError(
                "target_weights must have length len(target_vector) - 1."
            )
        self.target_vector = np.asarray(target_vector, dtype=np.float64)
        self.match_tol = match_tol
        self.coefs = np.concatenate([[-match_weight], target_weights])
        # static diameter groups: feature indices per distinct diameter
        groups = []
        for diameter, orbits in self._subspace.orbits_by_diameter.items():
            groups.append((float(diameter), self._group_indices(orbits)))
        self._diameter_groups = groups

    def _group_indices(self, orbits):
        raise NotImplementedError

    def _base_feature_vector(self, occupancy):
        raise NotImplementedError

    def exact_match_max_diameter(self, distance_vector) -> float:
        """Largest diameter below which every feature matches the target."""
        max_matched = 0.0
        for diameter, indices in self._diameter_groups:
            if np.all(distance_vector[indices] <= self.match_tol):
                max_matched = diameter
            else:
                break
        return max_matched

    def compute_feature_vector(self, occupancy) -> np.ndarray:
        occupancy = np.asarray(occupancy, dtype=np.int32)
        features = self._base_feature_vector(occupancy) / self.size
        features = np.abs(features - self.target_vector)
        features[0] = (
            self.exact_match_max_diameter(features) if self.coefs[0] != 0 else 0.0
        )
        return features

    def compute_feature_vector_distances(self, occupancy, flips) -> np.ndarray:
        occupancy = np.asarray(occupancy, dtype=np.int32)
        occu_f = occupancy.copy()
        for site, code in flips:
            occu_f[site] = code
        dist_i = np.abs(
            self._base_feature_vector(occupancy) / self.size - self.target_vector
        )
        dist_f = np.abs(
            self._base_feature_vector(occu_f) / self.size - self.target_vector
        )
        dist_i[0] = dist_f[0] = 0.0
        return np.stack([dist_i, dist_f])

    def compute_feature_vector_distance_change(
        self, feature_vector, occupancy, flips
    ) -> np.ndarray:
        """Change in |f - feature_vector| (elementwise L1) from a flip list.

        Like compute_feature_vector_change but against an arbitrary fixed
        vector instead of the stored target (the base-class interface the
        reference declares at smol/moca/processor/base.py:143).
        """
        occupancy = np.asarray(occupancy, dtype=np.int32)
        occu_f = occupancy.copy()
        for site, code in flips:
            occu_f[site] = code
        feature_vector = np.asarray(feature_vector, dtype=np.float64)
        dist_i = np.abs(
            self._base_feature_vector(occupancy) / self.size - feature_vector
        )
        dist_f = np.abs(
            self._base_feature_vector(occu_f) / self.size - feature_vector
        )
        return dist_f - dist_i

    def compute_feature_vector_change(self, occupancy, flips) -> np.ndarray:
        distances = self.compute_feature_vector_distances(occupancy, flips)
        if self.coefs[0] != 0:
            distances[0, 0] = self.exact_match_max_diameter(distances[0])
            distances[1, 0] = self.exact_match_max_diameter(distances[1])
        return distances[1] - distances[0]

    # ---------------- device API ----------------

    def _distance_features_fn(self, base_features_fn):
        import jax.numpy as jnp

        max_g = max(len(idx) for _, idx in self._diameter_groups)
        idx_pad = np.zeros((len(self._diameter_groups), max_g), dtype=np.int64)
        msk_pad = np.zeros((len(self._diameter_groups), max_g), dtype=bool)
        diams = np.zeros(len(self._diameter_groups))
        for g, (diameter, indices) in enumerate(self._diameter_groups):
            idx_pad[g, : len(indices)] = indices
            msk_pad[g, : len(indices)] = True
            diams[g] = diameter
        impl = _distance_features_impl(
            bool(self.coefs[0] != 0), float(self.size), float(self.match_tol)
        )
        return Partial(
            impl,
            base_features_fn,
            jnp.asarray(self.target_vector),
            jnp.asarray(idx_pad),
            jnp.asarray(msk_pad),
            jnp.asarray(diams),
        )

    @property
    def delta_energy_fn(self):
        """Scalar distance change of a flip: two full evaluations."""
        import jax.numpy as jnp

        return Partial(
            _distance_delta_energy, self.features_fn, jnp.asarray(self.coefs)
        )

    @property
    def delta_features_fn(self):
        return Partial(_distance_delta_features, self.features_fn)

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["target_vector"] = self.target_vector.tolist()
        d["match_weight"] = -float(self.coefs[0])
        d["match_tol"] = self.match_tol
        return d

    @classmethod
    def from_dict(cls, d):
        """Polymorphic deserialization via the subclass registry
        (reference distance.py:186-208)."""
        from smol_tpu.utils.class_utils import get_subclasses

        if type(d) is not dict or "@class" not in d:
            raise ValueError("Expected an as_dict() record with an @class key.")
        try:
            subclass = get_subclasses(DistanceProcessor)[d["@class"]]
        except KeyError as err:
            raise NameError(
                f"{d['@class']} is not a DistanceProcessor subclass."
            ) from err
        if subclass.from_dict.__func__ is DistanceProcessor.from_dict.__func__:
            raise NotImplementedError(
                f"{subclass.__name__} does not implement from_dict."
            )
        return subclass.from_dict(d)


class CorrelationDistanceProcessor(DistanceProcessor, ClusterExpansionProcessor):
    """Distance from a target correlation vector."""

    def __init__(
        self,
        cluster_subspace,
        supercell_matrix,
        use_concentration=False,
        target_vector=None,
        match_weight=1.0,
        target_weights=None,
        match_tol=1e-5,
    ):
        if target_vector is None:
            target_vector = np.zeros(len(cluster_subspace))
        if target_weights is None:
            target_weights = np.ones(len(cluster_subspace) - 1)
        super().__init__(
            cluster_subspace,
            supercell_matrix,
            coefficients=np.ones(cluster_subspace.num_corr_functions),
            use_concentration=use_concentration,
        )
        self._init_distance(target_vector, match_weight, match_tol, target_weights)

    def _group_indices(self, orbits):
        return list(
            chain.from_iterable(
                range(orb.bit_id, orb.bit_id + len(orb)) for orb in orbits
            )
        )

    def _base_feature_vector(self, occupancy):
        return ClusterExpansionProcessor.compute_feature_vector(self, occupancy)

    @property
    def features_fn(self):
        return self._distance_features_fn(
            ClusterExpansionProcessor.features_fn.fget(self)
        )

    @classmethod
    def from_dict(cls, d):
        return cls(
            process_decoded(d["cluster_subspace"]),
            np.array(d["supercell_matrix"]),
            target_vector=np.array(d["target_vector"]),
            match_weight=d["match_weight"],
            match_tol=d.get("match_tol", 1e-5),
        )


class ClusterInteractionDistanceProcessor(
    DistanceProcessor, ClusterDecompositionProcessor
):
    """Distance from a target cluster-interaction vector."""

    def __init__(
        self,
        cluster_subspace,
        supercell_matrix,
        interaction_tensors=None,
        use_concentration=False,
        target_vector=None,
        match_weight=1.0,
        target_weights=None,
        match_tol=1e-5,
    ):
        if target_vector is None:
            target_vector = np.zeros(cluster_subspace.num_orbits)
        if target_weights is None:
            target_weights = np.ones(cluster_subspace.num_orbits - 1)
        if interaction_tensors is None:
            interaction_tensors = (np.float64(0.0),) + tuple(
                sum(
                    m * tensor
                    for m, tensor in zip(
                        orbit.bit_combo_multiplicities, orbit.correlation_tensors
                    )
                )
                for orbit in cluster_subspace.orbits
            )
        super().__init__(
            cluster_subspace,
            supercell_matrix,
            interaction_tensors,
            use_concentration=use_concentration,
        )
        self._init_distance(target_vector, match_weight, match_tol, target_weights)

    def _group_indices(self, orbits):
        return [orb.id for orb in orbits]

    def _base_feature_vector(self, occupancy):
        return ClusterDecompositionProcessor.compute_feature_vector(self, occupancy)

    @property
    def features_fn(self):
        return self._distance_features_fn(
            ClusterDecompositionProcessor.features_fn.fget(self)
        )

    @classmethod
    def from_dict(cls, d):
        return cls(
            process_decoded(d["cluster_subspace"]),
            np.array(d["supercell_matrix"]),
            interaction_tensors=tuple(
                np.array(t) for t in d["interaction_tensors"]
            ),
            target_vector=np.array(d["target_vector"]),
            match_weight=d["match_weight"],
            match_tol=d.get("match_tol", 1e-5),
        )
