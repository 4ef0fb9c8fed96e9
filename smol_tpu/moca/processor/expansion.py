"""Cluster-expansion and cluster-decomposition processors.

TPU re-design of the reference processors (smol/moca/processor/expansion.py):
instead of per-site C evaluators (LocalEvalData), both processors share one
packed supercell (dense per-site local tables, smol_tpu.ops.packing) and
evaluate through fixed-shape JAX kernels.  Scalar MC energy changes always
use the decomposition form (coefficient-folded per-orbit energy tensors),
the cheapest local update.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
from jax.tree_util import Partial

from smol_tpu.moca.processor.base import Processor
from smol_tpu.ops import correlations as dev
from smol_tpu.ops.packing import pack_interactions, pack_supercell
from smol_tpu.serial import process_decoded

__all__ = [
    "ClusterExpansionProcessor",
    "ClusterDecompositionProcessor",
    "LocalEvalData",
]


@dataclass
class LocalEvalData:
    """Per-site local-update data (reference expansion.py:24-36).

    The reference holds one reduced Cython evaluator per site; the TPU
    design keeps every site's local cluster table in one padded device
    array (PackedSupercell.local_clusters) consumed by the delta kernels.
    This dataclass exposes the same per-site information as host views for
    inspection: the clusters containing the site and, per orbit touching
    it, the total/in-site cluster-count ratio that normalizes delta
    correlations (reference evaluator.pyx:262).
    """

    site_index: int
    cluster_indices: np.ndarray  # clusters containing the site
    cluster_ratio: dict  # orbit id -> total clusters / clusters at site


# Module-level device functions with data bound via jax.tree_util.Partial:
# processors that differ only in table *values* (e.g. the supercell shapes
# of an SQS search) produce steps with identical treedefs, sharing one XLA
# compilation (see smol_tpu/ops/mc.py run_chain).


def _packed_delta_energy(dp, flat, weights, occu, site, code, data):  # noqa: ARG001
    return dev.delta_energy_single_flip(occu, site, code, dp, flat, weights)


@lru_cache(maxsize=None)
def _ce_features_fn(num_corr: int, size: float):
    def fn(dp, occu, data):  # noqa: ARG001
        return dev.corr_from_occupancy(occu, dp, num_corr) * size

    return fn


@lru_cache(maxsize=None)
def _ce_delta_features_fn(num_corr: int, size: float):
    def fn(dp, occu, site, code, data):  # noqa: ARG001
        return dev.delta_corr_single_flip(occu, site, code, dp, num_corr) * size

    return fn


@lru_cache(maxsize=None)
def _cd_features_fn(num_orbits: int, size: float):
    def fn(dp, inter_flat, offset, occu, data):  # noqa: ARG001
        return (
            dev.interactions_from_occupancy(occu, dp, inter_flat, offset, num_orbits)
            * size
        )

    return fn


@lru_cache(maxsize=None)
def _cd_delta_features_fn(num_orbits: int, size: float):
    def fn(dp, inter_flat, occu, site, code, data):  # noqa: ARG001
        return (
            dev.delta_interactions_single_flip(
                occu, site, code, dp, inter_flat, num_orbits
            )
            * size
        )

    return fn


class _PackedProcessor(Processor):
    """Shared packing + device-data plumbing for CE/CD processors."""

    # the zero-gather fast path may fold this processor's energy tables
    # (subclasses that redefine the property semantics must disable this)
    fast_path_ok = True

    def _setup_packed(self):
        self._packed = pack_supercell(self._subspace, self._scmatrix)
        self._dp = dev.to_device(self._packed)

    def _energy_tables(self, energy_tensors):
        """Coef-folded per-orbit energy tensors -> (flat buffer, weights).

        weights[o] = size / total clusters of orbit o so that
        sum_local w*(T[new]-T[old]) = coefs . delta(features).
        """
        flat, _ = pack_interactions(self._subspace, energy_tensors)
        weights = self._packed.size / np.maximum(self._packed.orbit_cluster_count, 1)
        weights[0] = 0.0
        return flat, weights

    @property
    def packed(self):
        """The PackedSupercell (host arrays)."""
        return self._packed

    def get_local_eval_data(self, site_index: int) -> LocalEvalData:
        """Local-update data of one site from the packed tables."""
        row = self._packed.local_clusters[int(site_index)]
        clusters = row[row >= 0]
        orbit_ids, local_counts = np.unique(
            self._packed.cluster_orbit[clusters], return_counts=True
        )
        ratio = {
            int(o): float(self._packed.orbit_cluster_count[o]) / int(n)
            for o, n in zip(orbit_ids, local_counts)
        }
        return LocalEvalData(
            site_index=int(site_index),
            cluster_indices=np.asarray(clusters, dtype=np.int32),
            cluster_ratio=ratio,
        )

    def repad_local_tables(self, lmax=None, lpmax=None):
        """Re-pad the per-site local tables to the given widths (-1 fill).

        Processors padded to common widths produce identical device-table
        shapes, so different supercell shapes of the same size share one
        XLA compilation of the MC step (see ops/mc.py run_chain).
        """
        import dataclasses

        def pad(arr, width):
            if width is None or width <= arr.shape[1]:
                return arr
            out = np.full((arr.shape[0], width), -1, dtype=arr.dtype)
            out[:, : arr.shape[1]] = arr
            return out

        new_lc = pad(self._packed.local_clusters, lmax)
        new_lp = pad(self._packed.local_pairs, lpmax)
        if (
            new_lc is self._packed.local_clusters
            and new_lp is self._packed.local_pairs
        ):
            return
        self._packed = dataclasses.replace(
            self._packed, local_clusters=new_lc, local_pairs=new_lp
        )
        self._dp = dev.to_device(self._packed)

    @property
    def delta_energy_fn(self):
        if not hasattr(self, "_energy_dev"):
            import jax.numpy as jnp

            self._energy_dev = (
                jnp.asarray(self._energy_flat),
                jnp.asarray(self._energy_weights),
            )
        return Partial(_packed_delta_energy, self._dp, *self._energy_dev)


class ClusterExpansionProcessor(_PackedProcessor):
    """Feature vector = extensive correlation vector (num_corr entries).

    Mirrors reference ClusterExpansionProcessor (expansion.py:39).
    """

    def __init__(
        self, cluster_subspace, supercell_matrix, coefficients, use_concentration=False
    ):
        super().__init__(
            cluster_subspace, supercell_matrix, coefficients, use_concentration
        )
        if len(self.coefs) != cluster_subspace.num_corr_functions:
            raise ValueError(
                f"Got {len(self.coefs)} coefficients, need "
                f"{cluster_subspace.num_corr_functions}."
            )
        self._setup_packed()
        # energy tensors: per orbit, sum over combos of coef * corr tensor
        tensors = [np.float64(self.coefs[0])]
        for orbit in cluster_subspace.orbits:
            tensors.append(
                sum(
                    self.coefs[orbit.bit_id + k] * orbit.correlation_tensors[k]
                    for k in range(len(orbit))
                )
            )
        self._energy_flat, self._energy_weights = self._energy_tables(tensors)

    @property
    def num_features(self) -> int:
        return self._packed.num_corr

    @property
    def device_data(self):
        return {"dummy": np.zeros(1)}

    def compute_feature_vector(self, occupancy) -> np.ndarray:
        occupancy = np.asarray(occupancy, dtype=np.int32)
        return (
            np.asarray(
                dev.corr_from_occupancy(occupancy, self._dp, self._packed.num_corr)
            )
            * self.size
        )

    def compute_feature_vector_change(self, occupancy, flips) -> np.ndarray:
        occu = np.asarray(occupancy, dtype=np.int32).copy()
        delta = np.zeros(self._packed.num_corr)
        for site, code in flips:
            delta += np.asarray(
                dev.delta_corr_single_flip(
                    occu, site, code, self._dp, self._packed.num_corr
                )
            )
            occu[site] = code
        return delta * self.size

    @property
    def features_fn(self):
        return Partial(
            _ce_features_fn(self._packed.num_corr, float(self.size)), self._dp
        )

    @property
    def delta_features_fn(self):
        return Partial(
            _ce_delta_features_fn(self._packed.num_corr, float(self.size)),
            self._dp,
        )

    @classmethod
    def from_dict(cls, d):
        return cls(
            process_decoded(d["cluster_subspace"]),
            np.array(d["supercell_matrix"]),
            coefficients=np.array(d["coefficients"]),
        )


class ClusterDecompositionProcessor(_PackedProcessor):
    """Feature vector = extensive cluster-interaction vector (num_orbits).

    Mirrors reference ClusterDecompositionProcessor (expansion.py:243);
    default coefficients are the orbit multiplicities.
    """

    def __init__(
        self,
        cluster_subspace,
        supercell_matrix,
        interaction_tensors,
        coefficients=None,
        use_concentration=False,
    ):
        if len(interaction_tensors) != cluster_subspace.num_orbits:
            raise ValueError(
                f"Need {cluster_subspace.num_orbits} interaction tensors, got "
                f"{len(interaction_tensors)}."
            )
        coefficients = (
            cluster_subspace.orbit_multiplicities
            if coefficients is None
            else coefficients
        )
        super().__init__(
            cluster_subspace, supercell_matrix, coefficients, use_concentration
        )
        self._setup_packed()
        self._interaction_tensors = tuple(
            np.asarray(t, dtype=np.float64) for t in interaction_tensors
        )
        self._inter_flat, self._offset = pack_interactions(
            cluster_subspace, self._interaction_tensors
        )
        energy_tensors = [np.float64(self.coefs[0] * self._offset)] + [
            self.coefs[o.id] * t
            for o, t in zip(cluster_subspace.orbits, self._interaction_tensors[1:])
        ]
        self._energy_flat, self._energy_weights = self._energy_tables(energy_tensors)

    @property
    def num_features(self) -> int:
        return self._packed.num_orbits

    @property
    def device_data(self):
        return {"dummy": np.zeros(1)}

    def compute_feature_vector(self, occupancy) -> np.ndarray:
        occupancy = np.asarray(occupancy, dtype=np.int32)
        return (
            np.asarray(
                dev.interactions_from_occupancy(
                    occupancy, self._dp, self._inter_flat, self._offset,
                    self._packed.num_orbits,
                )
            )
            * self.size
        )

    def compute_feature_vector_change(self, occupancy, flips) -> np.ndarray:
        occu = np.asarray(occupancy, dtype=np.int32).copy()
        delta = np.zeros(self._packed.num_orbits)
        for site, code in flips:
            delta += np.asarray(
                dev.delta_interactions_single_flip(
                    occu, site, code, self._dp, self._inter_flat,
                    self._packed.num_orbits,
                )
            )
            occu[site] = code
        return delta * self.size

    @property
    def features_fn(self):
        import jax.numpy as jnp

        return Partial(
            _cd_features_fn(self._packed.num_orbits, float(self.size)),
            self._dp,
            jnp.asarray(self._inter_flat),
            jnp.float64(self._offset),
        )

    @property
    def delta_features_fn(self):
        import jax.numpy as jnp

        return Partial(
            _cd_delta_features_fn(self._packed.num_orbits, float(self.size)),
            self._dp,
            jnp.asarray(self._inter_flat),
        )

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["interaction_tensors"] = [
            np.asarray(t).tolist() for t in self._interaction_tensors
        ]
        return d

    @classmethod
    def from_dict(cls, d):
        return cls(
            process_decoded(d["cluster_subspace"]),
            np.array(d["supercell_matrix"]),
            tuple(np.array(t) for t in d["interaction_tensors"]),
            coefficients=np.array(d["coefficients"]),
        )
