"""Reference numpy evaluator for correlation/interaction vectors.

Host-side, vectorized-numpy equivalents of the reference's native kernels
(smol/utils/cluster/evaluator.pyx and correlations.pyx).  These serve two
purposes: (1) cheap single-structure evaluations on host (e.g. wrangling),
and (2) the ground truth for parity tests of the device (JAX/Pallas)
kernels at float64.

Orbit data is the tuple-per-orbit layout of the reference
(smol/utils/cluster/__init__.py:4): ``(orbit_id, bit_id,
flat_correlation_tensors [K, N], flat_tensor_indices [I])`` plus per-orbit
cluster site index arrays ``[J, I]`` (int32) for a given supercell.
"""

from __future__ import annotations

import numpy as np

from smol_tpu.utils.numthreads import SetNumThreads


def get_orbit_data(orbits) -> tuple:
    """Pack orbits into the flat-tensor tuples the evaluators consume."""
    return tuple(
        (
            orbit.id,
            orbit.bit_id,
            orbit.flat_correlation_tensors,
            orbit.flat_tensor_indices,
        )
        for orbit in orbits
    )


def corr_from_occupancy(occu, orbit_data, cluster_indices, num_corr) -> np.ndarray:
    """Correlation vector for one encoded occupancy (evaluator.pyx:121)."""
    occu = np.asarray(occu, dtype=np.int32)
    out = np.zeros(num_corr, dtype=np.float64)
    out[0] = 1.0
    for (oid, bit_id, tensors, strides), inds in zip(orbit_data, cluster_indices):
        tidx = occu[inds] @ strides  # [J]
        for k in range(tensors.shape[0]):
            out[bit_id + k] = tensors[k, tidx].mean()
    return out


def interactions_from_occupancy(
    occu, orbit_data, interaction_tensors, offset, cluster_indices, num_orbits
) -> np.ndarray:
    """Cluster interaction vector (evaluator.pyx:170).

    interaction_tensors: per-orbit flat f64 arrays (length prod(sizes)).
    """
    occu = np.asarray(occu, dtype=np.int32)
    out = np.zeros(num_orbits, dtype=np.float64)
    out[0] = offset
    for (oid, _, _, strides), inter, inds in zip(
        orbit_data, interaction_tensors, cluster_indices
    ):
        tidx = occu[inds] @ strides
        out[oid] = inter[tidx].mean()
    return out


def delta_corr_from_occupancies(
    occu_f, occu_i, cluster_ratio, orbit_data, cluster_indices, num_corr
) -> np.ndarray:
    """Correlation difference for site-local cluster sets (evaluator.pyx:211).

    cluster_ratio[n] = total clusters of orbit n / local clusters containing
    the flipped site; the delta is divided by ratio * J_local = J_total.
    """
    occu_f = np.asarray(occu_f, dtype=np.int32)
    occu_i = np.asarray(occu_i, dtype=np.int32)
    out = np.zeros(num_corr, dtype=np.float64)
    for n, ((oid, bit_id, tensors, strides), inds) in enumerate(
        zip(orbit_data, cluster_indices)
    ):
        tidx_f = occu_f[inds] @ strides
        tidx_i = occu_i[inds] @ strides
        denom = cluster_ratio[n] * len(inds)
        for k in range(tensors.shape[0]):
            out[bit_id + k] = (tensors[k, tidx_f] - tensors[k, tidx_i]).sum() / denom
    return out


def delta_interactions_from_occupancies(
    occu_f, occu_i, cluster_ratio, orbit_data, interaction_tensors,
    cluster_indices, num_orbits,
) -> np.ndarray:
    """Cluster interaction difference (evaluator.pyx:267)."""
    occu_f = np.asarray(occu_f, dtype=np.int32)
    occu_i = np.asarray(occu_i, dtype=np.int32)
    out = np.zeros(num_orbits, dtype=np.float64)
    for n, ((oid, _, _, strides), inter, inds) in enumerate(
        zip(orbit_data, interaction_tensors, cluster_indices)
    ):
        tidx_f = occu_f[inds] @ strides
        tidx_i = occu_i[inds] @ strides
        out[oid] = (inter[tidx_f] - inter[tidx_i]).sum() / (
            cluster_ratio[n] * len(inds)
        )
    return out


def corr_distances_from_occupancies(
    occu_f, occu_i, ref_corr, orbit_data, cluster_indices, num_corr
) -> np.ndarray:
    """|corr - ref| for two occupancies differing by a flip (evaluator.pyx:319)."""
    out = np.zeros((2, num_corr), dtype=np.float64)
    corr_i = corr_from_occupancy(occu_i, orbit_data, cluster_indices, num_corr)
    corr_f = corr_from_occupancy(occu_f, orbit_data, cluster_indices, num_corr)
    out[0] = np.abs(corr_i - ref_corr)
    out[1] = np.abs(corr_f - ref_corr)
    out[:, 0] = 0.0
    return out


def interaction_distances_from_occupancies(
    occu_f, occu_i, ref_inter, orbit_data, interaction_tensors, offset,
    cluster_indices, num_orbits,
) -> np.ndarray:
    """|interactions - ref| analog of the above (evaluator.pyx:381)."""
    out = np.zeros((2, num_orbits), dtype=np.float64)
    int_i = interactions_from_occupancy(
        occu_i, orbit_data, interaction_tensors, offset, cluster_indices, num_orbits
    )
    int_f = interactions_from_occupancy(
        occu_f, orbit_data, interaction_tensors, offset, cluster_indices, num_orbits
    )
    out[0] = np.abs(int_i - ref_inter)
    out[1] = np.abs(int_f - ref_inter)
    out[:, 0] = 0.0
    return out


class ClusterSpaceEvaluator:
    """Host evaluator object bundling packed orbit data.

    API-parity counterpart of the reference's Cython extension type
    (smol/utils/cluster/evaluator.pyx:22): holds the flat orbit tensors and
    exposes the six evaluation methods; per-supercell cluster indices are
    passed per call.  ``ClusterSubspace.evaluator`` returns an instance.
    The TPU hot paths do NOT go through this object — they use the packed
    device kernels (ops/correlations.py, ops/pallas_chain.py); this is the
    host-side oracle with the reference's interface.
    """

    num_threads = SetNumThreads("host_kernels")

    def __init__(self, orbit_data, num_orbits, num_corr_functions):
        from smol_tpu.utils.numthreads import HostKernels

        self.reset_data(orbit_data, num_orbits, num_corr_functions)
        self._interactions = None
        self._offset = 0.0
        # the reference evaluator carries the OpenMP thread knob
        # (evaluator.pyx + numthreads.py); here it tunes the native host
        # library — the numpy oracle itself is single-threaded
        self.host_kernels = HostKernels()

    def reset_data(self, orbit_data, num_orbits, num_corr_functions):
        """Replace the orbit data (evaluator.pyx:80)."""
        self.orbit_data = tuple(orbit_data)
        self.num_orbits = int(num_orbits)
        self.num_corr_functions = int(num_corr_functions)

    def set_cluster_interactions(self, cluster_interactions, offset):
        """Attach per-orbit interaction tensors (evaluator.pyx:103)."""
        self._interactions = tuple(
            np.asarray(t, dtype=np.float64) for t in cluster_interactions
        )
        self._offset = float(offset)

    @property
    def cluster_interactions(self):
        return self._interactions

    @property
    def offset(self):
        return self._offset

    def correlations_from_occupancy(self, occupancy, cluster_indices):
        return corr_from_occupancy(
            occupancy, self.orbit_data, cluster_indices, self.num_corr_functions
        )

    def interactions_from_occupancy(self, occupancy, cluster_indices):
        return interactions_from_occupancy(
            occupancy, self.orbit_data, self._interactions, self._offset,
            cluster_indices, self.num_orbits,
        )

    def delta_correlations_from_occupancies(
        self, occu_f, occu_i, cluster_ratio, cluster_indices
    ):
        return delta_corr_from_occupancies(
            occu_f, occu_i, cluster_ratio, self.orbit_data, cluster_indices,
            self.num_corr_functions,
        )

    def delta_interactions_from_occupancies(
        self, occu_f, occu_i, cluster_ratio, cluster_indices
    ):
        return delta_interactions_from_occupancies(
            occu_f, occu_i, cluster_ratio, self.orbit_data, self._interactions,
            cluster_indices, self.num_orbits,
        )

    def corr_distances_from_occupancies(
        self, occu_f, occu_i, ref_corr_vector, cluster_indices
    ):
        return corr_distances_from_occupancies(
            occu_f, occu_i, ref_corr_vector, self.orbit_data, cluster_indices,
            self.num_corr_functions,
        )

    def interaction_distances_from_occupancies(
        self, occu_f, occu_i, ref_interaction_vector, cluster_indices
    ):
        return interaction_distances_from_occupancies(
            occu_f, occu_i, ref_interaction_vector, self.orbit_data,
            self._interactions, self._offset, cluster_indices, self.num_orbits,
        )


# --- legacy serial-loop API (reference smol/utils/cluster/correlations.pyx) --


def delta_corr_single_flip(occu_f, occu_i, num_corr_functions, site_orbit_list):
    """Correlation difference from one flip over site-local orbit data.

    site_orbit_list entries: (bit_id, cluster_ratio, flat_tensor_indices,
    flat_correlation_tensors, cluster_indices) for orbits containing the
    flipped site (reference correlations.pyx:61-107).
    """
    occu_f = np.asarray(occu_f, dtype=np.int32)
    occu_i = np.asarray(occu_i, dtype=np.int32)
    out = np.zeros(num_corr_functions, dtype=np.float64)
    for bit_id, ratio, strides, tensors, inds in site_orbit_list:
        tidx_f = occu_f[inds] @ strides
        tidx_i = occu_i[inds] @ strides
        denom = ratio * len(inds)
        for k in range(tensors.shape[0]):
            out[bit_id + k] = (tensors[k, tidx_f] - tensors[k, tidx_i]).sum() / denom
    return out


def delta_interactions_single_flip(occu_f, occu_i, num_interactions, site_orbit_list):
    """Cluster-interaction difference from one flip (correlations.pyx:209-251).

    site_orbit_list entries: (orbit_id, cluster_ratio, flat_tensor_indices,
    flat_interaction_tensor, cluster_indices).
    """
    occu_f = np.asarray(occu_f, dtype=np.int32)
    occu_i = np.asarray(occu_i, dtype=np.int32)
    out = np.zeros(num_interactions, dtype=np.float64)
    for oid, ratio, strides, inter, inds in site_orbit_list:
        tidx_f = occu_f[inds] @ strides
        tidx_i = occu_i[inds] @ strides
        out[oid] = (inter[tidx_f] - inter[tidx_i]).sum() / (ratio * len(inds))
    return out


def corr_distance_single_flip(
    occu_f, occu_i, ref_corr_vector, num_corr_functions, orbit_list
):
    """|corr - ref| pair for occupancies differing by one flip.

    orbit_list entries: (bit_id, flat_tensor_indices,
    flat_correlation_tensors, cluster_indices) over ALL orbits — scales like
    a full evaluation (reference correlations.pyx:108-163).
    """
    orbit_data = tuple(
        (None, bit_id, tensors, strides)
        for bit_id, strides, tensors, _ in orbit_list
    )
    cluster_indices = tuple(inds for *_, inds in orbit_list)
    return corr_distances_from_occupancies(
        occu_f, occu_i, ref_corr_vector, orbit_data, cluster_indices,
        num_corr_functions,
    )


def interaction_distance_single_flip(
    occu_f, occu_i, ref_interaction_vector, num_interactions, orbit_list
):
    """|interactions - ref| pair analog (reference correlations.pyx:252-307).

    orbit_list entries: (orbit_id, flat_tensor_indices,
    flat_interaction_tensor, cluster_indices); the empty-orbit offset is
    taken from ref_interaction_vector[0] by convention.
    """
    orbit_data = tuple(
        (oid, None, None, strides) for oid, strides, _, _ in orbit_list
    )
    interaction_tensors = tuple(inter for _, _, inter, _ in orbit_list)
    cluster_indices = tuple(inds for *_, inds in orbit_list)
    return interaction_distances_from_occupancies(
        occu_f, occu_i, ref_interaction_vector, orbit_data, interaction_tensors,
        0.0, cluster_indices, num_interactions,
    )


def delta_ewald_single_flip(occu_f, occu_i, ewald_matrix, ewald_indices, site_ind):
    """O(n) Ewald energy difference for one site flip (ewald.pyx:9).

    ewald_indices[site, code] is the Ewald-matrix row of (site, species), or
    -1 for vacancies.
    """
    occu_f = np.asarray(occu_f, dtype=np.int32)
    occu_i = np.asarray(occu_i, dtype=np.int32)
    rows_i = ewald_indices[np.arange(len(occu_i)), occu_i]
    add = ewald_indices[site_ind, occu_f[site_ind]]
    rem = ewald_indices[site_ind, occu_i[site_ind]]
    # common rows: occupied rows of all OTHER sites.  The removed row must be
    # excluded from the dots — co-located rows of one site have near-singular
    # matrix entries that real kernels never touch (see ewald.pyx:43-58).
    other = np.arange(len(occu_i)) != site_ind
    b_rows = rows_i[other]
    b_rows = b_rows[b_rows >= 0]
    out = 0.0
    if add >= 0:
        out += ewald_matrix[add, add]
        out += 2 * ewald_matrix[add, b_rows].sum()
    if rem >= 0:
        out -= ewald_matrix[rem, rem]
        out -= 2 * ewald_matrix[rem, b_rows].sum()
    return out
