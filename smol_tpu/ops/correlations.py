"""Device (JAX/XLA) correlation and interaction kernels.

TPU-native equivalents of the reference's native evaluator
(smol/utils/cluster/evaluator.pyx): fixed-shape gathers + segment sums that
XLA fuses and vectorizes; `vmap` over replicas is the parallelism analog of
the reference's OpenMP ``prange`` over orbits (evaluator.pyx:148).

All energy/correlation math is float64 (the reference's dtype contract);
index math is int32.  Inputs come from :mod:`smol_tpu.ops.packing`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "tensor_indices",
    "corr_from_occupancy",
    "interactions_from_occupancy",
    "delta_corr_single_flip",
    "delta_interactions_single_flip",
    "delta_energy_single_flip",
    "DevicePacked",
    "to_device",
]


class DevicePacked(dict):
    """A dict pytree of device arrays for one PackedSupercell."""

    __getattr__ = dict.__getitem__


jax.tree_util.register_pytree_node(
    DevicePacked,
    lambda d: (tuple(d.values()), tuple(d.keys())),
    lambda keys, vals: DevicePacked(zip(keys, vals)),
)


def _pair_planes(packed):
    """[TMAX, P] f64 select planes: plane[t, p] = corr_flat[offset_p + t].

    XLA's dynamic gather is near-scalar on TPU; the full-correlation kernel
    instead SELECTS each cluster's tensor value from these precomputed
    planes with a vectorized compare per tensor index (tensor extents are
    <= ~64, and plane rows beyond a function's tensor length hold clipped
    junk that the compare can never pick).
    """
    import numpy as np

    corr_flat = np.asarray(packed.corr_flat)
    offsets = np.asarray(packed.pair_offset)
    uniq = np.unique(offsets)  # ascending tensor starts
    ends = np.append(uniq[1:], len(corr_flat))
    lengths = dict(zip(uniq.tolist(), (ends - uniq).tolist()))
    tmax = max(lengths.values())
    idx = np.minimum(
        offsets[None, :] + np.arange(tmax)[:, None], len(corr_flat) - 1
    )
    return corr_flat[idx]


def to_device(packed) -> DevicePacked:
    """Move a PackedSupercell's arrays to device as a pytree."""
    return DevicePacked(
        pair_planes=jnp.asarray(_pair_planes(packed)),
        cluster_sites=jnp.asarray(packed.cluster_sites),
        cluster_strides=jnp.asarray(packed.cluster_strides),
        cluster_orbit=jnp.asarray(packed.cluster_orbit),
        orbit_offset=jnp.asarray(packed.orbit_offset),
        orbit_cluster_count=jnp.asarray(packed.orbit_cluster_count),
        corr_flat=jnp.asarray(packed.corr_flat),
        pair_fn=jnp.asarray(packed.pair_fn),
        pair_cluster=jnp.asarray(packed.pair_cluster),
        pair_offset=jnp.asarray(packed.pair_offset),
        fn_cluster_count=jnp.asarray(packed.fn_cluster_count),
        local_clusters=jnp.asarray(packed.local_clusters),
        local_pairs=jnp.asarray(packed.local_pairs),
    )


def tensor_indices(occu, dp: DevicePacked) -> jnp.ndarray:
    """Flattened correlation-tensor index of every cluster: [C] int32.

    index(cluster) = sum_k strides[c, k] * occu[sites[c, k]]
    (reference evaluator.pyx:157-162).
    """
    occ = occu[dp.cluster_sites]  # [C, K] gather
    return jnp.sum(occ * dp.cluster_strides, axis=-1)


def _select_planes(tloc, planes):
    """vals[..., i] = planes[tloc[..., i], i] via vectorized compares.

    ``tloc`` local tensor indices (any batch shape x [N]); ``planes``
    [TMAX, N].  Replaces XLA's near-scalar TPU gather with TMAX fused
    vector select passes.
    """
    vals = jnp.zeros(tloc.shape, planes.dtype)
    for t in range(planes.shape[0]):
        vals = jnp.where(tloc == t, planes[t], vals)
    return vals


@partial(jax.jit, static_argnames=("num_corr",))
def corr_from_occupancy(occu, dp: DevicePacked, num_corr: int) -> jnp.ndarray:
    """Correlation vector [num_corr] f64 for one encoded occupancy."""
    tidx = tensor_indices(occu, dp)
    vals = _select_planes(tidx[dp.pair_cluster], dp.pair_planes)
    sums = jax.ops.segment_sum(vals, dp.pair_fn, num_segments=num_corr)
    corr = sums / dp.fn_cluster_count
    return corr.at[0].set(1.0)


@partial(jax.jit, static_argnames=("num_orbits",))
def interactions_from_occupancy(
    occu, dp: DevicePacked, inter_flat, offset, num_orbits: int
) -> jnp.ndarray:
    """Cluster-interaction vector [num_orbits] f64 (evaluator.pyx:170)."""
    tidx = tensor_indices(occu, dp)
    # [TMAX, C] select planes from the caller's interaction tensors;
    # occupancy-independent, so vmap over walkers leaves the (small,
    # one-off) gather unbatched
    offs = dp.orbit_offset[dp.cluster_orbit]
    tmax = int(dp.pair_planes.shape[0])
    idx = jnp.minimum(
        offs[None, :] + jnp.arange(tmax)[:, None], inter_flat.shape[0] - 1
    )
    planes = inter_flat[idx]
    vals = _select_planes(tidx, planes)
    sums = jax.ops.segment_sum(vals, dp.cluster_orbit, num_segments=num_orbits)
    out = sums / dp.orbit_cluster_count
    return out.at[0].set(offset)


def _local_tensor_indices(occu, site, new_code, dp):
    """Old/new tensor indices of the clusters containing ``site``.

    Handles repeated site indices within one cluster (small supercells)
    by substituting the flipped code at every matching slot.
    Returns (cluster ids [L], mask [L], tidx_old [L], tidx_new [L]).
    """
    local = dp.local_clusters[site]  # [L]
    mask = local >= 0
    lc = jnp.where(mask, local, 0)
    sites = dp.cluster_sites[lc]  # [L, K]
    strides = dp.cluster_strides[lc]
    occv = occu[sites]
    tidx_old = jnp.sum(occv * strides, axis=-1)
    occv_new = jnp.where(sites == site, new_code, occv)
    tidx_new = jnp.sum(occv_new * strides, axis=-1)
    return lc, mask, tidx_old, tidx_new


@jax.jit
def delta_energy_single_flip(occu, site, new_code, dp, inter_flat, orbit_weights):
    """Scalar energy change of one flip via cluster interactions.

    orbit_weights[o] = coefs[o] * size / total clusters of orbit o, so that
    sum over changed clusters of w * (H_new - H_old) equals
    coefs . delta(feature vector) exactly (the decomposition-processor
    energy, reference processor/expansion.py:420-464).
    """
    lc, mask, tidx_old, tidx_new = _local_tensor_indices(occu, site, new_code, dp)
    off = dp.orbit_offset[dp.cluster_orbit[lc]]
    dvals = inter_flat[off + tidx_new] - inter_flat[off + tidx_old]
    w = orbit_weights[dp.cluster_orbit[lc]]
    return jnp.sum(jnp.where(mask, dvals * w, 0.0))


@partial(jax.jit, static_argnames=("num_orbits",))
def delta_interactions_single_flip(
    occu, site, new_code, dp, inter_flat, num_orbits: int
):
    """Interaction-vector change of one flip: [num_orbits] f64.

    Normalized per orbit by the total cluster count (the reference divides
    by cluster_ratio * local count = total count, evaluator.pyx:315).
    """
    lc, mask, tidx_old, tidx_new = _local_tensor_indices(occu, site, new_code, dp)
    off = dp.orbit_offset[dp.cluster_orbit[lc]]
    dvals = inter_flat[off + tidx_new] - inter_flat[off + tidx_old]
    dvals = jnp.where(mask, dvals, 0.0)
    seg = jnp.where(mask, dp.cluster_orbit[lc], 0)
    sums = jax.ops.segment_sum(dvals, seg, num_segments=num_orbits)
    out = sums / dp.orbit_cluster_count
    return out.at[0].set(0.0)


@partial(jax.jit, static_argnames=("num_corr",))
def delta_corr_single_flip(occu, site, new_code, dp, num_corr: int):
    """Correlation-vector change of one flip: [num_corr] f64.

    Uses the per-site (function, cluster) pair table
    (evaluator.pyx:211-265 semantics).
    """
    lp = dp.local_pairs[site]  # [LP]
    mask = lp >= 0
    pid = jnp.where(mask, lp, 0)
    cl = dp.pair_cluster[pid]
    sites = dp.cluster_sites[cl]
    strides = dp.cluster_strides[cl]
    occv = occu[sites]
    tidx_old = jnp.sum(occv * strides, axis=-1)
    occv_new = jnp.where(sites == site, new_code, occv)
    tidx_new = jnp.sum(occv_new * strides, axis=-1)
    off = dp.pair_offset[pid]
    dvals = dp.corr_flat[off + tidx_new] - dp.corr_flat[off + tidx_old]
    dvals = jnp.where(mask, dvals, 0.0)
    seg = jnp.where(mask, dp.pair_fn[pid], 0)
    sums = jax.ops.segment_sum(dvals, seg, num_segments=num_corr)
    out = sums / dp.fn_cluster_count
    return out.at[0].set(0.0)
