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


def _dense_local(packed):
    """Dense per-site local-cluster tables for gather-free delta kernels.

    Expands the indirect local_clusters / local_pairs index tables into
    per-site dense arrays so a single one-hot select over the (traced)
    flip site fetches every operand the delta kernels need.
    """
    import numpy as np

    lc = np.asarray(packed.local_clusters)  # [N, L]
    n, L = lc.shape
    cs = np.asarray(packed.cluster_sites)  # [C, K]
    st = np.asarray(packed.cluster_strides)
    orb = np.asarray(packed.cluster_orbit)
    ooff = np.asarray(packed.orbit_offset)
    valid = lc >= 0
    lcs = np.where(valid, lc, 0)
    out = {
        "loc_sites": cs[lcs] * valid[:, :, None],
        "loc_strides": st[lcs] * valid[:, :, None],
        "loc_orbit": np.where(valid, orb[lcs], 0),
        "loc_offset": np.where(valid, ooff[orb[lcs]], 0),
        "loc_valid": valid,
    }
    lp = np.asarray(packed.local_pairs)  # [N, LP]
    pvalid = lp >= 0
    lps = np.where(pvalid, lp, 0)
    pc = np.asarray(packed.pair_cluster)[lps]
    out.update(
        lp_sites=cs[pc] * pvalid[:, :, None],
        lp_strides=st[pc] * pvalid[:, :, None],
        lp_offset=np.where(pvalid, np.asarray(packed.pair_offset)[lps], 0),
        lp_fn=np.where(pvalid, np.asarray(packed.pair_fn)[lps], 0),
        lp_valid=pvalid,
    )
    return {k: jnp.asarray(v) for k, v in out.items()}


def to_device(packed) -> DevicePacked:
    """Move a PackedSupercell's arrays to device as a pytree."""
    return DevicePacked(
        pair_planes=jnp.asarray(_pair_planes(packed)),
        **_dense_local(packed),
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


def _site_block(dp, site, keys):
    """One-hot select each dense per-site table row for a traced site.

    XLA TPU dynamic gathers lower near-scalar under vmap; a vectorized
    compare-select over the (static) site axis does not.
    """
    n = dp.loc_valid.shape[0]
    oh = jnp.arange(n) == site  # [N]
    out = []
    for k in keys:
        tab = dp[k]
        ohx = oh.reshape((n,) + (1,) * (tab.ndim - 1))
        sel = jnp.sum(jnp.where(ohx, tab, jnp.zeros_like(tab)), axis=0)
        out.append(sel.astype(tab.dtype))
    return out


def _value_select(flat, idx, mask):
    """flat[idx] for a small value table, gather-free: [L] out."""
    T = flat.shape[0]
    oh = (idx[:, None] == jnp.arange(T)[None, :]) & mask[:, None]
    return jnp.sum(jnp.where(oh, flat[None, :], 0.0), axis=1)


def _local_delta_vals(occu, site, new_code, sites, strides, offset, valid,
                      flat):
    """Per-local-cluster value change of one flip, gather-free: [L] f64.

    Handles repeated site indices within one cluster (small supercells)
    by substituting the flipped code at every matching slot.
    """
    n = occu.shape[0]
    occv = jnp.sum(
        jnp.where(
            sites[:, :, None] == jnp.arange(n)[None, None, :],
            occu[None, None, :], 0,
        ),
        axis=2,
    )  # [L, K]
    tidx_old = jnp.sum(occv * strides, axis=-1)
    occv_new = jnp.where(sites == site, new_code, occv)
    tidx_new = jnp.sum(occv_new * strides, axis=-1)
    v_new = _value_select(flat, offset + tidx_new, valid)
    v_old = _value_select(flat, offset + tidx_old, valid)
    return v_new - v_old


@jax.jit
def delta_energy_single_flip(occu, site, new_code, dp, inter_flat, orbit_weights):
    """Scalar energy change of one flip via cluster interactions.

    orbit_weights[o] = coefs[o] * size / total clusters of orbit o, so that
    sum over changed clusters of w * (H_new - H_old) equals
    coefs . delta(feature vector) exactly (the decomposition-processor
    energy, reference processor/expansion.py:420-464).
    """
    sites, strides, orbit, offset, valid = _site_block(
        dp, site, ("loc_sites", "loc_strides", "loc_orbit", "loc_offset",
                   "loc_valid"),
    )
    dvals = _local_delta_vals(
        occu, site, new_code, sites, strides, offset, valid, inter_flat
    )
    w = _value_select(orbit_weights, orbit, valid)
    return jnp.sum(jnp.where(valid, dvals * w, 0.0))


@partial(jax.jit, static_argnames=("num_orbits",))
def delta_interactions_single_flip(
    occu, site, new_code, dp, inter_flat, num_orbits: int
):
    """Interaction-vector change of one flip: [num_orbits] f64.

    Normalized per orbit by the total cluster count (the reference divides
    by cluster_ratio * local count = total count, evaluator.pyx:315).
    """
    sites, strides, orbit, offset, valid = _site_block(
        dp, site, ("loc_sites", "loc_strides", "loc_orbit", "loc_offset",
                   "loc_valid"),
    )
    dvals = _local_delta_vals(
        occu, site, new_code, sites, strides, offset, valid, inter_flat
    )
    dvals = jnp.where(valid, dvals, 0.0)
    oh = (orbit[:, None] == jnp.arange(num_orbits)[None, :]) & valid[:, None]
    sums = jnp.sum(jnp.where(oh, dvals[:, None], 0.0), axis=0)
    out = sums / dp.orbit_cluster_count
    return out.at[0].set(0.0)


@partial(jax.jit, static_argnames=("num_corr",))
def delta_corr_single_flip(occu, site, new_code, dp, num_corr: int):
    """Correlation-vector change of one flip: [num_corr] f64.

    Uses the per-site (function, cluster) pair table
    (evaluator.pyx:211-265 semantics).
    """
    sites, strides, offset, fn, valid = _site_block(
        dp, site, ("lp_sites", "lp_strides", "lp_offset", "lp_fn",
                   "lp_valid"),
    )
    dvals = _local_delta_vals(
        occu, site, new_code, sites, strides, offset, valid, dp.corr_flat
    )
    dvals = jnp.where(valid, dvals, 0.0)
    oh = (fn[:, None] == jnp.arange(num_corr)[None, :]) & valid[:, None]
    sums = jnp.sum(jnp.where(oh, dvals[:, None], 0.0), axis=0)
    out = sums / dp.fn_cluster_count
    return out.at[0].set(0.0)
