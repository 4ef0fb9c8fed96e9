"""Sharded correlation evaluation for very large supercells.

The long-context analog of this framework (SURVEY.md section 5): one
supercell too large for a single device's correlation evaluation shards
its (function, cluster) pair tables over a mesh axis; each device computes
the segment sums of its pair shard and a ``psum`` over the mesh reduces
them — the TPU-native equivalent of the reference's OpenMP ``prange`` over
orbits (smol/utils/cluster/evaluator.pyx:148), scaled past one chip.

The occupancy (O(sites)) is replicated; the O(pairs) work — site gathers,
tensor-index arithmetic, corr-tensor lookups — is what shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 moved shard_map out of experimental
    from jax.sharding import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - version fallback
    from jax.experimental.shard_map import shard_map

__all__ = ["make_sharded_corr_fn"]


def _local_corr(occu, sites, strides, fns, mask, planes,
                fn_cluster_count, num_corr: int, axis_name: str):
    from smol_tpu.ops.correlations import _select_planes

    tidx = jnp.sum(occu[sites] * strides, axis=-1)
    vals = jnp.where(mask, _select_planes(tidx, planes), 0.0)
    sums = jax.ops.segment_sum(vals, fns, num_segments=num_corr)
    sums = jax.lax.psum(sums, axis_name)
    corr = sums / fn_cluster_count
    return corr.at[0].set(1.0)


def make_sharded_corr_fn(packed, mesh: Mesh, axis_name: str | None = None):
    """Build ``fn(occu) -> corr`` with the pair axis sharded over ``mesh``.

    Args:
        packed: a PackedSupercell (smol_tpu.ops.packing).
        mesh: a 1D jax Mesh; the (function, cluster) pair tables shard over
            its single axis.
        axis_name: mesh axis to shard over (defaults to the mesh's axis).

    Returns:
        A jittable function mapping an encoded occupancy [num_sites] int32
        to the correlation vector [num_corr] f64, numerically identical to
        :func:`smol_tpu.ops.correlations.corr_from_occupancy`.
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    n_dev = int(np.prod([mesh.shape[a] for a in (axis_name,)]))
    num_corr = packed.num_corr

    # flatten cluster tables to per-pair rows, pad to a device multiple
    from smol_tpu.ops.correlations import _pair_planes

    pc = packed.pair_cluster.astype(np.int64)
    sites = packed.cluster_sites[pc]  # [P, K]
    strides = packed.cluster_strides[pc]
    fns = packed.pair_fn.astype(np.int64)
    planes = _pair_planes(packed)  # [TMAX, P] value select planes
    P_true = len(fns)
    pad = (-P_true) % n_dev
    if pad:
        sites = np.pad(sites, ((0, pad), (0, 0)))
        strides = np.pad(strides, ((0, pad), (0, 0)))
        fns = np.pad(fns, (0, pad))
        planes = np.pad(planes, ((0, 0), (0, pad)))
    mask = np.arange(P_true + pad) < P_true

    sites_d = jnp.asarray(sites, dtype=jnp.int32)
    strides_d = jnp.asarray(strides, dtype=jnp.int32)
    fns_d = jnp.asarray(fns, dtype=jnp.int32)
    mask_d = jnp.asarray(mask)
    planes_d = jnp.asarray(planes)
    fcc = jnp.asarray(packed.fn_cluster_count)

    local = partial(
        _local_corr,
        num_corr=num_corr,
        axis_name=axis_name,
    )
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),  # occu replicated
            P(axis_name), P(axis_name), P(axis_name), P(axis_name),
            P(None, axis_name),  # planes shard over the pair column axis
            P(),  # fn_cluster_count replicated
        ),
        out_specs=P(),
    )

    @jax.jit
    def fn(occu):
        return mapped(
            jnp.asarray(occu, dtype=jnp.int32),
            sites_d, strides_d, fns_d, mask_d, planes_d, fcc,
        )

    return fn
