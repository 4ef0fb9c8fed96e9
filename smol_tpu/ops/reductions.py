"""Device-side reductions over buffered sample segments.

The sample container keeps chain-launch record batches device-resident
(smol_tpu.moca.sampler.container.SampleContainer._pending_samples); over
a slow device->host link, copying the raw records just to take a mean or
variance would dominate an analysis read.  These helpers reduce each
segment where it lives — device segments via a jitted masked sum, host
segments via numpy — and combine the per-segment partials, so only
per-walker (or pooled) results ever cross the link.

The reference computes the same statistics on host ndarrays
(smol/moca/sampler/container.py:181-229); here the statistics follow the
data.  Two-pass mean/variance: the squared deviations are taken against
the final mean, so there is no one-pass cancellation loss.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "masked_mean_segments",
    "masked_min_segments",
    "masked_sqdev_segments",
    "masked_stats_segments",
]


@partial(jax.jit, static_argnames=("pool",))
def _masked_sum(values, mask, pool):
    """Sum of mask-selected rows; also over the walker axis when pool."""
    shaped = mask.reshape((-1,) + (1,) * (values.ndim - 1))
    total = jnp.where(shaped, values.astype(jnp.float64), 0.0).sum(axis=0)
    return total.sum(axis=0) if pool else total


@partial(jax.jit, static_argnames=("pool",))
def _masked_sqdev_sum(values, mask, mean, pool):
    shaped = mask.reshape((-1,) + (1,) * (values.ndim - 1))
    deviation = values.astype(jnp.float64) - mean
    total = jnp.where(shaped, deviation * deviation, 0.0).sum(axis=0)
    return total.sum(axis=0) if pool else total


def _np_masked_sum(values, mask, pool):
    total = values[mask].astype(np.float64).sum(axis=0)
    return total.sum(axis=0) if pool else total


def _np_masked_sqdev_sum(values, mask, mean, pool):
    deviation = values[mask].astype(np.float64) - mean
    total = (deviation * deviation).sum(axis=0)
    return total.sum(axis=0) if pool else total


def _pooled_count(segments, masks, rows, pool):
    if not pool:
        return rows
    nwalkers = segments[0][0].shape[1]
    return rows * nwalkers


def masked_mean_segments(segments, masks, rows, pool_walkers=True):
    """Mean over mask-selected rows of ``segments``.

    Args:
        segments: list of (values [k, W, ...], is_device) covering the
            sample axis in order.
        masks: per-segment boolean host arrays [k] selecting rows.
        rows: total selected rows (sum of mask sums).
        pool_walkers: also average over the walker axis (flat getters).

    Returns a host float64 array shaped like one record (pooled) or one
    per-walker record.
    """
    count = _pooled_count(segments, masks, rows, pool_walkers)
    total = 0.0
    # device partials accumulate as device arrays: one host sync at the
    # end instead of one per segment (each sync pays a link round trip)
    for (values, on_device), mask in zip(segments, masks):
        if not mask.any():
            continue
        if on_device:
            total = total + _masked_sum(values, jnp.asarray(mask), pool_walkers)
        else:
            total = total + _np_masked_sum(values, mask, pool_walkers)
    return np.asarray(total) / count


@partial(jax.jit, static_argnames=("pool",))
def _masked_min(values, mask, pool):
    shaped = mask.reshape((-1,) + (1,) * (values.ndim - 1))
    low = jnp.where(shaped, values.astype(jnp.float64), jnp.inf).min(axis=0)
    return low.min(axis=0) if pool else low


def masked_min_segments(segments, masks, pool_walkers=True):
    """Minimum over mask-selected rows of ``segments`` (see mean)."""
    low = None
    for (values, on_device), mask in zip(segments, masks):
        if not mask.any():
            continue
        if on_device:
            part = _masked_min(values, jnp.asarray(mask), pool_walkers)
        else:
            part = values[mask].astype(np.float64).min(axis=0)
            if pool_walkers:
                part = part.min(axis=0)
        low = part if low is None else jnp.minimum(low, part)
    return np.asarray(low)


@partial(jax.jit, static_argnames=("pool",))
def _sum_min_pass(values, mask, pool):
    """One dispatch per segment: (masked sum, masked min)."""
    shaped = mask.reshape((-1,) + (1,) * (values.ndim - 1))
    x = values.astype(jnp.float64)
    total = jnp.where(shaped, x, 0.0).sum(axis=0)
    low = jnp.where(shaped, x, jnp.inf).min(axis=0)
    if pool:
        total = total.sum(axis=0)
        low = low.min(axis=0)
    return total, low


def masked_stats_segments(segments, masks, rows, pool_walkers=True):
    """(mean, variance, min) over selected rows in 2 dispatches/segment.

    Device partials (including the mean fed to the second pass) stay on
    device; the three results sync together at the end — the whole
    analysis costs a handful of link round trips regardless of how many
    buffered batches exist.
    """
    count = _pooled_count(segments, masks, rows, pool_walkers)
    total, low = 0.0, None
    for (values, on_device), mask in zip(segments, masks):
        if not mask.any():
            continue
        if on_device:
            part_sum, part_min = _sum_min_pass(
                values, jnp.asarray(mask), pool_walkers
            )
        else:
            part_sum = _np_masked_sum(values, mask, pool_walkers)
            part_min = values[mask].astype(np.float64).min(axis=0)
            if pool_walkers:
                part_min = part_min.min(axis=0)
        total = total + part_sum
        low = part_min if low is None else jnp.minimum(low, part_min)
    mean = total / count  # device array when any segment is on device
    sqdev = 0.0
    for (values, on_device), mask in zip(segments, masks):
        if not mask.any():
            continue
        if on_device:
            sqdev = sqdev + _masked_sqdev_sum(
                values, jnp.asarray(mask), mean, pool_walkers
            )
        else:
            sqdev = sqdev + _np_masked_sqdev_sum(
                values, mask, np.asarray(mean), pool_walkers
            )
    return np.asarray(mean), np.asarray(sqdev) / count, np.asarray(low)


def masked_sqdev_segments(segments, masks, rows, mean, pool_walkers=True):
    """Variance (squared deviation from ``mean``) over selected rows."""
    count = _pooled_count(segments, masks, rows, pool_walkers)
    total = 0.0
    mean = jnp.asarray(mean) if not np.isscalar(mean) else mean
    for (values, on_device), mask in zip(segments, masks):
        if not mask.any():
            continue
        if on_device:
            total = total + _masked_sqdev_sum(
                values, jnp.asarray(mask), mean, pool_walkers
            )
        else:
            total = total + _np_masked_sqdev_sum(
                values, mask, np.asarray(mean), pool_walkers
            )
    return np.asarray(total) / count
