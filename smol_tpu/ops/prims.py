"""Shared in-kernel primitives for the Pallas TPU chain kernels.

Double-float (two f32 word) arithmetic and hardware-PRNG draws used by
the persistent-chain kernels (smol_tpu.ops.pallas_chain, ops.pallas_sqs).
The double-float representation carries ~2^-45 relative precision —
enough to accumulate thousands of per-step energy deltas without
bookkeeping-grade drift (exact f64 recomputation happens at thinning
boundaries; see the chain kernels' numerical contracts).

Reference analog: the reference accumulates per-flip deltas in plain f64
on the host (smol/moca/kernel/base.py:300-305); TPUs have no native f64
vector path, so the kernels use a two-word compensated format instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

__all__ = ["df_add", "pos_bits", "uniform01"]


def pos_bits(shape):
    """31-bit positive random ints of the given shape (hardware PRNG).

    Callers must seed the per-core PRNG first (``pltpu.prng_seed``).
    """
    bits = pltpu.prng_random_bits(shape)
    return jax.lax.bitwise_and(
        pltpu.bitcast(bits, jnp.int32), jnp.int32(0x7FFFFFFF)
    )


def uniform01(shape):
    """f32 uniforms in (0, 1] from the hardware PRNG."""
    r = pos_bits(shape)
    return (
        jax.lax.shift_right_logical(r, jnp.int32(7)).astype(jnp.float32) + 1.0
    ) * (2.0**-24)


def df_add(ah, al, bh, bl):
    """Double-float addition: (ah, al) + (bh, bl), f32 words.

    Knuth two-sum of the high words with the low words folded into the
    error term, then renormalized — exact to ~2^-45 relative.
    """
    s = ah + bh
    v = s - ah
    e = (ah - (s - v)) + (bh - v)
    e = e + al + bl
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


# legacy aliases (the kernels predate the public names)
_df_add = df_add
_pos_bits = pos_bits
_uniform01 = uniform01
