"""Shared-proposal persistent-chain Pallas kernel for Metropolis flips.

The fastest way to run single-flip Metropolis on a TPU.  The per-walker
bottleneck of the other fast path (smol_tpu.ops.fastmc) is
that the proposal site differs per walker, so every static-table access
must be a one-hot MXU matmul over all active sites — Theta(ranks x
table-width) MACs per attempt, plus (in the XLA path) HBM round trips for
the selected rows.

This kernel removes that cost entirely by making the proposal site a
SCALAR per (walker-block, step): the site sequence is drawn up front with
``jax.random`` (state-independent), stored in SMEM, and every per-site
table row is fetched with a scalar dynamic slice from VMEM-resident
tables.  The whole chain (thousands of steps) runs inside one kernel
invocation with the occupancy and the double-float enthalpy in VMEM.

Statistical contract (READ THIS):

- Each chain remains an EXACT Metropolis chain: the site sequence is
  exogenous (independent of every walker's state), acceptance uniforms
  and proposed codes are drawn per walker, and the stationary
  distribution is untouched.  Per-chain averages are unbiased.
- Canonical swaps (``move="swap"``) share an exogenous ordered PAIR
  sequence (u, v) drawn uniformly within one sublattice; pairs whose
  species already match are identity proposals counted as rejected
  attempts.  This proposal is state-independent and symmetric, so the
  canonical stationary distribution is exact (the reference Swap usher
  conditions the partner on a different species — a different but
  equally valid symmetric proposal; acceptance fractions are therefore
  not directly comparable, sampled distributions are).
- Walkers within one block (``block_size``, default 1024) share the same
  site-visit sequence, so they are not fully independent: cross-walker
  correlations reduce the effective number of independent replicas for
  *ensemble* (across-walker) averages.  Blocks use independent sequences.
  Disable with ``Sampler.from_ensemble(..., shared_proposals=False)`` to
  fall back to fully independent per-walker proposals.

Numerical contract: energy deltas and the running
enthalpy accumulate in double-float (two f32 words, ~2^-45 relative);
acceptance evaluates in f32; recorded trace enthalpies are recomputed in
exact f64 from occupancies at thinning points, so traces carry no drift.
With an Ewald term the delta's electrostatic part accumulates its dot
product in f32 (~1e-6 relative) — acceptance-grade, not bookkeeping-grade;
bookkeeping stays exact via the thin-point recomputation.  The resulting
acceptance-decision bias is measured, not waved at: on equilibrated
states the per-move decision-flip probability E|p_f32 - p_f64| is 2e-14
at the benched 112-site spinel and 4e-13 at 378 sites, with the absolute
delta error (max 2.3e-7 / 9.5e-7 eV) growing ~linearly with the mean
Ewald row L1 norm — i.e. with active-site count — so the worst-case bound
beta*max|err| stays < 1e-5 per move at 2000 K well past bench scale
(tests/test_ops/test_ewald_f32_bias.py).

Reference analog: the per-flip delta kernels
smol/utils/cluster/evaluator.pyx:211 and smol/utils/cluster/ewald.pyx:9,
with the Python step loop (smol/moca/kernel/base.py:145) replaced by an
in-VMEM fori_loop.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smol_tpu.ops.prims import _df_add, _pos_bits, _uniform01

__all__ = [
    "ChainTables",
    "TableMove",
    "WLChain",
    "build_chain_tables",
    "build_table_move",
    "make_shared_proposal_chain",
    "make_site_delta",
    "make_site_delta_qary",
    "table_sequences",
    "runtime_supported",
    "interpret_mode",
]

_P = jax.lax.Precision.HIGHEST
MAX_TENSOR = 63  # 2*TM + 1 lane columns must fit one 128-lane tile
MAX_CHUNK_STEPS = 2048  # SMEM budget for the per-block site sequence
VMEM_TABLE_BUDGET = 6 * 2**20  # above this, stream tables from HBM


def interpret_mode() -> bool:
    """True when the kernel should run in Pallas interpret mode (CPU tests).

    Set ``SMOL_TPU_CHAIN_INTERPRET=1`` to exercise the chain kernel without
    TPU hardware (slow; for tests only).
    """
    import os

    return os.environ.get("SMOL_TPU_CHAIN_INTERPRET", "") not in ("", "0")


def runtime_supported() -> bool:
    """True when the chain kernel can run here (TPU, or interpret mode)."""
    if interpret_mode():
        return True
    try:
        d = jax.devices()[0]
    except Exception:  # pragma: no cover - no backend at all
        return False
    kind = (getattr(d, "device_kind", "") or "").lower()
    return "tpu" in kind or d.platform == "tpu"


@dataclass(frozen=True)
class ChainTables:
    """Static operands of the shared-proposal chain kernel.

    All tables are rank-indexed (rank = position in the concatenation of
    the active sublattices' site lists).  ``gm`` folds the non-self tensor
    strides into a per-rank gather matrix so that the partial tensor index
    of every local cluster is one [L, Rpad] x [Rpad, wb] matmul against
    the rank-compacted occupancy; ``gcat`` holds the coefficient-folded
    energy tables (f64 split into two f32 planes) plus the self-stride
    column, fetched per step with a scalar dynamic slice.
    """

    num_sites: int
    num_ranks: int  # R
    rpad: int  # R padded (occupancy rows / matmul contraction)
    n_local: int  # L (padded to a power of two for the df reduction)
    tensor_max: int  # TM
    binary: bool  # every active sublattice has exactly 2 codes
    # L-axis segments (l0, l1, ext): rows l0:l1 have tensor extent <= ext
    # for every rank (rows are sorted per rank by descending extent), so
    # the g-plane select loop runs only ext iterations on each segment
    segments: tuple  # tuple of (int, int, int)
    gm: jnp.ndarray  # [R, L, Rpad] bf16: strides onto neighbor ranks
    #   (strides <= MAX_TENSOR < 256 and codes <= 16 are exact in bf16;
    #   the MXU accumulates in f32, so the gather matmul stays exact)
    gcat: jnp.ndarray  # [R, L, 2*TM+1] f32: g_hi | g_lo | d2
    ncod: jnp.ndarray  # [1, R] int32 codes per rank
    rank_sites: jnp.ndarray  # [R] int32 supercell site of each rank
    cum_probs: np.ndarray  # [S] f64 sublattice pick cdf (host)
    sub_offset: np.ndarray  # [S] int32 rank offset per sublattice (host)
    n_active: np.ndarray  # [S] int32 (host)
    has_mu: bool
    mu_cols: int
    mu: jnp.ndarray | None  # [R, 2*C] f32: mu_hi | mu_lo
    has_ewald: bool
    ew_v: jnp.ndarray | None  # [R, 2, Rpad] f32: V_hi | V_lo rows
    ew_c: jnp.ndarray | None  # [1, 2*R] f32 SMEM: C_hi | C_lo constants
    # Ising fast path (binary sites + sign-symmetric site basis): every
    # local-cluster tensor row is A * (-1)^popcount(index), so the
    # TM-column g-plane select collapses to a parity sign flip.  In this
    # mode ``gm`` holds 0/1 membership parities (slot count mod 2 per
    # neighbor rank), and ``gcat`` columns 0 / TM hold the df amplitude
    # A' = A * (self slot count mod 2); all other columns are zero.  The
    # substituted Hamiltonian matches the packed tensors to <= 1e-11
    # relative (product-rounding differences only); window-boundary
    # feature recomputes always use the exact tensors.
    ising: bool = False
    # q-ary fast path (cyclic order q in {2, 3, 4}): every local-cluster
    # tensor row decomposes EXACTLY over the Z_q characters of its
    # participating sites' codes, and only characters with a nonzero
    # SELF frequency contribute to a self-site recoloring delta.  In
    # this mode the L axis holds one row per delta-relevant character:
    # ``gm`` carries scaled neighbor frequencies (one phase matmul
    # replaces the tensor gather), and ``gcat`` columns 0 / TM hold the
    # df-split FOLDED cosine amplitude, 1 / TM+1 the folded sine
    # amplitude, and 2*TM the self frequency.  Folding keeps the per-row
    # cos/sin increments in {0, +-1, +-2} so every product is exact in
    # f32 (see make_site_delta_qary).  0 = off.
    qary: int = 0


def _hash_uniform01(seed, i, slot, shape):
    """Counter-based uniform (0, 1] f32 for interpret mode (CPU tests).

    A murmur3-finalizer hash of (seed, step, slot, lane): statistically
    adequate for test-scale chains; real TPU runs use the hardware PRNG.
    """
    x = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    x = x + seed * jnp.int32(2654435761 & 0x7FFFFFFF)
    x = x ^ (i * jnp.int32(40503) + jnp.int32(slot) * jnp.int32(2246822519 & 0x7FFFFFFF))
    for mult in (-2048144789, -1028477387):
        x = x ^ jax.lax.shift_right_logical(x, jnp.int32(13 if mult < -2000000000 else 16))
        x = x * jnp.int32(mult)
    x = x ^ jax.lax.shift_right_logical(x, jnp.int32(16))
    r = jax.lax.bitwise_and(x, jnp.int32(0x7FFFFFFF))
    return (
        jax.lax.shift_right_logical(r, jnp.int32(7)).astype(jnp.float32) + 1.0
    ) * (2.0**-24)


def _hash_randint(seed, i, slot, shape, bound):
    """Counter-based integer in [0, bound) for interpret mode."""
    x = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    x = x + seed * jnp.int32(2654435761 & 0x7FFFFFFF)
    x = x ^ (i * jnp.int32(40503) + jnp.int32(slot) * jnp.int32(2246822519 & 0x7FFFFFFF))
    for mult in (-2048144789, -1028477387):
        x = x ^ jax.lax.shift_right_logical(x, jnp.int32(13 if mult < -2000000000 else 16))
        x = x * jnp.int32(mult)
    x = x ^ jax.lax.shift_right_logical(x, jnp.int32(16))
    r = jax.lax.bitwise_and(x, jnp.int32(0x7FFFFFFF))
    return jax.lax.rem(r, bound)


def _split_f64(x):
    """Split f64 -> (hi, lo) f32 with hi + lo == x exactly."""
    hi = np.asarray(x, dtype=np.float64).astype(np.float32)
    lo = (np.asarray(x, dtype=np.float64) - hi.astype(np.float64)).astype(
        np.float32
    )
    return hi, lo


def make_site_delta(segments, TM, wb):
    """Build the per-site df energy-delta evaluator used by chain kernels.

    Returns ``site_delta(gm_x, gcat_x, occ_bf, a, b) -> (dh, dl)``: the
    double-float energy delta of recoloring one site from code ``a`` to
    code ``b`` ([1, wb] each), given that site's gather row ``gm_x``
    [L, RP] bf16 and coefficient table ``gcat_x`` [L, >=2*TM+1] f32.  The
    gather matmul runs in single-pass bf16 (strides and codes are small
    integers, exact in bf16; the MXU accumulates f32); the g-plane select
    loops only over each L segment's tensor extent.
    """

    def site_delta(gm_x, gcat_x, occ_bf, a, b):
        t_part = jax.lax.dot(
            gm_x, occ_bf, preferred_element_type=jnp.float32
        )  # [L, wb] f32, exact
        dh_t = jnp.zeros((1, wb), jnp.float32)
        dl_t = dh_t
        for (l0, l1, ext_s) in segments:
            ls = l1 - l0
            d2_s = jax.lax.broadcast_in_dim(
                gcat_x[l0:l1, 2 * TM: 2 * TM + 1], (ls, wb), (0, 1)
            )
            t_old = t_part[l0:l1] + a * d2_s
            t_new = t_part[l0:l1] + b * d2_s
            zero = jnp.zeros((ls, wb), jnp.float32)
            hn = zero
            ho = zero
            ln_ = zero
            lo_ = zero
            for tt in range(ext_s):
                ttf = jnp.float32(tt)
                ghc = jax.lax.broadcast_in_dim(
                    gcat_x[l0:l1, tt: tt + 1], (ls, wb), (0, 1)
                )
                glc = jax.lax.broadcast_in_dim(
                    gcat_x[l0:l1, TM + tt: TM + tt + 1], (ls, wb), (0, 1)
                )
                mn = t_new == ttf
                mo = t_old == ttf
                hn = jnp.where(mn, ghc, hn)
                ho = jnp.where(mo, ghc, ho)
                ln_ = jnp.where(mn, glc, ln_)
                lo_ = jnp.where(mo, glc, lo_)
            dh, dl = _df_add(hn, ln_, -ho, -lo_)
            width = ls  # power-of-two segment tree reduction
            while width > 1:
                half = width // 2
                dh, dl = _df_add(
                    dh[:half, :], dl[:half, :],
                    dh[half:width, :], dl[half:width, :],
                )
                width = half
            dh_t, dl_t = _df_add(dh_t, dl_t, dh, dl)
        return dh_t, dl_t  # [1, wb]

    return site_delta


def make_swap_pair_delta(segments, TM, wb, L, RP):
    """Build the fused two-site swap energy-delta evaluator.

    Returns ``swap_delta(gm_u, gcat_u, gm_v, gcat_v, occ_bf, a, b, u) ->
    (dh, dl)``: the double-float TOTAL energy delta of recoloring site u
    from code ``a`` to ``b`` and site v from ``b`` to ``a`` (a canonical
    swap), in ONE stacked gather matmul instead of two sequential
    site_delta calls.  v's t-row must see u's flip already applied; since
    occ1 = occ + e_u (b - a) is a rank-1 update, the correction is the
    single column ``gm_v[:, u] * (b - a)`` (extracted by a tiny one-hot
    matmul) — no second [L, RP] x [RP, wb] pass over the updated
    occupancy.  All operands are small integers, exact in bf16/f32, so
    the result is bit-identical to the two-pass evaluation.
    """

    def swap_delta(gm_u, gcat_u, gm_v, gcat_v, occ_bf, a, b, u):
        big = jnp.concatenate([gm_u, gm_v], axis=0)  # [2L, RP] bf16
        t_all = jax.lax.dot(
            big, occ_bf, preferred_element_type=jnp.float32
        )  # [2L, wb] f32, exact
        e_u = (
            jax.lax.broadcasted_iota(jnp.int32, (RP, 1), 0) == u
        ).astype(jnp.bfloat16)
        corr = jax.lax.dot(
            gm_v, e_u, preferred_element_type=jnp.float32
        )  # [L, 1] = gm_v[:, u]
        diff = b - a  # [1, wb] f32; zero for null pairs -> delta 0
        dh_t = jnp.zeros((1, wb), jnp.float32)
        dl_t = dh_t
        for (l0, l1, ext_s) in segments:
            ls = l1 - l0
            d2_u = jax.lax.broadcast_in_dim(
                gcat_u[l0:l1, 2 * TM: 2 * TM + 1], (ls, wb), (0, 1)
            )
            d2_v = jax.lax.broadcast_in_dim(
                gcat_v[l0:l1, 2 * TM: 2 * TM + 1], (ls, wb), (0, 1)
            )
            t_u = t_all[l0:l1]
            t_v = t_all[L + l0: L + l1] + corr[l0:l1] * diff
            # stacked [2ls, wb]: u recolors a -> b, v recolors b -> a
            t_old = jnp.concatenate([t_u + a * d2_u, t_v + b * d2_v], axis=0)
            t_new = jnp.concatenate([t_u + b * d2_u, t_v + a * d2_v], axis=0)
            zero = jnp.zeros((2 * ls, wb), jnp.float32)
            hn = zero
            ho = zero
            ln_ = zero
            lo_ = zero
            for tt in range(ext_s):
                ttf = jnp.float32(tt)
                ghc = jnp.concatenate(
                    [
                        jax.lax.broadcast_in_dim(
                            gcat_u[l0:l1, tt: tt + 1], (ls, wb), (0, 1)
                        ),
                        jax.lax.broadcast_in_dim(
                            gcat_v[l0:l1, tt: tt + 1], (ls, wb), (0, 1)
                        ),
                    ],
                    axis=0,
                )
                glc = jnp.concatenate(
                    [
                        jax.lax.broadcast_in_dim(
                            gcat_u[l0:l1, TM + tt: TM + tt + 1], (ls, wb), (0, 1)
                        ),
                        jax.lax.broadcast_in_dim(
                            gcat_v[l0:l1, TM + tt: TM + tt + 1], (ls, wb), (0, 1)
                        ),
                    ],
                    axis=0,
                )
                mn = t_new == ttf
                mo = t_old == ttf
                hn = jnp.where(mn, ghc, hn)
                ho = jnp.where(mo, ghc, ho)
                ln_ = jnp.where(mn, glc, ln_)
                lo_ = jnp.where(mo, glc, lo_)
            dh, dl = _df_add(hn, ln_, -ho, -lo_)
            width = 2 * ls  # power-of-two stacked tree reduction sums u + v
            while width > 1:
                half = width // 2
                dh, dl = _df_add(
                    dh[:half, :], dl[:half, :],
                    dh[half:width, :], dl[half:width, :],
                )
                width = half
            dh_t, dl_t = _df_add(dh_t, dl_t, dh, dl)
        return dh_t, dl_t  # [1, wb]

    return swap_delta


def _mod2(x):
    """Exact parity of a small-integer-valued f32 plane (negatives ok)."""
    return x - 2.0 * jnp.floor(x * 0.5)


def make_site_delta_ising(TM, wb):
    """Ising-factorized site delta: parity sign flip instead of a select.

    For binary sites with a sign-symmetric basis every local tensor row
    is ``A * (-1)^popcount(index)``, so recoloring the self site from
    ``a`` to ``b`` changes the row value by ``-2 (b - a) A (-1)^t01``
    with ``t01`` the neighbor-membership parity — computed by the same
    gather matmul (gm holds 0/1 parities), no TM-column select loop.
    Rows whose self slot count is even (or padding) carry A' = 0.
    Exact: products/scalings by {0, +-1, +-2} are lossless in f32.
    """

    def site_delta(gm_x, gcat_x, occ_bf, a, b):
        L = gm_x.shape[0]
        t01 = jax.lax.dot(
            gm_x, occ_bf, preferred_element_type=jnp.float32
        )  # [L, wb] neighbor parity counts, exact
        s = 1.0 - 2.0 * _mod2(t01)  # (-1)^t01
        ah = jax.lax.broadcast_in_dim(gcat_x[:, 0:1], (L, wb), (0, 1))
        al = jax.lax.broadcast_in_dim(gcat_x[:, TM: TM + 1], (L, wb), (0, 1))
        dh = ah * s
        dl = al * s
        width = L
        while width > 1:
            half = width // 2
            dh, dl = _df_add(
                dh[:half, :], dl[:half, :],
                dh[half:width, :], dl[half:width, :],
            )
            width = half
        scale = -2.0 * (b - a)  # [1, wb] in {-2, 0, +2}: exact df scaling
        return dh * scale, dl * scale

    return site_delta


def make_swap_pair_delta_ising(TM, wb, L, RP):
    """Fused two-site Ising swap delta (see make_swap_pair_delta).

    u recolors a -> b and v recolors b -> a; v's parity sees u's flip
    through the 0/1 membership column ``gm_v[:, u]`` (rank-1, exact).
    The total is ``-2 (b - a) * (sum_u A s_u - sum_v A s_v)``, reduced
    as one stacked [2L, wb] df tree.
    """

    def swap_delta(gm_u, gcat_u, gm_v, gcat_v, occ_bf, a, b, u):
        big = jnp.concatenate([gm_u, gm_v], axis=0)  # [2L, RP] bf16
        t_all = jax.lax.dot(
            big, occ_bf, preferred_element_type=jnp.float32
        )  # [2L, wb]
        e_u = (
            jax.lax.broadcasted_iota(jnp.int32, (RP, 1), 0) == u
        ).astype(jnp.bfloat16)
        corr = jax.lax.dot(
            gm_v, e_u, preferred_element_type=jnp.float32
        )  # [L, 1] = u's membership parity in v's rows
        diff = b - a  # [1, wb]; zero for null pairs -> delta 0
        s_u = 1.0 - 2.0 * _mod2(t_all[:L])
        s_v = 1.0 - 2.0 * _mod2(t_all[L:] + corr * diff)
        ah_u = jax.lax.broadcast_in_dim(gcat_u[:, 0:1], (L, wb), (0, 1))
        al_u = jax.lax.broadcast_in_dim(gcat_u[:, TM: TM + 1], (L, wb), (0, 1))
        ah_v = jax.lax.broadcast_in_dim(gcat_v[:, 0:1], (L, wb), (0, 1))
        al_v = jax.lax.broadcast_in_dim(gcat_v[:, TM: TM + 1], (L, wb), (0, 1))
        dh = jnp.concatenate([ah_u * s_u, -(ah_v * s_v)], axis=0)
        dl = jnp.concatenate([al_u * s_u, -(al_v * s_v)], axis=0)
        width = 2 * L
        while width > 1:
            half = width // 2
            dh, dl = _df_add(
                dh[:half, :], dl[:half, :],
                dh[half:width, :], dl[half:width, :],
            )
            width = half
        scale = -2.0 * diff
        return dh * scale, dl * scale

    return swap_delta


def _qary_fold(q):
    """(fold_c, fold_s): amplitude folds making phase increments exact.

    cos(2*pi*w/q) over w in [0, q) takes values whose pairwise
    DIFFERENCES are fold_c * {0, +-1, +-2} (same for sin with fold_s),
    for q in {2, 3, 4}:

        q=2: cos = [1, -1]            -> diffs in {0, +-2},        fold 1
        q=3: cos = [1, -1/2, -1/2]    -> diffs in {0, +-3/2},      fold 3/2
             sin = [0, s, -s]         -> diffs in s * {0, +-1, +-2}
        q=4: cos = [1, 0, -1, 0]      -> diffs in {0, +-1, +-2},   fold 1

    Folding the factor into the (f64 -> df) amplitude at table-build
    time leaves only products by {0, +-1, +-2} in the kernel — exact in
    f32, so the q-ary delta is double-float grade like the Ising path.
    """
    if q == 2:
        return 1.0, 0.0
    if q == 3:
        return 1.5, np.sqrt(3.0) / 2.0
    return 1.0, 1.0  # q == 4


def _phase_sel(q, w):
    """Branchless folded (sigma_cos, sigma_sin) of a phase plane w.

    sigma are the cos/sin values DIVIDED by their q-fold (so their
    increments are integers in {0, +-1, +-2}): see _qary_fold.
    """
    if q == 2:
        return 1.0 - 2.0 * w, None
    if q == 3:
        sc = (w == 0.0).astype(jnp.float32)
        ss = (w == 1.0).astype(jnp.float32) - (w == 2.0).astype(jnp.float32)
        return sc, ss
    sc = (w == 0.0).astype(jnp.float32) - (w == 2.0).astype(jnp.float32)
    ss = (w == 1.0).astype(jnp.float32) - (w == 3.0).astype(jnp.float32)
    return sc, ss


def _df_reduce_rows(dh, dl, width):
    """df reduction of [width, wb] planes to [1, wb], any width.

    One fold of the tail into the head reaches the largest power of two
    below ``width``, then a plain tree finishes: O(log width) ops with
    no row padding — the op count matters both on hardware (dependent-op
    latency) and in interpret mode (per-op dispatch cost).
    """
    p = 1
    while p * 2 < width:
        p *= 2
    if width > p:
        r = width - p  # <= p rows folded into the head
        sh, sl = _df_add(dh[:r, :], dl[:r, :], dh[p:width, :], dl[p:width, :])
        dh = jnp.concatenate([sh, dh[r:p, :]], axis=0)
        dl = jnp.concatenate([sl, dl[r:p, :]], axis=0)
        width = p
    while width > 1:
        half = width // 2
        dh, dl = _df_add(
            dh[:half, :], dl[:half, :], dh[half:width, :], dl[half:width, :]
        )
        width = half
    return dh, dl


def make_site_delta_qary(q, TM, wb):
    """Z_q character site delta: one frequency matmul + mod-q selects.

    For q-ary codes every local tensor row is a finite real Fourier
    series ``sum_p A_p cos(2 pi <m_p, c> / q) + B_p sin(...)`` over the
    participating sites' codes; recoloring the self site from ``a`` to
    ``b`` shifts each character's phase ``w`` by ``m_self (b - a)``, so
    the delta needs only the neighbor phase ``u = <m, c_neighbors>``
    (the gather matmul, with gm holding scaled frequencies) and a
    handful of compare-selects on ``(u + m_self code) mod q`` — no
    tensor-extent select loop.  Amplitude folding (_qary_fold) keeps
    every kernel product exact in f32.  The q = 2 instance covers
    binary bases that are NOT sign-symmetric (e.g. indicator), where
    the Ising parity path does not apply.
    """
    qf = jnp.float32(q)

    def _modq(x):
        # exact for small-integer-valued f32 planes (x / q rounds to a
        # value strictly between adjacent integers unless exact)
        return x - qf * jnp.floor(x / qf)

    def site_delta(gm_x, gcat_x, occ_bf, a, b):
        L = gm_x.shape[0]
        u = jax.lax.dot(
            gm_x, occ_bf, preferred_element_type=jnp.float32
        )  # [L, wb] neighbor phases, exact
        ms = jax.lax.broadcast_in_dim(
            gcat_x[:, 2 * TM: 2 * TM + 1], (L, wb), (0, 1)
        )
        wo = _modq(u + ms * a)
        wn = _modq(u + ms * b)
        sco, sso = _phase_sel(q, wo)
        scn, ssn = _phase_sel(q, wn)
        dc = scn - sco  # in {0, +-1, +-2}: exact f32 multipliers
        ch = jax.lax.broadcast_in_dim(gcat_x[:, 0:1], (L, wb), (0, 1))
        cl = jax.lax.broadcast_in_dim(gcat_x[:, TM: TM + 1], (L, wb), (0, 1))
        if q == 2:
            dh, dl = ch * dc, cl * dc
        else:
            ds = ssn - sso
            bh = jax.lax.broadcast_in_dim(gcat_x[:, 1:2], (L, wb), (0, 1))
            bl = jax.lax.broadcast_in_dim(
                gcat_x[:, TM + 1: TM + 2], (L, wb), (0, 1)
            )
            dh, dl = _df_add(ch * dc, cl * dc, bh * ds, bl * ds)
        return _df_reduce_rows(dh, dl, L)  # [1, wb]

    return site_delta


def make_swap_pair_delta_qary(q, TM, wb, L, RP):
    """Fused two-site Z_q swap delta (see make_swap_pair_delta).

    u recolors a -> b and v recolors b -> a; v's phases see u's flip
    through the frequency column ``gm_v[:, u] * (b - a)`` (phases are
    linear in codes, so the rank-1 correction is exact).  The stacked
    [2L, wb] df tree sums u's and v's character contributions.
    """
    qf = jnp.float32(q)

    def _modq(x):
        return x - qf * jnp.floor(x / qf)

    def swap_delta(gm_u, gcat_u, gm_v, gcat_v, occ_bf, a, b, u):
        big = jnp.concatenate([gm_u, gm_v], axis=0)  # [2L, RP] bf16
        t_all = jax.lax.dot(
            big, occ_bf, preferred_element_type=jnp.float32
        )  # [2L, wb]
        e_u = (
            jax.lax.broadcasted_iota(jnp.int32, (RP, 1), 0) == u
        ).astype(jnp.bfloat16)
        corr = jax.lax.dot(
            gm_v, e_u, preferred_element_type=jnp.float32
        )  # [L, 1] = u's frequency in v's rows
        diff = b - a  # [1, wb]; zero for null pairs -> delta 0
        u_u = t_all[:L]
        u_v = t_all[L:] + corr * diff  # exact: freq x small code change
        ms_u = jax.lax.broadcast_in_dim(
            gcat_u[:, 2 * TM: 2 * TM + 1], (L, wb), (0, 1)
        )
        ms_v = jax.lax.broadcast_in_dim(
            gcat_v[:, 2 * TM: 2 * TM + 1], (L, wb), (0, 1)
        )
        # u: a -> b ; v (post-u): b -> a
        wo = jnp.concatenate([_modq(u_u + ms_u * a), _modq(u_v + ms_v * b)], axis=0)
        wn = jnp.concatenate([_modq(u_u + ms_u * b), _modq(u_v + ms_v * a)], axis=0)
        sco, sso = _phase_sel(q, wo)
        scn, ssn = _phase_sel(q, wn)
        dc = scn - sco
        ch = jnp.concatenate(
            [
                jax.lax.broadcast_in_dim(gcat_u[:, 0:1], (L, wb), (0, 1)),
                jax.lax.broadcast_in_dim(gcat_v[:, 0:1], (L, wb), (0, 1)),
            ],
            axis=0,
        )
        cl = jnp.concatenate(
            [
                jax.lax.broadcast_in_dim(gcat_u[:, TM: TM + 1], (L, wb), (0, 1)),
                jax.lax.broadcast_in_dim(gcat_v[:, TM: TM + 1], (L, wb), (0, 1)),
            ],
            axis=0,
        )
        if q == 2:
            dh, dl = ch * dc, cl * dc
        else:
            ds = ssn - sso
            bh = jnp.concatenate(
                [
                    jax.lax.broadcast_in_dim(gcat_u[:, 1:2], (L, wb), (0, 1)),
                    jax.lax.broadcast_in_dim(gcat_v[:, 1:2], (L, wb), (0, 1)),
                ],
                axis=0,
            )
            bl = jnp.concatenate(
                [
                    jax.lax.broadcast_in_dim(
                        gcat_u[:, TM + 1: TM + 2], (L, wb), (0, 1)
                    ),
                    jax.lax.broadcast_in_dim(
                        gcat_v[:, TM + 1: TM + 2], (L, wb), (0, 1)
                    ),
                ],
                axis=0,
            )
            dh, dl = _df_add(ch * dc, cl * dc, bh * ds, bl * ds)
        return _df_reduce_rows(dh, dl, 2 * L)

    return swap_delta


def _qary_tables(rank_sites, rank_of_site, sites3, strides3, g3,
                 valid_cluster, n_codes, L0, rpad, tmax, max_rows=2048):
    """Build Z_q character tables (the q-ary generalization of Ising).

    Any real function on a product of cyclic code spaces decomposes
    exactly over roots-of-unity characters; a self-site recoloring
    changes only the characters whose self frequency is nonzero.  For
    every valid local-cluster row this tabulates the packed tensor over
    the participating sites' code grid, takes its multi-dimensional
    real DFT, verifies the scaled-frequency reconstruction the kernel
    will use to <= 1e-11 relative (guarding the index bookkeeping, not
    the mathematics), and keeps the delta-relevant characters.

    Sites with q_k codes embed into the global cyclic order q (the lcm
    of all flippable code counts) by scaling their frequencies with
    q / q_k, so mixed binary/quaternary systems ride one q = 4 kernel.

    Returns ``(q, gmq [R, Lq, rpad] f64 scaled neighbor frequencies,
    chi/clo/bhi/blo [R, Lq] f64 df-split folded amplitudes,
    msq [R, Lq] f64 scaled self frequencies, Lq)`` or None when
    unsupported (lcm not in {2, 3, 4}, tensor-index overflow, or more
    than ``max_rows`` character rows on some rank).
    """
    from math import lcm

    R = len(rank_sites)
    K = sites3.shape[2]
    q = 1
    for s in rank_sites:
        q = lcm(q, int(n_codes[s]))
    if q not in (2, 3, 4):
        return None
    fold_c, fold_s = _qary_fold(q)

    # One row per distinct character (freq vector + self frequency) per
    # rank: characters from different correlation functions over the
    # same site set coincide, and their amplitudes add exactly (the
    # Fourier series of a sum is the sum of the series) — merging them
    # shrinks Lq (and with it the per-step matmul and streamed DMA) by
    # the function multiplicity, typically 2-4x for ternary subspaces.
    rows = [{} for _ in range(R)]  # (freq key, ms) -> [freq, A_c, A_s]
    for ri, site in enumerate(rank_sites):
        for l in range(L0):
            if not valid_cluster[site, l]:
                continue
            row = g3[site, l]
            groups = {}  # member site -> [stride sum, slot count]
            for k in range(K):
                st = strides3[site, l, k]
                if st <= 0:
                    continue
                entry = groups.setdefault(int(sites3[site, l, k]), [0, 0])
                entry[0] += int(st)
                entry[1] += 1
            if int(site) not in groups:
                return None  # valid rows always carry a self stride
            # participating sites: self first, then flippable neighbors
            # (frozen single-code neighbors hold code 0 and drop out)
            members = [int(site)] + [
                s
                for s in groups
                if s != int(site) and rank_of_site[s] >= 0
            ]
            shape = tuple(int(n_codes[s]) for s in members)
            ssums = np.array([groups[s][0] for s in members])
            scales = np.array([q // qk for qk in shape])
            grid = np.stack(
                np.meshgrid(*(np.arange(qk) for qk in shape), indexing="ij")
            )  # [K', *shape]
            t_grid = np.tensordot(ssums, grid, axes=(0, 0))
            if t_grid.max() >= tmax:
                return None
            v = row[t_grid]  # [*shape] f64
            scale = max(float(np.abs(v).max()), 1e-300)
            F = np.fft.fftn(v) / v.size
            tiny = 1e-13 * scale
            consumed = np.zeros(shape, dtype=bool)
            recon = np.zeros(shape, dtype=np.float64)
            kept = []  # (scaled freqs incl. self, folded A_c, folded A_s)
            for m in np.ndindex(shape):
                if consumed[m]:
                    continue
                consumed[m] = True
                mc = tuple((-mi) % qk for mi, qk in zip(m, shape))
                if mc == m:  # self-conjugate: purely real character
                    a_c, a_s = float(F[m].real), 0.0
                else:
                    consumed[mc] = True
                    a_c = 2.0 * float(F[m].real)
                    a_s = -2.0 * float(F[m].imag)
                if max(abs(a_c), abs(a_s)) < tiny:
                    continue
                sm = np.array(m) * scales  # scaled frequencies
                w = np.mod(np.tensordot(sm, grid, axes=(0, 0)), q)
                theta = 2.0 * np.pi * w / q
                recon += a_c * np.cos(theta) + a_s * np.sin(theta)
                if sm[0] % q:  # delta-relevant: nonzero self frequency
                    kept.append((sm, a_c, a_s))
            if np.abs(recon - v).max() > 1e-11 * scale:
                return None
            for sm, a_c, a_s in kept:
                freq = np.zeros(rpad, dtype=np.float64)
                for s_m, f in zip(members[1:], sm[1:]):
                    freq[rank_of_site[s_m]] = float(f)
                key = (freq.tobytes(), float(sm[0] % q))
                entry = rows[ri].setdefault(key, [freq, 0.0, 0.0])
                entry[1] += a_c
                entry[2] += a_s
        if len(rows[ri]) > max_rows:
            return None

    n_max = max((len(r) for r in rows), default=0)
    if n_max == 0:
        return None
    Lq = max(16, -(-n_max // 16) * 16)  # bf16 sublane-tile aligned
    gmq = np.zeros((R, Lq, rpad), dtype=np.float64)
    amp_c = np.zeros((R, Lq), dtype=np.float64)
    amp_s = np.zeros((R, Lq), dtype=np.float64)
    msq = np.zeros((R, Lq), dtype=np.float64)
    for ri in range(R):
        for j, ((_fk, ms), (freq, a_c, a_s)) in enumerate(rows[ri].items()):
            gmq[ri, j] = freq
            # fold AFTER merging so the df split sees the exact f64 sum
            amp_c[ri, j], amp_s[ri, j] = fold_c * a_c, fold_s * a_s
            msq[ri, j] = ms
    chi, clo = _split_f64(amp_c)
    bhi, blo = _split_f64(amp_s)
    return q, gmq, chi, clo, bhi, blo, msq, Lq


def _ising_tables(rank_sites, rank_of_site, sites3, strides3, g3,
                  valid_cluster, L0, L, rpad, tmax):
    """Detect the Ising-factorizable tensor pattern and build its tables.

    Returns ``(gm01 [R, L, rpad] f64, amp [R, L] f64)`` when EVERY valid
    local-cluster row satisfies ``g3[row, t] == A * (-1)^popcount(t)``
    on its reachable indices to <= 1e-11 relative (the reachable set is
    enumerated per SITE group so multi-slot sites flip jointly), else
    None.  ``amp`` is 0 for rows with an even self slot count (the flip
    cancels) and for padding.
    """
    R = len(rank_sites)
    K = sites3.shape[2]
    gm01 = np.zeros((R, L, rpad), dtype=np.float64)
    amp = np.zeros((R, L), dtype=np.float64)
    for ri, site in enumerate(rank_sites):
        for l in range(L0):
            if not valid_cluster[site, l]:
                continue
            row = g3[site, l]
            a0 = row[0]
            # group positive-stride slots by member site
            groups = {}  # member site -> [stride sum, slot count]
            for k in range(K):
                st = strides3[site, l, k]
                if st <= 0:
                    continue
                entry = groups.setdefault(int(sites3[site, l, k]), [0, 0])
                entry[0] += int(st)
                entry[1] += 1
            self_ssum, self_cnt = groups.pop(int(site), [0, 0])
            # frozen single-code neighbors never flip: drop from the
            # reachable enumeration (their bits stay 0)
            members = [
                (ssum, cnt)
                for s_m, (ssum, cnt) in groups.items()
                if rank_of_site[s_m] >= 0
            ]
            # verify the pattern on all reachable indices (incl. self)
            tol = 1e-11 * max(abs(a0), 1e-300)
            combos = [(0, 0)]
            for ssum, cnt in members + (
                [(self_ssum, self_cnt)] if self_cnt else []
            ):
                combos = [
                    (t + c * ssum, p + c * cnt)
                    for (t, p) in combos
                    for c in (0, 1)
                ]
            for t, p in combos:
                if t >= tmax or abs(row[t] - a0 * (-1.0) ** p) > tol:
                    return None
            amp[ri, l] = a0 if self_cnt % 2 else 0.0
            for s_m, (ssum, cnt) in groups.items():
                nr = rank_of_site[s_m]
                if nr >= 0:
                    gm01[ri, l, nr] = float(cnt % 2)
    return gm01, amp


def build_chain_tables(processor, sublattices, mu_table=None,
                       sublattice_probabilities=None):
    """Build ChainTables, or None when the system is unsupported.

    Requirements: a packed CE-style processor (or a CompositeProcessor of
    one such + one EwaldProcessor), active sublattices with default
    (arange) encodings and no site restrictions, every non-self cluster
    slot pointing at an active rank or a single-species (code-0) site,
    positive self strides (as in ops.fastmc), tensor sizes <= 63, and —
    when an Ewald term is present — binary codes on every active site.
    """
    from smol_tpu.ops.fastmc import MAX_CODES, site_local_arrays

    # ---- unpack an optional composite into CE + Ewald parts ----
    ewald_proc = None
    ce_proc = processor
    subs = getattr(processor, "processors", None)
    if subs is not None:
        from smol_tpu.moca.processor.ewald import EwaldProcessor

        ce_parts = [p for p in subs if getattr(p, "fast_path_ok", False)]
        ew_parts = [p for p in subs if isinstance(p, EwaldProcessor)]
        if len(ce_parts) != 1 or len(ce_parts) + len(ew_parts) != len(subs):
            return None
        ce_proc = ce_parts[0]
        ewald_proc = ew_parts[0] if ew_parts else None

    arrays = site_local_arrays(ce_proc)
    if arrays is None:
        return None
    sites3, strides3, d2, g3, tmax = arrays
    n, L0, K = sites3.shape
    if tmax > MAX_TENSOR:
        return None

    active = [s for s in sublattices if s.is_active]
    if not active:
        return None
    for s in active:
        if not np.array_equal(s.encoding, np.arange(len(s.encoding))):
            return None
        if len(s.active_sites) != len(s.sites):
            return None  # restricted (frozen) sites: cannot fold

    n_codes = np.ones(n, dtype=np.int64)
    for s in sublattices:
        n_codes[s.sites] = len(s.encoding)
    if n_codes.max() > MAX_CODES:
        return None

    rank_sites = np.concatenate(
        [np.asarray(s.active_sites, dtype=np.int64) for s in active]
    )
    R = len(rank_sites)
    rank_of_site = -np.ones(n, dtype=np.int64)
    rank_of_site[rank_sites] = np.arange(R)
    rpad = max(8, -(-R // 8) * 8)

    # every valid cluster needs a positive self stride (fold into d2)
    valid_cluster = strides3.sum(axis=2) > 0
    if np.any(valid_cluster & (d2 <= 0)):
        return None

    L = 8
    while L < L0:
        L *= 2

    gm = np.zeros((R, L, rpad), dtype=np.float64)
    d2r = np.zeros((R, L), dtype=np.float64)
    g3r = np.zeros((R, L, tmax), dtype=np.float64)
    ext = np.zeros((R, L), dtype=np.int64)  # tensor extent per local cluster
    for ri, site in enumerate(rank_sites):
        d2r[ri, :L0] = d2[site]
        g3r[ri, :L0] = g3[site]
        for l in range(L0):
            if not valid_cluster[site, l]:
                continue
            e = 1
            for k in range(K):
                st = strides3[site, l, k]
                nb = sites3[site, l, k]
                if st <= 0:
                    continue
                e += st * (n_codes[nb] - 1)
                if nb != site:
                    nr = rank_of_site[nb]
                    if nr < 0:
                        if n_codes[nb] != 1:
                            return None  # frozen multi-code neighbor
                        continue  # single-species neighbor: code 0
                    gm[ri, l, nr] += st
            ext[ri, l] = e
    # strides <= MAX_TENSOR < 256 are exact in bfloat16 (codes <= 16, MXU
    # accumulates in f32), which the single-pass gather matmul relies on
    if gm.max(initial=0) >= 256 or d2r.max(initial=0) >= 2**24:
        return None

    # sort every rank's local clusters by descending tensor extent, then
    # partition the (shared) L axis into power-of-two segments so the
    # g-plane select loop runs only as many iterations as each segment's
    # worst extent (invalid/pad rows have extent 0 and all-zero g rows)
    order = np.argsort(-ext, axis=1, kind="stable")
    gm = np.take_along_axis(gm, order[:, :, None], axis=1)
    d2r = np.take_along_axis(d2r, order, axis=1)
    g3r = np.take_along_axis(g3r, order[:, :, None], axis=1)
    pos_ext = np.take_along_axis(ext, order, axis=1).max(axis=0)

    def _segment(l0, length):
        e = int(pos_ext[l0])
        if e == 0:
            return []
        if length <= 8:
            return [(l0, l0 + length, e)]
        half = length // 2
        left = _segment(l0, half)
        right = _segment(l0 + half, half)
        split_cost = sum(
            (b - a) * x for a, b, x in left + right
        )
        return left + right if split_cost < length * e else [(l0, l0 + length, e)]

    segments = tuple(_segment(0, L))
    if not segments:
        return None

    g_hi, g_lo = _split_f64(g3r)
    gcat = np.concatenate(
        [g_hi, g_lo, d2r[:, :, None].astype(np.float32)], axis=2
    )

    sub_n_codes = np.array([len(s.encoding) for s in active], dtype=np.int64)
    binary = bool((sub_n_codes == 2).all())

    # Ising fast path: binary sites + sign-symmetric basis tensors (see
    # ChainTables.ising).  Opt out with SMOL_TPU_CHAIN_NO_ISING=1.
    ising = False
    if binary and os.environ.get("SMOL_TPU_CHAIN_NO_ISING") != "1":
        built = _ising_tables(
            rank_sites, rank_of_site, sites3, strides3, g3,
            valid_cluster, L0, L, rpad, tmax,
        )
        if built is not None:
            gm01, amp = built
            amp_h, amp_l = _split_f64(amp)
            gcat = np.zeros((R, L, 2 * tmax + 1), dtype=np.float32)
            gcat[:, :, 0] = amp_h
            gcat[:, :, tmax] = amp_l
            gm = gm01
            segments = ((0, L, 1),)
            ising = True

    # q-ary fast path: cyclic-order-q character factorization (see
    # ChainTables.qary).  Covers everything the Ising path does not —
    # ternary/quaternary codes and non-sign-symmetric binary bases —
    # whenever the lcm of the active code counts is 2, 3, or 4 and the
    # character-row count stays within budget.  Opt out with
    # SMOL_TPU_CHAIN_NO_QARY=1.
    qary = 0
    if (
        not ising
        and tmax >= 2  # the amplitude column layout needs 2*TM+1 >= 5
        and os.environ.get("SMOL_TPU_CHAIN_NO_QARY") != "1"
    ):
        built = _qary_tables(
            rank_sites, rank_of_site, sites3, strides3, g3,
            valid_cluster, n_codes, L0, rpad, tmax,
        )
        # commit only when the character rows fit the per-step working
        # set (streamed-mode double buffers); else keep the select path
        if built is not None and (
            8 * built[-1] * rpad + 16 * built[-1] * (2 * tmax + 1)
            <= 8 * 2**20
        ):
            q_det, gmq, chi, clo, bhi, blo, msq, Lq = built
            gcat_q = np.zeros((R, Lq, 2 * tmax + 1), dtype=np.float32)
            gcat_q[:, :, 0] = chi
            gcat_q[:, :, 1] = bhi
            gcat_q[:, :, tmax] = clo
            gcat_q[:, :, tmax + 1] = blo
            gcat_q[:, :, 2 * tmax] = msq
            gcat = gcat_q
            gm = gmq
            L = Lq
            segments = ((0, Lq, 1),)
            qary = q_det
    ncod = np.ones((1, R), dtype=np.int32)
    off = 0
    nact = np.array([len(s.active_sites) for s in active], dtype=np.int64)
    for i, s in enumerate(active):
        ncod[0, off: off + nact[i]] = len(s.encoding)
        off += nact[i]
    sub_offset = np.concatenate([[0], np.cumsum(nact)[:-1]]).astype(np.int64)

    has_mu = mu_table is not None
    mu = None
    mu_cols = 0
    if has_mu:
        mu_r = np.asarray(mu_table, dtype=np.float64)[rank_sites]
        mu_cols = mu_r.shape[1]
        mh, ml = _split_f64(mu_r)
        mu = np.concatenate([mh, ml], axis=1)

    # ---- Ewald folding (binary active sites only) ----
    has_ewald = ewald_proc is not None
    ew_v = ew_c = None
    if has_ewald:
        if not binary:
            return None
        coef = float(np.atleast_1d(ewald_proc.coefs)[0])
        M = np.asarray(ewald_proc.ewald_matrix, dtype=np.float64)
        inds = np.asarray(ewald_proc._ewald_inds)
        n_ew = M.shape[0]

        def row_of(site, code):
            r = int(inds[site, code]) if code < inds.shape[1] else -1
            return r if 0 <= r < n_ew else -1

        # fixed (single-code) occupied rows
        fixed_rows = [
            row_of(t, 0) for t in range(n) if n_codes[t] == 1
        ]
        fixed_rows = [r for r in fixed_rows if r >= 0]
        r0 = np.array([row_of(s, 0) for s in rank_sites])
        r1 = np.array([row_of(s, 1) for s in rank_sites])

        def mrow(r):  # M row, 0 when the species is a vacancy
            return M[r] if r >= 0 else np.zeros(n_ew)

        def mdiag(r):
            return M[r, r] if r >= 0 else 0.0

        V = np.zeros((R, R), dtype=np.float64)
        C = np.zeros(R, dtype=np.float64)
        for u in range(R):
            dm = mrow(r1[u]) - mrow(r0[u])  # [n_ew]
            c = mdiag(r1[u]) - mdiag(r0[u])
            c += 2.0 * sum(dm[fr] for fr in fixed_rows)
            for t in range(R):
                if t == u:
                    continue
                m0 = dm[r0[t]] if r0[t] >= 0 else 0.0
                m1 = dm[r1[t]] if r1[t] >= 0 else 0.0
                V[u, t] = 2.0 * (m1 - m0)
                c += 2.0 * m0
            C[u] = c
        V *= coef
        C *= coef
        vh, vl = _split_f64(np.pad(V, ((0, 0), (0, rpad - R))))
        ew_v = np.stack([vh, vl], axis=1)  # [R, 2, rpad]
        ch, cl = _split_f64(C)
        ew_c = np.concatenate([ch, cl])[None, :]  # [1, 2R]

    if sublattice_probabilities is None:
        probs = np.full(len(active), 1.0 / len(active))
    else:
        probs = np.asarray(sublattice_probabilities, dtype=np.float64)
        if len(probs) != len(active):
            return None

    # VMEM budget (~16 MB/core on v5e): big tables above VMEM_TABLE_BUDGET
    # stream from HBM with double-buffered scratch (make_shared_proposal_
    # chain streamed mode), so only the PER-STEP working set is bounded:
    # two row buffers + the rank-compacted walker state + small tables.
    rpad_ = max(8, -(-R // 8) * 8)
    Lp = L  # final L axis (character rows when the q-ary path is on)
    working = (
        2 * 4 * Lp * rpad_  # bf16 gm row double buffers (x2 roles, swaps)
        + 4 * 4 * Lp * (2 * tmax + 1)  # gcat row double buffers
        + 4 * (mu.size if mu is not None else 0)
        + 4 * (ew_v.size if ew_v is not None else 0)
        + 4 * rpad_ * 1024  # occupancy block (worst-case block size)
    )
    if working > 10 * 2**20:
        return None

    return ChainTables(
        num_sites=n,
        num_ranks=R,
        rpad=rpad,
        n_local=L,
        tensor_max=tmax,
        binary=binary,
        ising=ising,
        qary=qary,
        segments=segments,
        gm=jnp.asarray(gm, dtype=jnp.bfloat16),
        gcat=jnp.asarray(gcat),
        ncod=jnp.asarray(ncod),
        rank_sites=jnp.asarray(rank_sites, dtype=jnp.int32),
        cum_probs=np.cumsum(probs),
        sub_offset=sub_offset,
        n_active=nact,
        has_mu=has_mu,
        mu_cols=mu_cols,
        mu=None if mu is None else jnp.asarray(mu),
        has_ewald=has_ewald,
        ew_v=None if ew_v is None else jnp.asarray(ew_v),
        ew_c=None if ew_c is None else jnp.asarray(ew_c),
    )


def rank_sequence(tables: ChainTables, key, shape):
    """Draw a state-independent proposal rank sequence of ``shape``.

    Sublattice choice follows the sublattice probabilities; the site is
    uniform within the sublattice — the same proposal distribution as the
    reference Flip usher (smol/moca/kernel/mcusher.py:151).
    """
    k_sl, k_site = jax.random.split(key)
    S = len(tables.cum_probs)
    cum = jnp.asarray(tables.cum_probs)
    u = jax.random.uniform(k_sl, shape)
    sl = jnp.sum((cum[None, ...] <= u[..., None]).astype(jnp.int32), axis=-1).astype(jnp.int32)
    sl = jnp.minimum(sl, S - 1)
    n_act = jnp.asarray(tables.n_active, dtype=jnp.int32)[sl]
    off = jnp.asarray(tables.sub_offset, dtype=jnp.int32)[sl]
    ai = jax.random.randint(k_site, shape, 0, n_act)
    return off + ai


def rank_pair_sequence(tables: ChainTables, key, shape):
    """Draw state-independent swap pairs (u, v), both within one sublattice.

    The sublattice is chosen by the sublattice probabilities; u and v are
    iid uniform within it.  Null pairs (u == v, or equal species at
    runtime) are identity proposals the kernel counts as rejected — the
    proposal distribution is state-independent and symmetric, so each
    chain remains an exact canonical Metropolis chain (the reference Swap
    usher, smol/moca/kernel/mcusher.py:209, conditions the partner on a
    different species instead; both are valid symmetric proposals).
    """
    k_sl, k_u, k_v = jax.random.split(key, 3)
    S = len(tables.cum_probs)
    cum = jnp.asarray(tables.cum_probs)
    r = jax.random.uniform(k_sl, shape)
    sl = jnp.minimum(
        jnp.sum((cum[None, ...] <= r[..., None]).astype(jnp.int32), axis=-1).astype(jnp.int32), S - 1
    )
    n_act = jnp.asarray(tables.n_active, dtype=jnp.int32)[sl]
    off = jnp.asarray(tables.sub_offset, dtype=jnp.int32)[sl]
    u = off + jax.random.randint(k_u, shape, 0, n_act)
    v = off + jax.random.randint(k_v, shape, 0, n_act)
    return u, v


@dataclass(frozen=True)
class TableMove:
    """Static description of chain-kernel table-flip (composition) moves.

    Row layout of the per-direction tables: rows ``0..n_dirs-1`` are the
    flip directions (``2*F``: each flip vector and its negation), row
    ``n_dirs`` is the canonical-swap move, row ``n_dirs + 1`` is the null
    move (used when a drawn proposal collides with itself).  Each
    direction expands into at most ``k_max`` site-recoloring slots.

    Sentinels: ``from_code == -1`` means no from-species check (inactive
    slot or swap), ``to_code == -2`` means "take the partner slot's
    current code" (swap), ``slot_sub == -1`` means "the sublattice drawn
    from the sublattice probabilities" (swap).

    STATISTICAL CONTRACT (differs from the reference TableFlip —
    smol/moca/kernel/mcusher.py:397-711 — but samples the SAME stationary
    distribution): each step draws a direction (flip directions
    uniformly — or by direction-symmetric weights — with probability
    ``1 - swap_weight``; a canonical swap otherwise) and one uniform
    site per slot from that slot's sublattice, all EXOGENOUSLY
    (state-independently).  A proposal is an identity (null, counted as
    a rejected attempt) unless every slot's site currently holds the
    direction's from-species and all slot sites are distinct.  Because
    the slot sites are uniform over fixed sublattices and every
    direction's negation is in the table with the same weight, the
    forward and reverse proposal probabilities of any realized move are
    EQUAL — the proposal is symmetric, so plain Metropolis acceptance is
    exact and the reference's gammaln a-priori factor
    (mcusher.py:656-711) is identically zero for this scheme.  The price
    is a higher null-proposal rate (species-mismatch rejections replace
    the reference's state-conditioned site draws).
    """

    n_dirs: int  # 2F flip directions (rows beyond are swap + null)
    k_max: int
    swap_weight: float
    from_code: np.ndarray  # [n_dirs + 2, k_max] int32 (host)
    to_code: np.ndarray  # [n_dirs + 2, k_max] int32 (host)
    slot_valid: np.ndarray  # [n_dirs + 2, k_max] int32 (host)
    slot_sub: np.ndarray  # [n_dirs + 2, k_max] int32 (host)
    dir_cum_probs: np.ndarray  # [n_dirs] f64 cumulative weights (host)


MAX_TABLE_SLOTS = 8


def build_table_move(tables: ChainTables, usher) -> TableMove | None:
    """Expand a TableFlip usher's flip table into chain-kernel TableMove.

    Returns None when the kernel cannot honor the usher exactly:
    direction-ASYMMETRIC flip weights (weight(+v) != weight(-v) breaks
    proposal symmetry), flip vectors touching inactive sublattices, flip
    vectors that change a sublattice's site count, or directions needing
    more than MAX_TABLE_SLOTS site recolorings.
    """
    flip_table = np.asarray(usher.flip_table, dtype=np.int64)  # [F, D]
    if flip_table.size == 0:
        return None
    weights = np.asarray(usher.flip_weights, dtype=np.float64)  # [2F]
    fw = weights.reshape(-1, 2)
    if not np.allclose(fw[:, 0], fw[:, 1]):
        return None  # asymmetric weights: proposal would not be symmetric
    if weights.sum() <= 0:
        return None

    # map each dim -> (active-sublattice index, species code); the active
    # sublattice order must match build_chain_tables' rank layout
    active_index = {}
    ai = 0
    for si, sl in enumerate(usher.sublattices):
        if sl.is_active:
            active_index[si] = ai
            ai += 1
    dim_sub = -np.ones(usher.d, dtype=np.int64)
    dim_code = np.zeros(usher.d, dtype=np.int64)
    for si, (sl, dim_ids) in enumerate(zip(usher.sublattices, usher.dim_ids)):
        for j, d in enumerate(dim_ids):
            dim_sub[d] = active_index.get(si, -1)
            dim_code[d] = j  # encoding is arange (checked by chain tables)

    dirs = np.concatenate([(u, -u) for u in flip_table], axis=0)  # [2F, D]
    n_dirs = len(dirs)
    slots = []  # per direction: list of (sub, from_code, to_code)
    for u in dirs:
        if np.any((u != 0) & (dim_sub < 0)):
            return None  # flips an inactive sublattice
        dir_slots = []
        for s in range(len(usher.sublattices)):
            asub = active_index.get(s, None)
            if asub is None:
                continue
            rem, add = [], []
            for d in np.nonzero(u)[0]:
                if dim_sub[d] != asub:
                    continue
                if u[d] < 0:
                    rem.extend([int(dim_code[d])] * int(-u[d]))
                else:
                    add.extend([int(dim_code[d])] * int(u[d]))
            if len(rem) != len(add):
                return None  # changes the sublattice's site count
            dir_slots.extend(
                (asub, fc, tc) for fc, tc in zip(rem, add)
            )
        if not dir_slots:
            return None
        slots.append(dir_slots)

    k_max = max(2, max(len(s) for s in slots))
    if k_max > MAX_TABLE_SLOTS:
        return None

    nd = n_dirs + 2  # + swap row + null row
    from_code = -np.ones((nd, k_max), dtype=np.int32)
    to_code = -np.ones((nd, k_max), dtype=np.int32)
    slot_valid = np.zeros((nd, k_max), dtype=np.int32)
    slot_sub = np.zeros((nd, k_max), dtype=np.int32)
    for di, dir_slots in enumerate(slots):
        for j, (sub, fc, tc) in enumerate(dir_slots):
            from_code[di, j] = fc
            to_code[di, j] = tc
            slot_valid[di, j] = 1
            slot_sub[di, j] = sub
    # swap row: slots 0, 1 exchange current codes within one sublattice
    from_code[n_dirs, :2] = -1
    to_code[n_dirs, :2] = -2
    slot_valid[n_dirs, :2] = 1
    slot_sub[n_dirs, :2] = -1

    return TableMove(
        n_dirs=n_dirs,
        k_max=k_max,
        swap_weight=float(usher.swap_weight),
        from_code=from_code,
        to_code=to_code,
        slot_valid=slot_valid,
        slot_sub=slot_sub,
        dir_cum_probs=np.cumsum(weights / weights.sum()),
    )


def table_sequences(tables: ChainTables, tm: TableMove, key, shape):
    """Draw exogenous (direction, slot-site) sequences for table moves.

    Returns ``(dirs, ranks)`` with shapes ``shape`` and ``shape + (k_max,)``.
    Directions follow the (direction-symmetric) flip weights with
    probability ``1 - swap_weight`` and are the swap row otherwise; each
    slot's site is uniform over its sublattice's active ranks.  Proposals
    whose valid slots collide (same rank twice — including swap u == v)
    are redirected to the null row.  All table lookups are one-hot
    compare-sums (XLA TPU lowers dynamic gathers near-scalar).
    """
    k_mode, k_dir, k_sub, k_site = jax.random.split(key, 4)
    nd_tot = tm.n_dirs + 2
    K = tm.k_max

    dcum = jnp.asarray(tm.dir_cum_probs)
    ud = jax.random.uniform(k_dir, shape)
    dirs = jnp.minimum(
        jnp.sum((dcum <= ud[..., None]).astype(jnp.int32), axis=-1),
        tm.n_dirs - 1,
    )
    if tm.swap_weight > 0:
        is_swap = jax.random.uniform(k_mode, shape) < tm.swap_weight
        dirs = jnp.where(is_swap, tm.n_dirs, dirs)

    # swap sublattice from the sublattice probabilities
    cum = jnp.asarray(tables.cum_probs)
    us = jax.random.uniform(k_sub, shape)
    swap_sub = jnp.minimum(
        jnp.sum((cum <= us[..., None]).astype(jnp.int32), axis=-1),
        len(tables.cum_probs) - 1,
    )

    # per-step slot tables (one-hot over the small direction axis)
    oh = (
        dirs[..., None] == jnp.arange(nd_tot, dtype=dirs.dtype)
    ).astype(jnp.int32)  # [*shape, nd_tot]
    sub_t = jnp.asarray(tm.slot_sub)  # [nd_tot, K]
    sv_t = jnp.asarray(tm.slot_valid)
    sub_j = jnp.einsum("...d,dk->...k", oh, sub_t)
    sv_j = jnp.einsum("...d,dk->...k", oh, sv_t)
    sub_j = jnp.where(sub_j < 0, swap_sub[..., None], sub_j)

    S = len(tables.cum_probs)
    oh_s = (
        sub_j[..., None] == jnp.arange(S, dtype=sub_j.dtype)
    ).astype(jnp.int32)  # [*shape, K, S]
    n_act = jnp.einsum(
        "...s,s->...", oh_s, jnp.asarray(tables.n_active, dtype=jnp.int32)
    )
    off = jnp.einsum(
        "...s,s->...", oh_s, jnp.asarray(tables.sub_offset, dtype=jnp.int32)
    )
    ranks = off + jax.random.randint(
        k_site, shape + (K,), 0, jnp.maximum(n_act, 1)
    )

    # collision -> null row (slot_valid all zero there)
    collide = jnp.zeros(shape, dtype=bool)
    for j in range(K):
        for k in range(j + 1, K):
            collide = collide | (
                (sv_j[..., j] > 0)
                & (sv_j[..., k] > 0)
                & (ranks[..., j] == ranks[..., k])
            )
    dirs = jnp.where(collide, tm.n_dirs + 1, dirs)
    return dirs.astype(jnp.int32), ranks.astype(jnp.int32)


@dataclass(frozen=True)
class WLChain:
    """Static parameters of chain-kernel Wang-Landau sampling.

    Replaces the thermal Metropolis acceptance with the entropy-difference
    rule S(bin_old) - S(bin_new) and adds the per-walker histogram /
    entropy / modification-factor bookkeeping of the reference kernel
    (smol/moca/kernel/wanglandau.py:186-266) INSIDE the chain kernel:
    entropy lives in VMEM as a double-float [bins, walkers] pair (so late
    -stage modification factors ~1e-8 still register against entropies of
    order 1e2), histograms/occurrences as int32 planes, and every bin
    lookup/update is an iota compare-select along the sublane axis.

    Semantics mirror the per-step XLA path (ops.mc._wl_step, itself
    parity-tested against exact degeneracies): enthalpies outside
    [min, min + num_levels * bin_size) are rejected; after every step the
    current bin's entropy += mod_factor and histogram/occurrences += 1
    (every ``update_period``-th valid step); flatness is checked every
    ``check_period``-th CHAIN step and at chunk boundaries (a scalar
    trigger, so the plane reductions stay off the hot path — the
    reference's every-check_period-th-in-window-step cadence is equally
    arbitrary), and a flat histogram resets to zero and divides the
    modification factor by ``mod_divisor``.  Per-walker lane carries
    (current bin, its entropy as a df pair) keep the per-step plane work
    to one bin select, one masked row write and two histogram adds.
    Per-bin CUMULATIVE MEAN FEATURES are the one piece
    of reference bookkeeping NOT tracked per step (a [bins, features]
    plane per walker would not fit VMEM): the WangLandau kernel updates
    them once per thinning window from exact boundary features instead —
    the same estimator on the thinned subchain.
    """

    min_enthalpy: float
    bin_size: float
    num_levels: int
    flatness: float
    check_period: int
    update_period: int
    mod_divisor: float


def make_shared_proposal_chain(
    tables: ChainTables,
    n_steps: int,
    block_size: int = 1024,
    interpret: bool = False,
    chunk_steps: int | None = None,
    streamed: bool | None = None,
    move: str = "flip",
    table_move: TableMove | None = None,
    wl: WLChain | None = None,
    proposal_mode: str = "random",
):
    """Build ``fn(state, key) -> state`` running n_steps shared-site moves.

    ``state`` uses plain occupancies: ``occupancy`` [W, N] int32,
    ``enthalpy`` [W] f64, ``beta`` [W] f64, ``naccept`` [W] int32,
    ``accepted`` [W] bool.  W must be a multiple of ``block_size`` (or
    equal to it).  See the module docstring for the statistical contract.

    ``move`` selects the proposal: ``"flip"`` (single-site semigrand),
    ``"swap"`` (two-site canonical exchange; walkers in a block share the
    (u, v) pair sequence, equal-species pairs are identity proposals
    counted as rejected, and the joint delta is computed exactly as
    dE(u) + dE(v | u applied)), or ``"table"`` (constrained composition
    moves from a ``TableMove`` — pass ``table_move``; each step recolors
    up to ``k_max`` slot sites sequentially, mirroring the reference's
    multi-site step application order, smol/moca/processor/expansion.py:
    215-230; see the TableMove docstring for the exact-but-different
    symmetric proposal contract).

    ``wl`` switches the acceptance rule and bookkeeping to Wang-Landau
    flat-histogram sampling (flip/swap moves only): per-walker entropy
    (df pair), histogram, occurrences, modification factor and valid-step
    counter live in VMEM and update every step; the state dict must carry
    ``entropy`` [W, B] f64, ``histogram``/``occurrences`` [W, B] int32,
    ``mod_factor`` [W] f64 and ``wl_counter`` [W] int32 (see
    :class:`WLChain` for the exact semantics).  ``beta`` is ignored.

    ``proposal_mode="sweep"`` (flip moves only) replaces the shared
    RANDOM site sequence with a DETERMINISTIC cyclic schedule: one fixed
    permutation of the active ranks (seeded by a constant, independent of
    the run key), repeated.  The schedule carries zero randomness, and
    all remaining draws (acceptance uniforms, proposed codes) are
    per-walker, so the walkers are FULLY INDEPENDENT, identically
    distributed chains — across-walker averages lose no effective
    samples.  Each site update is a pi-invariant Metropolis kernel and
    the fixed-order composition visits every active site once per R
    steps (systematic-scan Metropolis), so the stationary distribution
    is exactly the target; note the schedule proposes each ACTIVE SITE
    uniformly (once per sweep), whereas ``"random"`` picks a sublattice
    by ``sublattice_probabilities`` first — the ``sublattice
    probabilities`` knob is inert in sweep mode.

    ``streamed`` keeps the big per-rank tables (gm, gcat) in HBM and
    double-buffers each step's rows into VMEM scratch with async DMA —
    the known-in-advance site sequence makes the prefetch perfect.  Auto
    (None): stream when the tables exceed the VMEM budget.  This removes
    the table-size ceiling on supercell size (cost: one ~row-sized DMA
    per step, fully overlapped with compute).
    """
    if move not in ("flip", "swap", "table"):
        raise ValueError(f"unknown move type: {move!r}")
    if proposal_mode not in ("random", "sweep"):
        raise ValueError(f"unknown proposal mode: {proposal_mode!r}")
    sweep = proposal_mode == "sweep"
    if sweep and move != "flip":
        raise ValueError('proposal_mode="sweep" supports move="flip" only')
    swap = move == "swap"
    table = move == "table"
    if table and table_move is None:
        raise ValueError('move="table" requires table_move')
    if wl is not None and table:
        raise ValueError("the Wang-Landau chain supports flip/swap moves only")
    is_wl = wl is not None
    if is_wl:
        NB = wl.num_levels
        BP = max(8, -(-NB // 8) * 8)  # sublane-padded bin axis
        wl_minh, wl_minl = _split_f64(wl.min_enthalpy)
        wl_bs = np.float32(wl.bin_size)
        wl_span = np.float32(NB * wl.bin_size)
    KM = table_move.k_max if table else 0
    n_roles = KM if table else (2 if swap else 1)
    t = tables
    R, RP, L, TM = t.num_ranks, t.rpad, t.n_local, t.tensor_max
    C = t.mu_cols
    binary = t.binary
    has_mu, has_ewald = t.has_mu, t.has_ewald
    segments = t.segments
    table_bytes = 2 * t.gm.size + 4 * t.gcat.size
    if streamed is None:
        streamed = table_bytes > VMEM_TABLE_BUDGET

    # streamed DMA slices must be lane-aligned: pad the table lane dims to
    # multiples of 128 (the pad columns are zeros / never selected)
    gm_arr, gcat_arr, ewv_pad_cols = t.gm, t.gcat, 0
    GW = 2 * TM + 1
    if streamed:
        RP_new = -(-RP // 128) * 128
        GW = -(-(2 * TM + 1) // 128) * 128
        gm_arr = jnp.pad(t.gm, ((0, 0), (0, 0), (0, RP_new - RP)))
        gcat_arr = jnp.pad(
            t.gcat, ((0, 0), (0, 0), (0, GW - (2 * TM + 1)))
        )
        ewv_pad_cols = RP_new - RP
        RP = RP_new

    def kernel(seed_ref, nvalid_ref, seq_ref, vseq_ref, tf_ref, ncod_ref,
               ewc_ref, *rest):
        if is_wl:
            (occ_ref, beta_ref, ehi_ref, elo_ref, nacc_ref,
             enth_ref, entl_ref, hist_ref, occr_ref, modf_ref, cnt_ref,
             gm_ref, gcat_ref, mu_ref, ewv_ref,
             occ_out, ehi_out, elo_out, nacc_out,
             enth_out, entl_out, hist_out, occr_out, modf_out, cnt_out,
             *scratch) = rest
        elif swap:
            # swap chains also count non-null proposals (species differ):
            # the exogenous pair draw proposes identity moves, and the
            # reference Swap usher's rate is in null-free moves
            (occ_ref, beta_ref, ehi_ref, elo_ref, nacc_ref, nmove_ref,
             gm_ref, gcat_ref, mu_ref, ewv_ref,
             occ_out, ehi_out, elo_out, nacc_out, nmove_out,
             *scratch) = rest
        else:
            (occ_ref, beta_ref, ehi_ref, elo_ref, nacc_ref,
             gm_ref, gcat_ref, mu_ref, ewv_ref,
             occ_out, ehi_out, elo_out, nacc_out, *scratch) = rest
        wb = occ_ref.shape[1]
        block = pl.program_id(0)
        block_seed = seed_ref[0] + block * jnp.int32(7919)
        if not interpret:
            pltpu.prng_seed(block_seed)

        iota_r = jax.lax.broadcasted_iota(jnp.int32, (RP, wb), 0)
        beta = beta_ref[:]  # [1, wb] f32

        # rank of each streamed role at step i: u (flip), (u, v) (swap),
        # or the k_max slot sites (table)
        if table:
            role_rank = [
                (lambda i, j=j: vseq_ref[block, i * KM + j])
                for j in range(KM)
            ]
        elif swap:
            role_rank = [
                lambda i: seq_ref[block, i],
                lambda i: vseq_ref[block, i],
            ]
        else:
            role_rank = [lambda i: seq_ref[block, i]]

        if streamed:
            # scratch: one (gm, gcat) double buffer per role, each with
            # its own DMA semaphore pair
            bufs = [scratch[2 * k: 2 * k + 2] for k in range(n_roles)]
            sems = [
                scratch[2 * n_roles + 2 * k: 2 * n_roles + 2 * k + 2]
                for k in range(n_roles)
            ]
            chunk_len = seq_ref.shape[1]

            def issue(i, slot):
                for rank_fn, (gbuf, cbuf), (gsem, csem) in zip(
                    role_rank, bufs, sems
                ):
                    r_i = rank_fn(i)
                    pltpu.make_async_copy(
                        gm_ref.at[r_i], gbuf.at[slot], gsem.at[slot]
                    ).start()
                    pltpu.make_async_copy(
                        gcat_ref.at[r_i], cbuf.at[slot], csem.at[slot]
                    ).start()

            def wait(i, slot):
                rows = []
                for rank_fn, (gbuf, cbuf), (gsem, csem) in zip(
                    role_rank, bufs, sems
                ):
                    r_i = rank_fn(i)
                    pltpu.make_async_copy(
                        gm_ref.at[r_i], gbuf.at[slot], gsem.at[slot]
                    ).wait()
                    pltpu.make_async_copy(
                        gcat_ref.at[r_i], cbuf.at[slot], csem.at[slot]
                    ).wait()
                    rows.append((gbuf[slot], cbuf[slot]))
                return rows

            issue(jnp.int32(0), jnp.int32(0))

        def select_code(occ, r):
            """Current code at rank r (scalar) for every walker: [1, wb]."""
            return jnp.sum(
                jnp.where(iota_r == r, occ, 0.0), axis=0, keepdims=True
            )

        if t.ising:
            site_delta = make_site_delta_ising(TM, wb)
        elif t.qary:
            site_delta = make_site_delta_qary(t.qary, TM, wb)
        else:
            site_delta = make_site_delta(segments, TM, wb)
        if swap and not table:
            if t.ising:
                swap_pair_delta = make_swap_pair_delta_ising(TM, wb, L, RP)
            elif t.qary:
                swap_pair_delta = make_swap_pair_delta_qary(
                    t.qary, TM, wb, L, RP
                )
            else:
                swap_pair_delta = make_swap_pair_delta(segments, TM, wb, L, RP)

        def ewald_delta(r, sign, occ_x):
            """sign * (C_r + V_r . occ_x) as a df pair [1, wb]."""
            ewv_r = ewv_ref[pl.ds(r, 1)][0]  # [2, RP] f32
            vh = jax.lax.dot(ewv_r[0:1, :], occ_x, precision=_P)
            vl = jax.lax.dot(ewv_r[1:2, :], occ_x, precision=_P)
            ch = ewc_ref[0, r]
            cl = ewc_ref[0, R + r]
            eh, el = _df_add(vh, vl, ch, cl)
            return sign * eh, sign * el

        def mu_work(r, a, b):
            """df chemical work mu[r, b] - mu[r, a]: [1, wb] pair."""
            mu_u = mu_ref[pl.ds(r, 1)]  # [1, 2C] f32
            zf = jnp.zeros((1, wb), jnp.float32)
            mah = zf
            mal = zf
            mbh = zf
            mbl = zf
            for c in range(C):
                cf = jnp.float32(c)
                mh_c = jax.lax.broadcast_in_dim(
                    mu_u[:, c: c + 1], (1, wb), (0, 1)
                )
                ml_c = jax.lax.broadcast_in_dim(
                    mu_u[:, C + c: C + c + 1], (1, wb), (0, 1)
                )
                mah = jnp.where(a == cf, mh_c, mah)
                mal = jnp.where(a == cf, ml_c, mal)
                mbh = jnp.where(b == cf, mh_c, mbh)
                mbl = jnp.where(b == cf, ml_c, mbl)
            return _df_add(mbh, mbl, -mah, -mal)

        if is_wl:
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (BP, wb), 0)

            def wl_bin(eh, el):
                """(window coord w = E - min in f32, clipped bin) pair."""
                th, tl = _df_add(eh, el, -wl_minh, -wl_minl)
                w = th + tl  # [1, wb] f32
                b = jnp.clip(
                    jnp.floor(w / wl_bs), 0.0, jnp.float32(NB - 1)
                ).astype(jnp.int32)
                return w, b

            def bin_select(plane, b):
                """plane[b] per walker as [1, wb] (iota compare-sum)."""
                return jnp.sum(
                    jnp.where(iota_b == b, plane, 0.0), axis=0, keepdims=True
                )

        def table_step(i, carry):
            """One table-flip step: up to KM sequential slot recolorings.

            Direction row + slot sites come from SMEM (exogenous, shared
            within the block); validity = every checked slot holds its
            from-species (and the swap row's two species differ).  The
            proposal is symmetric (TableMove docstring), so acceptance is
            plain Metropolis on -beta * dH with no a-priori factor.
            """
            occ, ehi, elo, nacc = carry
            d = seq_ref[block, i]  # direction row (scalar)
            rs = [vseq_ref[block, i * KM + j] for j in range(KM)]
            if streamed:
                slot = jax.lax.rem(i, jnp.int32(2))
                rows = wait(i, slot)
                nxt = jnp.minimum(i + 1, jnp.int32(chunk_len - 1))
                issue(nxt, 1 - slot)
            else:
                rows = [
                    (gm_ref[pl.ds(r, 1)][0], gcat_ref[pl.ds(r, 1)][0])
                    for r in rs
                ]
            fcs = [tf_ref[0, d * KM + j] for j in range(KM)]
            tcs = [tf_ref[1, d * KM + j] for j in range(KM)]
            svs = [tf_ref[2, d * KM + j] for j in range(KM)]
            a0 = [select_code(occ, r) for r in rs]  # [1, wb] each

            # ---- validity ----
            valid = svs[0] > 0  # null row has no valid slots
            valid = jnp.broadcast_to(valid, (1, wb))
            for j in range(KM):
                need = jnp.logical_and(svs[j] > 0, fcs[j] >= 0)
                ok = a0[j] == fcs[j].astype(jnp.float32)
                valid = jnp.logical_and(
                    valid, jnp.logical_or(jnp.logical_not(need), ok)
                )
            is_swap_d = tcs[0] == jnp.int32(-2)
            valid = jnp.logical_and(
                valid,
                jnp.logical_or(jnp.logical_not(is_swap_d), a0[0] != a0[1]),
            )

            # ---- sequential slot application (evolving occupancy) ----
            occ_cur = occ
            dh = jnp.zeros((1, wb), jnp.float32)
            dl = dh
            for j in range(KM):
                partner = a0[j ^ 1] if KM >= 2 else a0[j]
                b_j = jnp.where(
                    tcs[j] >= 0, tcs[j].astype(jnp.float32), partner
                )
                b_j = jnp.where(svs[j] > 0, b_j, a0[j])  # inactive: no-op
                gm_j, gcat_j = rows[j]
                djh, djl = site_delta(
                    gm_j, gcat_j, occ_cur.astype(jnp.bfloat16), a0[j], b_j
                )
                dh, dl = _df_add(dh, dl, djh, djl)
                if has_ewald:
                    sign = b_j - a0[j]
                    ejh, ejl = ewald_delta(rs[j], sign, occ_cur)
                    dh, dl = _df_add(dh, dl, ejh, ejl)
                if has_mu:
                    dwh, dwl = mu_work(rs[j], a0[j], b_j)
                    dh, dl = _df_add(dh, dl, -dwh, -dwl)
                occ_cur = jnp.where(
                    iota_r == rs[j],
                    jnp.broadcast_to(b_j, (RP, wb)),
                    occ_cur,
                )

            # ---- accept + state update ----
            if interpret:
                uu = _hash_uniform01(block_seed, i, 1, (1, wb))
            else:
                uu = _uniform01((1, wb))
            expo = -beta * dh
            accept = jnp.logical_or(expo >= 0, expo > jnp.log(uu))
            accept = jnp.logical_and(accept, valid)
            occ = jnp.where(jnp.broadcast_to(accept, (RP, wb)), occ_cur, occ)
            zf = jnp.zeros_like(dh)
            ehi, elo = _df_add(
                ehi, elo, jnp.where(accept, dh, zf), jnp.where(accept, dl, zf)
            )
            nacc = nacc + accept.astype(jnp.int32)
            return occ, ehi, elo, nacc

        def step(i, carry):
            if table:
                return table_step(i, carry)
            if is_wl:
                (occ, ehi, elo, nacc,
                 enth, entl, hist, occr, modf, cnt,
                 w_cur, b_cur, sch, scl) = carry
            elif swap:
                occ, ehi, elo, nacc, nmove = carry
            else:
                occ, ehi, elo, nacc = carry  # occ [RP, wb] f32 codes
            u = seq_ref[block, i]  # scalar rank

            # ---- per-rank static rows ----
            if streamed:
                slot = jax.lax.rem(i, jnp.int32(2))
                rows = wait(i, slot)
                # prefetch the next step's rows into the other slot
                nxt = jnp.minimum(i + 1, jnp.int32(chunk_len - 1))
                issue(nxt, 1 - slot)
                gm_u, gcat_u = rows[0]
                if swap:
                    gm_v, gcat_v = rows[1]
            else:
                gm_u = gm_ref[pl.ds(u, 1)][0]  # [L, RP] f32
                gcat_u = gcat_ref[pl.ds(u, 1)][0]  # [L, 2*TM+1] f32

            # ---- proposal + joint energy delta ----
            a = select_code(occ, u)  # [1, wb] f32
            occ_bf = occ.astype(jnp.bfloat16)
            if swap:
                v = vseq_ref[block, i]
                if not streamed:
                    gm_v = gm_ref[pl.ds(v, 1)][0]
                    gcat_v = gcat_ref[pl.ds(v, 1)][0]
                av = select_code(occ, v)
                b = av  # u takes v's species, v takes u's
                is_move = a != av  # [1, wb] bool; null pairs are identity
                # both sites' deltas in one stacked gather matmul; v's
                # post-u-flip occupancy enters as a rank-1 correction
                dh, dl = swap_pair_delta(
                    gm_u, gcat_u, gm_v, gcat_v, occ_bf, a, b, u
                )
                if has_ewald:
                    u_rows = jnp.broadcast_to(iota_r == u, (RP, wb))
                    occ1 = jnp.where(
                        u_rows, jnp.broadcast_to(b, (RP, wb)), occ
                    )
                    sign = b - a  # [1, wb]; 0 for null pairs
                    e1h, e1l = ewald_delta(u, sign, occ)
                    e2h, e2l = ewald_delta(v, -sign, occ1)
                    dh, dl = _df_add(dh, dl, *_df_add(e1h, e1l, e2h, e2l))
            else:
                if binary:
                    b = 1.0 - a
                else:
                    nc = jnp.maximum(ncod_ref[0, u] - 1, 1)
                    if interpret:
                        j = _hash_randint(block_seed, i, 0, (1, wb), nc)
                    else:
                        j = jax.lax.rem(_pos_bits((1, wb)), nc)
                    jf = j.astype(jnp.float32)
                    b = jf + (jf >= a).astype(jnp.float32)
                dh, dl = site_delta(gm_u, gcat_u, occ_bf, a, b)
                if has_ewald:
                    sign = b - a  # [1, wb] in {-1, +1}
                    eh, el = ewald_delta(u, sign, occ)
                    dh, dl = _df_add(dh, dl, eh, el)

            # ---- chemical work ----
            if has_mu and not swap:
                dwh, dwl = mu_work(u, a, b)
                dh, dl = _df_add(dh, dl, -dwh, -dwl)

            # ---- accept + state update ----
            if interpret:
                uu = _hash_uniform01(block_seed, i, 1, (1, wb))
            else:
                uu = _uniform01((1, wb))
            if is_wl:
                # Wang-Landau rule: reject outside the window, otherwise
                # accept on S(bin_cur) - S(bin_new) (reference
                # wanglandau.py:186-202).  The current bin's entropy
                # (sch, scl) rides in the loop carry, so only ONE plane
                # select (the proposed bin) runs per step.
                neh, nel = _df_add(ehi, elo, dh, dl)
                w_new, b_new = wl_bin(neh, nel)
                in_win = jnp.logical_and(w_new >= 0, w_new < wl_span)
                snh = bin_select(enth, b_new)
                snl = bin_select(entl, b_new)
                xh, xl = _df_add(sch, scl, -snh, -snl)
                expo = xh + xl
                accept = jnp.logical_or(expo >= 0, expo > jnp.log(uu))
                accept = jnp.logical_and(accept, in_win)
            else:
                expo = -beta * dh
                accept = jnp.logical_or(expo >= 0, expo > jnp.log(uu))
            if swap:
                accept = jnp.logical_and(accept, is_move)
            acc_r = jnp.broadcast_to(accept, (RP, wb))
            upd = jnp.logical_and(iota_r == u, acc_r)
            occ = jnp.where(upd, jnp.broadcast_to(b, (RP, wb)), occ)
            if swap:
                upd_v = jnp.logical_and(iota_r == v, acc_r)
                occ = jnp.where(upd_v, jnp.broadcast_to(a, (RP, wb)), occ)
            zf = jnp.zeros_like(dh)
            ehi, elo = _df_add(
                ehi, elo, jnp.where(accept, dh, zf), jnp.where(accept, dl, zf)
            )
            nacc = nacc + accept.astype(jnp.int32)
            if swap and not is_wl:
                nmove = nmove + is_move.astype(jnp.int32)
            if is_wl:
                # post-step bookkeeping at the (possibly updated) current
                # state, mirroring ops.mc._wl_step / reference
                # wanglandau.py:222-266.  Lane-width carries (current
                # window coord / bin / bin-entropy) keep the plane work
                # to ONE masked row write + two histogram adds.
                w_cur = jnp.where(accept, w_new, w_cur)
                b_cur = jnp.where(accept, b_new, b_cur)
                sch = jnp.where(accept, snh, sch)
                scl = jnp.where(accept, snl, scl)
                valid = jnp.logical_and(w_cur >= 0, w_cur < wl_span)
                cnt = cnt + valid.astype(jnp.int32)
                do_upd = jnp.logical_and(
                    valid,
                    jax.lax.rem(cnt, jnp.int32(wl.update_period)) == 0,
                )
                # exact df bump of the current bin's entropy on the lane
                # carry, then broadcast write-back of the single changed
                # row (no plane-wide double-float arithmetic)
                nsh, nsl = _df_add(
                    sch, scl, jnp.where(do_upd, modf, 0.0),
                    jnp.zeros_like(modf),
                )
                ohb = jnp.logical_and(iota_b == b_cur, do_upd)  # [BP, wb]
                enth = jnp.where(ohb, jnp.broadcast_to(nsh, (BP, wb)), enth)
                entl = jnp.where(ohb, jnp.broadcast_to(nsl, (BP, wb)), entl)
                sch = jnp.where(do_upd, nsh, sch)
                scl = jnp.where(do_upd, nsl, scl)
                one = ohb.astype(jnp.int32)
                hist = hist + one
                occr = occr + one

                # flatness check every check_period-th CHAIN step (scalar
                # trigger -> the plane reductions run outside the hot
                # path; the reference checks every check_period-th
                # in-window step — an equally arbitrary cadence) and at
                # chunk end so check_period > chunk still checks
                trigger = jnp.logical_or(
                    jax.lax.rem(i + 1, jnp.int32(wl.check_period)) == 0,
                    i + 1 >= nvalid_ref[0],
                )

                def do_flat(args):
                    hist, modf = args
                    visited = enth > 0
                    nvis = jnp.sum(
                        visited.astype(jnp.float32), axis=0, keepdims=True
                    )
                    hf = hist.astype(jnp.float32)
                    hsum = jnp.sum(
                        jnp.where(visited, hf, 0.0), axis=0, keepdims=True
                    )
                    hmean = hsum / jnp.maximum(nvis, 1.0)
                    hmin = jnp.min(
                        jnp.where(visited, hf, jnp.float32(np.inf)),
                        axis=0, keepdims=True,
                    )
                    flat = jnp.logical_and(
                        nvis >= 2.0,
                        hmin > jnp.float32(wl.flatness) * hmean,
                    )
                    hist = jnp.where(
                        jnp.broadcast_to(flat, (BP, wb)), 0, hist
                    )
                    modf = jnp.where(
                        flat, modf / jnp.float32(wl.mod_divisor), modf
                    )
                    return hist, modf

                hist, modf = jax.lax.cond(
                    trigger, do_flat, lambda args: args, (hist, modf)
                )
                return (occ, ehi, elo, nacc,
                        enth, entl, hist, occr, modf, cnt,
                        w_cur, b_cur, sch, scl)
            if swap:
                return occ, ehi, elo, nacc, nmove
            return occ, ehi, elo, nacc

        carry = (occ_ref[:], ehi_ref[:], elo_ref[:], nacc_ref[:])
        if is_wl:
            w0, b0 = wl_bin(ehi_ref[:], elo_ref[:])
            carry = carry + (
                enth_ref[:], entl_ref[:], hist_ref[:], occr_ref[:],
                modf_ref[:], cnt_ref[:],
                w0, b0,
                bin_select(enth_ref[:], b0), bin_select(entl_ref[:], b0),
            )
        elif swap:
            carry = carry + (nmove_ref[:],)
        carry = jax.lax.fori_loop(
            jnp.int32(0), nvalid_ref[0], step, carry
        )
        occ, ehi, elo, nacc = carry[:4]
        if streamed:
            # drain the final prefetch (issued at step nvalid-1 into slot
            # nvalid % 2, never consumed): every DMA must complete before
            # the kernel exits
            nv = nvalid_ref[0]
            last_slot = jax.lax.rem(nv, jnp.int32(2))
            wait(jnp.minimum(nv, jnp.int32(chunk_len - 1)), last_slot)
        occ_out[:] = occ
        ehi_out[:] = ehi
        elo_out[:] = elo
        nacc_out[:] = nacc
        if is_wl:
            enth_out[:] = carry[4]
            entl_out[:] = carry[5]
            hist_out[:] = carry[6]
            occr_out[:] = carry[7]
            modf_out[:] = carry[8]
            cnt_out[:] = carry[9]
        elif swap:
            nmove_out[:] = carry[4]

    rank_sites = t.rank_sites  # [R] int32
    ncod_dev = t.ncod
    if table:
        tf_dev = jnp.asarray(
            np.stack(
                [
                    table_move.from_code.reshape(-1),
                    table_move.to_code.reshape(-1),
                    table_move.slot_valid.reshape(-1),
                ]
            ).astype(np.int32)
        )  # [3, (n_dirs + 2) * k_max], row-major over (direction, slot)
    else:
        tf_dev = jnp.zeros((3, 1), jnp.int32)
    mu_dev = t.mu if has_mu else jnp.zeros((R, 2), jnp.float32)
    ewv_dev = t.ew_v if has_ewald else jnp.zeros((R, 2, t.rpad), jnp.float32)
    if ewv_pad_cols:
        ewv_dev = jnp.pad(ewv_dev, ((0, 0), (0, 0), (0, ewv_pad_cols)))
    ewc_dev = t.ew_c if has_ewald else jnp.zeros((1, 2 * R), jnp.float32)

    if is_wl:
        # the six [BP, wb] WL planes are per-block VMEM residents (in +
        # out + loop carry): cap the walker block so they stay ~<4 MB
        wl_cap = max(128, (4 * 2**20) // (40 * BP) // 128 * 128)
        block_size = min(block_size, wl_cap)

    def fn(state, key):
        occu = state["occupancy"]
        W = occu.shape[0]
        # pad the walker axis to a lane-aligned multiple of the block size
        wb = min(block_size, -(-W // 128) * 128)
        Wp = -(-W // wb) * wb
        pad = Wp - W
        grid = Wp // wb

        # chunk the step axis so the SMEM-resident site sequence stays small
        default_chunk = MAX_CHUNK_STEPS // KM if table else MAX_CHUNK_STEPS
        chunk = min(n_steps, chunk_steps or default_chunk)
        n_chunks = -(-n_steps // chunk)

        k_seed, k_seq = jax.random.split(jax.random.fold_in(key, 13))
        seed0 = jax.random.randint(
            k_seed, (), 0, np.int32(2**30 - 1), dtype=jnp.int32
        )
        if table:
            seqs, ranks = table_sequences(
                tables, table_move, k_seq, (n_chunks, grid, chunk)
            )
            vseqs = ranks.reshape(n_chunks, grid, chunk * KM)
        elif swap:
            seqs, vseqs = rank_pair_sequence(
                tables, k_seq, (n_chunks, grid, chunk)
            )
            seqs = seqs.astype(jnp.int32)
            vseqs = vseqs.astype(jnp.int32)
        elif sweep:
            # deterministic cyclic schedule: one constant-seeded
            # permutation of the active ranks, repeated across chunks
            # (all blocks share it — sharing a CONSTANT schedule induces
            # no cross-walker randomness, see the docstring contract)
            perm = np.random.default_rng(0x5EED).permutation(R)
            sched = np.resize(perm, n_chunks * chunk).astype(np.int32)
            seqs = jnp.asarray(
                np.broadcast_to(
                    sched.reshape(n_chunks, 1, chunk), (n_chunks, grid, chunk)
                )
            )
            vseqs = jnp.zeros((n_chunks, 1, 1), jnp.int32)
        else:
            seqs = rank_sequence(
                tables, k_seq, (n_chunks, grid, chunk)
            ).astype(jnp.int32)
            # unread dummy (the kernel is specialized on move)
            vseqs = jnp.zeros((n_chunks, 1, 1), jnp.int32)
        nvalid = jnp.minimum(
            chunk, n_steps - jnp.arange(n_chunks) * chunk
        ).astype(jnp.int32)
        seeds = seed0 + jnp.arange(n_chunks, dtype=jnp.int32) * jnp.int32(999983)

        occ_rank = occu[:, rank_sites].astype(jnp.float32)  # [W, R]
        occ_t = jnp.pad(occ_rank, ((0, pad), (0, RP - R))).T  # [RP, Wp]
        ehi = jnp.pad(state["enthalpy"], (0, pad)).astype(jnp.float32)
        elo = (
            jnp.pad(state["enthalpy"], (0, pad)) - ehi.astype(jnp.float64)
        ).astype(jnp.float32)
        if "beta" in state:
            beta32 = jnp.pad(state["beta"], (0, pad)).astype(jnp.float32)
        else:
            beta32 = jnp.zeros(Wp, jnp.float32)  # WL: acceptance is athermal

        out_shapes = (
            jax.ShapeDtypeStruct((RP, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, Wp), jnp.int32),
        )
        if swap and not is_wl:
            out_shapes = out_shapes + (
                jax.ShapeDtypeStruct((1, Wp), jnp.int32),  # nmove
            )
        if is_wl:
            ent_t = jnp.pad(
                state["entropy"], ((0, pad), (0, BP - NB))
            ).T  # [BP, Wp] f64
            enth0 = ent_t.astype(jnp.float32)
            entl0 = (ent_t - enth0.astype(jnp.float64)).astype(jnp.float32)
            hist0 = jnp.pad(
                state["histogram"].astype(jnp.int32), ((0, pad), (0, BP - NB))
            ).T
            occr0 = jnp.pad(
                state["occurrences"].astype(jnp.int32),
                ((0, pad), (0, BP - NB)),
            ).T
            modf0 = jnp.pad(state["mod_factor"], (0, pad)).astype(
                jnp.float32
            )[None, :]
            cnt0 = jnp.pad(state["wl_counter"].astype(jnp.int32), (0, pad))[
                None, :
            ]
            out_shapes = out_shapes + (
                jax.ShapeDtypeStruct((BP, Wp), jnp.float32),
                jax.ShapeDtypeStruct((BP, Wp), jnp.float32),
                jax.ShapeDtypeStruct((BP, Wp), jnp.int32),
                jax.ShapeDtypeStruct((BP, Wp), jnp.int32),
                jax.ShapeDtypeStruct((1, Wp), jnp.float32),
                jax.ShapeDtypeStruct((1, Wp), jnp.int32),
            )
        blk = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, wb), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        full = lambda arr: pl.BlockSpec(  # noqa: E731
            arr.shape, lambda i: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM,
        )
        if streamed:
            table_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch_shapes = [
                shp
                for _ in range(n_roles)
                for shp in (
                    pltpu.VMEM((2, L, RP), jnp.bfloat16),
                    pltpu.VMEM((2, L, GW), jnp.float32),
                )
            ] + [
                pltpu.SemaphoreType.DMA((2,))
                for _ in range(2 * n_roles)
            ]
        else:
            table_spec = None
            scratch_shapes = []
        with jax.enable_x64(False):

            wl_specs = (
                [blk(BP), blk(BP), blk(BP), blk(BP), blk(1), blk(1)]
                if is_wl else ([blk(1)] if swap else [])
            )  # WL state planes, or the swap non-null move counter

            def chunk_body(carry, xs):
                occ_c, ehi_c, elo_c, nacc_c = carry[:4]
                seed_c, nvalid_c, seq_c, vseq_c = xs
                outs = pl.pallas_call(
                    kernel,
                    grid=(grid,),
                    out_shape=out_shapes,
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
                        pl.BlockSpec(memory_space=pltpu.SMEM),  # nvalid
                        pl.BlockSpec(memory_space=pltpu.SMEM),  # sequences
                        pl.BlockSpec(memory_space=pltpu.SMEM),  # swap partners
                        pl.BlockSpec(memory_space=pltpu.SMEM),  # tableflip spec
                        pl.BlockSpec(memory_space=pltpu.SMEM),  # ncod
                        pl.BlockSpec(memory_space=pltpu.SMEM),  # ewald consts
                        blk(RP),  # occ
                        blk(1),  # beta
                        blk(1),  # ehi
                        blk(1),  # elo
                        blk(1),  # nacc
                        *wl_specs,  # entropy hi/lo, hist, occur, mod, cnt
                        table_spec or full(gm_arr),
                        table_spec or full(gcat_arr),
                        full(mu_dev),
                        full(ewv_dev),
                    ],
                    out_specs=(blk(RP), blk(1), blk(1), blk(1), *wl_specs),
                    scratch_shapes=scratch_shapes,
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                    ),
                    interpret=interpret,
                )(
                    seed_c[None],
                    nvalid_c[None],
                    seq_c,
                    vseq_c,
                    tf_dev,
                    ncod_dev,
                    ewc_dev,
                    occ_c,
                    beta32[None, :],
                    ehi_c,
                    elo_c,
                    nacc_c,
                    *carry[4:],  # WL state planes (empty otherwise)
                    gm_arr,
                    gcat_arr,
                    mu_dev,
                    ewv_dev,
                )
                return outs, None

            carry0 = (
                occ_t,
                ehi[None, :],
                elo[None, :],
                jnp.zeros((1, Wp), jnp.int32),
            )
            if is_wl:
                carry0 = carry0 + (enth0, entl0, hist0, occr0, modf0, cnt0)
            elif swap:
                carry0 = carry0 + (jnp.zeros((1, Wp), jnp.int32),)
            if n_chunks == 1:
                outs_n, _ = chunk_body(
                    carry0, (seeds[0], nvalid[0], seqs[0], vseqs[0])
                )
            else:
                outs_n, _ = jax.lax.scan(
                    chunk_body, carry0, (seeds, nvalid, seqs, vseqs)
                )
            occ_n, ehi_n, elo_n, nacc_n = outs_n[:4]

        out = dict(state)
        new_codes = occ_n.T[:W, :R].astype(jnp.int32)  # [W, R]
        out["occupancy"] = occu.at[:, rank_sites].set(new_codes)
        out["enthalpy"] = ehi_n[0, :W].astype(jnp.float64) + elo_n[0, :W].astype(
            jnp.float64
        )
        nacc_w = nacc_n[0, :W]
        out["naccept"] = state["naccept"] + nacc_w
        out["accepted"] = nacc_w > 0  # coarse: any accept in the window
        if "window_naccept" in state:
            # only update a pre-existing key (run_chain_fused seeds it):
            # introducing one would change the output pytree structure vs
            # the input and force jitted callers to recompile on reuse
            out["window_naccept"] = state["window_naccept"] + nacc_w
        if swap and not is_wl and "nmove" in state:
            # cumulative non-null (species-differ) proposal count, the
            # reference-equivalent move count for canonical swaps (same
            # pre-existing-key rule as window_naccept)
            out["nmove"] = state["nmove"] + outs_n[4][0, :W]
        if is_wl:
            enth_n, entl_n, hist_n, occr_n, modf_n, cnt_n = outs_n[4:10]
            out["entropy"] = (
                enth_n.astype(jnp.float64) + entl_n.astype(jnp.float64)
            ).T[:W, :NB]
            out["histogram"] = hist_n.T[:W, :NB]
            out["occurrences"] = occr_n.T[:W, :NB]
            out["mod_factor"] = modf_n[0, :W].astype(jnp.float64)
            out["wl_counter"] = cnt_n[0, :W]
        return out

    return fn
