"""Fused Pallas TPU kernel for the Metropolis flip hot loop.

Runs MANY MC steps per kernel invocation with the whole walker state and all
static tables resident in VMEM, eliminating the HBM round trips between ops
that bound the XLA fast path (smol_tpu.ops.fastmc).  Layouts are chosen for
the TPU vector unit:

- occupancy as 4-bit codes packed into uint32 words [Wb, NW] per block,
- static per-site tables in one matrix row-selected by a one-hot MXU matmul
  (bit-exact; f64 energy tables split into two f32 planes),
- site-slot columns K-block-major and energy-table columns t-major so all
  per-step selections are contiguous lane slices + compare-selects,
- energy deltas and enthalpy accumulated in double-float (two f32 words,
  ~2^-45 relative error); recorded enthalpies are recomputed in exact f64
  at thinning points by the sampler, so no drift accumulates.

Acceptance thresholds evaluate in f32 (the Metropolis decision is
statistically insensitive at this scale); site/code draws use modulo of
31-bit PRNG words (bias ~ A / 2^31 < 1e-7, documented).

Walker blocks are independent chains, so the grid dimension parallelizes
perfectly over blocks.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["PallasFlipTables", "build_pallas_flip_tables", "make_pallas_flip_steps"]

_P = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class PallasFlipTables:
    """Static operands of the fused flip kernel."""

    num_sites: int
    num_words: int
    n_local: int  # L (padded to a multiple of 8)
    max_size: int  # K
    tensor_max: int  # Tmax
    tab: jnp.ndarray  # [N, K*L + K*L + L + 1 (+2C)] f32 static rows
    g_hi: jnp.ndarray  # [N, Tmax*L] f32 (t-major)
    g_lo: jnp.ndarray  # [N, Tmax*L] f32
    act: jnp.ndarray  # [1, A] int32 active sites
    has_mu: bool
    mu_cols: int


def build_pallas_flip_tables(processor, sublattices, mu_table=None):
    """Build kernel tables, or None when the system is unsupported."""
    from smol_tpu.ops.fastmc import MAX_CODES, site_local_arrays

    arrays = site_local_arrays(processor)
    if arrays is None:
        return None
    sites3, strides3, d2, g3, tmax = arrays
    n, L0, K = sites3.shape
    active = [s for s in sublattices if s.is_active]
    if not active:
        return None
    for s in active:
        if not np.array_equal(s.encoding, np.arange(len(s.encoding))):
            return None
    n_codes = np.ones(n, dtype=np.int64)
    for s in sublattices:
        n_codes[s.sites] = len(s.encoding)
    if n_codes.max() > MAX_CODES or tmax > 128:
        return None

    # pad L to a power of two: the in-kernel double-float tree reduction
    # halves the lane width each level
    L = 8
    while L < L0:
        L *= 2
    padL = L - L0
    sites3 = np.pad(sites3, ((0, 0), (0, padL), (0, 0)))
    strides3 = np.pad(strides3, ((0, 0), (0, padL), (0, 0)))
    d2 = np.pad(d2, ((0, 0), (0, padL)))
    g3 = np.pad(g3, ((0, 0), (0, padL), (0, 0)))

    # K-block-major site/stride columns; t-major energy columns
    sites_km = np.transpose(sites3, (0, 2, 1)).reshape(n, K * L)
    strides_km = np.transpose(strides3, (0, 2, 1)).reshape(n, K * L)
    g_tm = np.transpose(g3, (0, 2, 1)).reshape(n, tmax * L)
    g_hi = g_tm.astype(np.float32)
    g_lo = (g_tm - g_hi.astype(np.float64)).astype(np.float32)

    cols = [sites_km, strides_km, d2, n_codes[:, None].astype(np.float64)]
    mu_cols = 0
    has_mu = mu_table is not None
    if has_mu:
        mu = np.asarray(mu_table, dtype=np.float64)
        mu_cols = mu.shape[1]
        mu_hi = mu.astype(np.float32)
        mu_lo = (mu - mu_hi.astype(np.float64)).astype(np.float32)
        cols += [mu_hi, mu_lo]
    tab = np.concatenate(cols, axis=1).astype(np.float32)

    act_sites = np.concatenate([s.active_sites for s in active]).astype(np.int32)
    return PallasFlipTables(
        num_sites=n,
        num_words=(n + 7) // 8,
        n_local=L,
        max_size=K,
        tensor_max=tmax,
        tab=jnp.asarray(tab),
        g_hi=jnp.asarray(g_hi),
        g_lo=jnp.asarray(g_lo),
        act=jnp.asarray(act_sites[None, :]),
        has_mu=has_mu,
        mu_cols=mu_cols,
    )


def _pos_bits(shape):
    """31-bit positive random ints of the given shape."""
    bits = pltpu.prng_random_bits(shape)
    return jax.lax.bitwise_and(
        pltpu.bitcast(bits, jnp.int32), jnp.int32(0x7FFFFFFF)
    )


def _uniform01(shape):
    """f32 uniforms in (0, 1]."""
    r = _pos_bits(shape)
    return (jax.lax.shift_right_logical(r, jnp.int32(7)).astype(jnp.float32) + 1.0) * (
        2.0**-24
    )


def _df_add(ah, al, bh, bl):
    """Double-float addition: (ah, al) + (bh, bl), f32 words."""
    s = ah + bh
    v = s - ah
    e = (ah - (s - v)) + (bh - v)
    e = e + al + bl
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def make_pallas_flip_steps(tables: PallasFlipTables, n_steps: int,
                           block_size: int = 512):
    """Build ``fn(state, seed) -> state`` running n_steps fused flip steps.

    The kernel uses a transposed layout with WALKERS ON THE VECTOR LANES:
    every per-walker scalar is a [1, wb] vector (full lane utilization) and
    every table-indexed quantity is [rows, wb].  The one-hot row-select runs
    as dot(table^T [D, N], onehot [N, wb]) on the MXU.

    State layout matches smol_tpu.ops.fastmc: words [W, NW] uint32,
    enthalpy [W] f64, beta [W] f64, accepted [W] bool, naccept [W] int32.
    ``seed`` is an int32 scalar; per-block streams derive from it.
    """
    t = tables
    N, NW, L, K, TM = (
        t.num_sites, t.num_words, t.n_local, t.max_size, t.tensor_max,
    )
    KL = K * L
    A = int(t.act.shape[1])
    ncod_col = 2 * KL + L
    mu0 = ncod_col + 1
    C = t.mu_cols
    # transposed static tables: [cols, N] and [A, 1]
    tab_t = jnp.asarray(np.ascontiguousarray(np.asarray(t.tab).T))
    gcat_t = jnp.asarray(np.ascontiguousarray(
        np.concatenate([np.asarray(t.g_hi), np.asarray(t.g_lo)], axis=1).T
    ))  # [2*TM*L, N]
    act_t = jnp.asarray(np.ascontiguousarray(np.asarray(t.act).T))  # [A, 1]

    def kernel(seed_ref, words_ref, beta_ref, ehi_ref, elo_ref, nacc_ref,
               tab_ref, gcat_ref, act_ref,
               words_out, ehi_out, elo_out, nacc_out):
        wb = words_ref.shape[1]
        block = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + block)

        iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, wb), 0)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, wb), 0)
        iota_w8 = jax.lax.broadcasted_iota(jnp.int32, (NW, wb), 0)
        beta = beta_ref[:]  # [1, wb] f32
        zero_kl = jnp.zeros((KL, wb), jnp.int32)
        zero_nw = jnp.zeros((NW, wb), jnp.int32)

        def step(_, carry):
            words, ehi, elo, nacc = carry  # words [NW, wb] int32
            # ---- proposal: site ----
            ai = jax.lax.rem(_pos_bits((1, wb)), jnp.int32(A))
            act_b = jnp.broadcast_to(act_ref[:], (A, wb))
            s = jnp.sum(
                jnp.where(ai == iota_a, act_b, jnp.zeros_like(act_b)),
                axis=0, keepdims=True, dtype=jnp.int32,
            )  # [1, wb]
            oh = (s == iota_n).astype(jnp.float32)  # [N, wb]
            rows = jax.lax.dot(tab_ref[:], oh, precision=_P)  # [D, wb]
            ncod = rows[ncod_col:ncod_col + 1, :].astype(jnp.int32)
            sw = jax.lax.shift_right_logical(s, jnp.int32(3))
            word_s = jnp.sum(
                jnp.where(sw == iota_w8, words, zero_nw),
                axis=0, keepdims=True, dtype=jnp.int32,
            )
            shift_s = jax.lax.bitwise_and(s, jnp.int32(7)) * 4
            a_code = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(word_s, shift_s), jnp.int32(15)
            )
            j = jax.lax.rem(_pos_bits((1, wb)), jnp.maximum(ncod - 1, 1))
            b_code = j + (j >= a_code).astype(jnp.int32)

            # ---- tensor indices of local clusters ----
            sites = rows[:KL, :].astype(jnp.int32)  # [KL, wb]
            strides = rows[KL: 2 * KL, :].astype(jnp.int32)
            d2 = rows[2 * KL: 2 * KL + L, :].astype(jnp.int32)
            widx = jax.lax.shift_right_logical(sites, jnp.int32(3))
            wsel = zero_kl
            for w in range(NW):
                word_b = jnp.broadcast_to(words[w: w + 1, :], (KL, wb))
                wsel = jnp.where(widx == w, word_b, wsel)
            occv = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(
                    wsel, jax.lax.bitwise_and(sites, jnp.int32(7)) * 4
                ),
                jnp.int32(15),
            )
            t_old = occv[:L, :] * strides[:L, :]
            for k in range(1, K):
                t_old = t_old + occv[k * L:(k + 1) * L, :] * strides[k * L:(k + 1) * L, :]
            t_new = t_old + (b_code - a_code) * d2  # [L, wb]

            # ---- energy delta via t-major block selects ----
            # one fused select pass: rows stacked as [hi|lo] x [new|old]
            g_all = jax.lax.dot(gcat_ref[:], oh, precision=_P)  # [2*TM*L, wb]
            t_cat = jnp.concatenate([t_new, t_old, t_new, t_old], axis=0)
            sel = jnp.zeros((4 * L, wb), jnp.float32)
            for tt in range(TM):
                gh = g_all[tt * L:(tt + 1) * L, :]
                gl = g_all[TM * L + tt * L: TM * L + (tt + 1) * L, :]
                blockv = jnp.concatenate([gh, gh, gl, gl], axis=0)
                sel = jnp.where(t_cat == tt, blockv, sel)
            hi_new, hi_old = sel[:L, :], sel[L: 2 * L, :]
            lo_new, lo_old = sel[2 * L: 3 * L, :], sel[3 * L:, :]
            dh, dl = _df_add(hi_new, lo_new, -hi_old, -lo_old)
            width = L
            while width > 1:
                half = width // 2
                dh, dl = _df_add(
                    dh[:half, :], dl[:half, :],
                    dh[half:width, :], dl[half:width, :],
                )
                width = half
            # dh, dl now [1, wb]

            # ---- chemical work ----
            if t.has_mu:
                mu_hi = rows[mu0: mu0 + C, :]
                mu_lo = rows[mu0 + C: mu0 + 2 * C, :]
                iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, wb), 0)
                mnh = jnp.sum(
                    jnp.where(b_code == iota_c, mu_hi, 0.0),
                    axis=0, keepdims=True,
                )
                mnl = jnp.sum(
                    jnp.where(b_code == iota_c, mu_lo, 0.0),
                    axis=0, keepdims=True,
                )
                moh = jnp.sum(
                    jnp.where(a_code == iota_c, mu_hi, 0.0),
                    axis=0, keepdims=True,
                )
                mol = jnp.sum(
                    jnp.where(a_code == iota_c, mu_lo, 0.0),
                    axis=0, keepdims=True,
                )
                dwh, dwl = _df_add(mnh, mnl, -moh, -mol)
                dh, dl = _df_add(dh, dl, -dwh, -dwl)

            # ---- accept ----
            u = _uniform01((1, wb))
            expo = -beta * dh
            accept = jnp.logical_or(expo >= 0, expo > jnp.log(u))

            # ---- state update ----
            new_word = jax.lax.bitwise_or(
                jax.lax.bitwise_and(
                    word_s,
                    jax.lax.bitwise_not(
                        jax.lax.shift_left(jnp.int32(15), shift_s)
                    ),
                ),
                jax.lax.shift_left(b_code, shift_s),
            )
            upd_mask = jnp.logical_and(sw == iota_w8, accept)
            new_word_b = jnp.broadcast_to(new_word, (NW, wb))
            words = jnp.where(upd_mask, new_word_b, words)
            add_h = jnp.where(accept, dh, 0.0)
            add_l = jnp.where(accept, dl, 0.0)
            ehi, elo = _df_add(ehi, elo, add_h, add_l)
            nacc = nacc + accept.astype(jnp.int32)
            return words, ehi, elo, nacc

        carry = (words_ref[:], ehi_ref[:], elo_ref[:], nacc_ref[:])
        words, ehi, elo, nacc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_steps), step, carry
        )
        words_out[:] = words
        ehi_out[:] = ehi
        elo_out[:] = elo
        nacc_out[:] = nacc

    def fn(state, seed):
        words = state["words"]
        W = words.shape[0]
        wb = min(block_size, W)
        if W % wb != 0:
            raise ValueError(f"walkers {W} must be a multiple of block {wb}")
        grid = W // wb
        ehi = state["enthalpy"].astype(jnp.float32)
        elo = (state["enthalpy"] - ehi.astype(jnp.float64)).astype(jnp.float32)
        beta32 = state["beta"].astype(jnp.float32)

        # transposed per-walker arrays: [rows, W]
        words_t = jax.lax.bitcast_convert_type(words, jnp.int32).T

        out_shapes = (
            jax.ShapeDtypeStruct((NW, W), jnp.int32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.int32),
        )
        blk = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, wb), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        full = lambda arr: pl.BlockSpec(  # noqa: E731
            arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        # gridded Mosaic lowering emits i64 index arithmetic under x64;
        # all kernel I/O is 32-bit so trace the call in a 32-bit scope
        with jax.enable_x64(False):
            words_n, ehi_n, elo_n, nacc_n = pl.pallas_call(
                kernel,
                grid=(grid,),
                out_shape=out_shapes,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    blk(NW),
                    blk(1),
                    blk(1),
                    blk(1),
                    blk(1),
                    full(tab_t),
                    full(gcat_t),
                    full(act_t),
                ],
                out_specs=(blk(NW), blk(1), blk(1), blk(1)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
            )(
                jnp.atleast_1d(seed).astype(jnp.int32),
                words_t,
                beta32[None, :],
                ehi[None, :],
                elo[None, :],
                jnp.zeros((1, W), jnp.int32),
                tab_t,
                gcat_t,
                act_t,
            )
        out = dict(state)
        out["words"] = jax.lax.bitcast_convert_type(words_n.T, jnp.uint32)
        out["enthalpy"] = ehi_n[0].astype(jnp.float64) + elo_n[0].astype(
            jnp.float64
        )
        out["naccept"] = state["naccept"] + nacc_n[0]
        out["accepted"] = nacc_n[0] > 0  # coarse: any accept in the window
        out["_window_naccept_pallas"] = nacc_n[0]
        return out

    return fn


# ---------------------------------------------------------------------------
# binary persistent-chain kernel
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PallasBinaryTables:
    """Operands of the binary persistent-chain kernel.

    Rank-compacted (rows = active sites in sublattice-concatenation order),
    1-bit occupancy packing, compact tensor index m = sum_j occ_j * 2^j, and
    difference planes split exactly into three bf16 terms per f32 plane
    (hi = b0+b1+b2, lo = b3+b4+b5) so the one-hot select runs in native
    bf16 on the MXU while staying bit-exact.
    """

    num_sites: int
    num_words: int  # 32 sites per word
    num_ranks: int
    n_local: int  # L padded to a power of two (df64 tree reduction)
    k_other: int  # Ko non-self slots per cluster
    tmax_c: int  # 2**Ko
    tab: jnp.ndarray  # [Ko*L + 2*C, R] f32: sites (j-major) | mu hi | mu lo
    planes: jnp.ndarray  # [6*tc*L, R] bf16 (plane-major, then t-major)
    act: jnp.ndarray  # [S, A] int32 active sites
    n_active: jnp.ndarray  # [S]
    sub_offset: jnp.ndarray  # [S]
    cum_probs: jnp.ndarray  # [S]
    has_mu: bool
    mu_cols: int


def build_pallas_binary_tables(processor, sublattices, mu_table=None):
    """Build binary persistent-chain tables, or None when unsupported."""
    from smol_tpu.ops import fastmc

    ft = fastmc.build_fast_tables(
        processor, sublattices, mu_table=mu_table
    )
    if ft is None or not ft.binary:
        return None
    from smol_tpu.ops.fastmc import site_local_arrays

    sites3, strides3, d2, g3, tmax = site_local_arrays(processor)
    n, L0, K = sites3.shape
    ko = ft.k_other
    tc = ft.tmax_c
    active = [s for s in sublattices if s.is_active]

    # pad L to a power of two for the in-kernel tree reduction
    L = 8
    while L < L0:
        L *= 2
    rank_sites = np.concatenate(
        [np.asarray(s.active_sites, dtype=np.int64) for s in active]
    )
    R = len(rank_sites)

    # non-self slots (self folds into the compact index implicitly: the
    # difference tables already encode the self flip)
    sites_o = np.zeros((n, L, ko), dtype=np.int64)
    strides_o = np.zeros((n, L, ko), dtype=np.int64)
    for i in range(n):
        for l in range(L0):
            kk = 0
            for k in range(K):
                st = strides3[i, l, k]
                if st > 0 and sites3[i, l, k] != i:
                    sites_o[i, l, kk] = sites3[i, l, k]
                    strides_o[i, l, kk] = st
                    kk += 1

    # compact difference tables Dc[i, l, m]
    dc = np.zeros((n, L, tc))
    d2i = d2.astype(np.int64)
    for i in range(n):
        for l in range(L0):
            d = int(d2i[i, l])
            if d <= 0:
                continue
            for m in range(tc):
                tt = sum(
                    ((m >> j) & 1) * int(strides_o[i, l, j]) for j in range(ko)
                )
                dc[i, l, m] = g3[i, l, tt + d] - g3[i, l, tt]

    hi32 = dc.astype(np.float32)
    lo32 = (dc - hi32.astype(np.float64)).astype(np.float32)

    def split3(x32):
        xb = jnp.asarray(x32)
        p0 = xb.astype(jnp.bfloat16)
        r1 = xb - p0.astype(jnp.float32)
        p1 = r1.astype(jnp.bfloat16)
        r2 = r1 - p1.astype(jnp.float32)
        p2 = r2.astype(jnp.bfloat16)
        if not bool(((r2 - p2.astype(jnp.float32)) == 0).all()):
            return None
        return [np.asarray(p) for p in (p0, p1, p2)]

    sh = split3(hi32)
    sl_ = split3(lo32)
    if sh is None or sl_ is None:
        return None
    # plane-major then t-major then l: [6, tc, L] -> rows p*tc*L + t*L + l
    planes = np.stack(sh + sl_, axis=0)  # [6, n, L, tc]
    planes = np.transpose(planes[:, rank_sites], (0, 3, 2, 1)).reshape(
        6 * tc * L, R
    )

    # j-major site slots: rows j*L + l
    sites_km = np.transpose(
        sites_o[rank_sites], (2, 1, 0)
    ).reshape(ko * L, R)
    cols = [sites_km.astype(np.float32)]
    mu_cols = 0
    has_mu = mu_table is not None
    if has_mu:
        mu = np.asarray(mu_table, dtype=np.float64)[rank_sites]
        mu_cols = mu.shape[1]
        mu_hi = mu.astype(np.float32)
        mu_lo = (mu - mu_hi.astype(np.float64)).astype(np.float32)
        cols += [mu_hi.T.astype(np.float32), mu_lo.T.astype(np.float32)]
    tab = np.concatenate(cols, axis=0).astype(np.float32)

    return PallasBinaryTables(
        num_sites=n,
        num_words=(n + 31) // 32,
        num_ranks=R,
        n_local=L,
        k_other=ko,
        tmax_c=tc,
        tab=jnp.asarray(tab),
        planes=jnp.asarray(planes, dtype=jnp.bfloat16),
        act=ft.active_sites,
        n_active=ft.n_active,
        sub_offset=ft.sub_offset,
        cum_probs=ft.cum_probs,
        has_mu=has_mu,
        mu_cols=mu_cols,
    )


def make_pallas_binary_chain(tables: PallasBinaryTables, n_steps: int,
                             block_size: int = 512):
    """Build ``fn(state, seed) -> state``: n_steps fused binary flip steps.

    The whole chain runs inside ONE kernel invocation per walker block with
    the packed occupancy words, enthalpy (double-float) and all tables
    resident in VMEM — no HBM traffic between steps.  Walkers live on the
    vector lanes; the per-step energy lookup is two native-bf16 one-hot
    matmuls (exact: see PallasBinaryTables) plus compare-selects.

    Status: EXPERIMENTAL.  Correct and double-float exact (accumulated
    enthalpy matches exact f64 recomputation at ~1e-13 over thousands of
    steps on a v5e chip), but the one-hot plane select on the MXU costs
    Theta(R * 6 * tc * L) MACs per walker-step in both this kernel and the
    XLA fast path, and the XLA path currently schedules it better (~36 M
    vs ~14 M attempts/s on the 112-site spinel).  Kept as the substrate
    for future in-kernel algorithmic work (e.g. contraction-form energy
    deltas with acceptance-grade precision).

    Statistical notes (documented deviations from the XLA fast path):
    site/code draws use modulo of 31-bit PRNG words (bias < 1e-7) and the
    acceptance comparison is f32 (acceptance probabilities perturbed at
    ~1e-6 relative); the enthalpy bookkeeping itself is double-float exact
    and recorded traces are recomputed in exact f64 at thinning points.
    """
    t = tables
    NW, L, Ko, tc, R = t.num_words, t.n_local, t.k_other, t.tmax_c, t.num_ranks
    KL = Ko * L
    C = t.mu_cols
    S = int(t.act.shape[0])
    A = int(t.act.shape[1])
    act_np = np.asarray(t.act)
    n_active = [int(x) for x in np.asarray(t.n_active)]
    sub_offset = [int(x) for x in np.asarray(t.sub_offset)]
    cum_probs = [float(x) for x in np.asarray(t.cum_probs)]
    tab = t.tab  # [KL + 2C, R] f32
    planes = t.planes  # [6*tc*L, R] bf16
    PH = 3 * tc * L  # rows of the three hi planes

    act_t = jnp.asarray(np.ascontiguousarray(act_np.T), dtype=jnp.int32)

    def kernel(seed_ref, words_ref, beta_ref, ehi_ref, elo_ref, nacc_ref,
               tab_ref, planes_ref, act_ref,
               words_out, ehi_out, elo_out, nacc_out):
        wb = words_ref.shape[1]
        block = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + block)

        iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, wb), 0)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, wb), 0)
        beta = beta_ref[:]  # [1, wb] f32
        zero_1 = jnp.zeros((1, wb), jnp.int32)
        zero_a = jnp.zeros((A, wb), jnp.int32)

        def step(_, carry):
            words, ehi, elo, nacc = carry  # words [NW, wb] int32
            # ---- proposal: sublattice, slot, site ----
            u_sl = _uniform01((1, wb))
            sl = zero_1
            for si in range(S - 1):
                sl = sl + (u_sl > cum_probs[si]).astype(jnp.int32)
            na = jnp.full((1, wb), n_active[0], jnp.int32)
            off = jnp.full((1, wb), sub_offset[0], jnp.int32)
            for si in range(1, S):
                is_si = sl == si
                na = jnp.where(is_si, jnp.full_like(na, n_active[si]), na)
                off = jnp.where(
                    is_si, jnp.full_like(off, sub_offset[si]), off
                )
            ai = jax.lax.rem(_pos_bits((1, wb)), na)
            rank = off + ai
            row = zero_a
            for si in range(S):
                row = jnp.where(
                    jnp.broadcast_to(sl == si, (A, wb)),
                    jnp.broadcast_to(act_ref[:, si: si + 1], (A, wb)),
                    row,
                )
            s = jnp.sum(
                jnp.where(ai == iota_a, row, zero_a),
                axis=0, keepdims=True, dtype=jnp.int32,
            )  # [1, wb]

            # ---- current bit ----
            sw = jax.lax.shift_right_logical(s, jnp.int32(5))
            word_s = jnp.zeros((1, wb), jnp.int32)
            for w in range(NW):
                word_s = jnp.where(sw == w, words[w: w + 1, :], word_s)
            sh_s = jax.lax.bitwise_and(s, jnp.int32(31))
            a_bit = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(word_s, sh_s), jnp.int32(1)
            )
            sign = 1.0 - 2.0 * a_bit.astype(jnp.float32)  # +1: 0->1

            # ---- one-hot table selects ----
            oh = (rank == iota_r).astype(jnp.float32)  # [R, wb]
            rows = jax.lax.dot(tab_ref[:], oh, precision=_P)  # [KL+2C, wb]
            sites = rows[:KL, :].astype(jnp.int32)
            ohb = oh.astype(jnp.bfloat16)
            hi3 = jax.lax.dot_general(
                planes_ref[:PH, :], ohb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [3*tc*L, wb]
            lo3 = jax.lax.dot_general(
                planes_ref[PH:, :], ohb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            TL = tc * L
            hi_t = hi3[:TL, :] + hi3[TL: 2 * TL, :] + hi3[2 * TL:, :]
            lo_t = lo3[:TL, :] + lo3[TL: 2 * TL, :] + lo3[2 * TL:, :]

            # ---- occupancy bits of the non-self slots ----
            widx = jax.lax.shift_right_logical(sites, jnp.int32(5))
            wsel = jnp.zeros((KL, wb), jnp.int32)
            for w in range(NW):
                word_b = jnp.broadcast_to(words[w: w + 1, :], (KL, wb))
                wsel = jnp.where(widx == w, word_b, wsel)
            occv = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(
                    wsel, jax.lax.bitwise_and(sites, jnp.int32(31))
                ),
                jnp.int32(1),
            )
            m = occv[:L, :]
            for j in range(1, Ko):
                m = m + jax.lax.shift_left(
                    occv[j * L:(j + 1) * L, :], jnp.int32(j)
                )

            # ---- select the difference at compact index m ----
            d_hi = jnp.zeros((L, wb), jnp.float32)
            d_lo = jnp.zeros((L, wb), jnp.float32)
            for tt in range(tc):
                is_tt = m == tt
                d_hi = jnp.where(is_tt, hi_t[tt * L:(tt + 1) * L, :], d_hi)
                d_lo = jnp.where(is_tt, lo_t[tt * L:(tt + 1) * L, :], d_lo)
            d_hi = sign * d_hi
            d_lo = sign * d_lo
            width = L
            while width > 1:
                half = width // 2
                d_hi, d_lo = _df_add(
                    d_hi[:half, :], d_lo[:half, :],
                    d_hi[half:width, :], d_lo[half:width, :],
                )
                width = half
            dh, dl = d_hi, d_lo  # [1, wb]

            # ---- chemical work (binary: mu row b minus row a) ----
            if t.has_mu:
                b_bit = 1 - a_bit
                mu_hi = rows[KL: KL + C, :]
                mu_lo = rows[KL + C: KL + 2 * C, :]
                a_is1 = a_bit == 1
                b_is1 = b_bit == 1
                mha = jnp.where(a_is1, mu_hi[1:2, :], mu_hi[0:1, :])
                mla = jnp.where(a_is1, mu_lo[1:2, :], mu_lo[0:1, :])
                mhb = jnp.where(b_is1, mu_hi[1:2, :], mu_hi[0:1, :])
                mlb = jnp.where(b_is1, mu_lo[1:2, :], mu_lo[0:1, :])
                dwh, dwl = _df_add(mhb, mlb, -mha, -mla)
                dh, dl = _df_add(dh, dl, -dwh, -dwl)

            # ---- accept + state update ----
            u = _uniform01((1, wb))
            expo = -beta * dh
            accept = jnp.logical_or(expo >= 0, expo > jnp.log(u))
            flip_mask = jax.lax.shift_left(jnp.int32(1), sh_s)
            new_word = jax.lax.bitwise_xor(word_s, flip_mask)
            for_w = jnp.broadcast_to(new_word, (NW, wb))
            upd = jnp.logical_and(
                jnp.broadcast_to(sw, (NW, wb))
                == jax.lax.broadcasted_iota(jnp.int32, (NW, wb), 0),
                jnp.broadcast_to(accept, (NW, wb)),
            )
            words = jnp.where(upd, for_w, words)
            zf = jnp.zeros_like(dh)
            add_h = jnp.where(accept, dh, zf)
            add_l = jnp.where(accept, dl, zf)
            ehi, elo = _df_add(ehi, elo, add_h, add_l)
            nacc = nacc + accept.astype(jnp.int32)
            return words, ehi, elo, nacc

        carry = (words_ref[:], ehi_ref[:], elo_ref[:], nacc_ref[:])
        words, ehi, elo, nacc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_steps), step, carry
        )
        words_out[:] = words
        ehi_out[:] = ehi
        elo_out[:] = elo
        nacc_out[:] = nacc

    def fn(state, seed):
        words = state["words"]
        W = words.shape[0]
        wb = min(block_size, W)
        if W % wb != 0:
            raise ValueError(f"walkers {W} must be a multiple of block {wb}")
        grid = W // wb
        ehi = state["enthalpy"].astype(jnp.float32)
        elo = (state["enthalpy"] - ehi.astype(jnp.float64)).astype(jnp.float32)
        beta32 = state["beta"].astype(jnp.float32)
        words_t = jax.lax.bitcast_convert_type(words, jnp.int32).T

        out_shapes = (
            jax.ShapeDtypeStruct((NW, W), jnp.int32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
            jax.ShapeDtypeStruct((1, W), jnp.int32),
        )
        blk = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, wb), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        full = lambda arr: pl.BlockSpec(  # noqa: E731
            arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        with jax.enable_x64(False):
            words_n, ehi_n, elo_n, nacc_n = pl.pallas_call(
                kernel,
                grid=(grid,),
                out_shape=out_shapes,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    blk(NW), blk(1), blk(1), blk(1), blk(1),
                    full(tab), full(planes), full(act_t),
                ],
                out_specs=(blk(NW), blk(1), blk(1), blk(1)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
            )(
                jnp.atleast_1d(seed).astype(jnp.int32),
                words_t,
                beta32[None, :],
                ehi[None, :],
                elo[None, :],
                jnp.zeros((1, W), jnp.int32),
                tab,
                planes,
                act_t,
            )
        out = dict(state)
        out["words"] = jax.lax.bitcast_convert_type(words_n.T, jnp.uint32)
        out["enthalpy"] = ehi_n[0].astype(jnp.float64) + elo_n[0].astype(
            jnp.float64
        )
        out["naccept"] = state["naccept"] + nacc_n[0]
        out["accepted"] = nacc_n[0] > 0
        out["_window_naccept_pallas"] = nacc_n[0]
        return out

    return fn
