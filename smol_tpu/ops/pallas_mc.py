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
