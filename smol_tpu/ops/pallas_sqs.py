"""Persistent-chain Pallas kernel for SQS distance annealing.

Runs whole windows of canonical-swap Metropolis steps against the
correlation-distance objective

    d = -w L + sum_f W_f |f_f - T_f|

entirely in VMEM: each walker block carries its occupancy AND its
intensive correlation vector ``f`` (a double-float [features, walkers]
plane pair).  A swap's feature delta touches only the clusters containing
the two sites, so each step:

1. gathers the two sites' local-cluster rows (the same select-plane
   machinery as the energy chain, smol_tpu.ops.pallas_chain) to get each
   row's OLD and NEW correlation-tensor entries,
2. scatters row deltas into the feature plane with one 0/1 matrix
   multiply per site on the MXU (each local row belongs to exactly one
   correlation function),
3. recomputes the distance in-plane: |f - T| -> weighted sum, plus the
   exact-match diameter L from per-diameter-group all-match indicators
   (features are PERMUTED at build time so each diameter group is one
   contiguous row range),
4. accepts on the f32 distance change and tracks each walker's best
   (score, occupancy) on device.

Reference analog: the distance delta kernels
smol/utils/cluster/evaluator.pyx:319-434 driven by the per-flip Python
loop; here the whole annealing window is one kernel launch.

Numerical contract: the feature plane accumulates in double-float;
the per-step scatter matmuls round at f32, so callers should recompute
features exactly at launch boundaries (make_distance_chain's wrapper
does) — drift within one window is ~1e-6 relative, well inside annealing
noise, and final SQS scores are re-verified exactly by the generator.

Statistical contract: walkers in a block share the exogenous swap-pair
sequence exactly as in pallas_chain (see its module docstring).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smol_tpu.ops.pallas_chain import (
    MAX_CHUNK_STEPS,
    MAX_TENSOR,
    _hash_uniform01,
    _split_f64,
    interpret_mode,
    rank_pair_sequence,
    runtime_supported,
)
from smol_tpu.ops.prims import _df_add, _uniform01

__all__ = [
    "DistanceTables",
    "build_distance_tables",
    "make_distance_chain",
    "interpret_mode",
    "runtime_supported",
]

_P = jax.lax.Precision.HIGHEST
VMEM_BUDGET = 8 * 2**20  # total static tables; no streaming (SQS cells small)


@dataclass(frozen=True)
class DistanceTables:
    """Static operands of the distance chain kernel (see module doc)."""

    num_sites: int
    num_ranks: int  # R
    rpad: int
    n_local: int  # Ld: padded (instance, combo) rows per rank
    tensor_max: int  # TM
    segments: tuple  # (l0, l1, ext) on the Ld axis
    num_feats: int  # F: correlation functions EXCLUDING the empty one
    fpad: int  # FP
    gm: jnp.ndarray  # [R, Ld, RP] bf16 neighbor strides
    gcat: jnp.ndarray  # [R, Ld, 2*TM+1] f32: v_hi | v_lo | d2
    sm: jnp.ndarray  # [R, FP, Ld] bf16 0/1 scatter (row -> feature)
    tw: jnp.ndarray  # [FP, 8] f32: T_hi | T_lo | W | pad (feature rows)
    groups: tuple  # ((g0, g1, diameter) ...) ascending-diameter row ranges
    match_tol: float
    match_weight: float
    ncod: jnp.ndarray  # [1, R] int32 (unused for swaps; kept for parity)
    rank_sites: jnp.ndarray  # [R] int32
    cum_probs: np.ndarray
    sub_offset: np.ndarray
    n_active: np.ndarray
    perm: np.ndarray  # [F] feature id (>=1) of each plane row


def build_distance_tables(processor, sublattices):
    """DistanceTables for a CorrelationDistanceProcessor, or None.

    Requirements mirror build_chain_tables (packed processor, arange
    encodings, unrestricted active sublattices, positive self strides,
    tensor size <= MAX_TENSOR) plus: total table bytes under VMEM_BUDGET
    (SQS supercells are small by construction — the generator enumerates
    shapes of a fixed, modest size).
    """
    from smol_tpu.moca.processor.distance import CorrelationDistanceProcessor
    from smol_tpu.ops.fastmc import MAX_CODES

    # only the correlation flavor: the tables index by correlation-function
    # id (bit_id + k); ClusterInteractionDistanceProcessor's diameter groups
    # hold orbit ids in a different index space and must take the XLA path
    if not isinstance(processor, CorrelationDistanceProcessor):
        return None
    packed = getattr(processor, "packed", None)
    if packed is None or not hasattr(processor, "_diameter_groups"):
        return None
    n = packed.num_sites
    lc = packed.local_clusters
    valid = lc >= 0
    lc_safe = np.where(valid, lc, 0)
    sites3 = packed.cluster_sites[lc_safe] * valid[:, :, None]
    strides3 = packed.cluster_strides[lc_safe] * valid[:, :, None]
    orb3 = np.where(valid, packed.cluster_orbit[lc_safe], 0)
    tmax = int(packed.orbit_tensor_size.max())
    if tmax > MAX_TENSOR:
        return None

    active = [s for s in sublattices if s.is_active]
    if not active:
        return None
    for s in active:
        if not np.array_equal(s.encoding, np.arange(len(s.encoding))):
            return None
        if len(s.active_sites) != len(s.sites):
            return None

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

    # d2 self-stride per (site, local cluster)
    L0 = lc.shape[1]
    K = sites3.shape[2]
    d2 = np.zeros((n, L0))
    valid_cluster = strides3.sum(axis=2) > 0
    for i in range(n):
        for l in range(L0):
            if valid_cluster[i, l]:
                d2[i, l] = sum(
                    strides3[i, l, k]
                    for k in range(K)
                    if sites3[i, l, k] == i and strides3[i, l, k] > 0
                )
    if np.any(valid_cluster & (d2 <= 0)):
        return None

    # feature plane layout: concatenate the processor's diameter groups
    # (ascending diameter order is the processor's iteration order, used
    # by exact_match_max_diameter) into contiguous row ranges
    diameter_groups = processor._diameter_groups
    perm = []  # plane row -> feature id (>= 1)
    groups = []
    for diameter, indices in diameter_groups:
        g0 = len(perm)
        perm.extend(int(f) for f in indices)
        groups.append((g0, len(perm), float(diameter)))
    F = len(perm)
    if F == 0:
        return None
    perm = np.asarray(perm, dtype=np.int64)
    row_of_fn = -np.ones(int(perm.max()) + 1, dtype=np.int64)
    row_of_fn[perm] = np.arange(F)
    FP = max(8, -(-F // 8) * 8)

    # expand (instance, combo) rows per rank
    fn_orbit_rows = {}  # orbit -> list of (feature_row, fn_offset)
    bit_id = packed.orbit_bit_id
    ncomb = packed.orbit_num_combos
    fn_off = np.zeros(len(packed.fn_cluster_count), dtype=np.int64)
    # reconstruct per-function corr_flat offsets: orbit tensors are
    # appended combo-major starting at slot 1 (ops/packing.py)
    off = 1
    for o in np.argsort(bit_id):
        if o == 0:
            continue
        ts = int(packed.orbit_tensor_size[o])
        for k in range(int(ncomb[o])):
            fn_off[bit_id[o] + k] = off
            off += ts
    for o in range(len(bit_id)):
        if o == 0:
            continue
        rows = []
        for k in range(int(ncomb[o])):
            f = int(bit_id[o]) + k
            if f < len(row_of_fn) and row_of_fn[f] >= 0:
                rows.append((int(row_of_fn[f]), int(fn_off[f])))
        fn_orbit_rows[o] = rows

    # fn_cluster_count is the TOTAL instance count in the supercell
    # (ops/correlations.py:154 normalizes by it alone), so dividing by it
    # already yields the INTENSIVE feature
    ncl = packed.fn_cluster_count

    # per-rank: rows = (instance l, combo k); value table = corr_flat
    # normalized to the intensive feature (per total cluster count)
    rows_per_rank = []
    max_rows = 0
    for ri, site in enumerate(rank_sites):
        rows = []
        for l in range(L0):
            if not valid_cluster[site, l]:
                continue
            o = int(orb3[site, l])
            for frow, foff in fn_orbit_rows.get(o, ()):
                rows.append((l, o, frow, foff))
        rows_per_rank.append(rows)
        max_rows = max(max_rows, len(rows))
    Ld = 8
    while Ld < max_rows:
        Ld *= 2

    gm = np.zeros((R, Ld, rpad), dtype=np.float64)
    d2r = np.zeros((R, Ld), dtype=np.float64)
    g3r = np.zeros((R, Ld, tmax), dtype=np.float64)
    frow_r = np.zeros((R, Ld), dtype=np.int64)
    ext = np.zeros((R, Ld), dtype=np.int64)
    for ri, site in enumerate(rank_sites):
        for j, (l, o, frow, foff) in enumerate(rows_per_rank[ri]):
            ts = int(packed.orbit_tensor_size[o])
            f = perm[frow]
            g3r[ri, j, :ts] = packed.corr_flat[foff: foff + ts] / ncl[f]
            d2r[ri, j] = d2[site, l]
            frow_r[ri, j] = frow
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
                            return None
                        continue
                    gm[ri, j, nr] += st
            ext[ri, j] = e
    if gm.max(initial=0) >= 256 or d2r.max(initial=0) >= 2**24:
        return None

    # sort rows by descending extent; shared segment partition (same
    # scheme as build_chain_tables)
    order = np.argsort(-ext, axis=1, kind="stable")
    gm = np.take_along_axis(gm, order[:, :, None], axis=1)
    d2r = np.take_along_axis(d2r, order, axis=1)
    g3r = np.take_along_axis(g3r, order[:, :, None], axis=1)
    frow_r = np.take_along_axis(frow_r, order, axis=1)
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
        split_cost = sum((b - a) * x for a, b, x in left + right)
        return (
            left + right if split_cost < length * e else [(l0, l0 + length, e)]
        )

    segments = tuple(_segment(0, Ld))
    if not segments:
        return None

    g_hi, g_lo = _split_f64(g3r)
    gcat = np.concatenate(
        [g_hi, g_lo, d2r[:, :, None].astype(np.float32)], axis=2
    )

    # scatter matrices: sm[r, frow, j] = 1 iff rank r's row j feeds frow.
    # Padded rows carry all-zero value tables, so frow 0 is safe for them.
    sm = np.zeros((R, FP, Ld), dtype=np.float32)
    valid_rows = np.take_along_axis(ext, order, axis=1) > 0
    for ri in range(R):
        for j in range(Ld):
            if valid_rows[ri, j]:
                sm[ri, frow_r[ri, j], j] = 1.0

    # target / weight planes in permuted row order
    target = np.asarray(processor.target_vector, dtype=np.float64)[perm]
    wvec = np.zeros(FP, dtype=np.float64)
    wvec[:F] = np.asarray(processor.coefs, dtype=np.float64)[perm]
    th, tl = _split_f64(np.pad(target, (0, FP - F)))
    tw = np.zeros((FP, 8), dtype=np.float32)
    tw[:, 0] = th
    tw[:, 1] = tl
    tw[:, 2] = wvec.astype(np.float32)

    table_bytes = 2 * gm.size + 4 * gcat.size + 2 * sm.size
    if table_bytes > VMEM_BUDGET:
        return None

    ncod = np.ones((1, R), dtype=np.int32)
    nact = np.array([len(s.active_sites) for s in active], dtype=np.int64)
    off = 0
    for i, s in enumerate(active):
        ncod[0, off: off + nact[i]] = len(s.encoding)
        off += nact[i]
    sub_offset = np.concatenate([[0], np.cumsum(nact)[:-1]]).astype(np.int64)
    probs = np.full(len(active), 1.0 / len(active))

    return DistanceTables(
        num_sites=n,
        num_ranks=R,
        rpad=rpad,
        n_local=Ld,
        tensor_max=tmax,
        segments=segments,
        num_feats=F,
        fpad=FP,
        gm=jnp.asarray(gm, dtype=jnp.bfloat16),
        gcat=jnp.asarray(gcat),
        sm=jnp.asarray(sm, dtype=jnp.bfloat16),
        tw=jnp.asarray(tw),
        groups=tuple(groups),
        match_tol=float(processor.match_tol),
        match_weight=float(-processor.coefs[0]),
        ncod=jnp.asarray(ncod),
        rank_sites=jnp.asarray(rank_sites, dtype=jnp.int32),
        cum_probs=np.cumsum(probs),
        sub_offset=sub_offset,
        n_active=nact,
        perm=perm,
    )


def make_distance_chain(
    tables: DistanceTables,
    n_steps: int,
    base_corr_fn,
    block_size: int = 512,
    interpret: bool = False,
    chunk_steps: int | None = None,
):
    """Build ``fn(state, key) -> state`` annealing n_steps swap moves.

    ``base_corr_fn(occu) -> [num_corr] f64`` must return the INTENSIVE
    correlation vector (``ops.correlations.corr_from_occupancy``); it is
    used for the exact boundary recomputation of the feature plane.

    ``state``: ``occupancy`` [W, N] int32, ``enthalpy`` [W] f64 (the
    distance score), ``beta`` [W] f64 (1/temperature at kB = 1),
    ``naccept`` [W] int32, ``best_enthalpy`` [W] f64, ``best_occupancy``
    [W, N] int32.  Features are recomputed exactly from the occupancies
    on entry (no cross-launch drift) and live in VMEM during the window.
    """
    t = tables
    R, RP, Ld, TM, FP = t.num_ranks, t.rpad, t.n_local, t.tensor_max, t.fpad
    segments = t.segments
    # row_deltas assembles per-segment pieces by STATIC CONCATENATION, so
    # it silently misplaces rows unless the segments are sorted,
    # non-overlapping, and within [0, Ld]; check the invariant here, where
    # the segments are consumed (concatenation alone only catches a wrong
    # total length)
    cursor = 0
    for (l0, l1, _e) in segments:
        if not (cursor <= l0 < l1 <= Ld):
            raise AssertionError(
                f"distance-chain segments must be sorted, disjoint and "
                f"within [0, {Ld}]; got {segments}"
            )
        cursor = l1
    wtol = np.float32(t.match_tol)
    mweight = np.float32(t.match_weight)

    def kernel(seed_ref, nvalid_ref, seq_ref, vseq_ref,
               occ_ref, beta_ref, d_ref, bd_ref, bocc_ref, fh_ref, fl_ref,
               gm_ref, gcat_ref, sm_ref, tw_ref,
               occ_out, d_out, nacc_out, bd_out, bocc_out,
               fh_out, fl_out):
        wb = occ_ref.shape[1]
        block = pl.program_id(0)
        block_seed = seed_ref[0] + block * jnp.int32(7919)
        if not interpret:
            pltpu.prng_seed(block_seed)

        iota_r = jax.lax.broadcasted_iota(jnp.int32, (RP, wb), 0)
        beta = beta_ref[:]
        th = jax.lax.broadcast_in_dim(tw_ref[:, 0:1], (FP, wb), (0, 1))
        tl = jax.lax.broadcast_in_dim(tw_ref[:, 1:2], (FP, wb), (0, 1))
        wv = jax.lax.broadcast_in_dim(tw_ref[:, 2:3], (FP, wb), (0, 1))

        def select_code(occ, r):
            return jnp.sum(
                jnp.where(iota_r == r, occ, 0.0), axis=0, keepdims=True
            )

        def row_deltas(gm_x, gcat_x, occ_bf, a, b):
            """Per-row value change of recoloring a -> b: ([Ld, wb] hi, lo).

            Per-segment pieces assemble by static concatenation (segment
            bounds are Python ints); Mosaic has no dynamic_update_slice.
            """
            t_part = jax.lax.dot(
                gm_x, occ_bf, preferred_element_type=jnp.float32
            )
            pieces_h = []
            pieces_l = []
            cursor = 0
            for (l0, l1, ext_s) in segments:
                if l0 > cursor:
                    gap = jnp.zeros((l0 - cursor, wb), jnp.float32)
                    pieces_h.append(gap)
                    pieces_l.append(gap)
                cursor = l1
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
                sh, sl = _df_add(hn, ln_, -ho, -lo_)
                pieces_h.append(sh)
                pieces_l.append(sl)
            if cursor < Ld:
                gap = jnp.zeros((Ld - cursor, wb), jnp.float32)
                pieces_h.append(gap)
                pieces_l.append(gap)
            if len(pieces_h) == 1:
                return pieces_h[0], pieces_l[0]
            return (
                jnp.concatenate(pieces_h, axis=0),
                jnp.concatenate(pieces_l, axis=0),
            )

        def scatter(sm_x, vh, vl):
            """Feature-plane delta: [FP, wb] df pair via 0/1 MXU scatter.

            The 0/1 scatter matrix is exact in any dtype; the value
            operands stay f32 so each delta rounds only at f32 (the
            stated per-window drift bound).
            """
            fh32 = jax.lax.dot_general(
                sm_x.astype(jnp.float32), vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=_P,
                preferred_element_type=jnp.float32,
            )
            fl32 = jax.lax.dot_general(
                sm_x.astype(jnp.float32), vl,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=_P,
                preferred_element_type=jnp.float32,
            )
            return fh32, fl32

        def distance(fh, fl):
            """(-w L + sum W|f - T|) as [1, wb] f32."""
            dh, dl = _df_add(fh, fl, -th, -tl)
            dist = jnp.abs(dh + dl)  # [FP, wb]
            dsum = jnp.sum(wv * dist, axis=0, keepdims=True)
            if mweight != 0:
                running = jnp.ones((1, wb), jnp.float32)
                ell = jnp.zeros((1, wb), jnp.float32)
                for (g0, g1, diam) in t.groups:
                    ok = jnp.min(
                        jnp.where(dist[g0:g1] <= wtol, 1.0, 0.0),
                        axis=0, keepdims=True,
                    )
                    running = running * ok
                    ell = jnp.maximum(ell, jnp.float32(diam) * running)
                dsum = dsum - mweight * ell
            return dsum

        def step(i, carry):
            occ, d_cur, nacc, bd, bocc, fh, fl = carry
            u = seq_ref[block, i]
            v = vseq_ref[block, i]
            gm_u = gm_ref[pl.ds(u, 1)][0]
            gcat_u = gcat_ref[pl.ds(u, 1)][0]
            sm_u = sm_ref[pl.ds(u, 1)][0]
            gm_v = gm_ref[pl.ds(v, 1)][0]
            gcat_v = gcat_ref[pl.ds(v, 1)][0]
            sm_v = sm_ref[pl.ds(v, 1)][0]

            a = select_code(occ, u)
            av = select_code(occ, v)
            is_move = a != av
            occ_bf = occ.astype(jnp.bfloat16)
            vh1, vl1 = row_deltas(gm_u, gcat_u, occ_bf, a, av)
            u_rows = jnp.broadcast_to(iota_r == u, (RP, wb))
            occ1_bf = jnp.where(
                u_rows, jnp.broadcast_to(av, (RP, wb)).astype(jnp.bfloat16),
                occ_bf,
            )
            vh2, vl2 = row_deltas(gm_v, gcat_v, occ1_bf, av, a)
            d1h, d1l = scatter(sm_u, vh1, vl1)
            d2h, d2l = scatter(sm_v, vh2, vl2)
            fnh, fnl = _df_add(fh, fl, d1h, d1l)
            fnh, fnl = _df_add(fnh, fnl, d2h, d2l)
            d_new = distance(fnh, fnl)

            if interpret:
                uu = _hash_uniform01(block_seed, i, 1, (1, wb))
            else:
                uu = _uniform01((1, wb))
            expo = -beta * (d_new - d_cur)
            accept = jnp.logical_or(expo >= 0, expo > jnp.log(uu))
            accept = jnp.logical_and(accept, is_move)
            acc_r = jnp.broadcast_to(accept, (RP, wb))
            occ = jnp.where(
                jnp.logical_and(iota_r == u, acc_r),
                jnp.broadcast_to(av, (RP, wb)), occ,
            )
            occ = jnp.where(
                jnp.logical_and(iota_r == v, acc_r),
                jnp.broadcast_to(a, (RP, wb)), occ,
            )
            acc_f = jnp.broadcast_to(accept, (FP, wb))
            fh = jnp.where(acc_f, fnh, fh)
            fl = jnp.where(acc_f, fnl, fl)
            d_cur = jnp.where(accept, d_new, d_cur)
            nacc = nacc + accept.astype(jnp.int32)
            better = d_cur < bd
            bd = jnp.where(better, d_cur, bd)
            bocc = jnp.where(jnp.broadcast_to(better, (RP, wb)), occ, bocc)
            return occ, d_cur, nacc, bd, bocc, fh, fl

        carry = (
            occ_ref[:], d_ref[:], jnp.zeros((1, wb), jnp.int32),
            bd_ref[:], bocc_ref[:], fh_ref[:], fl_ref[:],
        )
        occ, d_cur, nacc, bd, bocc, fh, fl = jax.lax.fori_loop(
            jnp.int32(0), nvalid_ref[0], step, carry
        )
        occ_out[:] = occ
        d_out[:] = d_cur
        nacc_out[:] = nacc
        bd_out[:] = bd
        bocc_out[:] = bocc
        fh_out[:] = fh
        fl_out[:] = fl

    rank_sites = t.rank_sites

    def fn(state, key):
        occu = state["occupancy"]
        W = occu.shape[0]
        wb = min(block_size, -(-W // 128) * 128)
        Wp = -(-W // wb) * wb
        pad = Wp - W
        grid = Wp // wb

        chunk = min(n_steps, chunk_steps or MAX_CHUNK_STEPS)
        n_chunks = -(-n_steps // chunk)
        k_seed, k_seq = jax.random.split(jax.random.fold_in(key, 29))
        seed0 = jax.random.randint(
            k_seed, (), 0, np.int32(2**30 - 1), dtype=jnp.int32
        )
        seqs, vseqs = rank_pair_sequence(t, k_seq, (n_chunks, grid, chunk))
        seqs = seqs.astype(jnp.int32)
        vseqs = vseqs.astype(jnp.int32)
        nvalid = jnp.minimum(
            chunk, n_steps - jnp.arange(n_chunks) * chunk
        ).astype(jnp.int32)
        seeds = seed0 + jnp.arange(n_chunks, dtype=jnp.int32) * jnp.int32(
            999983
        )

        # exact feature/distance recomputation at the launch boundary
        F = t.num_feats
        perm = jnp.asarray(t.perm)
        base = jax.vmap(base_corr_fn)(occu)  # [W, num_corr] intensive f64
        fsel = base[:, perm]  # [W, F]
        fh0 = jnp.pad(fsel, ((0, pad), (0, FP - F))).T.astype(jnp.float32)
        fl0 = (
            jnp.pad(fsel, ((0, pad), (0, FP - F))).T
            - fh0.astype(jnp.float64)
        ).astype(jnp.float32)

        occ_rank = occu[:, rank_sites].astype(jnp.float32)
        occ_t = jnp.pad(occ_rank, ((0, pad), (0, RP - R))).T
        bocc_rank = state["best_occupancy"][:, rank_sites].astype(jnp.float32)
        bocc_t = jnp.pad(bocc_rank, ((0, pad), (0, RP - R))).T
        d0 = jnp.pad(state["enthalpy"], (0, pad)).astype(jnp.float32)[None]
        bd0 = jnp.pad(
            state["best_enthalpy"], (0, pad), constant_values=np.inf
        ).astype(jnp.float32)[None]
        beta32 = jnp.pad(state["beta"], (0, pad)).astype(jnp.float32)[None]

        out_shapes = (
            jax.ShapeDtypeStruct((RP, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1, Wp), jnp.int32),
            jax.ShapeDtypeStruct((1, Wp), jnp.float32),
            jax.ShapeDtypeStruct((RP, Wp), jnp.float32),
            jax.ShapeDtypeStruct((FP, Wp), jnp.float32),
            jax.ShapeDtypeStruct((FP, Wp), jnp.float32),
        )
        blk = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, wb), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        full = lambda arr: pl.BlockSpec(  # noqa: E731
            arr.shape, lambda i: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM,
        )
        with jax.enable_x64(False):

            def chunk_body(carry, xs):
                occ_c, d_c, nacc_c, bd_c, bocc_c, fh_c, fl_c = carry
                seed_c, nvalid_c, seq_c, vseq_c = xs
                outs = pl.pallas_call(
                    kernel,
                    grid=(grid,),
                    out_shape=out_shapes,
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        blk(RP),  # occ
                        blk(1),  # beta
                        blk(1),  # d
                        blk(1),  # best d
                        blk(RP),  # best occ
                        blk(FP),  # f hi
                        blk(FP),  # f lo
                        full(t.gm),
                        full(t.gcat),
                        full(t.sm),
                        full(t.tw),
                    ],
                    out_specs=(
                        blk(RP), blk(1), blk(1), blk(1), blk(RP),
                        blk(FP), blk(FP),
                    ),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                    ),
                    interpret=interpret,
                )(
                    seed_c[None], nvalid_c[None], seq_c, vseq_c,
                    occ_c, beta32, d_c, bd_c, bocc_c, fh_c, fl_c,
                    t.gm, t.gcat, t.sm, t.tw,
                )
                occ_n, d_n, nacc_n, bd_n, bocc_n, fh_n, fl_n = outs
                return (occ_n, d_n, nacc_c + nacc_n, bd_n, bocc_n,
                        fh_n, fl_n), None

            carry0 = (
                occ_t, d0, jnp.zeros((1, Wp), jnp.int32), bd0, bocc_t,
                fh0, fl0,
            )
            if n_chunks == 1:
                outs_n, _ = chunk_body(
                    carry0, (seeds[0], nvalid[0], seqs[0], vseqs[0])
                )
            else:
                outs_n, _ = jax.lax.scan(
                    chunk_body, carry0, (seeds, nvalid, seqs, vseqs)
                )
        occ_n, d_n, nacc_n, bd_n, bocc_n, fh_n, fl_n = outs_n

        out = dict(state)
        new_codes = occ_n.T[:W, :R].astype(jnp.int32)
        out["occupancy"] = occu.at[:, rank_sites].set(new_codes)
        best_codes = bocc_n.T[:W, :R].astype(jnp.int32)
        out["best_occupancy"] = state["best_occupancy"].at[
            :, rank_sites
        ].set(best_codes)
        out["enthalpy"] = d_n[0, :W].astype(jnp.float64)
        out["best_enthalpy"] = jnp.minimum(
            state["best_enthalpy"], bd_n[0, :W].astype(jnp.float64)
        )
        nacc_w = nacc_n[0, :W]
        out["naccept"] = state["naccept"] + nacc_w
        out["accepted"] = nacc_w > 0
        if "window_naccept" in state:
            # only update a pre-existing key: introducing one would change
            # the output pytree structure vs the input and force jitted
            # callers to recompile on their second call
            out["window_naccept"] = state["window_naccept"] + nacc_w
        return out

    return fn
