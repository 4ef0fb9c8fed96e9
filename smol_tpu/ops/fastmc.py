"""Fast TPU Metropolis path: zero-gather, matmul + compare-select kernels.

Dynamic gathers/scatters are pathologically slow on TPU; this module
re-formulates the MC hot loop so that NO dynamic gather ever executes:

- all per-site static data (local cluster site lists, tensor strides,
  coefficient-folded energy tables, chemical-potential rows) are packed into
  one matrix and row-selected with a one-hot MXU matmul, which is bit-exact
  (the f64 energy tables are split into two f32 planes, each selected
  exactly and recombined);
- the occupancy lives as 4-bit codes packed into uint32 words (<= 16
  species per site; 1-bit words when every sublattice is binary), so
  reading a site's code is a compare-select over the words plus a shift,
  not a gather;
- per-cluster correlation-tensor values are selected by comparing the
  computed tensor index against a small iota (tensor sizes <= 128); for
  all-binary systems, precomputed f64 difference tables are indexed by the
  compact code m = sum_j occ_j 2^j and selected on the MXU in native bf16
  via an exact three-way bf16 split of each f32 plane.

Per-chain sequential Metropolis semantics are preserved exactly; the energy
delta equals the reference's native kernel output to f64 roundoff
(validated ~1e-13 over thousands of accumulated steps).

Measured on a TPU v5e chip (112-site spinel pair+triplet CE, 8192
walkers): ~36 M flip-attempts/s vs ~0.3 M for the naive XLA gather
formulation.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import Partial

__all__ = [
    "FastTables",
    "build_fast_tables",
    "pack_occupancy",
    "unpack_occupancy",
    "make_fast_flip_step",
    "make_fast_swap_step",
]

_P = jax.lax.Precision.HIGHEST
_ROW_SELECT = "matmul"  # "matmul" (one-hot MXU select) or "gather"
MAX_CODES = 16  # 4-bit nibble packing
MAX_TENSOR = 128  # compare-select domain for tensor indices


@dataclass(frozen=True)
class FastTables:
    """Static device tables for the fast step (see module docstring).

    Table rows are indexed by active-site RANK (position in the
    concatenation of the active sublattices' site lists), not by site id:
    inactive sites contribute no rows, which shrinks the dominant one-hot
    row-select matmuls (e.g. 112 -> 48 rows on the spinel benchmark).
    """

    num_sites: int
    num_words: int
    num_ranks: int  # R: total active sites across sublattices
    n_local: int  # L: padded local clusters per site
    k_other: int  # Ko: padded non-self sites per cluster (K - 1)
    tensor_max: int  # Tmax: padded tensor size
    # ONE fused table selected by a single one-hot matmul per step.
    # General layout ([R, L*Ko + L*Ko + L + C + 2*L*Tmax] f32):
    #   sites_other | strides_other | d2 | mu (+ mu correction) | g_hi | g_lo
    # Binary layout ([R, L*Ko + C (+C)] f32):
    #   sites_other | mu (+ mu correction)
    # with the energy planes in a separate bf16 matrix (see planes_bf):
    # strides and d2 are unnecessary because the compact tensor index is
    # m = sum_j occ_j * 2^j over the non-self slots.
    big: jnp.ndarray
    mu_offset: int  # column where mu rows start
    plane_offset: int  # column where the energy planes start (general)
    binary: bool  # binary compact layout + difference planes
    sub_n_codes: jnp.ndarray  # [S] int32 allowed codes per sublattice
    has_mu: bool
    max_code_cols: int
    # active-site tables per sublattice for proposals
    active_sites: jnp.ndarray  # [S, A] int32 padded 0
    n_active: jnp.ndarray  # [S] int32
    sub_offset: jnp.ndarray  # [S] int32 rank offset of each sublattice
    cum_probs: jnp.ndarray  # [S] f64
    # binary path: difference tables Dc[r, l, m] = g(m-state flipped up) -
    # g(m-state), m the compact index, stored as SIX exact bf16 planes
    # (hi = b0+b1+b2, lo = b3+b4+b5; each f32 plane splits exactly into
    # three bf16 terms, and a one-hot matmul in native bf16 selects each
    # term exactly) -> [R, 6 * L * tmax_c] bf16
    planes_bf: jnp.ndarray = field(default=None)
    tmax_c: int = 0  # compact tensor width (2**Ko)


# FastTables is a pytree: array fields are leaves, static config is aux
# data.  Step functions built from it are jax.tree_util.Partial pytrees, so
# systems that differ only in table VALUES (e.g. a temperature sweep of
# samplers, or the per-shape kernels of an SQS search) share one XLA
# compilation of the chain driver.
_FT_ARRAY_FIELDS = (
    "big", "sub_n_codes", "active_sites", "n_active", "sub_offset",
    "cum_probs", "planes_bf",
)
_FT_STATIC_FIELDS = tuple(
    f.name for f in fields(FastTables) if f.name not in _FT_ARRAY_FIELDS
)


def _ft_flatten(t):
    return (
        tuple(getattr(t, n) for n in _FT_ARRAY_FIELDS),
        tuple(getattr(t, n) for n in _FT_STATIC_FIELDS),
    )


def _ft_unflatten(aux, leaves):
    kwargs = dict(zip(_FT_ARRAY_FIELDS, leaves))
    kwargs.update(zip(_FT_STATIC_FIELDS, aux))
    return FastTables(**kwargs)


jax.tree_util.register_pytree_node(FastTables, _ft_flatten, _ft_unflatten)


def site_local_arrays(processor):
    """Raw per-site local-cluster arrays of a packed processor.

    Returns (sites [N, L, K], strides [N, L, K], d2 [N, L],
    g [N, L, Tmax] f64 coefficient-folded energy tables, tmax) or None when
    the processor does not expose packed energy tables.
    """
    if not getattr(processor, "fast_path_ok", False):
        return None
    packed = getattr(processor, "packed", None)
    energy_flat = getattr(processor, "_energy_flat", None)
    energy_weights = getattr(processor, "_energy_weights", None)
    if packed is None or energy_flat is None:
        return None
    n = packed.num_sites
    lc = packed.local_clusters
    L = lc.shape[1]
    K = packed.cluster_sites.shape[1]
    tmax = int(packed.orbit_tensor_size.max())
    valid = lc >= 0
    lc_safe = np.where(valid, lc, 0)
    sites = packed.cluster_sites[lc_safe] * valid[:, :, None]
    strides = packed.cluster_strides[lc_safe] * valid[:, :, None]
    orb = packed.cluster_orbit[lc_safe]
    g = np.zeros((n, L, tmax))
    off = packed.orbit_offset
    ts_all = packed.orbit_tensor_size
    for i in range(n):
        for l in range(L):
            if valid[i, l]:
                o = orb[i, l]
                ts = int(ts_all[o])
                g[i, l, :ts] = (
                    energy_weights[o] * energy_flat[off[o]: off[o] + ts]
                )
    d2 = np.zeros((n, L))
    cs, cst = packed.cluster_sites, packed.cluster_strides
    for i in range(n):
        for l in range(L):
            if valid[i, l]:
                c = lc[i, l]
                d2[i, l] = sum(
                    cst[c, k] for k in range(K) if cs[c, k] == i and cst[c, k] > 0
                )
    return sites, strides, d2, g, tmax


def build_fast_tables(processor, sublattices, mu_table=None,
                      sublattice_probabilities=None):
    """Build FastTables from a packed processor, or None when unsupported.

    Requirements: processor exposes ``packed``/``_energy_flat``/
    ``_energy_weights`` (or is a composite of such + Ewald is NOT yet
    supported on the fast path), <= 16 codes per site, tensor sizes <= 128,
    and default (arange) sublattice encodings.
    """
    arrays = site_local_arrays(processor)
    if arrays is None:
        return None
    sites3, strides3, d2, g3, tmax = arrays
    packed = processor.packed
    n = packed.num_sites
    L = sites3.shape[1]
    K = sites3.shape[2]
    if tmax > MAX_TENSOR:
        return None

    active = [s for s in sublattices if s.is_active]
    if not active:
        return None
    for s in active:
        if not np.array_equal(s.encoding, np.arange(len(s.encoding))):
            return None

    # every valid local cluster must carry a positive self stride so that
    # the self slot can be folded into d2
    valid_cluster = strides3.sum(axis=2) > 0
    if np.any(valid_cluster & (d2 <= 0)):
        return None
    ko = max(K - 1, 1)
    sites_o = np.zeros((n, L, ko), dtype=np.int64)
    strides_o = np.zeros((n, L, ko), dtype=np.int64)
    for i in range(n):
        for l in range(L):
            kk = 0
            for k in range(K):
                st = strides3[i, l, k]
                if st > 0 and sites3[i, l, k] != i:
                    if kk >= ko:
                        return None
                    sites_o[i, l, kk] = sites3[i, l, k]
                    strides_o[i, l, kk] = st
                    kk += 1

    n_codes = np.ones(n, dtype=np.int32)
    for s in sublattices:
        n_codes[s.sites] = len(s.encoding)
    if np.max(n_codes) > MAX_CODES:
        return None

    sub_n_codes_all = sorted(
        {len(s.encoding) for s in sublattices if s.is_active}
    )
    # 1-bit packing requires EVERY site's code (including frozen/inactive
    # sublattices) to fit one bit
    binary = sub_n_codes_all == [2] and all(
        len(s.encoding) <= 2 and int(np.max(s.encoding, initial=0)) <= 1
        for s in sublattices
    )

    max_code_cols = 0
    has_mu = mu_table is not None
    if binary:
        cols = [sites_o.reshape(n, L * ko)]
        mu_offset = L * ko
    else:
        cols = [sites_o.reshape(n, L * ko), strides_o.reshape(n, L * ko), d2]
        mu_offset = 2 * L * ko + L
    if has_mu:
        max_code_cols = mu_table.shape[1]
        cols.append(np.asarray(mu_table, dtype=np.float64))
    big = np.concatenate(cols, axis=1).astype(np.float32)
    if has_mu:
        # mu values must be exactly representable in f32 for the matmul
        # row-select to stay exact; keep an f64 correction plane if not
        mu32 = big[:, mu_offset:].astype(np.float64)
        if not np.allclose(mu32, np.asarray(mu_table), rtol=0, atol=0):
            # append a correction plane
            corr = (np.asarray(mu_table) - mu32).astype(np.float32)
            big = np.concatenate([big, corr], axis=1)
    plane_offset = big.shape[1]

    if sublattice_probabilities is None:
        probs = np.full(len(active), 1.0 / len(active))
    else:
        probs = np.asarray(sublattice_probabilities, dtype=np.float64)
    amax = max(len(s.active_sites) for s in active)
    act = np.zeros((len(active), amax), dtype=np.int32)
    nact = np.zeros(len(active), dtype=np.int32)
    for i, s in enumerate(active):
        act[i, : len(s.active_sites)] = s.active_sites
        nact[i] = len(s.active_sites)

    # compact table rows to active sites, ordered by rank
    rank_sites = np.concatenate(
        [np.asarray(s.active_sites, dtype=np.int64) for s in active]
    )
    sub_offset = np.concatenate([[0], np.cumsum(nact)[:-1]]).astype(np.int32)
    sub_n_codes = np.array([len(s.encoding) for s in active], dtype=np.int32)

    planes_bf = None
    tmax_c = 0
    if binary:
        # compact difference tables: Dc[i, l, m] = g(t(m) + d2) - g(t(m))
        # where m = sum_j occ_j * 2**j over the Ko non-self slots and
        # t(m) = sum_j occ_j * stride_j (self code 0)
        tmax_c = 2 ** ko
        dc = np.zeros((n, L, tmax_c))
        d2i = d2.astype(np.int64)
        for i in range(n):
            for l in range(L):
                d = int(d2i[i, l])
                if d <= 0:
                    continue
                for m in range(tmax_c):
                    tt = sum(
                        ((m >> j) & 1) * int(strides_o[i, l, j])
                        for j in range(ko)
                    )
                    dc[i, l, m] = g3[i, l, tt + d] - g3[i, l, tt]
        dcf = dc.reshape(n, L * tmax_c)
        hi32 = dcf.astype(np.float32)
        lo32 = (dcf - hi32.astype(np.float64)).astype(np.float32)

        def split3(x32):
            # numpy has no bfloat16; do the exact 3-way split via jax
            import jax.numpy as _jnp
            xb = _jnp.asarray(x32)
            p0 = xb.astype(_jnp.bfloat16)
            r1 = (xb - p0.astype(_jnp.float32))
            p1 = r1.astype(_jnp.bfloat16)
            r2 = (r1 - p1.astype(_jnp.float32))
            p2 = r2.astype(_jnp.bfloat16)
            resid = r2 - p2.astype(_jnp.float32)
            ok = bool((resid == 0).all())
            return [np.asarray(p) for p in (p0, p1, p2)], ok

        (h0, h1, h2), ok_h = split3(hi32)
        (l0, l1, l2), ok_l = split3(lo32)
        if ok_h and ok_l:
            planes_np = np.concatenate([h0, h1, h2, l0, l1, l2], axis=1)
            planes_bf = jnp.asarray(planes_np[rank_sites])
        else:  # exactness of the 3-way split failed: general path
            binary = False
            tmax_c = 0

    if not binary:
        # general layout keeps strides/d2 and appends f32 value planes
        if sub_n_codes_all == [2] and planes_bf is None:
            # binary fell back: rebuild big with the general layout
            cols = [
                sites_o.reshape(n, L * ko), strides_o.reshape(n, L * ko), d2
            ]
            mu_offset = 2 * L * ko + L
            if has_mu:
                cols.append(np.asarray(mu_table, dtype=np.float64))
            big = np.concatenate(cols, axis=1).astype(np.float32)
            if has_mu:
                mu32 = big[:, mu_offset:].astype(np.float64)
                if not np.allclose(mu32, np.asarray(mu_table), rtol=0, atol=0):
                    corr = (np.asarray(mu_table) - mu32).astype(np.float32)
                    big = np.concatenate([big, corr], axis=1)
            plane_offset = big.shape[1]
        pf = g3.reshape(n, L * tmax)
        p_hi = pf.astype(np.float32)
        p_lo = (pf - p_hi.astype(np.float64)).astype(np.float32)
        big = np.concatenate([big, p_hi, p_lo], axis=1)

    return FastTables(
        num_sites=n,
        num_words=(n + 31) // 32 if binary else (n + 7) // 8,
        num_ranks=len(rank_sites),
        n_local=L,
        k_other=ko,
        tensor_max=tmax,
        big=jnp.asarray(big[rank_sites]),
        mu_offset=mu_offset,
        plane_offset=plane_offset,
        binary=binary,
        sub_n_codes=jnp.asarray(sub_n_codes),
        has_mu=has_mu,
        max_code_cols=max_code_cols,
        active_sites=jnp.asarray(act),
        n_active=jnp.asarray(nact),
        sub_offset=jnp.asarray(sub_offset),
        cum_probs=jnp.asarray(np.cumsum(probs)),
        planes_bf=planes_bf,
        tmax_c=tmax_c,
    )


def pack_occupancy(occu, num_sites: int, code_bits: int = 4) -> jnp.ndarray:
    """Pack [W, N] int codes into uint32 words (4-bit nibbles or 1-bit)."""
    per = 32 // code_bits
    occu = jnp.asarray(occu, dtype=jnp.uint32)
    nw = (num_sites + per - 1) // per
    pad = nw * per - num_sites
    if pad:
        occu = jnp.pad(occu, ((0, 0), (0, pad)))
    shifts = (jnp.arange(nw * per, dtype=jnp.uint32) % per) * code_bits
    bits = occu << shifts[None, :]
    # keep uint32: jnp.sum would promote unsigned ints to uint64 under x64
    return bits.reshape(occu.shape[0], nw, per).sum(axis=2, dtype=jnp.uint32)


def unpack_occupancy(words, num_sites: int, code_bits: int = 4) -> jnp.ndarray:
    """Inverse of pack_occupancy -> [W, N] int32 (static indexing only)."""
    per = 32 // code_bits
    mask = (1 << code_bits) - 1
    widx = np.arange(num_sites) // per
    shifts = jnp.asarray(
        ((np.arange(num_sites) % per) * code_bits).astype(np.uint32)
    )
    return ((words[:, widx] >> shifts[None, :]) & mask).astype(jnp.int32)


def _read_site_code(words, site, iota_w, code_bits=4):
    """Code at a dynamic site: compare-select word + shift (no gather)."""
    per_shift = {4: 3, 1: 5}[code_bits]  # log2(codes per word)
    mask = (1 << code_bits) - 1
    sw = (site >> per_shift).astype(jnp.uint32)
    word = jnp.sum(
        jnp.where(sw[:, None] == iota_w[None, :], words, jnp.uint32(0)),
        axis=1, dtype=jnp.uint32,
    )
    sh = (site.astype(jnp.uint32) & ((1 << per_shift) - 1)) * code_bits
    return ((word >> sh) & mask).astype(jnp.int32), word


def _write_site_code(words, site, code, word_s, accept, iota_w, code_bits=4):
    """Masked packed write of a site's code (no scatter)."""
    per_shift = {4: 3, 1: 5}[code_bits]
    mask_v = jnp.uint32((1 << code_bits) - 1)
    sh = (site.astype(jnp.uint32) & ((1 << per_shift) - 1)) * code_bits
    new_word = (word_s & ~(mask_v << sh)) | (code.astype(jnp.uint32) << sh)
    sw = (site >> per_shift).astype(jnp.uint32)
    mask = (sw[:, None] == iota_w[None, :]) & accept[:, None]
    return jnp.where(mask, new_word[:, None], words)


def _flip_delta(words, rank, a, b, t: FastTables):
    """Exact f64 energy change of flipping the site of active rank ``rank``
    from code ``a`` to ``b``.  Returns (delta_e, delta_mu_work), both [W].

    One one-hot MXU matmul selects the rank's entire fused table row
    (neighbor slots, strides, d2, mu, energy planes); the occupancy of the
    non-self slots is read by compare-select over the packed words; the
    energy contribution per local cluster is selected from the planes by
    comparing the tensor index against a small iota.
    """
    W = words.shape[0]
    L, Ko, tmax = t.n_local, t.k_other, t.tensor_max
    LK = L * Ko
    LT = L * tmax
    iota_w = jnp.arange(t.num_words, dtype=jnp.uint32)
    iota_t = jnp.arange(tmax, dtype=jnp.int32)

    if _ROW_SELECT == "gather":
        rows = jnp.take(t.big, rank, axis=0)
        oh = None
    else:
        oh = jax.nn.one_hot(rank, t.num_ranks, dtype=jnp.float32)
        rows = jax.lax.dot(oh, t.big, precision=_P)
    sites = rows[:, :LK].astype(jnp.uint32)

    if t.binary:  # 1-bit packing: 32 sites per word
        widx = sites >> 5
        sh = sites & 31
        code_mask = jnp.uint32(1)
    else:  # 4-bit nibbles
        widx = sites >> 3
        sh = (sites & 7) * 4
        code_mask = jnp.uint32(15)
    wsel = jnp.sum(
        jnp.where(
            widx[:, :, None] == iota_w[None, None, :],
            words[:, None, :],
            jnp.uint32(0),
        ),
        axis=2,
    )
    occv = ((wsel >> sh) & code_mask).astype(jnp.int32)

    if t.binary:
        # compact binary index m = sum_j occ_j * 2^j over non-self slots;
        # difference planes selected by a native-bf16 one-hot matmul (the
        # 3-way bf16 split of each f32 plane makes the select bit-exact)
        tc = t.tmax_c
        LTc = L * tc
        occ3 = occv.reshape(W, L, Ko)
        m_idx = occ3[:, :, 0]
        for j in range(1, Ko):
            m_idx = m_idx + (occ3[:, :, j] << j)
        if oh is None:
            p = jnp.take(t.planes_bf, rank, axis=0).astype(jnp.float32)
        else:
            p = jax.lax.dot(
                oh.astype(jnp.bfloat16),
                t.planes_bf,
                preferred_element_type=jnp.float32,
            )
        d_hi_t = p[:, :LTc] + p[:, LTc: 2 * LTc] + p[:, 2 * LTc: 3 * LTc]
        d_lo_t = (
            p[:, 3 * LTc: 4 * LTc]
            + p[:, 4 * LTc: 5 * LTc]
            + p[:, 5 * LTc: 6 * LTc]
        )
        iota_c = jnp.arange(tc, dtype=jnp.int32)
        sel = m_idx[:, :, None] == iota_c[None, None, :]
        sign = (b - a).astype(jnp.float32)[:, None]
        d_hi = sign * jnp.sum(
            jnp.where(sel, d_hi_t.reshape(W, L, tc), 0.0), axis=2
        )
        d_lo = sign * jnp.sum(
            jnp.where(sel, d_lo_t.reshape(W, L, tc), 0.0), axis=2
        )
        de = jnp.sum(
            d_hi.astype(jnp.float64) + d_lo.astype(jnp.float64), axis=1
        )
    else:
        strides = rows[:, LK: 2 * LK].astype(jnp.int32)
        d2 = rows[:, 2 * LK: 2 * LK + L].astype(jnp.int32)
        partial = jnp.sum((occv * strides).reshape(W, L, Ko), axis=2)
        t_old = partial + a[:, None] * d2
        t_new = t_old + (b - a)[:, None] * d2
        po = t.plane_offset
        ghi = rows[:, po: po + LT].reshape(W, L, tmax)
        glo = rows[:, po + LT: po + 2 * LT].reshape(W, L, tmax)
        sel_new = t_new[:, :, None] == iota_t[None, None, :]
        sel_old = t_old[:, :, None] == iota_t[None, None, :]
        hi_new = jnp.sum(jnp.where(sel_new, ghi, 0.0), axis=2).astype(jnp.float64)
        hi_old = jnp.sum(jnp.where(sel_old, ghi, 0.0), axis=2).astype(jnp.float64)
        lo_new = jnp.sum(jnp.where(sel_new, glo, 0.0), axis=2).astype(jnp.float64)
        lo_old = jnp.sum(jnp.where(sel_old, glo, 0.0), axis=2).astype(jnp.float64)
        de = jnp.sum((hi_new - hi_old) + (lo_new - lo_old), axis=1)

    dwork = jnp.float64(0.0)
    if t.has_mu:
        c0 = t.mu_offset
        mu_rows = rows[:, c0: c0 + t.max_code_cols].astype(jnp.float64)
        if t.plane_offset > c0 + t.max_code_cols:  # correction plane
            mu_rows = mu_rows + rows[
                :, c0 + t.max_code_cols: c0 + 2 * t.max_code_cols
            ].astype(jnp.float64)
        iota_c = jnp.arange(t.max_code_cols, dtype=jnp.int32)
        mu_new = jnp.sum(
            jnp.where(b[:, None] == iota_c[None, :], mu_rows, 0.0), axis=1
        )
        mu_old = jnp.sum(
            jnp.where(a[:, None] == iota_c[None, :], mu_rows, 0.0), axis=1
        )
        dwork = mu_new - mu_old
    return de, dwork


def make_fast_flip_step(t: FastTables):
    """Semigrand single-flip Metropolis step over packed walker state.

    State: words [W, NW] uint32, enthalpy [W] f64, beta [W] f64,
    accepted [W] bool, naccept [W] int32.  Returned as a Partial over the
    FastTables pytree: same-shape systems share one compilation.
    """
    return Partial(_fast_flip_step, t)


def _fast_flip_step(t, state, key):
    cb = 1 if t.binary else 4
    iota_w = jnp.arange(t.num_words, dtype=jnp.uint32)
    n_sub = t.active_sites.shape[0]
    amax = t.active_sites.shape[1]
    iota_a = jnp.arange(amax, dtype=jnp.int32)
    iota_s = jnp.arange(n_sub)

    def step(state, key):
        words = state["words"]
        W = words.shape[0]
        k_sl, k_site, k_code, k_acc = jax.random.split(key, 4)
        u_sl = jax.random.uniform(k_sl, (W,))
        from smol_tpu.ops.mc import searchsorted_right

        sl = searchsorted_right(t.cum_probs, u_sl).astype(jnp.int32)
        sl_oh = sl[:, None] == iota_s[None, :]  # [W, S]
        n_act = jnp.sum(jnp.where(sl_oh, t.n_active[None, :], 0), axis=1)
        ai = jax.random.randint(k_site, (W,), 0, n_act)
        # site = active_sites[sl, ai] via two compare-selects
        row = jnp.sum(
            jnp.where(sl_oh[:, :, None], t.active_sites[None, :, :], 0),
            axis=1,
        )  # [W, A]
        s = jnp.sum(jnp.where(ai[:, None] == iota_a[None, :], row, 0), axis=1)
        rank = jnp.sum(jnp.where(sl_oh, t.sub_offset[None, :], 0), axis=1) + ai

        a, word_s = _read_site_code(words, s, iota_w, cb)
        ncod = jnp.sum(jnp.where(sl_oh, t.sub_n_codes[None, :], 0), axis=1)
        j = jax.random.randint(k_code, (W,), 0, jnp.maximum(ncod - 1, 1))
        b = j + (j >= a)

        de, dwork = _flip_delta(words, rank, a, b, t)
        dh = de - dwork if t.has_mu else de
        u = jax.random.uniform(k_acc, (W,), dtype=jnp.float64)
        accept = (dh * -state["beta"] >= 0) | (-state["beta"] * dh > jnp.log(u))

        words = _write_site_code(words, s, b, word_s, accept, iota_w, cb)
        out = dict(state)
        out["words"] = words
        out["enthalpy"] = state["enthalpy"] + jnp.where(accept, dh, 0.0)
        out["accepted"] = accept
        out["naccept"] = state["naccept"] + accept.astype(jnp.int32)
        return out

    return step(state, key)


def make_fast_swap_step(t: FastTables):
    """Canonical two-site swap Metropolis step over packed walker state.

    Returned as a Partial over the FastTables pytree (shared compilation
    across same-shape systems).
    """
    return Partial(_fast_swap_step, t)


def _fast_swap_step(t, state, key):
    cb = 1 if t.binary else 4
    iota_w = jnp.arange(t.num_words, dtype=jnp.uint32)
    n_sub = t.active_sites.shape[0]
    amax = t.active_sites.shape[1]
    iota_a = jnp.arange(amax, dtype=jnp.int32)
    iota_s = jnp.arange(n_sub)

    def step(state, key):
        words = state["words"]
        W = words.shape[0]
        k_sl, k_site, k_pick, k_acc = jax.random.split(key, 4)
        u_sl = jax.random.uniform(k_sl, (W,))
        from smol_tpu.ops.mc import searchsorted_right

        sl = searchsorted_right(t.cum_probs, u_sl).astype(jnp.int32)
        sl_oh = sl[:, None] == iota_s[None, :]  # [W, S]
        n_act = jnp.sum(jnp.where(sl_oh, t.n_active[None, :], 0), axis=1)
        row = jnp.sum(
            jnp.where(sl_oh[:, :, None], t.active_sites[None, :, :], 0),
            axis=1,
        )  # [W, A] active sites of the chosen sublattice
        off = jnp.sum(jnp.where(sl_oh, t.sub_offset[None, :], 0), axis=1)
        ai = jax.random.randint(k_site, (W,), 0, n_act)
        s1 = jnp.sum(jnp.where(ai[:, None] == iota_a[None, :], row, 0), axis=1)
        rank1 = off + ai
        sp1, word_s1 = _read_site_code(words, s1, iota_w, cb)

        # occupancies of all active sites in the chosen sublattice
        if cb == 1:
            widx = (row >> 5).astype(jnp.uint32)
        else:
            widx = (row >> 3).astype(jnp.uint32)
        wsel = jnp.sum(
            jnp.where(
                widx[:, :, None] == iota_w[None, None, :],
                words[:, None, :],
                jnp.uint32(0),
            ),
            axis=2,
        )
        if cb == 1:
            occ_row = ((wsel >> (row.astype(jnp.uint32) & 31)) & 1).astype(
                jnp.int32
            )
        else:
            occ_row = (
                (wsel >> ((row.astype(jnp.uint32) & 7) * 4)) & 15
            ).astype(jnp.int32)
        mask = (iota_a[None, :] < n_act[:, None]) & (occ_row != sp1[:, None])
        count = jnp.sum(mask, axis=1)
        m = jax.random.randint(k_pick, (W,), 0, jnp.maximum(count, 1))
        cum = jnp.cumsum(mask, axis=1)
        pick = mask & (cum == (m + 1)[:, None])
        s2 = jnp.sum(jnp.where(pick, row, 0), axis=1)
        rank2 = off + jnp.sum(jnp.where(pick, iota_a[None, :], 0), axis=1)
        sp2 = jnp.sum(jnp.where(pick, occ_row, 0), axis=1)
        has = count > 0

        # flip 1: s1 -> sp2 ; flip 2 (on updated words): s2 -> sp1
        de1, dw1 = _flip_delta(words, rank1, sp1, sp2, t)
        words1 = _write_site_code(words, s1, sp2, word_s1, has, iota_w, cb)
        sp2_check, word_s2 = _read_site_code(words1, s2, iota_w, cb)
        de2, dw2 = _flip_delta(words1, rank2, sp2_check, sp1, t)
        dh = de1 + de2
        if t.has_mu:
            dh = dh - (dw1 + dw2)
        dh = jnp.where(has, dh, 0.0)

        u = jax.random.uniform(k_acc, (W,), dtype=jnp.float64)
        expo = -state["beta"] * dh
        # an empty step (no swap partner) has dh = 0 and is "accepted" with
        # no state change, mirroring the reference (mcusher.py:194-200)
        metro = (expo >= 0) | (expo > jnp.log(u))
        accept = metro
        do_swap = has & metro
        words2 = _write_site_code(
            words1, s2, sp1, word_s2, do_swap, iota_w, cb
        )
        # revert flip 1 where the swap does not go through
        _, word_s1b = _read_site_code(words2, s1, iota_w, cb)
        words_out = _write_site_code(
            words2, s1, sp1, word_s1b, has & ~metro, iota_w, cb
        )

        out = dict(state)
        out["words"] = words_out
        out["enthalpy"] = state["enthalpy"] + jnp.where(do_swap, dh, 0.0)
        out["accepted"] = accept
        out["naccept"] = state["naccept"] + accept.astype(jnp.int32)
        if "nmove" in state:
            # this path conditions the partner on a different species, so
            # every proposal with an available partner is a real move
            out["nmove"] = state["nmove"] + has.astype(jnp.int32)
        return out

    return step(state, key)


# ---------------------------------------------------------------------------
# Ewald electrostatics on the fast path (general codes)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class EwaldFlipTables:
    """Zero-gather Ewald single-flip deltas for arbitrary site codes.

    dE(site s: a -> b) = 2 (V[r_b] - V[r_a]) . bvec + Q[s, b, a], where
    bvec is the occupied-row indicator of the current occupancy (which
    includes r_a; the constant Q absorbs the self/cross corrections:
    Q = M[r_b,r_b] + M[r_a,r_a] - 2 M[r_b,r_a], vacancy rows = 0).
    All rows are coefficient-folded.  Reference: the O(N) row sweep
    smol/utils/cluster/ewald.pyx:9-58, reformulated as one-hot matmuls
    (XLA TPU dynamic gathers are near-scalar under vmap).

    Numerical contract: hi/lo f32 split rows with f32 accumulation —
    acceptance-grade (~1e-6 relative); recorded trace enthalpies are
    recomputed exactly at thinning points (sampler record path).
    """

    n_ew: int  # padded row count (last row = zero/vacancy)
    inds: jnp.ndarray  # [N, Cmax] int32 ewald row of (site, code); n_ew=vac
    vrow_hi: jnp.ndarray  # [n_ew + 1, n_ew + 1] f32 2*coef*M rows (pad 0)
    vrow_lo: jnp.ndarray  # [n_ew + 1, n_ew + 1] f32
    q: jnp.ndarray  # [N, Cmax, Cmax] f32  Q[s, b, a]
    bmats: tuple  # per-code static placement matrices [N, n_ew + 1] f32


_EW_ARRAY_FIELDS = ("inds", "vrow_hi", "vrow_lo", "q", "bmats")


jax.tree_util.register_pytree_node(
    EwaldFlipTables,
    lambda e: (
        tuple(getattr(e, f) for f in _EW_ARRAY_FIELDS),
        (e.n_ew,),
    ),
    lambda aux, leaves: EwaldFlipTables(
        n_ew=aux[0], **dict(zip(_EW_ARRAY_FIELDS, leaves))
    ),
)


def build_ewald_flip_tables(ewald_proc, num_sites: int, cmax: int):
    """Build EwaldFlipTables from an EwaldProcessor, or None."""
    M = np.asarray(ewald_proc.ewald_matrix, dtype=np.float64)
    inds_raw = np.asarray(ewald_proc._ewald_inds)
    coef = float(np.atleast_1d(ewald_proc.coefs)[0])
    n_ew = M.shape[0]
    inds = np.full((num_sites, cmax), n_ew, dtype=np.int64)
    for s in range(num_sites):
        for c in range(min(cmax, inds_raw.shape[1])):
            r = int(inds_raw[s, c])
            if 0 <= r < n_ew:
                inds[s, c] = r
    # 2*coef*M rows, zero-padded vacancy row/column
    V = np.zeros((n_ew + 1, n_ew + 1), dtype=np.float64)
    V[:n_ew, :n_ew] = 2.0 * coef * M
    vh = V.astype(np.float32)
    vl = (V - vh.astype(np.float64)).astype(np.float32)
    Mp = np.zeros((n_ew + 1, n_ew + 1), dtype=np.float64)
    Mp[:n_ew, :n_ew] = M
    q = np.zeros((num_sites, cmax, cmax), dtype=np.float64)
    for s in range(num_sites):
        for b in range(cmax):
            for a in range(cmax):
                rb, ra = inds[s, b], inds[s, a]
                q[s, b, a] = coef * (
                    Mp[rb, rb] + Mp[ra, ra] - 2.0 * Mp[rb, ra]
                )
    bmats = []
    for c in range(cmax):
        B = np.zeros((num_sites, n_ew + 1), dtype=np.float32)
        B[np.arange(num_sites), inds[:, c]] = 1.0
        B[:, n_ew] = 0.0  # vacancies contribute nothing
        bmats.append(jnp.asarray(B))
    return EwaldFlipTables(
        n_ew=n_ew,
        inds=jnp.asarray(inds.astype(np.int32)),
        vrow_hi=jnp.asarray(vh),
        vrow_lo=jnp.asarray(vl),
        q=jnp.asarray(q.astype(np.float32)),
        bmats=tuple(bmats),
    )


def ewald_bvec(occu, et: EwaldFlipTables):
    """Occupied-row indicator [W, n_ew + 1] f32 from occupancies [W, N]."""
    out = None
    for c, B in enumerate(et.bmats):
        x = (occu == c).astype(jnp.float32)
        term = jax.lax.dot(x, B, precision=jax.lax.Precision.HIGHEST)
        out = term if out is None else out + term
    return out


def _ewald_row_of(site, code, et: EwaldFlipTables):
    """r(site, code) [W] via two-level one-hot select (gather-free)."""
    N, C = et.inds.shape
    row = jnp.sum(
        jnp.where(
            (site[:, None] == jnp.arange(N)[None, :])[:, :, None],
            et.inds[None, :, :], 0,
        ),
        axis=1,
    )  # [W, C]
    return jnp.sum(
        jnp.where(code[:, None] == jnp.arange(C)[None, :], row, 0), axis=1
    )


def ewald_flip_delta(bvec, site, a, b, et: EwaldFlipTables):
    """dE [W] f32-split and the bvec increment for applying the flip."""
    ra = _ewald_row_of(site, a, et)
    rb = _ewald_row_of(site, b, et)
    oh_a = (ra[:, None] == jnp.arange(et.n_ew + 1)[None, :]).astype(
        jnp.float32
    )
    oh_b = (rb[:, None] == jnp.arange(et.n_ew + 1)[None, :]).astype(
        jnp.float32
    )
    doh = oh_b - oh_a
    vh = jax.lax.dot(doh, et.vrow_hi, precision=jax.lax.Precision.HIGHEST)
    vl = jax.lax.dot(doh, et.vrow_lo, precision=jax.lax.Precision.HIGHEST)
    dot = jnp.sum((vh + vl) * bvec, axis=1)
    # Q[site, b, a] via one-hot over (site), then (b, a)
    N, C = et.inds.shape
    q_site = jnp.sum(
        jnp.where(
            (site[:, None] == jnp.arange(N)[None, :])[:, :, None, None],
            et.q[None, :, :, :], 0.0,
        ),
        axis=1,
    )  # [W, C, C]
    q_b = jnp.sum(
        jnp.where(
            (b[:, None] == jnp.arange(C)[None, :])[:, :, None], q_site, 0.0
        ),
        axis=1,
    )
    q_ba = jnp.sum(
        jnp.where(a[:, None] == jnp.arange(C)[None, :], q_b, 0.0), axis=1
    )
    de = (dot + q_ba).astype(jnp.float64)
    return de, doh


# ---------------------------------------------------------------------------
# fast TableFlip step: vectorized proposal + zero-gather sequential deltas
# ---------------------------------------------------------------------------


def make_fast_tableflip_step(
    t: FastTables,
    rank_map,
    propose_fn,
    priori_fn,
    ewald_tables: EwaldFlipTables | None = None,
):
    """Metropolis TableFlip step over packed walker state.

    ``propose_fn``/``priori_fn`` are the TableFlip usher's per-walker device
    functions; deltas run through the zero-gather one-hot machinery
    (_flip_delta) with sequential multi-slot semantics, plus an optional
    additive Ewald term.  Returned as a Partial pytree for shared
    compilation (slot width comes from the proposal output shape, the site
    count from the rank map length).
    """
    return Partial(
        _fast_tableflip_step,
        t,
        jnp.asarray(rank_map, dtype=jnp.int32),
        Partial(propose_fn) if not isinstance(propose_fn, Partial) else propose_fn,
        Partial(priori_fn) if not isinstance(priori_fn, Partial) else priori_fn,
        ewald_tables,
    )


def _fast_tableflip_step(t, rank_map, propose_fn, priori_fn, et, state, key):
    cb = 1 if t.binary else 4
    num_sites = rank_map.shape[0]
    iota_w = jnp.arange(t.num_words, dtype=jnp.uint32)
    words = state["words"]
    W = words.shape[0]
    occu = unpack_occupancy(words, num_sites, cb)

    k_prop, k_acc = jax.random.split(key)
    prop_keys = jax.random.split(k_prop, W)
    sites, codes, valid, _ = jax.vmap(propose_fn)(prop_keys, occu)
    logp = jax.vmap(priori_fn)(occu, sites, codes, valid)

    iota_n = jnp.arange(num_sites)
    dh = jnp.zeros(W, dtype=jnp.float64)
    words_new = words
    if et is not None:
        bvec = ewald_bvec(occu, et)
    for i in range(sites.shape[1]):
        site_i = sites[:, i]
        code_i = codes[:, i]
        v_i = valid[:, i]
        rank_i = jnp.sum(
            jnp.where(
                site_i[:, None] == iota_n[None, :], rank_map[None, :], 0
            ),
            axis=1,
        )
        a_i, word_s = _read_site_code(words_new, site_i, iota_w, cb)
        de, dwork = _flip_delta(words_new, rank_i, a_i, code_i, t)
        if et is not None:
            de_ew, doh = ewald_flip_delta(bvec, site_i, a_i, code_i, et)
            de = de + de_ew
            bvec = bvec + jnp.where(v_i[:, None], doh, 0.0)
        dh = dh + jnp.where(v_i, de - dwork, 0.0)
        words_new = _write_site_code(
            words_new, site_i, code_i, word_s, v_i, iota_w, cb
        )

    beta = state["beta"]
    expo = -beta * dh + logp
    u = jax.random.uniform(k_acc, (W,), dtype=jnp.float64)
    accept = (expo >= 0) | (expo > jnp.log(u))
    out = dict(state)
    out["words"] = jnp.where(accept[:, None], words_new, words)
    out["enthalpy"] = state["enthalpy"] + jnp.where(accept, dh, 0.0)
    out["accepted"] = accept
    out["naccept"] = state["naccept"] + accept.astype(jnp.int32)
    return out
