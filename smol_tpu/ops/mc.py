"""Device Monte Carlo machinery: proposals, kernels, scan drivers.

This is the TPU-native inversion of the reference's MC runtime: where smol
does a per-flip Python -> Cython round trip (smol/moca/sampler/sampler.py:164
-> kernel/base.py:145 -> evaluator.pyx), here the entire step loop lives on
device as a compiled ``lax.scan``, vmapped over walkers.  Per-chain Markov
semantics are preserved exactly — each walker is an independent sequential
chain; throughput comes from batching walkers, never from reordering flips.

Structure:
- :func:`sublattice_tables`: pack active sublattices into padded arrays.
- proposal makers (flip, swap, multistep, composite, table-flip elsewhere):
  pure per-walker functions ``(key, occu) -> (sites [S], codes [S],
  valid [S], log_priori)``.
- :func:`make_step_applier`: apply S flips sequentially against the evolving
  occupancy and accumulate the enthalpy change (and optionally feature
  deltas), matching the reference's sequential multi-flip semantics
  (processor/expansion.py:215-230).
- kernel step builders (Metropolis / UniformlyRandom / WangLandau) producing
  ``step(state, key) -> state`` over the batched walker state.
- :func:`run_chain`: scan nsamples x thin_by steps, recording thinned traces.

Compile-sharing design: every factory returns a :class:`jax.tree_util.Partial`
whose *function* has stable identity (module-level or ``lru_cache``'d on the
static configuration) and whose shape-specific arrays are bound pytree
leaves.  :func:`run_chain` passes such step functions as *traced* arguments,
so systems that differ only in table values (e.g. the many supercell shapes
of an SQS search, or the cells of a multicell kernel) share one XLA
compilation.  Factories fall back to plain closures (compiled per instance)
when handed non-Partial callables.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import Partial

__all__ = [
    "sublattice_tables",
    "make_flip_proposal",
    "make_swap_proposal",
    "make_multistep_proposal",
    "make_composite_proposal",
    "make_step_applier",
    "make_metropolis_step",
    "make_uniform_step",
    "make_wang_landau_step",
    "run_chain",
]


# ---------------------------------------------------------------------------
# sublattice tables
# ---------------------------------------------------------------------------


class SublatticeTables(NamedTuple):
    """Padded device arrays describing active sublattices (a pytree)."""

    active_sites: jnp.ndarray  # [S, A] int32, padded 0
    n_active: jnp.ndarray  # [S] int32
    encodings: jnp.ndarray  # [S, C] int32, padded 0
    n_codes: jnp.ndarray  # [S] int32
    cum_probs: jnp.ndarray  # [S] f64 cumulative selection probabilities


def sublattice_tables(sublattices, sublattice_probabilities=None) -> SublatticeTables:
    """Pack the ACTIVE sublattices into fixed-shape tables."""
    active = [s for s in sublattices if s.is_active]
    if not active:
        raise ValueError("No active sublattices.")
    if sublattice_probabilities is None:
        probs = np.full(len(active), 1.0 / len(active))
    else:
        probs = np.asarray(sublattice_probabilities, dtype=np.float64)
        if len(probs) != len(active):
            raise AttributeError(
                "Sublattice probabilities must match the number of active "
                "sublattices."
            )
        if abs(probs.sum() - 1) > 1e-12:
            raise ValueError("Sublattice probabilities must sum to one.")
    amax = max(len(s.active_sites) for s in active)
    cmax = max(len(s.encoding) for s in active)
    act = np.zeros((len(active), amax), dtype=np.int32)
    nact = np.zeros(len(active), dtype=np.int32)
    enc = np.zeros((len(active), cmax), dtype=np.int32)
    ncod = np.zeros(len(active), dtype=np.int32)
    for i, s in enumerate(active):
        act[i, : len(s.active_sites)] = s.active_sites
        nact[i] = len(s.active_sites)
        enc[i, : len(s.encoding)] = s.encoding
        ncod[i] = len(s.encoding)
    return SublatticeTables(
        active_sites=jnp.asarray(act),
        n_active=jnp.asarray(nact),
        encodings=jnp.asarray(enc),
        n_codes=jnp.asarray(ncod),
        cum_probs=jnp.asarray(np.cumsum(probs)),
    )


def searchsorted_right(cum, u):
    """``searchsorted(cum, u, side="right")`` as a compare-sum.

    XLA lowers searchsorted to a near-scalar while loop on TPU (~33 ms for
    2048 elements, measured); a vectorized compare-sum over the (small)
    sorted table does not.
    """
    return jnp.sum(
        (cum <= jnp.asarray(u)[..., None]).astype(jnp.int32), axis=-1
    )


def _choose_sublattice(key, tables: SublatticeTables):
    u = jax.random.uniform(key)
    return searchsorted_right(tables.cum_probs, u).astype(jnp.int32)


# ---------------------------------------------------------------------------
# gather-free selects
#
# On TPU, XLA lowers a vmapped DYNAMIC-index gather (traced scalar index
# into a per-walker or shared array) to a near-scalar loop: ~30 ms for 2048
# walkers even on a 2-element table (measured), which caps every XLA MC
# path.  STATIC-index gathers are fine.  These helpers replace dynamic
# indexing with vectorized one-hot compare-selects.
# ---------------------------------------------------------------------------


def sel_row(table, idx):
    """``table[idx]`` for a traced scalar ``idx``, gather-free."""
    T = table.shape[0]
    oh = (jnp.arange(T) == idx).reshape((T,) + (1,) * (table.ndim - 1))
    out = jnp.sum(jnp.where(oh, table, jnp.zeros_like(table)), axis=0)
    return out.astype(table.dtype)


def sel_vec(vec, idxs):
    """``vec[idxs]`` for 1-D ``vec`` and a traced index vector, gather-free."""
    oh = idxs[:, None] == jnp.arange(vec.shape[0])[None, :]
    out = jnp.sum(jnp.where(oh, vec[None, :], jnp.zeros_like(vec)[None, :]),
                  axis=1)
    return out.astype(vec.dtype)


def set_vec(vec, idxs, vals, mask):
    """``vec.at[idxs].set(vals)`` where ``mask``, scatter-free.

    Masked duplicate indices must not occur (every proposal maker emits
    distinct valid sites within one step).
    """
    hit = (idxs[:, None] == jnp.arange(vec.shape[0])[None, :]) & mask[:, None]
    newv = jnp.sum(
        jnp.where(hit, vals[:, None], jnp.zeros_like(vec)[None, :]), axis=0
    )
    return jnp.where(jnp.any(hit, axis=0), newv.astype(vec.dtype), vec)


# ---------------------------------------------------------------------------
# proposals
# ---------------------------------------------------------------------------


def _flip_propose(tables, key, occu):
    """Single-site flip to a different random allowed species (Flip usher)."""
    k_sl, k_site, k_code = jax.random.split(key, 3)
    sl = _choose_sublattice(k_sl, tables)
    i = jax.random.randint(k_site, (), 0, sel_row(tables.n_active, sl))
    site = sel_row(sel_row(tables.active_sites, sl), i)
    cur = sel_row(occu, site)
    codes = sel_row(tables.encodings, sl)
    pos = jnp.argmax(codes == cur)
    j = jax.random.randint(k_code, (), 0, sel_row(tables.n_codes, sl) - 1)
    j = j + (j >= pos)
    code = sel_row(codes, j)
    return (
        jnp.array([site], dtype=jnp.int32),
        jnp.array([code], dtype=jnp.int32),
        jnp.array([True]),
        jnp.float64(0.0),
    )


def make_flip_proposal(tables: SublatticeTables):
    """Single-site flip proposal (Flip usher)."""
    return Partial(_flip_propose, tables)


def _swap_propose(tables, key, occu):
    """Canonical two-site swap within one sublattice (Swap usher).

    Site 2 is uniform among active sites whose occupancy differs from
    site 1's (reference mcusher.py:176-200); the step is empty when no such
    site exists.
    """
    k_sl, k1, k2 = jax.random.split(key, 3)
    sl = _choose_sublattice(k_sl, tables)
    n_act = sel_row(tables.n_active, sl)
    i = jax.random.randint(k1, (), 0, n_act)
    act = sel_row(tables.active_sites, sl)  # [A]
    site1 = sel_row(act, i)
    occ_act = sel_vec(occu, act)  # [A]
    sp1 = sel_row(occ_act, i)
    in_range = jnp.arange(act.shape[0]) < n_act
    mask = in_range & (occ_act != sp1)
    count = jnp.sum(mask)
    m = jax.random.randint(k2, (), 0, jnp.maximum(count, 1))
    cum = jnp.cumsum(mask)
    j2 = jnp.argmax(mask & (cum == m + 1))
    site2 = sel_row(act, j2)
    has = count > 0
    sites = jnp.array([site1, site2], dtype=jnp.int32)
    codes = jnp.stack([sel_row(occ_act, j2), sp1]).astype(jnp.int32)
    return sites, codes, jnp.array([has, has]), jnp.float64(0.0)


def make_swap_proposal(tables: SublatticeTables):
    """Canonical two-site swap proposal (Swap usher)."""
    return Partial(_swap_propose, tables)


@lru_cache(maxsize=None)
def _multistep_fn(max_len: int, base_width: int):
    total = max_len * base_width

    def propose(base_propose, lengths_arr, cum_probs, key, occu):
        k_len, key = jax.random.split(key)
        u = jax.random.uniform(k_len)
        length = sel_row(lengths_arr, searchsorted_right(cum_probs, u))
        sites = jnp.zeros(total, dtype=jnp.int32)
        codes = jnp.zeros(total, dtype=jnp.int32)
        valid = jnp.zeros(total, dtype=bool)
        work_occu = occu
        for step_i in range(max_len):
            key, k_sub = jax.random.split(key)
            s_sites, s_codes, s_valid, _ = base_propose(k_sub, work_occu)
            in_length = step_i < length
            # drop the sub-step if any of its sites was already used by a
            # previous (valid) sub-step (reference mcusher.py:296-301)
            touched = jnp.any(
                valid[None, :] & (sites[None, :] == s_sites[:, None])
            )
            keep = in_length & ~touched
            s_valid = s_valid & keep
            off = step_i * base_width
            sites = jax.lax.dynamic_update_slice(sites, s_sites, (off,))
            codes = jax.lax.dynamic_update_slice(codes, s_codes, (off,))
            valid = jax.lax.dynamic_update_slice(valid, s_valid, (off,))
            work_occu = _apply_flips(work_occu, s_sites, s_codes, s_valid)
        return sites, codes, valid, jnp.float64(0.0)

    return propose


def make_multistep_proposal(base_propose, base_width, step_lengths, step_probabilities=None):
    """Chain several base proposals into one step (MultiStep usher).

    A sub-step is dropped when any of its sites was already touched,
    matching reference mcusher.py:286-304.
    """
    lengths = np.atleast_1d(np.asarray(step_lengths, dtype=np.int64))
    max_len = int(lengths.max())
    if step_probabilities is None:
        probs = np.full(len(lengths), 1.0 / len(lengths))
    else:
        probs = np.asarray(step_probabilities, dtype=np.float64)
    fn = _multistep_fn(max_len, int(base_width))
    return Partial(
        fn,
        _as_partial(base_propose),
        jnp.asarray(lengths),
        jnp.asarray(np.cumsum(probs)),
    )


@lru_cache(maxsize=None)
def _composite_fn(widths: tuple):
    width = max(widths)

    def pad(sites, codes, valid, w):
        padn = width - w
        if padn == 0:
            return sites, codes, valid
        return (
            jnp.pad(sites, (0, padn)),
            jnp.pad(codes, (0, padn)),
            jnp.pad(valid, (0, padn)),
        )

    def propose(proposals, cum, key, occu):
        k_pick, k_prop = jax.random.split(key)
        u = jax.random.uniform(k_pick)
        which = searchsorted_right(cum, u)
        branches = []
        for p, w in zip(proposals, widths):
            def branch(key_occu, p=p, w=w):
                k, o = key_occu
                s, c, v, lp = p(k, o)
                s, c, v = pad(s, c, v, w)
                return s, c, v, lp
            branches.append(branch)
        return jax.lax.switch(which, branches, (k_prop, occu))

    return propose


def make_composite_proposal(proposals, widths, probabilities=None):
    """Mix several proposal types with given probabilities (Composite usher)."""
    n = len(proposals)
    if probabilities is None:
        probs = np.full(n, 1.0 / n)
    else:
        probs = np.asarray(probabilities, dtype=np.float64)
        probs = probs / probs.sum()
    fn = _composite_fn(tuple(int(w) for w in widths))
    return Partial(
        fn, tuple(_as_partial(p) for p in proposals), jnp.asarray(np.cumsum(probs))
    )


def _as_partial(fn):
    """Wrap a plain callable so it can ride in a Partial pytree.

    A Partial is returned unchanged (its bound arrays stay traced data); a
    plain closure is wrapped with no bound args — correct, but its identity
    becomes part of the treedef, so such steps compile per closure instance.
    """
    return fn if isinstance(fn, Partial) else Partial(fn)


@jax.jit
def batched_features(feat_fn, occupancies):
    """Compiled vmapped feature evaluation: [W, N] occupancies -> [W, F].

    ``feat_fn`` must be a ``Partial`` (e.g. ``MCKernel.full_features_fn()``)
    so its bound arrays are traced data: one compilation serves every
    same-shaped processor (the SQS generator's per-shape evaluations, the
    kernel initial states).  An eager ``jax.vmap`` here would dispatch the
    whole select-plane evaluation op-by-op — latency-bound on
    remote-attached TPUs.
    """
    return jax.vmap(feat_fn)(occupancies)


def _apply_flips(occu, sites, codes, valid):
    """Apply masked flips (gather/scatter-free one-hot writes)."""
    return set_vec(occu, sites, codes, valid)


# ---------------------------------------------------------------------------
# step application: sequential flips + enthalpy / feature deltas
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _applier_fn(has_mu: bool, num_features: int):
    """Step applier body; ``num_features < 0`` means no feature tracking."""
    has_features = num_features >= 0

    def apply(de_fn, df_fn, mu, occu, sites, codes, valid):
        n_flips = sites.shape[0]
        iota_n = jnp.arange(occu.shape[0])
        dh = jnp.float64(0.0)
        dfeat = (
            jnp.zeros(num_features, dtype=jnp.float64) if has_features else None
        )
        for i in range(n_flips):
            site, code, v = sites[i], codes[i], valid[i]
            de = de_fn(occu, site, code, None)
            if has_mu:
                cur = sel_row(occu, site)
                mu_row = sel_row(mu, site)
                dwork = sel_row(mu_row, code) - sel_row(mu_row, cur)
                d = de - dwork
            else:
                dwork = 0.0
                d = de
            dh = dh + jnp.where(v, d, 0.0)
            if has_features:
                df = df_fn(occu, site, code, None)
                if has_mu:
                    df = jnp.concatenate([df, jnp.atleast_1d(dwork)])
                dfeat = dfeat + jnp.where(v, df, 0.0)
            occu = jnp.where(
                v & (iota_n == site), code.astype(occu.dtype), occu
            )
        return occu, dh, dfeat

    return apply


def make_step_applier(delta_energy_fn, mu_table=None, delta_features_fn=None,
                      num_features=None):
    """Build ``apply(occu, sites, codes, valid) -> (occu', dH, dfeat)``.

    Flips apply sequentially against the evolving occupancy (the reference's
    multi-flip semantics).  ``dH`` is the generalized-enthalpy change:
    energy change minus chemical work when ``mu_table`` is given (natural
    parameter -1, reference ensemble.py:22-99).  When ``delta_features_fn``
    is given, the feature-vector delta (with the chemical work appended) is
    accumulated as well; otherwise dfeat is None.
    """
    has_mu = mu_table is not None
    mu = (
        jnp.asarray(mu_table)
        if has_mu
        else jnp.zeros((1, 1), dtype=jnp.float64)
    )
    nf = int(num_features) if delta_features_fn is not None else -1
    de = _as_partial(delta_energy_fn)
    df = _as_partial(delta_features_fn) if delta_features_fn is not None else de
    return Partial(_applier_fn(has_mu, nf), de, df, mu)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _accept_metropolis(key, exponent):
    u = jax.random.uniform(key, dtype=jnp.float64)
    return (exponent >= 0) | (exponent > jnp.log(u))


@lru_cache(maxsize=None)
def _metropolis_step_fn(has_priori: bool):
    def step(propose_fn, apply_fn, priori_fn, state, key):
        def step_one(occu, enthalpy, beta, k, features):
            k_prop, k_acc = jax.random.split(k)
            sites, codes, valid, logp = propose_fn(k_prop, occu)
            if has_priori:
                logp = logp + priori_fn(occu, sites, codes, valid)
            occu_new, dh, dfeat = apply_fn(occu, sites, codes, valid)
            exponent = -beta * dh + logp
            accept = _accept_metropolis(k_acc, exponent)
            is_move = jnp.any(valid)
            occu = jnp.where(accept, occu_new, occu)
            enthalpy = enthalpy + jnp.where(accept, dh, 0.0)
            if features is not None:
                features = features + jnp.where(
                    accept, dfeat, jnp.zeros_like(dfeat)
                )
            return occu, enthalpy, accept, features, is_move

        keys = jax.random.split(key, state["occupancy"].shape[0])
        has_features = "features" in state
        occu, enthalpy, accept, features, is_move = jax.vmap(
            step_one, in_axes=(0, 0, 0, 0, 0 if has_features else None)
        )(
            state["occupancy"],
            state["enthalpy"],
            state["beta"],
            keys,
            state.get("features"),
        )
        out = dict(state)
        out["occupancy"] = occu
        out["enthalpy"] = enthalpy
        out["accepted"] = accept
        out["naccept"] = state["naccept"] + accept.astype(jnp.int32)
        if "nmove" in state:
            # non-identity proposal count (at least one valid flip)
            out["nmove"] = state["nmove"] + is_move.astype(jnp.int32)
        if has_features:
            out["features"] = features
        return out

    return step


def make_metropolis_step(propose_fn, apply_fn, log_priori_fn=None):
    """Metropolis-Hastings step over the batched walker state.

    State entries: occupancy [W, N] int32, enthalpy [W] f64, beta [W] f64,
    accepted [W] bool, naccept [W] int32, features [W, F] f64 (optional),
    bias [W] f64 (optional, with 'bias_fn' folded into log_priori_fn).
    """
    has_priori = log_priori_fn is not None
    priori = _as_partial(log_priori_fn) if has_priori else _as_partial(_no_priori)
    return Partial(
        _metropolis_step_fn(has_priori),
        _as_partial(propose_fn),
        _as_partial(apply_fn),
        priori,
    )


def _no_priori(occu, sites, codes, valid):  # pragma: no cover - placeholder
    return jnp.float64(0.0)


def _uniform_step(propose_fn, apply_fn, state, key):
    """Uniformly-random (infinite temperature) acceptance kernel."""

    def step_one(occu, enthalpy, k, features):
        sites, codes, valid, _ = propose_fn(k, occu)
        occu_new, dh, dfeat = apply_fn(occu, sites, codes, valid)
        if features is not None:
            features = features + dfeat
        return occu_new, enthalpy + dh, features

    keys = jax.random.split(key, state["occupancy"].shape[0])
    has_features = "features" in state
    occu, enthalpy, features = jax.vmap(
        step_one, in_axes=(0, 0, 0, 0 if has_features else None)
    )(state["occupancy"], state["enthalpy"], keys, state.get("features"))
    out = dict(state)
    out["occupancy"] = occu
    out["enthalpy"] = enthalpy
    out["accepted"] = jnp.ones(occu.shape[0], dtype=bool)
    out["naccept"] = state["naccept"] + 1
    if has_features:
        out["features"] = features
    return out


def make_uniform_step(propose_fn, apply_fn):
    """Uniformly-random (infinite temperature) acceptance kernel."""
    return Partial(_uniform_step, _as_partial(propose_fn), _as_partial(apply_fn))


def _wl_step(propose_fn, apply_fn, params, state, key):
    """Wang-Landau step (arXiv PhysRevLett.86.2050; reference wanglandau.py).

    Extra state entries per walker: entropy [W, L], histogram [W, L],
    occurrences [W, L], mean_features [W, L, F], mod_factor [W],
    wl_counter [W] (valid-state step counter).  Enthalpies outside
    [min, min + L*bin) are rejected.  ``params`` is a dict of scalars:
    min_enthalpy, bin_size, flatness, check_period, update_period,
    mod_divisor.
    """
    min_enthalpy = params["min_enthalpy"]
    bin_size = params["bin_size"]

    def bin_of(e):
        return jnp.floor((e - min_enthalpy) / bin_size).astype(jnp.int32)

    def step_one(occu, enthalpy, features, entropy, histogram, occurrences,
                 mean_features, mod_factor, counter, k):
        num_levels = entropy.shape[0]
        max_enthalpy = min_enthalpy + num_levels * bin_size
        k_prop, k_acc = jax.random.split(k)
        sites, codes, valid, logp = propose_fn(k_prop, occu)
        occu_new, dh, dfeat = apply_fn(occu, sites, codes, valid)
        new_enthalpy = enthalpy + dh
        bin_id = jnp.clip(bin_of(enthalpy), 0, num_levels - 1)
        new_bin = jnp.clip(bin_of(new_enthalpy), 0, num_levels - 1)
        in_window = (new_enthalpy >= min_enthalpy) & (new_enthalpy < max_enthalpy)
        exponent = sel_row(entropy, bin_id) - sel_row(entropy, new_bin) + logp
        accept = in_window & _accept_metropolis(k_acc, exponent)

        occu = jnp.where(accept, occu_new, occu)
        enthalpy = jnp.where(accept, new_enthalpy, enthalpy)
        features = jnp.where(accept, features + dfeat, features)

        # post-step: histogram/entropy/mean-feature updates at current
        # state.  One-hot masked updates: XLA TPU lowers dynamic
        # gathers/scatters near-scalar under vmap, and full-array
        # conditional copies would move the whole [L] / [L, F] per-bin
        # state every step
        cur_bin = jnp.clip(bin_of(enthalpy), 0, num_levels - 1)
        oh = jnp.arange(num_levels) == cur_bin  # [L]
        cur_valid = (enthalpy >= min_enthalpy) & (enthalpy < max_enthalpy)
        counter = counter + cur_valid.astype(jnp.int32)
        total = sel_row(occurrences, cur_bin)
        cur_mean = jnp.sum(
            jnp.where(oh[:, None], mean_features, 0.0), axis=0
        )
        new_mean = (features + total * cur_mean) / (total + 1)
        mean_features = jnp.where(
            (oh & cur_valid)[:, None], new_mean[None, :], mean_features
        )
        do_update = cur_valid & (
            jnp.mod(counter, params["update_period"]) == 0
        )
        upd = (oh & do_update).astype(entropy.dtype)
        entropy = entropy + upd * mod_factor
        histogram = histogram + (oh & do_update).astype(histogram.dtype)
        occurrences = occurrences + (oh & do_update).astype(occurrences.dtype)

        # flatness check every check_period valid steps
        do_check = cur_valid & (jnp.mod(counter, params["check_period"]) == 0)
        visited = entropy > 0
        nvisited = jnp.sum(visited)
        hmean = jnp.sum(jnp.where(visited, histogram, 0)) / jnp.maximum(
            nvisited, 1
        )
        flat = (nvisited >= 2) & jnp.all(
            jnp.where(visited, histogram > params["flatness"] * hmean, True)
        )
        reset = do_check & flat
        histogram = jnp.where(reset, jnp.zeros_like(histogram), histogram)
        mod_factor = jnp.where(
            reset, mod_factor / params["mod_divisor"], mod_factor
        )

        return (occu, enthalpy, features, entropy, histogram, occurrences,
                mean_features, mod_factor, counter, accept)

    keys = jax.random.split(key, state["occupancy"].shape[0])
    outs = jax.vmap(step_one)(
        state["occupancy"], state["enthalpy"], state["features"],
        state["entropy"], state["histogram"], state["occurrences"],
        state["mean_features"], state["mod_factor"], state["wl_counter"],
        keys,
    )
    (occu, enthalpy, features, entropy, histogram, occurrences,
     mean_features, mod_factor, counter, accept) = outs
    out = dict(state)
    out.update(
        occupancy=occu, enthalpy=enthalpy, features=features,
        entropy=entropy, histogram=histogram, occurrences=occurrences,
        mean_features=mean_features, mod_factor=mod_factor,
        wl_counter=counter, accepted=accept,
        naccept=state["naccept"] + accept.astype(jnp.int32),
    )
    return out


def make_wang_landau_step(
    propose_fn,
    apply_fn,
    min_enthalpy: float,
    bin_size: float,
    num_levels: int,  # noqa: ARG001 (carried by the state array shapes)
    flatness: float = 0.8,
    check_period: int = 1000,
    update_period: int = 1,
    mod_divisor: float = 2.0,
):
    """Wang-Landau step builder (see :func:`_wl_step`)."""
    params = {
        "min_enthalpy": jnp.float64(min_enthalpy),
        "bin_size": jnp.float64(bin_size),
        "flatness": jnp.float64(flatness),
        "check_period": jnp.int32(check_period),
        "update_period": jnp.int32(update_period),
        "mod_divisor": jnp.float64(mod_divisor),
    }
    return Partial(
        _wl_step, _as_partial(propose_fn), _as_partial(apply_fn), params
    )


# ---------------------------------------------------------------------------
# chain driver
# ---------------------------------------------------------------------------


def _run_chain_impl(state, key, step_fn, record_fn, nsamples: int, thin_by: int):
    def sample_body(carry, sample_key):
        st = carry
        st["window_naccept"] = jnp.zeros_like(st["naccept"])

        def step_body(s, k):
            s = step_fn(s, k)
            s["window_naccept"] = s["window_naccept"] + s["accepted"].astype(
                jnp.int32
            )
            return s, None

        step_keys = jax.random.split(sample_key, thin_by)
        st, _ = jax.lax.scan(step_body, st, step_keys)
        return st, record_fn(st)

    state = dict(state)
    state["window_naccept"] = jnp.zeros_like(state["naccept"])
    sample_keys = jax.random.split(key, nsamples)
    state, traces = jax.lax.scan(sample_body, state, sample_keys)
    state.pop("window_naccept", None)
    return state, traces


# step/record functions passed as traced Partial pytrees: all systems with
# the same table shapes share one compilation
_run_chain_fnargs = jax.jit(
    _run_chain_impl, static_argnames=("nsamples", "thin_by")
)
# legacy path: step/record are static (compiled per closure instance)
_run_chain_static = jax.jit(
    _run_chain_impl,
    static_argnames=("step_fn", "record_fn", "nsamples", "thin_by"),
)


def run_chain(state, key, step_fn, record_fn, nsamples: int, thin_by: int):
    """Run nsamples * thin_by steps, recording a trace every thin_by.

    Returns (final state, stacked traces pytree with leading axis nsamples).
    """
    if isinstance(step_fn, Partial):
        return _run_chain_fnargs(
            state, key, step_fn, _as_partial(record_fn), int(nsamples),
            int(thin_by),
        )
    return _run_chain_static(
        state, key, step_fn, record_fn, int(nsamples), int(thin_by)
    )


def _run_chain_fused_impl(state, key, chain_fn, record_fn, nsamples: int):
    """Chain-kernel driver: one fused multi-step call per recorded sample.

    ``chain_fn(state, key) -> state`` executes a whole thinning window on
    device (e.g. the shared-proposal Pallas chain,
    smol_tpu.ops.pallas_chain) and maintains ``window_naccept`` itself.
    """

    def body(st, sample_key):
        st = dict(st)
        st["window_naccept"] = jnp.zeros_like(st["naccept"])
        st = chain_fn(st, sample_key)
        return st, record_fn(st)

    state = dict(state)
    state["window_naccept"] = jnp.zeros_like(state["naccept"])
    keys = jax.random.split(key, nsamples)
    state, traces = jax.lax.scan(body, state, keys)
    state.pop("window_naccept", None)
    return state, traces


_run_chain_fused_static = jax.jit(
    _run_chain_fused_impl,
    static_argnames=("chain_fn", "record_fn", "nsamples"),
)


def run_chain_fused(state, key, chain_fn, record_fn, nsamples: int):
    """Run nsamples fused chain windows, recording a trace after each."""
    return _run_chain_fused_static(
        state, key, chain_fn, record_fn, int(nsamples)
    )
