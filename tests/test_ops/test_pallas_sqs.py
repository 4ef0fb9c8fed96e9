"""Tests of the SQS distance-annealing chain kernel (ops.pallas_sqs).

Runs in Pallas interpret mode so the kernel logic is exercised without
TPU hardware.  Invariants:

- single accepted steps from an exactly-recomputed feature plane match
  the exact distance-score change (delta correctness, forced accepts);
- a whole annealing window's accumulated distance matches an exact
  recomputation from the final occupancy to f32 window-drift tolerance,
  for binary and ternary systems, with and without the exact-match term;
- canonical swap moves conserve every walker's composition;
- on-device best tracking returns (occupancy, score) pairs consistent
  with host rescoring;
- the StochasticSQSGenerator dispatches to the chain path and its best
  scores equal exact host recomputation;
- applicability guards return None for unsupported processors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smol_tpu.benchmarks.systems import fcc_binary_prim, fcc_ternary_prim
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.moca.processor.distance import CorrelationDistanceProcessor
from smol_tpu.ops import pallas_sqs
from smol_tpu.ops.correlations import corr_from_occupancy


def _setup(prim, cutoffs, scm, match_weight=1.0, **kwargs):
    cs = ClusterSubspace.from_cutoffs(prim, cutoffs)
    proc = CorrelationDistanceProcessor(
        cs, scm, match_weight=match_weight, **kwargs
    )
    tables = pallas_sqs.build_distance_tables(proc, proc.get_sublattices())
    assert tables is not None
    num_corr = cs.num_corr_functions
    dp = proc._dp

    def base_corr_fn(occu):
        return corr_from_occupancy(occu, dp, num_corr)

    def exact_score(occu):
        return float(proc.coefs @ proc.compute_feature_vector(occu))

    return proc, tables, base_corr_fn, exact_score


def _random_occus(proc, nwalkers, seed=0, balanced=True):
    rng = np.random.default_rng(seed)
    n = proc.num_sites
    n_codes = np.array([len(sp) for sp in proc.allowed_species])
    ncod = int(n_codes.max())
    if balanced:
        base = np.arange(n) % ncod
        return np.stack(
            [rng.permutation(base).astype(np.int32) for _ in range(nwalkers)]
        )
    return (rng.random((nwalkers, n)) * n_codes).astype(np.int32)


def _state(proc, occus, exact_score, beta=0.5):
    nwalkers = occus.shape[0]
    scores = jnp.asarray([exact_score(o) for o in occus])
    return {
        "occupancy": jnp.asarray(occus),
        "enthalpy": scores,
        "beta": jnp.full(nwalkers, beta),
        "naccept": jnp.zeros(nwalkers, jnp.int32),
        "best_enthalpy": scores,
        "best_occupancy": jnp.asarray(occus),
    }


def _window_parity(prim, cutoffs, scm, match_weight, nwalkers=8,
                   n_steps=200, seed=0, **kwargs):
    proc, tables, base_corr_fn, exact_score = _setup(
        prim, cutoffs, scm, match_weight=match_weight, **kwargs
    )
    occus = _random_occus(proc, nwalkers, seed=seed)
    state = _state(proc, occus, exact_score)
    fn = pallas_sqs.make_distance_chain(
        tables, n_steps, base_corr_fn, block_size=nwalkers, interpret=True
    )
    out = fn(state, jax.random.key(0))
    enth = np.asarray(out["enthalpy"])
    occ1 = np.asarray(out["occupancy"])
    bocc = np.asarray(out["best_occupancy"])
    benth = np.asarray(out["best_enthalpy"])
    ncod = max(len(sp) for sp in proc.allowed_species)
    for w in range(nwalkers):
        # whole-window accumulation vs exact final-state recomputation
        assert abs(enth[w] - exact_score(occ1[w])) < 2e-5, w
        # composition conserved by canonical swaps
        assert np.array_equal(
            np.bincount(occ1[w], minlength=ncod),
            np.bincount(occus[w], minlength=ncod),
        ), w
        # best tracking consistent with host rescore (f32 tolerance)
        assert abs(benth[w] - exact_score(bocc[w])) < 2e-5, w
        assert benth[w] <= enth[w] + 2e-5, w
    assert np.asarray(out["naccept"]).sum() > 0


def test_window_parity_binary():
    _window_parity(fcc_binary_prim(), {2: 4.0, 3: 2.8}, np.diag([2, 2, 2]),
                   match_weight=1.0)


def test_window_parity_binary_no_match_term():
    _window_parity(fcc_binary_prim(), {2: 4.0, 3: 2.8}, np.diag([2, 2, 2]),
                   match_weight=0.0)


def test_window_parity_ternary():
    _window_parity(fcc_ternary_prim(), {2: 4.0}, np.diag([2, 2, 2]),
                   match_weight=1.0, nwalkers=8, n_steps=150)


def test_window_parity_weighted_targets():
    rng = np.random.default_rng(3)
    cs = ClusterSubspace.from_cutoffs(fcc_binary_prim(), {2: 4.0, 3: 2.8})
    target = np.zeros(cs.num_corr_functions)
    target[1:] = rng.uniform(-0.3, 0.3, cs.num_corr_functions - 1)
    weights = rng.uniform(0.5, 2.0, cs.num_corr_functions - 1)
    _window_parity(
        fcc_binary_prim(), {2: 4.0, 3: 2.8}, np.diag([2, 2, 2]),
        match_weight=0.5, target_vector=target, target_weights=weights,
    )


def test_single_step_deltas_exact():
    """beta=0 forces accepts; each launch starts from an exact plane, so
    any per-step delta bug shows as an immediate score mismatch."""
    proc, tables, base_corr_fn, exact_score = _setup(
        fcc_binary_prim(), {2: 4.0, 3: 2.8}, np.diag([2, 2, 2])
    )
    occus = _random_occus(proc, 8, seed=1)
    state = _state(proc, occus, exact_score, beta=0.0)
    fn = pallas_sqs.make_distance_chain(
        tables, 1, base_corr_fn, block_size=8, interpret=True
    )
    for it in range(12):
        state = fn(state, jax.random.key(it))
        occ1 = np.asarray(state["occupancy"])
        enth = np.asarray(state["enthalpy"])
        for w in range(8):
            assert abs(enth[w] - exact_score(occ1[w])) < 1e-5, (it, w)
        state = dict(state)
        state["enthalpy"] = jnp.asarray(
            [exact_score(o) for o in occ1]
        )


def test_multi_chunk_execution():
    proc, tables, base_corr_fn, exact_score = _setup(
        fcc_binary_prim(), {2: 4.0}, np.diag([2, 2, 2])
    )
    occus = _random_occus(proc, 4, seed=2)
    state = _state(proc, occus, exact_score)
    fn = pallas_sqs.make_distance_chain(
        tables, 130, base_corr_fn, block_size=4, interpret=True,
        chunk_steps=48,
    )
    out = fn(state, jax.random.key(5))
    occ1 = np.asarray(out["occupancy"])
    enth = np.asarray(out["enthalpy"])
    for w in range(4):
        assert abs(enth[w] - exact_score(occ1[w])) < 2e-5, w


def test_annealing_reaches_good_sqs():
    """A short device anneal at descending temperatures must reach the
    perfectly matched (L = max diameter) configurations the XLA-path
    generator finds on this cell."""
    proc, tables, base_corr_fn, exact_score = _setup(
        fcc_binary_prim(), {2: 4.0}, np.diag([2, 2, 2])
    )
    occus = _random_occus(proc, 16, seed=4)
    state = _state(proc, occus, exact_score)
    fn = pallas_sqs.make_distance_chain(
        tables, 150, base_corr_fn, block_size=16, interpret=True
    )
    key = jax.random.key(9)
    for temp in (2.0, 0.5, 0.1, 0.02):
        state = dict(state)
        state["beta"] = jnp.full(16, 1.0 / temp)
        key, sub = jax.random.split(key)
        state = fn(state, sub)
    best = min(
        exact_score(o) for o in np.asarray(state["best_occupancy"])
    )
    start = min(exact_score(o) for o in occus)
    assert best <= start  # best-tracking never loses ground
    assert best < 0  # a matched shell (negative score) exists and is found


def test_generator_uses_chain_path(monkeypatch):
    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")
    from smol_tpu.capp import StochasticSQSGenerator

    generator = StochasticSQSGenerator.from_structure(
        fcc_binary_prim(), {2: 4.0}, supercell_size=8
    )
    fn = generator._chain_anneal_fn(generator.processors[0], 50)
    assert fn is not None  # the chain path is selected under interpret mode
    generator.generate(
        mcmc_steps=60,
        temperatures=np.linspace(3.0, 0.05, 3),
        nwalkers=4,
        seed=11,
    )
    assert generator.num_structures > 0
    best = generator.get_best_sqs(num_structures=2)
    recomputed = generator.compute_score(
        best[0].structure, best[0].supercell_matrix
    )
    assert recomputed == pytest.approx(best[0].score, abs=1e-8)


def test_build_guards():
    """Unsupported processors must return None, not a wrong kernel."""
    cs = ClusterSubspace.from_cutoffs(fcc_binary_prim(), {2: 4.0})
    proc = CorrelationDistanceProcessor(cs, np.diag([2, 2, 2]))

    class NoPacked:
        packed = None

    assert pallas_sqs.build_distance_tables(NoPacked(), []) is None
    # restricted sublattices are unsupported
    subls = proc.get_sublattices()
    subls[0].restrict_sites([0])
    try:
        assert pallas_sqs.build_distance_tables(proc, subls) is None
    finally:
        subls[0].reset_restricted_sites()
