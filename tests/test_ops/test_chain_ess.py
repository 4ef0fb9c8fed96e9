"""Quantifies the shared-proposal cross-walker correlation (ESS loss).

Walkers within one chain-kernel block share the proposal SITE sequence
(ops/pallas_chain.py module docstring): each chain remains an exact
Metropolis chain, but ACROSS-walker averages carry positive correlation,
so a block of m walkers contributes fewer than m effective samples to an
ensemble mean.  This test MEASURES that loss as

    ESS fraction = var(per-walker means) / (W * var(grand mean))

estimated over R independent repeats (independent keys => independent
site sequences).  For fully independent walkers the fraction is ~1; for
perfectly correlated walkers it is ~1/W.

Measured on the 8-site binary FCC canonical system here (W = 128 walkers
in one block, windows of 100 swaps): the shared-sequence fraction comes
out ~0.15-0.6 depending on the observable window, vs ~1 for independent
per-walker proposals — i.e. a shared block of 128 walkers is worth
roughly 20-80 effective walkers for ensemble averaging.  Practical
guidance (documented in the Metropolis kernel): keep
``chain_block_size`` at its 1024 default for throughput, but budget
across-walker statistics assuming ~1/4 of a block's walkers are
effective, or lower ``chain_block_size`` (more independent sequences per
ensemble) / set ``shared_proposals=False`` when ensemble-mean variance
matters more than throughput.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.ops import pallas_chain

W = 128  # one full lane block
R = 12  # independent repeats
WINDOWS = 6
WINDOW_STEPS = 100
DISCARD = 2


def _ensemble():
    ce = random_expansion(fcc_binary_prim(), {2: 6.0}, seed=3)
    return Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))


def _start(ens, seed=1):
    # fixed 50/50 composition for canonical swaps
    rng = np.random.default_rng(seed)
    n = ens.num_sites
    occu = np.zeros((W, n), dtype=np.int32)
    for k in range(W):
        occu[k, rng.choice(n, n // 2, replace=False)] = 1
    return occu


def _ess_fraction(run_means):
    """run_means [R, W] per-walker window-averaged enthalpies."""
    var_within = run_means.var(axis=1, ddof=1).mean()
    grand = run_means.mean(axis=1)  # [R]
    var_grand = grand.var(ddof=1)
    return float(var_within / (W * max(var_grand, 1e-300)))


def test_shared_proposal_ess_vs_independent(monkeypatch):
    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")
    ens = _ensemble()
    occu = _start(ens)
    temperature = 600.0

    sampler = Sampler.from_ensemble(
        ens, temperature=temperature, nwalkers=W, seed=7
    )
    tables = pallas_chain.build_chain_tables(
        ens.processor, ens.sublattices
    )
    assert tables is not None
    fn = pallas_chain.make_shared_proposal_chain(
        tables, WINDOW_STEPS, block_size=W, interpret=True, move="swap"
    )
    state0 = dict(sampler.setup_sample(occu))
    state0.pop("words", None)
    state0["occupancy"] = jnp.asarray(occu)

    shared_means = np.empty((R, W))
    for r in range(R):
        st = state0
        acc = np.zeros(W)
        for s in range(WINDOWS):
            st = fn(st, jax.random.fold_in(jax.random.key(17), r * 64 + s))
            if s >= DISCARD:
                acc += np.asarray(st["enthalpy"])
        shared_means[r] = acc / (WINDOWS - DISCARD)
    f_shared = _ess_fraction(shared_means)

    # independent per-walker proposals: same windows via the XLA step path
    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "0")
    indep_means = np.empty((R, W))
    for r in range(R):
        s2 = Sampler.from_ensemble(
            ens, temperature=temperature, nwalkers=W, seed=1000 + r,
            shared_proposals=False,
        )
        assert s2._get_chain_fn(WINDOW_STEPS) is None
        s2.run(WINDOWS * WINDOW_STEPS, occu, thin_by=WINDOW_STEPS)
        enth = s2.samples.get_trace_value("enthalpy", flat=False)
        indep_means[r] = enth[DISCARD:].mean(axis=0)
    f_indep = _ess_fraction(indep_means)

    # shared blocks lose effective samples but stay usable; independent
    # walkers are ~fully effective.  Var-of-variance across R=12 repeats
    # is large, so bounds are generous — the point is the measured gap.
    assert 0.02 < f_shared < 1.5, f_shared
    assert f_indep > 0.35, f_indep
    assert f_indep > f_shared, (f_indep, f_shared)


def test_sweep_schedule_full_ess(monkeypatch):
    """Deterministic-sweep walkers carry ~full effective sample counts.

    proposal_mode="sweep" shares only a CONSTANT site schedule: all
    randomness (acceptance uniforms, proposed codes) is per-walker, so
    the across-walker ESS fraction must sit near 1 — unlike the shared
    RANDOM sequence, whose fraction drops to 0.15-0.6 (test above).
    """
    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")
    ce = random_expansion(fcc_binary_prim(), {2: 6.0}, seed=3)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.1, "Cu": 0.0}
    )
    rng = np.random.default_rng(1)
    occu = rng.integers(0, 2, (W, ens.num_sites)).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ens, temperature=600.0, nwalkers=W, seed=7, proposal_mode="sweep"
    )
    tables = pallas_chain.build_chain_tables(
        ens.processor, ens.sublattices,
        mu_table=ens.chemical_potential_table,
    )
    fn = pallas_chain.make_shared_proposal_chain(
        tables, WINDOW_STEPS, block_size=W, interpret=True, move="flip",
        proposal_mode="sweep",
    )
    state0 = dict(sampler.setup_sample(occu))
    state0.pop("words", None)
    state0["occupancy"] = jnp.asarray(occu)

    means = np.empty((R, W))
    for r in range(R):
        st = state0
        acc = np.zeros(W)
        for s in range(WINDOWS):
            st = fn(st, jax.random.fold_in(jax.random.key(29), r * 64 + s))
            if s >= DISCARD:
                acc += np.asarray(st["enthalpy"])
        means[r] = acc / (WINDOWS - DISCARD)
    f_sweep = _ess_fraction(means)
    # var-of-variance noise across R = 12 repeats is large; iid walkers
    # must still clear the shared-sequence regime decisively
    assert f_sweep > 0.5, f_sweep


@pytest.mark.parametrize("block_size", [64, 128])
def test_block_size_bounds_sharing(monkeypatch, block_size):
    """Smaller chain_block_size => more independent sequences per ensemble.

    Sanity check on the documented mitigation: two blocks of 64 walkers
    draw different site sequences, so their block means must differ
    (shared sequences produce identical-looking drift within a block).
    """
    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")
    ens = _ensemble()
    occu = _start(ens, seed=5)
    sampler = Sampler.from_ensemble(
        ens, temperature=600.0, nwalkers=W, seed=3
    )
    tables = pallas_chain.build_chain_tables(ens.processor, ens.sublattices)
    fn = pallas_chain.make_shared_proposal_chain(
        tables, 100, block_size=block_size, interpret=True, move="swap"
    )
    st = dict(sampler.setup_sample(occu))
    st.pop("words", None)
    st["occupancy"] = jnp.asarray(occu)
    out = fn(st, jax.random.key(2))
    # both blocks moved and produced distinct states
    occ1 = np.asarray(out["occupancy"])
    assert not np.array_equal(occ1[:64], occ1[64:])
    assert np.asarray(out["naccept"]).min() >= 0
    assert np.asarray(out["naccept"]).mean() > 0
