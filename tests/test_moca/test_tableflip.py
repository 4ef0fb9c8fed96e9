"""TableFlip tests: charge-neutral SGC sampling vs exact enumeration."""

from itertools import product

import numpy as np
import pytest

from smol_tpu.cofe import ClusterSubspace
from smol_tpu.cofe.expansion import ClusterExpansion
from smol_tpu.constants import kB
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.moca.kernel.tableflip import TableFlip


@pytest.fixture(scope="module")
def neutral_system():
    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat,
        [{"Li+": 1 / 3, "Mn3+": 1 / 3}, {"O2-": 0.8, "F-": 0.2}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    cs = ClusterSubspace.from_cutoffs(prim, {2: 3.1})
    rng = np.random.default_rng(1)
    coefs = rng.normal(scale=0.02, size=cs.num_corr_functions)
    coefs[0] = -0.3
    ce = ClusterExpansion(cs, coefs)
    scm = np.diag([2, 1, 1])
    mus = {"Li+": 0.1, "Mn3+": -0.2, "vacA0+": 0.0, "O2-": 0.0, "F-": 0.05}
    ens = Ensemble.from_cluster_expansion(ce, scm, chemical_potentials=mus)
    proc = ens.processor
    neutral = []
    n_codes = [len(s) for s in proc.allowed_species]
    for occ in product(*[range(c) for c in n_codes]):
        occ = np.array(occ, dtype=np.int32)
        charge = sum(
            (proc.allowed_species[i][occ[i]].oxi_state or 0)
            for i in range(len(occ))
        )
        if charge == 0:
            neutral.append(occ)
    return ens, neutral


def test_flip_table_charge_neutral(neutral_system):
    ens, neutral = neutral_system
    usher = TableFlip(ens.sublattices, rng=np.random.default_rng(0))
    charges = np.array(
        [
            [(sp.oxi_state or 0) for sp in sl.species]
            for sl in ens.sublattices
        ],
        dtype=object,
    )
    # every flip vector conserves charge and sublattice site counts
    flat_charges = np.array(
        [c for sl in ens.sublattices for c in
         [(sp.oxi_state or 0) for sp in sl.species]]
    )
    for u in usher.flip_table:
        assert flat_charges @ u == 0


def test_host_steps_stay_neutral(neutral_system):
    ens, neutral = neutral_system
    rng = np.random.default_rng(3)
    usher = TableFlip(ens.sublattices, rng=rng)
    proc = ens.processor

    def charge(occ):
        return sum(
            (proc.allowed_species[i][occ[i]].oxi_state or 0)
            for i in range(len(occ))
        )

    occu = neutral[0].copy()
    for _ in range(200):
        step = usher.propose_step(occu)
        for site, code in step:
            occu[site] = code
        assert charge(occu) == 0


def test_tableflip_sgc_matches_enumeration(neutral_system):
    """Charge-neutral SGC sampling must match exact neutral-ensemble averages."""
    ens, neutral = neutral_system
    temperature = 3000.0
    beta = 1 / (kB * temperature)

    # the flip table (without ergodicity augmentation) only reaches the
    # component connected to the initial composition; restrict the exact
    # ensemble to it (swaps make each composition internally ergodic)
    from smol_tpu.moca.kernel.tableflip import TableFlip
    from smol_tpu.moca.occu_utils import get_dim_ids_table, occu_to_counts

    usher = TableFlip(ens.sublattices, rng=np.random.default_rng(0))
    table = get_dim_ids_table(ens.sublattices)
    d = usher.d

    def comp(occ):
        return tuple(occu_to_counts(occ, d, table))

    start = comp(neutral[0])
    comps = {comp(o) for o in neutral}
    reachable = {start}
    frontier = [np.array(start)]
    while frontier:
        cur = frontier.pop()
        for u in usher.flip_table:
            for sgn in (1, -1):
                nxt = tuple(cur + sgn * u)
                if nxt in comps and nxt not in reachable:
                    reachable.add(nxt)
                    frontier.append(np.array(nxt))
    neutral = [o for o in neutral if comp(o) in reachable]
    assert len(neutral) >= 2

    hs = np.array(
        [
            float(ens.compute_feature_vector(o) @ ens.natural_parameters)
            for o in neutral
        ]
    )
    w = np.exp(-beta * (hs - hs.min()))
    w /= w.sum()
    exact = float(hs @ w)

    nwalkers = 48
    occu = np.stack([neutral[0]] * nwalkers)
    sampler = Sampler.from_ensemble(
        ens,
        step_type="table-flip",
        temperature=temperature,
        nwalkers=nwalkers,
        seed=5,
    )
    sampler.run(16000, occu, thin_by=10)
    mc_mean = sampler.samples.mean_enthalpy(discard=300)
    sem = np.sqrt(
        sampler.samples.enthalpy_variance(discard=300)
        / sampler.samples.get_enthalpies(discard=300).shape[0]
    )
    assert abs(mc_mean - exact) < max(10 * sem, 2e-3), (mc_mean, exact, sem)

    # every sampled occupancy is charge neutral
    proc = ens.processor
    occs = sampler.samples.get_occupancies(discard=300)[::97]
    charges = np.array(
        [
            sum(
                (proc.allowed_species[i][o[i]].oxi_state or 0)
                for i in range(len(o))
            )
            for o in occs
        ]
    )
    assert np.all(charges == 0)


def test_tableflip_priori_factor_detailed_balance(neutral_system):
    """The a-priori factor equals the reverse/forward proposal-probability
    ratio (empirically measured), i.e. Metropolis-Hastings detailed balance
    holds for table-flip moves (reference tests/test_moca/test_mcushers.py
    statistical-depth analog)."""
    ens, _ = neutral_system
    rng = np.random.default_rng(42)
    usher = TableFlip(ens.sublattices, rng=rng)
    proc = ens.processor
    n_codes = [len(s) for s in proc.allowed_species]

    # a definite charge-neutral starting occupancy
    occu = None
    for _ in range(200):
        cand = np.array(
            [rng.integers(0, c) for c in n_codes], dtype=np.int32
        )
        charge = sum(
            (proc.allowed_species[i][cand[i]].oxi_state or 0)
            for i in range(len(cand))
        )
        if charge == 0:
            occu = cand
            break
    assert occu is not None

    def canon(step):
        return tuple(sorted((int(s), int(c)) for s, c in step))

    # find a proposable step with a measurable forward probability
    step = None
    for _ in range(500):
        cand = usher.propose_step(occu)
        if cand:
            step = cand
            break
    assert step is not None
    occu2 = occu.copy()
    reverse = []
    for site, code in step:
        reverse.append((site, int(occu2[site])))
        occu2[site] = code
    log_factor = usher.compute_log_priori_factor(occu, step)

    M = 60_000
    fwd = sum(
        1 for _ in range(M) if canon(usher.propose_step(occu)) == canon(step)
    )
    rev = sum(
        1
        for _ in range(M)
        if canon(usher.propose_step(occu2)) == canon(reverse)
    )
    assert fwd > 30 and rev > 30, (fwd, rev)
    p_fwd, p_rev = fwd / M, rev / M
    ratio = p_rev / p_fwd
    # binomial standard error propagated to the ratio
    se = ratio * np.sqrt(1 / fwd + 1 / rev)
    assert abs(ratio - np.exp(log_factor)) < 5 * se + 1e-9, (
        ratio, np.exp(log_factor), se,
    )


def _ewald_neutral_ensemble(scm=(2, 1, 1)):
    from smol_tpu.cofe.extern import EwaldTerm

    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat,
        [{"Li+": 1 / 3, "Mn3+": 1 / 3}, {"O2-": 0.8, "F-": 0.2}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    cs = ClusterSubspace.from_cutoffs(prim, {2: 3.1})
    cs.add_external_term(EwaldTerm())
    rng = np.random.default_rng(1)
    coefs = np.concatenate(
        [rng.normal(scale=0.02, size=cs.num_corr_functions), [0.1]]
    )
    coefs[0] = -0.3
    ce = ClusterExpansion(cs, coefs)
    mus = {"Li+": 0.1, "Mn3+": -0.2, "vacA0+": 0.0, "O2-": 0.0, "F-": 0.05}
    return Ensemble.from_cluster_expansion(
        ce, np.diag(scm), chemical_potentials=mus
    )


def test_fast_tableflip_accumulated_parity(neutral_system):
    """Fast-path accumulated enthalpy is exact (no Ewald term)."""
    import jax

    ens, neutral = neutral_system
    nw = 8
    sampler = Sampler.from_ensemble(
        ens, temperature=1500.0, step_type="table-flip", nwalkers=nw, seed=7
    )
    assert sampler.mckernel._get_fast_tables() is not None
    assert sampler.mckernel._get_fast_tables()[1] == "tableflip"
    rng = np.random.default_rng(0)
    occu = np.stack([neutral[rng.integers(len(neutral))] for _ in range(nw)])
    sampler.run(300, occu, thin_by=300)
    state = sampler._state
    occs = sampler.mckernel.state_occupancy(state)
    feats = np.asarray(
        jax.vmap(sampler.mckernel.full_features_fn())(occs)
    )
    exact = feats @ ens.natural_parameters
    err = np.abs(np.asarray(state["enthalpy"]) - exact).max()
    assert err < 1e-9, err
    assert np.asarray(state["naccept"]).sum() > 0


def test_fast_tableflip_ewald_parity():
    """With Ewald: acceptance-grade accumulation, exact charge neutrality."""
    import jax

    ens = _ewald_neutral_ensemble()
    nw = 8
    sampler = Sampler.from_ensemble(
        ens, temperature=1500.0, step_type="table-flip", nwalkers=nw, seed=7
    )
    fast = sampler.mckernel._get_fast_tables()
    assert fast is not None and fast[1] == "tableflip"
    assert fast[3] is not None, "Ewald flip tables missing"
    from smol_tpu.capp import generate_random_ordered_occupancy

    rng = np.random.default_rng(0)
    occu = np.stack([
        generate_random_ordered_occupancy(
            ens.processor, charge_neutral=True, rng=rng
        )
        for _ in range(nw)
    ])
    sampler.run(200, occu, thin_by=200)
    state = sampler._state
    occs = np.asarray(sampler.mckernel.state_occupancy(state))
    feats = np.asarray(
        jax.vmap(sampler.mckernel.full_features_fn())(jnp_arr(occs))
    )
    exact = feats @ ens.natural_parameters
    scale = max(1.0, np.abs(exact).max())
    err = np.abs(np.asarray(state["enthalpy"]) - exact).max() / scale
    assert err < 1e-4, err  # f32 Ewald accumulation is acceptance-grade
    # recorded traces are exact (recomputed at thin points)
    rec = sampler.samples.get_enthalpies(flat=False)[-1]
    rec_feats = sampler.samples.get_feature_vectors(flat=False)[-1]
    assert np.abs(rec - rec_feats @ ens.natural_parameters).max() < 1e-9
    # every walker stays exactly charge neutral
    proc = ens.processor
    for w in range(nw):
        charge = sum(
            (proc.allowed_species[i][occs[w, i]].oxi_state or 0)
            for i in range(occs.shape[1])
        )
        assert charge == 0


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
