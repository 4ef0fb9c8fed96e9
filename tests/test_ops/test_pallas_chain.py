"""Tests of the shared-proposal persistent-chain kernel (ops.pallas_chain).

Runs in Pallas interpret mode so the kernel logic is exercised without TPU
hardware.  Invariants:

- accumulated enthalpy equals an exact f64 recomputation from the final
  occupancy (the strongest delta-correctness check), across every
  supported system class: binary/ternary, canonical/semigrand, spinel,
  and composite CE + Ewald;
- semigrand averages match brute-force Boltzmann enumeration on a tiny
  cell (the shared site sequence leaves every chain's stationary
  distribution exact);
- the Sampler selects the chain path and its recorded traces stay
  self-consistent;
- applicability guards fall back (return None) for unsupported systems.
"""

from itertools import product

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smol_tpu.benchmarks.systems import (
    fcc_binary_prim,
    fcc_ternary_prim,
    random_expansion,
    spinel_prim,
)
from smol_tpu.constants import kB
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.ops import pallas_chain


def _random_occu(ensemble, nwalkers, seed=0):
    rng = np.random.default_rng(seed)
    n_codes = np.array([len(sp) for sp in ensemble.processor.allowed_species])
    return (
        rng.random((nwalkers, ensemble.num_sites)) * n_codes
    ).astype(np.int32)


def _chain_state(sampler, occu):
    state = dict(sampler.setup_sample(occu))
    state.pop("words", None)
    state["occupancy"] = jnp.asarray(occu)
    return state


def _accum_parity(ensemble, nwalkers=8, n_steps=150, temperature=900.0,
                  move="flip", **chain_kwargs):
    sampler = Sampler.from_ensemble(
        ensemble, temperature=temperature, nwalkers=nwalkers, seed=3
    )
    tables = pallas_chain.build_chain_tables(
        ensemble.processor,
        ensemble.sublattices,
        mu_table=ensemble.chemical_potential_table,
    )
    assert tables is not None
    occu = _random_occu(ensemble, nwalkers)
    state = _chain_state(sampler, occu)
    fn = pallas_chain.make_shared_proposal_chain(
        tables, n_steps, block_size=nwalkers, interpret=True, move=move,
        **chain_kwargs,
    )
    out = fn(state, jax.random.key(0))
    if move == "swap":
        # canonical moves conserve the composition of every walker exactly
        occ0 = np.asarray(occu)
        occ1 = np.asarray(out["occupancy"])
        for w in range(nwalkers):
            assert np.array_equal(
                np.bincount(occ1[w], minlength=8),
                np.bincount(occ0[w], minlength=8),
            )
    kernel = sampler.mckernel
    feats = jax.vmap(kernel.full_features_fn())(out["occupancy"])
    exact = feats @ jnp.asarray(kernel.natural_params)
    err = np.max(np.abs(np.asarray(out["enthalpy"]) - np.asarray(exact)))
    scale = max(1.0, float(np.max(np.abs(np.asarray(exact)))))
    assert err / scale < 1e-10, (err, scale)
    assert np.asarray(out["naccept"]).mean() > 0
    return out


def test_accum_parity_binary_semigrand():
    ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.3, "Cu": 0.0}
    )
    _accum_parity(ens)


def test_accum_parity_ternary_semigrand():
    ce = random_expansion(fcc_ternary_prim(), {2: 5.5, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]),
        chemical_potentials={"Au": 0.05, "Ag": 0.0, "Cu": -0.05},
    )
    _accum_parity(ens)


def test_accum_parity_spinel_ewald():
    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11, ewald=True)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([1, 1, 1]),
        chemical_potentials={
            "Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0
        },
    )
    out = _accum_parity(ens, temperature=1000.0)
    # occupancies must stay within code bounds
    occ = np.asarray(out["occupancy"])
    n_codes = np.array([len(sp) for sp in ens.processor.allowed_species])
    assert (occ >= 0).all() and (occ < n_codes[None, :]).all()


def test_accum_parity_binary_canonical_swap():
    ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))
    _accum_parity(ens, move="swap")


def test_accum_parity_ternary_canonical_swap():
    ce = random_expansion(fcc_ternary_prim(), {2: 5.5, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))
    _accum_parity(ens, move="swap")


def test_ising_fast_path_matches_select_path(monkeypatch):
    """Ising parity chain == tensor-select chain, step for step.

    Binary sites with a sign-symmetric basis dispatch the Ising fast
    path (ChainTables.ising: parity sign flips instead of the TM-column
    g-plane select).  On the same PRNG stream it must reproduce the
    select path's trajectories exactly and enthalpies to the table
    construction tolerance (<= 1e-11 relative amplitude rounding).
    """
    ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    ens_mu = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.3, "Cu": 0.0}
    )
    ens_cn = Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))
    results = {}
    for mode in ("ising", "select"):
        monkeypatch.setenv(
            "SMOL_TPU_CHAIN_NO_ISING", "1" if mode == "select" else "0"
        )
        for move, ens in (("flip", ens_mu), ("swap", ens_cn)):
            sampler = Sampler.from_ensemble(
                ens, temperature=900.0, nwalkers=8, seed=3
            )
            tables = pallas_chain.build_chain_tables(
                ens.processor,
                ens.sublattices,
                mu_table=(
                    ens.chemical_potential_table if move == "flip" else None
                ),
            )
            assert tables.ising == (mode == "ising"), (mode, move)
            occu = _random_occu(ens, 8)
            state = _chain_state(sampler, occu)
            fn = pallas_chain.make_shared_proposal_chain(
                tables, 150, block_size=8, interpret=True, move=move
            )
            out = fn(state, jax.random.key(0))
            results[(mode, move)] = (
                np.asarray(out["occupancy"]),
                np.asarray(out["enthalpy"]),
                np.asarray(out["naccept"]),
            )
    for move in ("flip", "swap"):
        o1, e1, n1 = results[("ising", move)]
        o0, e0, n0 = results[("select", move)]
        np.testing.assert_array_equal(o1, o0, err_msg=move)
        np.testing.assert_array_equal(n1, n0, err_msg=move)
        np.testing.assert_allclose(e1, e0, rtol=0, atol=1e-9, err_msg=move)


def test_ising_detection_requires_binary_symmetric():
    """Ternary systems must not trigger the binary Ising parity path;
    they dispatch the q-ary (Z_3 character) fast path instead."""
    ce = random_expansion(fcc_ternary_prim(), {2: 5.5, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]),
        chemical_potentials={"Au": 0.05, "Ag": 0.0, "Cu": -0.05},
    )
    tables = pallas_chain.build_chain_tables(
        ens.processor, ens.sublattices,
        mu_table=ens.chemical_potential_table,
    )
    assert tables is not None and not tables.ising
    assert tables.qary == 3


def test_qary_fast_path_matches_select_path(monkeypatch):
    """Z_3 character chain == tensor-select chain, step for step.

    Ternary sites dispatch the q-ary fast path (ChainTables.qary:
    frequency matmul + mod-3 phase selects instead of the TM-column
    g-plane select).  The character decomposition re-rounds each
    cluster's delta at the double-float level (~1e-13 relative), far
    below the f32 acceptance granularity, so on the same PRNG stream
    the trajectories match exactly for flip and swap moves.
    """
    ce = random_expansion(fcc_ternary_prim(), {2: 5.5, 3: 4.0}, seed=7)
    ens_mu = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]),
        chemical_potentials={"Au": 0.05, "Ag": 0.0, "Cu": -0.05},
    )
    ens_cn = Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))
    results = {}
    for mode in ("qary", "select"):
        monkeypatch.setenv(
            "SMOL_TPU_CHAIN_NO_QARY", "1" if mode == "select" else "0"
        )
        for move, ens in (("flip", ens_mu), ("swap", ens_cn)):
            sampler = Sampler.from_ensemble(
                ens, temperature=900.0, nwalkers=8, seed=3
            )
            tables = pallas_chain.build_chain_tables(
                ens.processor,
                ens.sublattices,
                mu_table=(
                    ens.chemical_potential_table if move == "flip" else None
                ),
            )
            assert tables.qary == (3 if mode == "qary" else 0), (mode, move)
            occu = _random_occu(ens, 8)
            state = _chain_state(sampler, occu)
            fn = pallas_chain.make_shared_proposal_chain(
                tables, 150, block_size=8, interpret=True, move=move
            )
            out = fn(state, jax.random.key(0))
            results[(mode, move)] = (
                np.asarray(out["occupancy"]),
                np.asarray(out["enthalpy"]),
                np.asarray(out["naccept"]),
            )
    for move in ("flip", "swap"):
        o1, e1, n1 = results[("qary", move)]
        o0, e0, n0 = results[("select", move)]
        np.testing.assert_array_equal(o1, o0, err_msg=move)
        np.testing.assert_array_equal(n1, n0, err_msg=move)
        np.testing.assert_allclose(e1, e0, rtol=0, atol=1e-9, err_msg=move)


def test_qary_binary_q2_path(monkeypatch):
    """The q = 2 character instance covers ANY binary system (Z_2
    characters span all binary functions): with the Ising parity path
    disabled, detection falls through to qary = 2 and the accumulated
    enthalpy still matches the exact f64 recomputation."""
    monkeypatch.setenv("SMOL_TPU_CHAIN_NO_ISING", "1")
    ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.3, "Cu": 0.0}
    )
    tables = pallas_chain.build_chain_tables(
        ens.processor, ens.sublattices,
        mu_table=ens.chemical_potential_table,
    )
    assert tables is not None and not tables.ising and tables.qary == 2
    _accum_parity(ens)


def test_swap_chain_counts_nonnull_moves():
    """The swap chain's nmove counter = proposals where species differ.

    The exogenous pair draw proposes identity moves (~50% for a balanced
    binary); nmove counts the reference-equivalent (null-free) moves so
    benchmarks can report a rate comparable to the reference Swap usher
    (smol/moca/kernel/mcusher.py:209, which conditions the partner).
    """
    ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))
    nwalkers, n_steps = 8, 200
    sampler = Sampler.from_ensemble(
        ens, temperature=900.0, nwalkers=nwalkers, seed=3
    )
    tables = pallas_chain.build_chain_tables(
        ens.processor, ens.sublattices
    )
    occu = _random_occu(ens, nwalkers)
    occu[0, :] = 0  # walker 0: single species -> every swap is null
    state = _chain_state(sampler, occu)
    assert "nmove" in state  # seeded by Metropolis.initial_state for Swap
    fn = pallas_chain.make_shared_proposal_chain(
        tables, n_steps, block_size=nwalkers, interpret=True, move="swap",
    )
    out = fn(state, jax.random.key(0))
    nmove = np.asarray(out["nmove"])
    nacc = np.asarray(out["naccept"])
    assert nmove[0] == 0 and nacc[0] == 0
    # mixed walkers: some but not all proposals are real moves, and every
    # accepted move was a real move
    assert (nmove[1:] > 0).all() and (nmove[1:] < n_steps).all()
    assert (nacc <= nmove).all()
    # balanced binary: the non-null fraction concentrates near 1/2
    frac = nmove[1:].mean() / n_steps
    assert 0.3 < frac < 0.7, frac


def test_canonical_swap_matches_enumeration(monkeypatch):
    """Chain-kernel canonical averages match exact fixed-composition sums.

    The swap chain must leave the canonical (fixed-composition) Boltzmann
    distribution invariant; compare against brute-force enumeration over
    all arrangements at the walkers' composition.
    """
    from smol_tpu.cofe import ClusterSubspace
    from smol_tpu.cofe.expansion import ClusterExpansion
    from smol_tpu.crystal import Lattice, Structure

    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")

    a = 3.8
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(lat, [{"Au": 0.5, "Cu": 0.5}], [[0, 0, 0]])
    cs = ClusterSubspace.from_cutoffs(prim, {2: 3.0})
    rng = np.random.default_rng(5)
    coefs = rng.normal(scale=0.05, size=cs.num_corr_functions)
    coefs[0] = -0.5
    ce = ClusterExpansion(cs, coefs)

    temperature = 1500.0
    ens = Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))
    n = ens.num_sites
    n_au = n // 2
    beta = 1 / (kB * temperature)
    energies = []
    from itertools import combinations

    for aus in combinations(range(n), n_au):
        occu = np.zeros(n, dtype=np.int32)
        occu[list(aus)] = 1
        feats = ens.compute_feature_vector(occu)
        energies.append(float(np.dot(feats, ens.natural_parameters)))
    energies = np.array(energies)
    w = np.exp(-beta * (energies - energies.min()))
    exact = float(np.dot(energies, w) / w.sum())

    nwalkers = 16
    occu = np.zeros((nwalkers, n), dtype=np.int32)
    rng2 = np.random.default_rng(9)
    for k in range(nwalkers):
        occu[k, rng2.choice(n, n_au, replace=False)] = 1
    sampler = Sampler.from_ensemble(
        ens, temperature=temperature, nwalkers=nwalkers, seed=23
    )
    assert sampler._get_chain_fn(20) is not None, "swap chain not selected"
    sampler.run(4000, occu, thin_by=20)
    mc_mean = sampler.samples.mean_enthalpy(discard=50)
    sem = np.sqrt(
        sampler.samples.enthalpy_variance(discard=50)
        / sampler.samples.get_enthalpies(discard=50).shape[0]
    )
    assert abs(mc_mean - exact) < max(30 * sem, 2e-2), (mc_mean, exact, sem)


def _site_charges(ensemble):
    """[site][code] -> formal charge of the species encoded there."""
    return [
        [float(getattr(sp, "oxi_state", 0) or 0) for sp in species]
        for species in ensemble.processor.allowed_species
    ]


def test_accum_parity_spinel_tableflip():
    """Charge-neutral TableFlip chain: parity + exact charge conservation."""
    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11, ewald=True)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([1, 1, 1]),
        chemical_potentials={
            "Li+": 0.1, "vacA0+": 0.0, "Mn3+": 0.05, "Mn4+": 0.0
        },
    )
    nwalkers, n_steps = 8, 150
    sampler = Sampler.from_ensemble(
        ens, temperature=1000.0, nwalkers=nwalkers, seed=3,
        step_type="table-flip",
    )
    kernel = sampler.mckernel
    built = kernel._get_chain_tables()
    assert built is not None and built[1] == "table"
    tables, _, table_move = built
    occu = _random_occu(ens, nwalkers)
    state = _chain_state(sampler, occu)
    fn = pallas_chain.make_shared_proposal_chain(
        tables, n_steps, block_size=nwalkers, interpret=True,
        move="table", table_move=table_move,
    )
    out = fn(state, jax.random.key(0))
    feats = jax.vmap(kernel.full_features_fn())(out["occupancy"])
    exact = feats @ jnp.asarray(kernel.natural_params)
    err = np.max(np.abs(np.asarray(out["enthalpy"]) - np.asarray(exact)))
    scale = max(1.0, float(np.max(np.abs(np.asarray(exact)))))
    assert err / scale < 1e-10, (err, scale)
    assert np.asarray(out["naccept"]).mean() > 0
    # every accepted composite move is charge neutral: net charge invariant
    chg = _site_charges(ens)
    occ1 = np.asarray(out["occupancy"])
    for w in range(nwalkers):
        q0 = sum(chg[s][occu[w, s]] for s in range(ens.num_sites))
        q1 = sum(chg[s][occ1[w, s]] for s in range(ens.num_sites))
        assert q0 == q1, (w, q0, q1)
    assert not np.array_equal(occ1, occu)


def _run_tableflip_chain(ens, seed=3, n_steps=150, nwalkers=8):
    """Build + run the table-move chain; returns (occ, enthalpy, naccept)."""
    sampler = Sampler.from_ensemble(
        ens, temperature=1000.0, nwalkers=nwalkers, seed=seed,
        step_type="table-flip",
    )
    built = sampler.mckernel._get_chain_tables()
    assert built is not None and built[1] == "table"
    tables, _, table_move = built
    occu = _random_occu(ens, nwalkers)
    state = _chain_state(sampler, occu)
    fn = pallas_chain.make_shared_proposal_chain(
        tables, n_steps, block_size=nwalkers, interpret=True,
        move="table", table_move=table_move,
    )
    out = fn(state, jax.random.key(0))
    return (
        tables,
        np.asarray(out["occupancy"]),
        np.asarray(out["enthalpy"]),
        np.asarray(out["naccept"]),
    )


def test_ising_table_move_matches_select_path(monkeypatch):
    """move="table" also dispatches the Ising site delta (the multi-slot
    sequential recolorings reuse site_delta): its trajectories must match
    the tensor-select path step for step, like flip and swap."""
    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11, ewald=True)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([1, 1, 1]),
        chemical_potentials={
            "Li+": 0.1, "vacA0+": 0.0, "Mn3+": 0.05, "Mn4+": 0.0
        },
    )
    results = {}
    for mode in ("ising", "select"):
        monkeypatch.setenv(
            "SMOL_TPU_CHAIN_NO_ISING", "1" if mode == "select" else "0"
        )
        tables, occ, enth, nacc = _run_tableflip_chain(ens)
        assert tables.ising == (mode == "ising"), mode
        results[mode] = (occ, enth, nacc)
    np.testing.assert_array_equal(results["ising"][0], results["select"][0])
    np.testing.assert_array_equal(results["ising"][2], results["select"][2])
    np.testing.assert_allclose(
        results["ising"][1], results["select"][1], rtol=0, atol=1e-9
    )


def test_qary_table_move_matches_select_path(monkeypatch):
    """move="table" on a ternary system dispatches the Z_3 character
    site delta: trajectories must match the tensor-select path."""
    ce = random_expansion(fcc_ternary_prim(), {2: 5.5, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]),
        chemical_potentials={"Au": 0.05, "Ag": 0.0, "Cu": -0.05},
    )
    results = {}
    for mode in ("qary", "select"):
        monkeypatch.setenv(
            "SMOL_TPU_CHAIN_NO_QARY", "1" if mode == "select" else "0"
        )
        tables, occ, enth, nacc = _run_tableflip_chain(ens)
        assert tables.qary == (3 if mode == "qary" else 0), mode
        results[mode] = (occ, enth, nacc)
    np.testing.assert_array_equal(results["qary"][0], results["select"][0])
    np.testing.assert_array_equal(results["qary"][2], results["select"][2])
    np.testing.assert_allclose(
        results["qary"][1], results["select"][1], rtol=0, atol=1e-9
    )


def test_tableflip_chain_matches_enumeration(monkeypatch):
    """Table chain SGC averages match enumeration over the neutral manifold.

    The exogenous symmetric proposal (pallas_chain.TableMove) must sample
    exp(-beta * (E - mu.N)) over all charge-neutral occupancies reachable
    from the start; compare against brute-force enumeration on a tiny
    two-sublattice cell ({Li+, vac} x {Mn3+, Mn4+} with fixed O2-).
    """
    from smol_tpu.cofe import ClusterSubspace
    from smol_tpu.cofe.expansion import ClusterExpansion
    from smol_tpu.crystal import Lattice, Structure

    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")

    a = 4.1
    lat = Lattice(np.eye(3) * a)
    prim = Structure(
        lat,
        [
            {"Li+": 0.5},
            {"Mn3+": 0.5, "Mn4+": 0.5},
            {"O2-": 1.0},
            {"O2-": 1.0},
        ],
        [[0, 0, 0], [0.5, 0.5, 0.5], [0.25, 0.25, 0.25], [0.75, 0.75, 0.75]],
    )
    cs = ClusterSubspace.from_cutoffs(prim, {2: 4.2})
    rng = np.random.default_rng(5)
    coefs = rng.normal(scale=0.02, size=cs.num_corr_functions)
    coefs[0] = -1.0
    ce = ClusterExpansion(cs, coefs)

    temperature = 2000.0
    mus = {"Li+": 0.08, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": -0.03}
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 1, 1]), chemical_potentials=mus
    )
    beta = 1 / (kB * temperature)
    chg = _site_charges(ens)
    n = ens.num_sites
    active = sorted(
        s for sl in ens.sublattices if sl.is_active for s in sl.sites
    )
    n_codes = np.array([len(sp) for sp in ens.processor.allowed_species])

    # enumerate every occupancy on the charge-neutral manifold
    energies, weights = [], []
    for bits in product(*(range(n_codes[s]) for s in active)):
        occu = np.zeros(n, dtype=np.int32)
        occu[active] = bits
        if sum(chg[s][occu[s]] for s in range(n)) != 0:
            continue
        feats = ens.compute_feature_vector(occu)
        h = float(np.dot(feats, ens.natural_parameters))
        energies.append(h)
        weights.append(-beta * h)
    assert len(energies) >= 4, "manifold too small to be a meaningful test"
    weights = np.exp(weights - np.max(weights))
    exact = float(np.dot(energies, weights) / weights.sum())

    # all walkers start on the neutral manifold
    nwalkers = 16
    occu0 = np.zeros((nwalkers, n), dtype=np.int32)
    for w in range(nwalkers):
        # one Li+ (code of Li on its sublattice) and one Mn3+ kept
        occu0[w] = 0
    # set codes so charge is zero: pick the first enumerated neutral config
    for bits in product(*(range(n_codes[s]) for s in active)):
        occ = np.zeros(n, dtype=np.int32)
        occ[active] = bits
        if sum(chg[s][occ[s]] for s in range(n)) == 0:
            occu0[:] = occ
            break
    sampler = Sampler.from_ensemble(
        ens, temperature=temperature, nwalkers=nwalkers, seed=23,
        step_type="table-flip",
    )
    assert sampler._get_chain_fn(20) is not None, "table chain not selected"
    sampler.run(4000, occu0, thin_by=20)
    # all sampled configurations stay charge neutral
    occs = sampler.samples.get_occupancies(flat=True).astype(int)
    qs = np.array(
        [sum(chg[s][o[s]] for s in range(n)) for o in occs[-64:]]
    )
    assert np.all(qs == 0)
    mc_mean = sampler.samples.mean_enthalpy(discard=50)
    sem = np.sqrt(
        sampler.samples.enthalpy_variance(discard=50)
        / sampler.samples.get_enthalpies(discard=50).shape[0]
    )
    assert abs(mc_mean - exact) < max(30 * sem, 2e-2), (mc_mean, exact, sem)


def test_build_table_move_guards():
    """build_table_move falls back (None) when exactness cannot be honored."""
    ce = random_expansion(spinel_prim(), {2: 5.3}, seed=11)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([1, 1, 1]),
        chemical_potentials={
            "Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0
        },
    )
    from smol_tpu.moca.kernel.tableflip import TableFlip

    tables = pallas_chain.build_chain_tables(
        ens.processor, ens.sublattices,
        mu_table=ens.chemical_potential_table,
    )
    assert tables is not None
    usher = TableFlip(ens.sublattices)
    tm = pallas_chain.build_table_move(tables, usher)
    assert tm is not None
    assert tm.n_dirs == 2 * len(usher.flip_table)
    # direction-asymmetric weights break proposal symmetry -> unsupported
    asym = TableFlip(
        ens.sublattices,
        flip_weights=np.arange(1, 2 * len(usher.flip_table) + 1),
    )
    if not np.allclose(
        np.asarray(asym.flip_weights).reshape(-1, 2)[:, 0],
        np.asarray(asym.flip_weights).reshape(-1, 2)[:, 1],
    ):
        assert pallas_chain.build_table_move(tables, asym) is None


def test_multi_chunk_execution():
    """Step counts above the SMEM chunk limit split into scanned chunks."""
    ce = random_expansion(fcc_binary_prim(), {2: 6.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.1, "Cu": 0.0}
    )
    sampler = Sampler.from_ensemble(
        ens, temperature=900.0, nwalkers=4, seed=3
    )
    tables = pallas_chain.build_chain_tables(
        ens.processor, ens.sublattices,
        mu_table=ens.chemical_potential_table,
    )
    occu = _random_occu(ens, 4)
    state = _chain_state(sampler, occu)
    # 150 steps over 64-step chunks: 2 full chunks + 1 partial
    fn = pallas_chain.make_shared_proposal_chain(
        tables, 150, block_size=4, interpret=True, chunk_steps=64
    )
    out = fn(state, jax.random.key(0))
    kernel = sampler.mckernel
    feats = jax.vmap(kernel.full_features_fn())(out["occupancy"])
    exact = feats @ jnp.asarray(kernel.natural_params)
    err = np.max(np.abs(np.asarray(out["enthalpy"]) - np.asarray(exact)))
    assert err < 1e-10, err
    assert np.asarray(out["naccept"]).mean() > 0


def test_walker_padding():
    """Walker counts that are not lane multiples are padded internally."""
    ce = random_expansion(fcc_binary_prim(), {2: 6.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.1, "Cu": 0.0}
    )
    _accum_parity(ens, nwalkers=5, n_steps=60)


def test_semigrand_matches_enumeration(monkeypatch):
    """Chain-kernel SGC averages match exact Boltzmann enumeration."""
    from smol_tpu.cofe import ClusterSubspace
    from smol_tpu.cofe.expansion import ClusterExpansion
    from smol_tpu.crystal import Lattice, Structure

    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")

    a = 3.8
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(lat, [{"Au": 0.5, "Cu": 0.5}], [[0, 0, 0]])
    cs = ClusterSubspace.from_cutoffs(prim, {2: 3.0})
    rng = np.random.default_rng(5)
    coefs = rng.normal(scale=0.02, size=cs.num_corr_functions)
    coefs[0] = -0.5
    ce = ClusterExpansion(cs, coefs)

    temperature = 2000.0
    mus = {"Au": 0.05, "Cu": -0.05}
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials=mus
    )
    beta = 1 / (kB * temperature)
    energies, weights = [], []
    feat_fn = None
    for bits in product((0, 1), repeat=ens.num_sites):
        occu = np.array(bits, dtype=np.int32)
        feats = ens.compute_feature_vector(occu)
        h = float(np.dot(feats, ens.natural_parameters))
        energies.append(h)
        weights.append(-beta * h)
    weights = np.exp(weights - np.max(weights))
    exact = float(np.dot(energies, weights) / weights.sum())

    nwalkers = 16
    occu = np.random.default_rng(4).integers(
        0, 2, (nwalkers, ens.num_sites)
    ).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ens, temperature=temperature, nwalkers=nwalkers, seed=23
    )
    assert sampler._get_chain_fn(20) is not None, "chain path not selected"
    sampler.run(4000, occu, thin_by=20)
    mc_mean = sampler.samples.mean_enthalpy(discard=50)
    sem = np.sqrt(
        sampler.samples.enthalpy_variance(discard=50)
        / sampler.samples.get_enthalpies(discard=50).shape[0]
    )
    # shared site sequences correlate walkers: widen the tolerance by the
    # worst case (one effective walker per block)
    assert abs(mc_mean - exact) < max(30 * sem, 2e-2), (mc_mean, exact, sem)


def test_sweep_schedule_accum_parity_and_path(monkeypatch):
    """Deterministic-sweep flips: exact accumulation on binary (Ising),
    ternary (q-ary), and the Sampler's path marker.

    proposal_mode="sweep" replaces the shared random site sequence with
    a fixed cyclic schedule; all remaining randomness is per-walker, so
    walkers are fully independent chains (pallas_chain docstring).
    """
    ce_b = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    ens_b = Ensemble.from_cluster_expansion(
        ce_b, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.3, "Cu": 0.0}
    )
    _accum_parity(ens_b, proposal_mode="sweep")
    ce_t = random_expansion(fcc_ternary_prim(), {2: 5.5, 3: 4.0}, seed=7)
    ens_t = Ensemble.from_cluster_expansion(
        ce_t, np.diag([2, 2, 2]),
        chemical_potentials={"Au": 0.05, "Ag": 0.0, "Cu": -0.05},
    )
    _accum_parity(ens_t, proposal_mode="sweep")

    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")
    sampler = Sampler.from_ensemble(
        ens_b, temperature=900.0, nwalkers=4, seed=3, proposal_mode="sweep"
    )
    assert sampler._get_chain_fn(25) is not None
    assert "sweep-schedule+independent-walkers" in sampler.execution_path(25)
    # sweeps are flip-only: canonical swaps must fall back (no chain fn)
    ens_cn = Ensemble.from_cluster_expansion(ce_b, np.diag([2, 2, 2]))
    s_cn = Sampler.from_ensemble(
        ens_cn, temperature=900.0, nwalkers=4, seed=3, proposal_mode="sweep"
    )
    assert s_cn._get_chain_fn(25) is None


def test_sweep_semigrand_matches_enumeration(monkeypatch):
    """Sweep-schedule SGC averages match exact Boltzmann enumeration.

    Systematic-scan Metropolis is pi-invariant per site update and the
    cyclic schedule visits every active site, so the stationary
    distribution is exactly the semigrand Boltzmann measure; since the
    walkers are fully independent the across-walker standard error needs
    no shared-sequence widening.
    """
    from smol_tpu.cofe import ClusterSubspace
    from smol_tpu.cofe.expansion import ClusterExpansion
    from smol_tpu.crystal import Lattice, Structure

    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")

    a = 3.8
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(lat, [{"Au": 0.5, "Cu": 0.5}], [[0, 0, 0]])
    cs = ClusterSubspace.from_cutoffs(prim, {2: 3.0})
    rng = np.random.default_rng(5)
    coefs = rng.normal(scale=0.02, size=cs.num_corr_functions)
    coefs[0] = -0.5
    ce = ClusterExpansion(cs, coefs)

    temperature = 2000.0
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.05, "Cu": -0.05}
    )
    beta = 1 / (kB * temperature)
    energies, weights = [], []
    for bits in product((0, 1), repeat=ens.num_sites):
        occu = np.array(bits, dtype=np.int32)
        feats = ens.compute_feature_vector(occu)
        h = float(np.dot(feats, ens.natural_parameters))
        energies.append(h)
        weights.append(-beta * h)
    weights = np.exp(weights - np.max(weights))
    exact = float(np.dot(energies, weights) / weights.sum())

    nwalkers = 16
    occu = np.random.default_rng(4).integers(
        0, 2, (nwalkers, ens.num_sites)
    ).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ens, temperature=temperature, nwalkers=nwalkers, seed=23,
        proposal_mode="sweep",
    )
    assert sampler._get_chain_fn(20) is not None, "sweep chain not selected"
    assert "sweep-schedule" in sampler.execution_path(20)
    sampler.run(4000, occu, thin_by=20)
    mc_mean = sampler.samples.mean_enthalpy(discard=50)
    sem = np.sqrt(
        sampler.samples.enthalpy_variance(discard=50)
        / sampler.samples.get_enthalpies(discard=50).shape[0]
    )
    assert abs(mc_mean - exact) < max(6 * sem, 5e-3), (mc_mean, exact, sem)


def test_sampler_trace_consistency(monkeypatch):
    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")
    ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.3, "Cu": 0.0}
    )
    nwalkers = 4
    sampler = Sampler.from_ensemble(
        ens, temperature=900.0, nwalkers=nwalkers, seed=3
    )
    assert sampler._get_chain_fn(25) is not None
    occu = _random_occu(ens, nwalkers)
    sampler.run(100, occu, thin_by=25)
    occs = sampler.samples.get_occupancies(flat=False)
    feats = np.asarray(
        jax.vmap(jax.vmap(sampler.mckernel.full_features_fn()))(occs)
    )
    stored = sampler.samples.get_feature_vectors(flat=False)
    assert np.abs(feats - stored).max() < 1e-12
    enth = sampler.samples.get_enthalpies(flat=False)
    recomputed = feats @ ens.natural_parameters
    assert np.abs(enth - recomputed).max() < 1e-10


def test_guards():
    """Unsupported systems must fall back (None), not crash."""
    ce = random_expansion(fcc_binary_prim(), {2: 6.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.0, "Cu": 0.0}
    )
    # restricted sites on an active sublattice -> unsupported
    subl = ens.sublattices
    subl[0].restrict_sites(subl[0].sites[:2])
    tables = pallas_chain.build_chain_tables(
        ens.processor, subl, mu_table=ens.chemical_potential_table
    )
    assert tables is None
    subl[0].reset_restricted_sites()

    # wrong sublattice-probability count -> unsupported
    tables = pallas_chain.build_chain_tables(
        ens.processor, ens.sublattices,
        sublattice_probabilities=[0.5, 0.5],
    )
    assert tables is None


def test_kernel_fallback_off_tpu():
    """Without TPU or interpret mode the kernel reports unavailable."""
    ce = random_expansion(fcc_binary_prim(), {2: 6.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.0, "Cu": 0.0}
    )
    sampler = Sampler.from_ensemble(
        ens, temperature=500.0, nwalkers=2, seed=1
    )
    # the suite runs on CPU without the interpret env var by default
    import os

    if os.environ.get("SMOL_TPU_CHAIN_INTERPRET"):
        pytest.skip("interpret mode forced in this environment")
    assert sampler.mckernel.make_chain_fn(10) is None


@pytest.mark.parametrize("move", ["flip", "swap"])
def test_accum_parity_streamed_hbm(move):
    """Streamed-HBM table path (double-buffered DMA) matches exact energies.

    Forces ``streamed=True`` (normally auto-enabled only above
    VMEM_TABLE_BUDGET) with a small ``chunk_steps`` so the final chunk is
    PARTIAL (150 = 64 + 64 + 22) — exercising the last-prefetch drain at
    kernel exit and the per-chunk DMA slot accounting for both the
    single-role (flip) and two-role (swap) layouts.
    """
    ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    mu = {"Au": 0.3, "Cu": 0.0} if move == "flip" else None
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials=mu
    )
    _accum_parity(ens, move=move, streamed=True, chunk_steps=64)


def test_accum_parity_streamed_tableflip():
    """Streamed-HBM path with multi-slot table moves (k_max role DMAs)."""
    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11, ewald=True)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([1, 1, 1]),
        chemical_potentials={
            "Li+": 0.1, "vacA0+": 0.0, "Mn3+": 0.05, "Mn4+": 0.0
        },
    )
    nwalkers, n_steps = 8, 150
    sampler = Sampler.from_ensemble(
        ens, temperature=1000.0, nwalkers=nwalkers, seed=3,
        step_type="table-flip",
    )
    kernel = sampler.mckernel
    tables, _, table_move = kernel._get_chain_tables()
    occu = _random_occu(ens, nwalkers)
    state = _chain_state(sampler, occu)
    fn = pallas_chain.make_shared_proposal_chain(
        tables, n_steps, block_size=nwalkers, interpret=True,
        move="table", table_move=table_move, streamed=True, chunk_steps=64,
    )
    out = fn(state, jax.random.key(0))
    feats = jax.vmap(kernel.full_features_fn())(out["occupancy"])
    exact = feats @ jnp.asarray(kernel.natural_params)
    err = np.max(np.abs(np.asarray(out["enthalpy"]) - np.asarray(exact)))
    scale = max(1.0, float(np.max(np.abs(np.asarray(exact)))))
    assert err / scale < 1e-10, (err, scale)
    assert np.asarray(out["naccept"]).mean() > 0


def test_ewald_acceptance_precision_2x2x2(monkeypatch):
    """f32 Ewald-delta acceptance is statistically unbiased at real size.

    The chain kernel accumulates the electrostatic part of each delta in
    f32 (~1e-6 relative; ops/pallas_chain.py module docstring) while
    bookkeeping stays exact via df/thin-point recomputation.  This test
    bounds the resulting ACCEPTANCE bias on a 2x2x2 spinel-Ewald cell
    (112 sites — Ewald rows two orders larger than the 14-site parity
    cell): SGC ensemble means from the chain kernel must match the
    exact-double-float per-step XLA path at the 5-sigma level.
    """
    from smol_tpu.capp.generate.random import generate_random_ordered_occupancy

    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11, ewald=True)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]),
        chemical_potentials={
            "Li+": 0.1, "vacA0+": 0.0, "Mn3+": 0.05, "Mn4+": 0.0
        },
    )
    # charge-neutral manifold via table-flip moves: plain flips on this
    # Ewald-dominated cell quench every walker into one frozen state
    T, nw = 2000.0, 8
    rng = np.random.default_rng(2)
    occ0 = generate_random_ordered_occupancy(
        ens.processor, charge_neutral=True, rng=rng
    )
    occu = np.tile(occ0, (nw, 1)).astype(np.int32)

    def sgc_stats(sampler, nsteps, thin, discard):
        sampler.run(nsteps, occu, thin_by=thin)
        enth = sampler.samples.get_trace_value("enthalpy", flat=False)
        occs = sampler.samples.get_trace_value("occupancy", flat=False)
        enth = enth[discard:]
        li = (occs[discard:] == 0).sum(axis=-1).astype(float)
        # per-walker means -> across-walker mean and SEM
        em, lm = enth.mean(axis=0), li.mean(axis=0)
        return (
            em.mean(), em.std(ddof=1) / np.sqrt(nw),
            lm.mean(), lm.std(ddof=1) / np.sqrt(nw),
        )

    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "1")
    s_chain = Sampler.from_ensemble(
        ens, temperature=T, nwalkers=nw, seed=11, step_type="table-flip"
    )
    assert s_chain._get_chain_fn(50) is not None, "chain path not selected"
    e1, se1, l1, sl1 = sgc_stats(s_chain, 2000, 50, 10)

    monkeypatch.setenv("SMOL_TPU_CHAIN_INTERPRET", "0")
    s_exact = Sampler.from_ensemble(
        ens, temperature=T, nwalkers=nw, seed=29, shared_proposals=False,
        step_type="table-flip",
    )
    assert s_exact._get_chain_fn(50) is None
    e2, se2, l2, sl2 = sgc_stats(s_exact, 6000, 50, 30)

    tol_e = 5 * np.hypot(se1, se2)
    tol_l = 5 * np.hypot(sl1, sl2)
    assert abs(e1 - e2) < tol_e, (e1, e2, tol_e)
    assert abs(l1 - l2) < tol_l, (l1, l2, tol_l)
