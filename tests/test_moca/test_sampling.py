"""End-to-end MC sampling tests.

Statistical golden tests: device-sampled averages must match brute-force
Boltzmann enumeration on small systems (the strongest possible check of
proposal + acceptance + energy-delta correctness), plus trace consistency
(saved enthalpies equal recomputation from occupancies, reference
test_sampler.py:70-80 analog).
"""

from itertools import product

import numpy as np
import pytest

from smol_tpu.cofe import ClusterSubspace
from smol_tpu.cofe.expansion import ClusterExpansion
from smol_tpu.constants import kB
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.moca import Ensemble, Sampler


@pytest.fixture(scope="module")
def small_ce():
    a = 3.8
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(lat, [{"Au": 0.5, "Cu": 0.5}], [[0, 0, 0]])
    cs = ClusterSubspace.from_cutoffs(prim, {2: 3.0})
    rng = np.random.default_rng(5)
    coefs = rng.normal(scale=0.02, size=cs.num_corr_functions)
    coefs[0] = -0.5
    return ClusterExpansion(cs, coefs)


def enumerate_boltzmann(ensemble, temperature, fixed_n=None):
    """Exact canonical/semigrand averages on a tiny binary cell."""
    n = ensemble.num_sites
    beta = 1 / (kB * temperature)
    energies, weights = [], []
    for bits in product((0, 1), repeat=n):
        occu = np.array(bits, dtype=np.int32)
        if fixed_n is not None and occu.sum() != fixed_n:
            continue
        h = float(
            ensemble.compute_feature_vector(occu) @ ensemble.natural_parameters
        )
        energies.append(h)
        weights.append(-beta * h)
    energies = np.array(energies)
    weights = np.exp(np.array(weights) - np.max(weights))
    weights /= weights.sum()
    return float(energies @ weights)


def test_canonical_matches_enumeration(small_ce):
    scm = np.diag([2, 2, 2])  # 8 sites
    ens = Ensemble.from_cluster_expansion(small_ce, scm)
    temperature = 2000.0
    exact = enumerate_boltzmann(ens, temperature, fixed_n=4)

    rng = np.random.default_rng(3)
    nwalkers = 64
    occu = np.zeros((nwalkers, 8), dtype=np.int32)
    for w in range(nwalkers):
        occu[w, rng.choice(8, 4, replace=False)] = 1
    sampler = Sampler.from_ensemble(
        ens, temperature=temperature, nwalkers=nwalkers, seed=17
    )
    sampler.run(16000, occu, thin_by=10)
    mc_mean = sampler.samples.mean_enthalpy(discard=400)
    sem = np.sqrt(
        sampler.samples.enthalpy_variance(discard=400)
        / sampler.samples.get_enthalpies(discard=400).shape[0]
    )
    # autocorrelation inflates the true error; allow a generous factor
    assert abs(mc_mean - exact) < max(10 * sem, 5e-3), (mc_mean, exact, sem)


def test_semigrand_matches_enumeration(small_ce):
    scm = np.diag([2, 2, 2])
    mus = {"Au": 0.05, "Cu": -0.05}
    ens = Ensemble.from_cluster_expansion(small_ce, scm, chemical_potentials=mus)
    temperature = 2000.0
    exact = enumerate_boltzmann(ens, temperature)

    rng = np.random.default_rng(4)
    nwalkers = 64
    occu = rng.integers(0, 2, (nwalkers, 8)).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ens, temperature=temperature, nwalkers=nwalkers, seed=23
    )
    sampler.run(16000, occu, thin_by=10)
    mc_mean = sampler.samples.mean_enthalpy(discard=400)
    sem = np.sqrt(
        sampler.samples.enthalpy_variance(discard=400)
        / sampler.samples.get_enthalpies(discard=400).shape[0]
    )
    assert abs(mc_mean - exact) < max(10 * sem, 5e-3), (mc_mean, exact, sem)


def test_trace_consistency_and_composition(small_ce):
    scm = np.diag([3, 3, 3])
    ens = Ensemble.from_cluster_expansion(small_ce, scm)
    rng = np.random.default_rng(0)
    nwalkers = 4
    occu = rng.integers(0, 2, (nwalkers, ens.num_sites)).astype(np.int32)
    sampler = Sampler.from_ensemble(ens, temperature=500.0, nwalkers=nwalkers, seed=1)
    sampler.run(600, occu, thin_by=6)
    samples = sampler.samples
    assert samples.num_samples == 100

    # recorded enthalpy == recompute from recorded occupancy (1e-8 target)
    occus = samples.get_occupancies(flat=False)
    enths = samples.get_enthalpies(flat=False)
    feats = samples.get_feature_vectors(flat=False)
    for s in (0, 50, 99):
        for w in range(nwalkers):
            f = ens.compute_feature_vector(occus[s, w])
            np.testing.assert_allclose(f, feats[s, w], rtol=1e-10, atol=1e-10)
            assert abs(f @ ens.natural_parameters - enths[s, w]) < 1e-8

    # swap moves conserve composition per walker
    for w in range(nwalkers):
        assert occus[:, w].sum(axis=-1).std() == 0

    # continuing a run without initial occupancies extends the chain
    sampler.run(60, thin_by=6)
    assert sampler.samples.num_samples == 110


def test_uniformly_random_kernel(small_ce):
    scm = np.diag([2, 2, 2])
    ens = Ensemble.from_cluster_expansion(
        small_ce, scm, chemical_potentials={"Au": 0.0, "Cu": 0.0}
    )
    rng = np.random.default_rng(0)
    occu = rng.integers(0, 2, (16, 8)).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ens, kernel_type="uniformly-random", nwalkers=16, seed=2
    )
    sampler.run(4000, occu, thin_by=10)
    # infinite temperature: mean site occupancy ~ 0.5
    occus = sampler.samples.get_occupancies(discard=100)
    assert abs(occus.mean() - 0.5) < 0.05


def test_container_hdf5_roundtrip(small_ce, tmp_path):
    scm = np.diag([2, 2, 2])
    ens = Ensemble.from_cluster_expansion(small_ce, scm)
    rng = np.random.default_rng(0)
    occu = rng.integers(0, 2, (2, 8)).astype(np.int32)
    sampler = Sampler.from_ensemble(ens, temperature=400.0, nwalkers=2, seed=3)
    sampler.run(100, occu, thin_by=5)
    path = str(tmp_path / "samples.h5")
    sampler.samples.to_hdf5(path)
    from smol_tpu.moca import SampleContainer

    loaded = SampleContainer.from_hdf5(path)
    assert loaded.num_samples == sampler.samples.num_samples
    np.testing.assert_array_equal(
        loaded.get_occupancies(), sampler.samples.get_occupancies()
    )
    np.testing.assert_allclose(
        loaded.get_enthalpies(), sampler.samples.get_enthalpies()
    )


def test_streaming_backend(small_ce, tmp_path):
    scm = np.diag([2, 2, 2])
    ens = Ensemble.from_cluster_expansion(small_ce, scm)
    rng = np.random.default_rng(0)
    occu = rng.integers(0, 2, (2, 8)).astype(np.int32)
    sampler = Sampler.from_ensemble(ens, temperature=400.0, nwalkers=2, seed=3)
    path = str(tmp_path / "stream.h5")
    sampler.run(200, occu, thin_by=5, stream_chunk=10, stream_file=path)
    from smol_tpu.moca import SampleContainer

    loaded = SampleContainer.from_hdf5(path)
    assert loaded.num_samples == 40
    assert loaded.get_occupancies().shape == (80, 8)


def test_anneal(small_ce):
    scm = np.diag([2, 2, 2])
    ens = Ensemble.from_cluster_expansion(small_ce, scm)
    rng = np.random.default_rng(0)
    occu = rng.integers(0, 2, (8, 8)).astype(np.int32)
    sampler = Sampler.from_ensemble(ens, temperature=2000.0, nwalkers=8, seed=3)
    sampler.anneal([2000.0, 500.0, 100.0], 500, occu, thin_by=10)
    temps = sampler.samples.get_temperatures(flat=False)
    assert temps.shape[0] == 150
    assert temps[0, 0] == pytest.approx(2000.0)
    assert temps[-1, 0] == pytest.approx(100.0)
    # energies should not increase on average as T drops
    e = sampler.samples.get_energies(flat=False).mean(axis=1)
    assert e[140:].mean() <= e[:50].mean() + 1e-8


def test_get_orbit_factors(small_ce):
    """Per-orbit factor getter groups weighted features by orbit id
    (reference container.py:269)."""
    scm = np.diag([2, 2, 2])
    ens = Ensemble.from_cluster_expansion(small_ce, scm)
    rng = np.random.default_rng(4)
    occu = rng.integers(0, 2, (2, ens.num_sites)).astype(np.int32)
    sampler = Sampler.from_ensemble(ens, temperature=800.0, nwalkers=2, seed=5)
    sampler.run(40, occu, thin_by=10)
    samples = sampler.samples
    # decomposition processor: one feature per orbit already
    nf = len(samples.natural_parameters)
    ids = np.arange(nf)
    factors = samples.get_orbit_factors(ids, flat=False)
    assert factors.shape[-1] == nf
    vals = samples.natural_parameters * samples.get_feature_vectors(flat=False)
    np.testing.assert_allclose(factors, vals, rtol=1e-12)
    # grouping all features into one orbit sums to the enthalpy
    ones = np.zeros(nf, dtype=np.int64)
    total = samples.get_orbit_factors(ones, flat=False)
    np.testing.assert_allclose(
        total[..., 0], samples.get_enthalpies(flat=False), rtol=1e-10
    )
