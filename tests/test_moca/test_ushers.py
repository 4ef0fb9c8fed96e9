"""MC usher tests: MultiStep, Composite, UniformlyRandom, sublattice split.

Mirrors reference tests for kernel/mcusher.py:203-393 (MultiStep/Composite),
kernel/random.py (infinite-temperature kernel), and sublattice splitting
(sublattice.py:109-184, ensemble.py:288).
"""

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim, fcc_ternary_prim
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.cofe.expansion import ClusterExpansion
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.moca.kernel.mcusher import (
    Composite,
    Flip,
    MultiStep,
    Swap,
    mcusher_factory,
)


@pytest.fixture(scope="module")
def ensemble():
    cs = ClusterSubspace.from_cutoffs(fcc_ternary_prim(), {2: 3.0})
    rng = np.random.default_rng(13)
    coefs = rng.normal(scale=0.02, size=cs.num_corr_functions)
    coefs[0] = -0.7
    exp = ClusterExpansion(cs, coefs)
    return Ensemble.from_cluster_expansion(exp, np.diag([2, 2, 2]))


def _random_occu(ensemble, seed=0):
    rng = np.random.default_rng(seed)
    sizes = {}
    for subl in ensemble.sublattices:
        for s in subl.sites:
            sizes[int(s)] = len(subl.encoding)
    return np.array(
        [rng.integers(0, sizes[i]) for i in range(ensemble.num_sites)],
        dtype=np.int32,
    )


def _valid_flip(ensemble, site, code):
    for subl in ensemble.sublattices:
        if site in subl.sites:
            return code in subl.encoding
    return False


def test_multistep_proposals(ensemble):
    usher = MultiStep(ensemble.sublattices, "flip", step_lengths=3)
    occu = _random_occu(ensemble, 1)
    for _ in range(50):
        step = usher.propose_step(occu)
        assert 1 <= len(step) <= 3
        sites = [s for s, _ in step]
        assert len(set(sites)) == len(sites)  # no repeated sites
        for site, code in step:
            assert _valid_flip(ensemble, site, code)


def test_multistep_probabilities_validation(ensemble):
    with pytest.raises(ValueError):
        MultiStep(
            ensemble.sublattices, "flip", step_lengths=[1, 2],
            step_probabilities=[0.9, 0.3],
        )
    with pytest.raises(ValueError):
        MultiStep(
            ensemble.sublattices, "flip", step_lengths=[1, 2, 3],
            step_probabilities=[0.5, 0.5],
        )


def test_composite_proposals(ensemble):
    usher = Composite(
        ensemble.sublattices, ["flip", "swap"], mcusher_weights=[1, 2]
    )
    assert len(usher.mcushers) == 2
    np.testing.assert_allclose(usher.probabilities, [1 / 3, 2 / 3])
    occu = _random_occu(ensemble, 2)
    saw_sizes = set()
    for _ in range(100):
        step = usher.propose_step(occu)
        saw_sizes.add(len(step))
        for site, code in step:
            assert _valid_flip(ensemble, site, code)
    assert saw_sizes == {1, 2}  # both flip (1) and swap (2) get chosen


def test_mcusher_factory(ensemble):
    assert isinstance(mcusher_factory("flip", ensemble.sublattices), Flip)
    assert isinstance(mcusher_factory("swap", ensemble.sublattices), Swap)
    assert isinstance(
        mcusher_factory(
            "multi-step", ensemble.sublattices, "flip", step_lengths=2
        ),
        MultiStep,
    )


def test_uniformly_random_kernel(ensemble):
    """Infinite-T kernel: every composition visited uniformly (binary cell)."""
    cs = ClusterSubspace.from_cutoffs(fcc_binary_prim(), {2: 3.0})
    coefs = np.zeros(cs.num_corr_functions)
    coefs[0] = 1.0
    exp = ClusterExpansion(cs, coefs)
    ens = Ensemble.from_cluster_expansion(exp, np.diag([2, 1, 1]))
    ens.chemical_potentials = {"Au": 0.0, "Cu": 0.0}  # flips allowed

    sampler = Sampler.from_ensemble(
        ens, kernel_type="uniformly-random", step_type="flip", nwalkers=8,
        seed=21,
    )
    occu = np.zeros((8, ens.num_sites), dtype=np.int32)
    sampler.run(4000, occu, thin_by=4)
    occus = sampler.samples.get_occupancies(discard=200)
    # each site occupied half the time under uniform sampling
    freqs = occus.reshape(-1, ens.num_sites).mean(axis=0)
    np.testing.assert_allclose(freqs, 0.5, atol=0.1)


def test_split_sublattice_by_species(ensemble):
    cs = ClusterSubspace.from_cutoffs(fcc_ternary_prim(), {2: 3.0})
    coefs = np.zeros(cs.num_corr_functions)
    exp = ClusterExpansion(cs, coefs)
    ens = Ensemble.from_cluster_expansion(exp, np.diag([2, 2, 2]))
    n0 = len(ens.sublattices)
    occu = _random_occu(ens, 3)
    species = list(ens.sublattices[0].site_spaces[0]) if hasattr(
        ens.sublattices[0], "site_spaces"
    ) else list(ens.sublattices[0].species)
    # partition species: first alone, rest together
    parts = [[species[0]], species[1:]]
    ens.split_sublattice_by_species(0, occu, parts)
    assert len(ens.sublattices) == n0 + 1
    all_sites = np.concatenate([s.sites for s in ens.sublattices])
    assert len(all_sites) == ens.num_sites
    assert len(np.unique(all_sites)) == ens.num_sites
