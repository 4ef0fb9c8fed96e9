"""Integration tests over realistic disordered prims.

The reference parametrizes its whole suite over five real disordered
structures including low-symmetry cells with vacancies and electrostatics
(reference tests/conftest.py:36-44).  This module exercises the
from-scratch symmetry finder, matcher, packing, processors, and sampler on
the analogous hard cases:

- ternary rocksalt oxide with cation vacancies and charged species,
- a monoclinic (low-symmetry) layered oxide with two distinct cation
  sublattices + Ewald electrostatics,
- a BCC ternary alloy.

Invariants per prim: symmetry-closure of the generated subspace,
corr-vector roundtrip through structure matching, delta-vs-full drift at
machine epsilon, MSON + pickle round trips, and a short sampling run with
exact trace parity.
"""

import numpy as np
import pytest

import jax

from smol_tpu.cofe import ClusterSubspace
from smol_tpu.cofe.expansion import ClusterExpansion
from smol_tpu.cofe.extern import EwaldTerm
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.moca.processor.expansion import ClusterExpansionProcessor
from tests.utils import assert_msonable, assert_pickles


def rocksalt_lmto():
    """Ternary rocksalt oxide with cation vacancies (Li/Mn/Ti on fcc)."""
    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    return Structure(
        lat,
        [{"Li+": 0.4, "Mn3+": 0.3, "Ti4+": 0.2}, {"O2-": 1.0}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )


def monoclinic_layered():
    """Low-symmetry monoclinic oxide, two distinct cation sublattices."""
    lat = Lattice(np.array([[5.1, 0, 0], [0, 3.1, 0], [-1.1, 0, 4.9]]))
    return Structure(
        lat,
        [
            {"Li+": 0.5},
            {"Ni2+": 0.5, "Ni3+": 0.5},
            {"O2-": 1.0},
            {"O2-": 1.0},
        ],
        [
            [0.0, 0.0, 0.0],
            [0.5, 0.5, 0.35],
            [0.25, 0.0, 0.6],
            [0.75, 0.5, 0.8],
        ],
    )


def bcc_ternary():
    """BCC ternary alloy prim (CrFeW-like)."""
    a = 3.1
    lat = Lattice(np.array([[-0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, -0.5]]) * a)
    return Structure(lat, [{"Cr": 1 / 3, "Fe": 1 / 3, "W": 1 / 3}], [[0, 0, 0]])


PRIMS = {
    "rocksalt-lmto-vac": (rocksalt_lmto, {2: 4.4}, np.diag([2, 2, 1])),
    "monoclinic-layered": (monoclinic_layered, {2: 4.0}, np.diag([1, 2, 1])),
    "bcc-ternary": (bcc_ternary, {2: 3.3, 3: 3.0}, np.diag([2, 2, 2])),
}


@pytest.fixture(scope="module", params=list(PRIMS), ids=list(PRIMS))
def setup(request):
    builder, cutoffs, scm = PRIMS[request.param]
    prim = builder()
    subspace = ClusterSubspace.from_cutoffs(prim, cutoffs)
    rng = np.random.default_rng(17)
    coefs = rng.normal(scale=0.05, size=subspace.num_corr_functions)
    coefs[0] = -1.0
    return prim, subspace, ClusterExpansion(subspace, coefs), scm


def test_subspace_sanity(setup):
    prim, subspace, ce, scm = setup
    assert subspace.num_corr_functions > 1
    assert len(subspace.orbits) >= 1
    # orbit multiplicities are consistent with the symmetry operations
    assert all(o.multiplicity >= 1 for o in subspace.orbits)


def test_corr_structure_roundtrip(setup):
    """Encoded occupancy -> structure -> matched corr == direct corr."""
    prim, subspace, ce, scm = setup
    proc = ClusterExpansionProcessor(
        subspace, scm, np.ones(subspace.num_corr_functions)
    )
    from smol_tpu.capp import generate_random_ordered_occupancy

    occu = generate_random_ordered_occupancy(
        proc, rng=np.random.default_rng(3)
    )
    ref = subspace.corr_from_occupancy(occu, scm)
    structure = proc.structure_from_occupancy(occu)
    corr = subspace.corr_from_structure(structure)
    np.testing.assert_allclose(corr, ref, atol=1e-10)


def test_drift_and_sampling(setup):
    """Delta updates match full recomputation; traces stay exact."""
    prim, subspace, ce, scm = setup
    from smol_tpu.cofe.space.domain import get_site_spaces

    mus = {
        str(sp): 0.0
        for space in get_site_spaces(subspace.expansion_structure)
        for sp in space
    }
    ens = Ensemble.from_cluster_expansion(ce, scm, chemical_potentials=mus)
    fwd, rev = ens.processor.compute_average_drift(iterations=200)
    assert abs(fwd) < 1e-12 and abs(rev) < 1e-12

    nwalkers = 4
    rng = np.random.default_rng(5)
    n_codes = np.array([len(sp) for sp in ens.processor.allowed_species])
    occu = (rng.random((nwalkers, ens.num_sites)) * n_codes).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ens, temperature=1500.0, nwalkers=nwalkers, seed=7
    )
    sampler.run(200, occu, thin_by=50)
    occs = sampler.samples.get_occupancies(flat=False)
    feats = np.asarray(
        jax.vmap(jax.vmap(sampler.mckernel.full_features_fn()))(occs)
    )
    enth = sampler.samples.get_enthalpies(flat=False)
    assert np.abs(enth - feats @ ens.natural_parameters).max() < 1e-10


def test_serialization_roundtrips(setup):
    prim, subspace, ce, scm = setup
    assert_msonable(subspace)
    assert_pickles(subspace)
    assert_msonable(ce)
    assert_pickles(ce)
    ens = Ensemble.from_cluster_expansion(ce, scm)
    assert_msonable(ens)
    assert_pickles(ens)
    # the round-tripped subspace still evaluates identically
    clone = assert_pickles(subspace)
    proc = ClusterExpansionProcessor(
        subspace, scm, np.ones(subspace.num_corr_functions)
    )
    from smol_tpu.capp import generate_random_ordered_occupancy

    occu = generate_random_ordered_occupancy(
        proc, rng=np.random.default_rng(3)
    )
    np.testing.assert_allclose(
        clone.corr_from_occupancy(occu, scm),
        subspace.corr_from_occupancy(occu, scm),
        atol=1e-12,
    )


def test_ewald_composite_monoclinic():
    """Ewald composite on the low-symmetry oxide: drift + short run."""
    prim = monoclinic_layered()
    subspace = ClusterSubspace.from_cutoffs(prim, {2: 4.0})
    subspace.add_external_term(EwaldTerm())
    rng = np.random.default_rng(23)
    coefs = rng.normal(scale=0.05, size=len(subspace))
    coefs[0] = -1.0
    coefs[-1] = 0.2
    ce = ClusterExpansion(subspace, coefs)
    scm = np.diag([1, 2, 1])
    mus = {"Li+": 0.0, "vacA0+": 0.0, "Ni2+": 0.0, "Ni3+": 0.0}
    ens = Ensemble.from_cluster_expansion(ce, scm, chemical_potentials=mus)
    fwd, rev = ens.processor.compute_average_drift(iterations=100)
    assert abs(fwd) < 1e-10 and abs(rev) < 1e-10
    nwalkers = 2
    n_codes = np.array([len(sp) for sp in ens.processor.allowed_species])
    occu = (
        np.random.default_rng(4).random((nwalkers, ens.num_sites)) * n_codes
    ).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ens, temperature=2000.0, nwalkers=nwalkers, seed=11
    )
    sampler.run(100, occu, thin_by=25)
    occs = sampler.samples.get_occupancies(flat=False)
    feats = np.asarray(
        jax.vmap(jax.vmap(sampler.mckernel.full_features_fn()))(occs)
    )
    enth = sampler.samples.get_enthalpies(flat=False)
    assert np.abs(enth - feats @ ens.natural_parameters).max() < 1e-9
