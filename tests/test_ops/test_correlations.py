"""Parity tests: device (JAX) kernels vs numpy reference evaluator.

Mirrors the reference's evaluator consistency strategy
(tests/test_utils/test_evaluator.py): the packed device kernels must agree
with the per-orbit numpy loops at f64, and delta updates must agree with
full recomputation (drift ~ machine epsilon).
"""

import numpy as np
import pytest

from smol_tpu.cofe import ClusterSubspace
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.ops import ref as refops
from smol_tpu.ops import correlations as dev
from smol_tpu.ops.packing import pack_interactions, pack_supercell

DRIFT_TOL = 10 * np.finfo(np.float64).eps


def fcc_prim(species):
    a = 3.8
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    return Structure(lat, [species], [[0, 0, 0]])


def rocksalt_prim():
    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    return Structure(
        lat,
        [{"Li+": 0.5, "Mn3+": 0.3, "Mn4+": 0.2}, {"O2-": 1.0}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )


CASES = [
    (fcc_prim({"Au": 0.5, "Cu": 0.5}), {2: 5.4, 3: 2.8}, np.diag([3, 3, 3])),
    (fcc_prim({"Au": 1 / 3, "Ag": 1 / 3, "Cu": 1 / 3}), {2: 3.9, 3: 2.8},
     np.diag([2, 2, 2])),
    (rocksalt_prim(), {2: 4.3, 3: 3.0}, np.array([[2, 0, 0], [0, 2, 0], [1, 0, 2]])),
]


@pytest.fixture(params=range(len(CASES)), scope="module")
def case(request):
    prim, cutoffs, scm = CASES[request.param]
    cs = ClusterSubspace.from_cutoffs(prim, cutoffs)
    packed = pack_supercell(cs, scm)
    dp = dev.to_device(packed)
    rng = np.random.default_rng(7 + request.param)
    n_codes = np.array(
        [len(sp) for sp in
         __import__("smol_tpu.cofe.space.domain", fromlist=["get_site_spaces"])
         .get_site_spaces(prim.copy().make_supercell(scm))]
    )
    occu = (rng.random(packed.num_sites) * n_codes).astype(np.int32)
    return cs, scm, packed, dp, occu, n_codes, rng


def test_corr_parity(case):
    cs, scm, packed, dp, occu, *_ = case
    ref = refops.corr_from_occupancy(
        occu, refops.get_orbit_data(cs.orbits),
        cs.get_orbit_indices(scm).arrays, cs.num_corr_functions,
    )
    out = np.asarray(dev.corr_from_occupancy(occu, dp, cs.num_corr_functions))
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, ref, atol=1e-12, rtol=1e-12)


def test_interactions_parity(case):
    cs, scm, packed, dp, occu, *_ = case
    rng = np.random.default_rng(3)
    # random interaction tensors of the right shapes
    tensors = [np.array(rng.normal())] + [
        rng.normal(size=o.correlation_tensors.shape[1:]) for o in cs.orbits
    ]
    inter_flat, offset = pack_interactions(cs, tensors)
    ref = refops.interactions_from_occupancy(
        occu,
        refops.get_orbit_data(cs.orbits),
        [t.ravel() for t in tensors[1:]],
        offset,
        cs.get_orbit_indices(scm).arrays,
        cs.num_orbits,
    )
    out = np.asarray(
        dev.interactions_from_occupancy(occu, dp, inter_flat, offset, cs.num_orbits)
    )
    np.testing.assert_allclose(out, ref, atol=1e-12, rtol=1e-12)


def test_delta_corr_vs_full(case):
    """Delta correlation must equal full recomputation difference."""
    cs, scm, packed, dp, occu, n_codes, rng = case
    data = refops.get_orbit_data(cs.orbits)
    inds = cs.get_orbit_indices(scm).arrays
    occu = occu.copy()
    for _ in range(20):
        site = int(rng.integers(packed.num_sites))
        new = int(rng.integers(n_codes[site]))
        occu_f = occu.copy()
        occu_f[site] = new
        full_delta = refops.corr_from_occupancy(
            occu_f, data, inds, cs.num_corr_functions
        ) - refops.corr_from_occupancy(occu, data, inds, cs.num_corr_functions)
        full_delta[0] = 0.0
        out = np.asarray(
            dev.delta_corr_single_flip(occu, site, new, dp, cs.num_corr_functions)
        )
        np.testing.assert_allclose(out, full_delta, atol=1e-11)
        occu = occu_f


def test_delta_interactions_and_energy_vs_full(case):
    cs, scm, packed, dp, occu, n_codes, rng = case
    tensors = [np.array(rng.normal())] + [
        rng.normal(size=o.correlation_tensors.shape[1:]) for o in cs.orbits
    ]
    inter_flat, offset = pack_interactions(cs, tensors)
    coefs = rng.normal(size=cs.num_orbits)
    # energy = coefs . (interactions * size)
    weights = coefs * packed.size / np.maximum(packed.orbit_cluster_count, 1)
    weights[0] = 0.0

    occu = occu.copy()
    for _ in range(20):
        site = int(rng.integers(packed.num_sites))
        new = int(rng.integers(n_codes[site]))
        occu_f = occu.copy()
        occu_f[site] = new
        int_i = np.asarray(
            dev.interactions_from_occupancy(occu, dp, inter_flat, offset, cs.num_orbits)
        )
        int_f = np.asarray(
            dev.interactions_from_occupancy(occu_f, dp, inter_flat, offset, cs.num_orbits)
        )
        full_delta = int_f - int_i
        out = np.asarray(
            dev.delta_interactions_single_flip(
                occu, site, new, dp, inter_flat, cs.num_orbits
            )
        )
        np.testing.assert_allclose(out, full_delta, atol=1e-11)

        de = float(
            dev.delta_energy_single_flip(occu, site, new, dp, inter_flat, weights)
        )
        de_full = float(coefs @ (full_delta * packed.size))
        assert abs(de - de_full) < 1e-9
        occu = occu_f


def test_vmapped_replicas(case):
    """Correlations vmap over a replica batch and match per-replica evals."""
    import jax

    cs, scm, packed, dp, occu, n_codes, rng = case
    occus = (rng.random((16, packed.num_sites)) * n_codes).astype(np.int32)
    batch = np.asarray(
        jax.vmap(lambda o: dev.corr_from_occupancy(o, dp, cs.num_corr_functions))(
            occus
        )
    )
    for i in range(16):
        single = np.asarray(
            dev.corr_from_occupancy(occus[i], dp, cs.num_corr_functions)
        )
        np.testing.assert_allclose(batch[i], single, atol=1e-13)
