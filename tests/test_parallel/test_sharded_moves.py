"""Sharded-vs-unsharded trajectory identity for every move family.

The multichip dryrun (smol_tpu/parallel/dryrun.py) proves each move type
*executes* on a mesh; these tests prove the mesh does not change the
*answer*: running the same jitted step function over walker state sharded
across the 8-device CPU mesh must reproduce the single-device trajectory
bit-for-bit in the occupancies (integer state) and to f64 round-off in the
enthalpies.  Counterpart of the reference's single-process walker loop
(smol ``moca/sampler/sampler.py:436-440``), which has no sharding to get
wrong; here GSPMD partitioning must be semantics-preserving.
"""

import jax
import numpy as np
import pytest

from smol_tpu.benchmarks.systems import random_expansion, spinel_prim
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.parallel import shard_walker_state, walker_mesh

NSTEPS = 25
NWALKERS = 16


def _trajectory(sampler, occu, mesh=None):
    """Occupancy + enthalpy after NSTEPS jitted steps, optionally sharded."""
    kernel = sampler.mckernel
    state = kernel.initial_state(occu)
    step = jax.jit(kernel.make_step_fn())
    base = jax.random.key(97)
    if mesh is None:
        for i in range(NSTEPS):
            state = step(state, jax.random.fold_in(base, i))
    else:
        state = shard_walker_state(state, mesh)
        with mesh:
            for i in range(NSTEPS):
                state = step(state, jax.random.fold_in(base, i))
    jax.block_until_ready(state)
    occ = np.asarray(kernel.state_occupancy(state))
    return occ, np.asarray(state["enthalpy"], dtype=np.float64)


def _assert_identical(sampler, occu):
    occ_1, enth_1 = _trajectory(sampler, occu)
    mesh = walker_mesh(jax.devices()[:8])
    occ_8, enth_8 = _trajectory(sampler, occu, mesh=mesh)
    np.testing.assert_array_equal(occ_8, occ_1)
    np.testing.assert_allclose(enth_8, enth_1, rtol=1e-12, atol=1e-12)


@pytest.fixture(scope="module")
def spinel_ce():
    return random_expansion(spinel_prim(), {2: 3.0}, seed=11)


@pytest.fixture(scope="module")
def spinel_ce_ewald():
    return random_expansion(spinel_prim(), {2: 3.0}, seed=11, ewald=True)


MU = {"Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0}


def _random_occu(ensemble, rng):
    n_codes = np.array(
        [len(sp) for sp in ensemble.processor.allowed_species], dtype=np.int64
    )
    return (rng.random((NWALKERS, ensemble.num_sites)) * n_codes).astype(
        np.int32
    )


def test_sharded_swap_trajectory_identity(spinel_ce):
    ens = Ensemble.from_cluster_expansion(spinel_ce, np.diag((1, 1, 1)))
    sampler = Sampler.from_ensemble(
        ens, temperature=800.0, nwalkers=NWALKERS, seed=5
    )
    assert sampler.mckernel.mcusher.__class__.__name__ == "Swap"
    _assert_identical(sampler, _random_occu(ens, np.random.default_rng(1)))


def test_sharded_table_trajectory_identity(spinel_ce_ewald):
    from smol_tpu.capp.generate.random import generate_random_ordered_occupancy

    ens = Ensemble.from_cluster_expansion(
        spinel_ce_ewald, np.diag((1, 1, 1)), chemical_potentials=MU
    )
    rng = np.random.default_rng(2)
    occ0 = generate_random_ordered_occupancy(
        ens.processor, charge_neutral=True, rng=rng
    )
    sampler = Sampler.from_ensemble(
        ens, temperature=1000.0, nwalkers=NWALKERS, seed=7,
        step_type="table-flip",
    )
    _assert_identical(sampler, np.tile(occ0, (NWALKERS, 1)).astype(np.int32))


def test_sharded_flip_trajectory_identity(spinel_ce):
    ens = Ensemble.from_cluster_expansion(
        spinel_ce, np.diag((1, 1, 1)), chemical_potentials=MU
    )
    sampler = Sampler.from_ensemble(
        ens, temperature=1000.0, nwalkers=NWALKERS, seed=3
    )
    _assert_identical(sampler, _random_occu(ens, np.random.default_rng(3)))


def test_sharded_wang_landau_trajectory_identity(spinel_ce):
    ens = Ensemble.from_cluster_expansion(
        spinel_ce, np.diag((1, 1, 1)), chemical_potentials=MU
    )
    rng = np.random.default_rng(4)
    occu = _random_occu(ens, rng)
    probe = np.array([
        float(ens.compute_feature_vector(o) @ ens.natural_parameters)
        for o in occu
    ])
    span = probe.max() - probe.min() + 1e-3
    sampler = Sampler.from_ensemble(
        ens,
        kernel_type="wang-landau",
        step_type="flip",
        min_enthalpy=probe.min() - 2 * span,
        max_enthalpy=probe.max() + 2 * span,
        bin_size=span / 10,
        flatness=0.8,
        nwalkers=NWALKERS,
        seed=13,
    )
    # WL aux planes (histogram/entropy) must also agree across shardings
    kernel = sampler.mckernel
    st1 = kernel.initial_state(occu)
    step = jax.jit(kernel.make_step_fn())
    base = jax.random.key(97)
    for i in range(NSTEPS):
        st1 = step(st1, jax.random.fold_in(base, i))
    mesh = walker_mesh(jax.devices()[:8])
    st8 = shard_walker_state(kernel.initial_state(occu), mesh)
    with mesh:
        for i in range(NSTEPS):
            st8 = step(st8, jax.random.fold_in(base, i))
    jax.block_until_ready((st1, st8))
    np.testing.assert_array_equal(
        np.asarray(kernel.state_occupancy(st8)),
        np.asarray(kernel.state_occupancy(st1)),
    )
    for name in ("histogram", "entropy"):
        if name in st1:
            np.testing.assert_allclose(
                np.asarray(st8[name]), np.asarray(st1[name]),
                rtol=1e-12, atol=1e-12,
            )
