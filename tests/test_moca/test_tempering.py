"""Parallel tempering tests: exchange correctness + sharded execution."""

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.parallel import (
    make_temperature_ladder,
    shard_walker_state,
    walker_mesh,
)


@pytest.fixture(scope="module")
def pt_sampler():
    ce = random_expansion(fcc_binary_prim(), {2: 3.0}, seed=2)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.0, "Cu": 0.0}
    )
    nwalkers = 16
    ladder = make_temperature_ladder(300.0, 3000.0, nwalkers)
    sampler = Sampler.from_ensemble(
        ens,
        temperature=ladder,
        nwalkers=nwalkers,
        seed=11,
        replica_exchange_period=5,
    )
    rng = np.random.default_rng(0)
    occu = rng.integers(0, 2, (nwalkers, ens.num_sites)).astype(np.int32)
    return ens, sampler, occu


def test_tempering_preserves_ladder(pt_sampler):
    """Exchanges permute the beta ladder; the multiset must be invariant."""
    ens, sampler, occu = pt_sampler
    sampler.run(500, occu, thin_by=10)
    temps = sampler.samples.get_temperatures(flat=False)
    ladder = make_temperature_ladder(300.0, 3000.0, 16)
    for t_sample in temps[::13]:
        np.testing.assert_allclose(np.sort(t_sample), np.sort(ladder), rtol=1e-10)


def test_tempering_energy_ordering(pt_sampler):
    """After equilibration, colder replicas have lower mean energy."""
    ens, sampler, occu = pt_sampler
    sampler.run(3000, thin_by=10)
    temps = sampler.samples.get_temperatures(flat=False)[-100:]
    energies = sampler.samples.get_energies(flat=False)[-100:]
    # average energy binned by temperature rank
    order = np.argsort(temps, axis=1)
    e_sorted = np.take_along_axis(energies, order, axis=1)
    cold = e_sorted[:, :4].mean()
    hot = e_sorted[:, -4:].mean()
    assert cold < hot


def test_sharded_tempering_step(pt_sampler):
    """The tempering step executes over an 8-device CPU mesh."""
    import jax
    import jax.numpy as jnp

    from smol_tpu.parallel.tempering import make_tempering_step

    ens, sampler, occu = pt_sampler
    state = sampler.mckernel.initial_state(occu)
    ladder = make_temperature_ladder(300.0, 3000.0, 16)
    state["beta"] = jnp.asarray(1.0 / (8.617333262145e-5 * ladder))
    state["pt_counter"] = jnp.zeros((), dtype=jnp.int32)

    mesh = walker_mesh(jax.devices()[:8])
    state = shard_walker_state(state, mesh)
    step = make_tempering_step(sampler.mckernel.make_step_fn(), exchange_period=1)
    with mesh:
        out = jax.jit(step)(state, jax.random.key(0))
        jax.block_until_ready(out)
    assert np.all(np.isfinite(np.asarray(out["enthalpy"])))
    np.testing.assert_allclose(
        np.sort(np.asarray(out["beta"])), np.sort(np.asarray(state["beta"]))
    )
