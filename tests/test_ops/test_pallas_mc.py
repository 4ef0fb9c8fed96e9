"""Pallas fused-kernel tests (run on real TPU only; skipped on CPU)."""

import numpy as np
import pytest

import jax

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas TPU kernel needs TPU hardware",
)


@requires_tpu
def test_pallas_flip_kernel_exact():
    import jax.numpy as jnp

    from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
    from smol_tpu.moca import Ensemble
    from smol_tpu.moca.kernel.metropolis import Metropolis
    from smol_tpu.ops import fastmc, pallas_mc

    ce = random_expansion(fcc_binary_prim(), {2: 4.0}, seed=1)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.02, "Cu": -0.02}
    )
    proc = ens.processor
    tables = pallas_mc.build_pallas_flip_tables(
        proc, ens.sublattices, ens.chemical_potential_table
    )
    assert tables is not None

    W = 256
    rng = np.random.default_rng(0)
    occus = rng.integers(0, 2, (W, 8)).astype(np.int32)
    kernel = Metropolis(ens, "flip", temperature=1200.0, seed=1)
    state = kernel.initial_state(occus)
    # this legacy kernel uses 4-bit nibble words regardless of the fast
    # path's packing choice
    state["words"] = fastmc.pack_occupancy(jnp.asarray(occus), 8, 4)
    fn = jax.jit(pallas_mc.make_pallas_flip_steps(tables, n_steps=500,
                                                  block_size=256))
    out = fn(state, jnp.int32(3))
    final = np.asarray(fastmc.unpack_occupancy(out["words"], 8, 4))
    acc = np.asarray(out["enthalpy"])
    # double-float bookkeeping must match exact f64 recomputation
    for w in range(16):
        h = float(
            ens.compute_feature_vector(final[w]) @ ens.natural_parameters
        )
        assert abs(acc[w] - h) < 1e-10
    rate = np.asarray(out["naccept"]).mean() / 500
    assert 0.05 < rate < 0.95


@requires_tpu
def test_pallas_binary_chain_exact():
    """Persistent-chain kernel: df64 enthalpy matches exact f64 recompute."""
    import jax.numpy as jnp

    from smol_tpu.benchmarks.systems import spinel_prim, random_expansion
    from smol_tpu.moca import Ensemble
    from smol_tpu.moca.kernel.metropolis import Metropolis
    from smol_tpu.ops import fastmc, pallas_mc

    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11)
    mus = {"Li+": 0.1, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": -0.1, "O2-": 0.0}
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 1, 1]), chemical_potentials=mus
    )
    tables = pallas_mc.build_pallas_binary_tables(
        ens.processor, ens.sublattices, ens.chemical_potential_table
    )
    assert tables is not None

    W = 256
    rng = np.random.default_rng(2)
    n_codes = np.array([len(s) for s in ens.processor.allowed_species])
    occus = (rng.random((W, ens.num_sites)) * n_codes).astype(np.int32)
    kernel = Metropolis(ens, "flip", temperature=1000.0, seed=1)
    state = kernel.initial_state(occus)
    fn = jax.jit(pallas_mc.make_pallas_binary_chain(tables, n_steps=800,
                                                    block_size=256))
    out = fn(state, jnp.int32(5))
    final = np.asarray(fastmc.unpack_occupancy(out["words"], ens.num_sites, 1))
    acc = np.asarray(out["enthalpy"])
    for w in range(12):
        h = float(
            ens.compute_feature_vector(final[w]) @ ens.natural_parameters
        )
        assert abs(acc[w] - h) < 1e-10, (w, acc[w], h)
    rate = np.asarray(out["naccept"]).mean() / 800
    assert 0.02 < rate < 0.98
