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
    fn = jax.jit(pallas_mc.make_pallas_flip_steps(tables, n_steps=500,
                                                  block_size=256))
    out = fn(state, jnp.int32(3))
    final = np.asarray(fastmc.unpack_occupancy(out["words"], 8))
    acc = np.asarray(out["enthalpy"])
    # double-float bookkeeping must match exact f64 recomputation
    for w in range(16):
        h = float(
            ens.compute_feature_vector(final[w]) @ ens.natural_parameters
        )
        assert abs(acc[w] - h) < 1e-10
    rate = np.asarray(out["naccept"]).mean() / 500
    assert 0.05 < rate < 0.95
