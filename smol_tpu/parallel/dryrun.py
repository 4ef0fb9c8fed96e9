"""Multi-chip dry run: one sharded parallel-tempering step on an N-device mesh.

This module is executed as ``python -m smol_tpu.parallel.dryrun N`` inside an
environment that forces the CPU platform with N virtual host devices (see
``__graft_entry__.dryrun_multichip``, which scrubs the environment and spawns
the subprocess).  It builds the spinel cluster-expansion ensemble, shards a
parallel-tempering walker ensemble over a 1D ``jax.sharding.Mesh``, and jits
one full step (MC sweep + replica-exchange collectives) on tiny shapes.

Counterpart of the reference's multi-walker loop (smol
``moca/sampler/sampler.py:436-440``, sequential Python) — here walkers shard
over the mesh and GSPMD lowers the exchange rolls to ICI ppermute.
"""

from __future__ import annotations

import os
import sys

__all__ = ["main"]


def main(n_devices: int) -> None:
    """Run the sharded tempering step on ``n_devices`` CPU devices."""
    # Must run before the first jax backend use; the caller normally sets
    # these in the subprocess environment, but be defensive for direct use.
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # A site hook may have already pinned jax_platforms via config.update at
    # interpreter start (the axon sitecustomize does), which overrides the
    # env var; re-apply explicitly so the dry run never dials a TPU tunnel.
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import smol_tpu  # noqa: F401  (enables x64)
    from smol_tpu.benchmarks.systems import random_expansion, spinel_prim
    from smol_tpu.moca import Ensemble, Sampler
    from smol_tpu.parallel import (
        make_temperature_ladder,
        make_tempering_step,
        shard_walker_state,
        walker_mesh,
    )

    devices = jax.devices("cpu")[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} CPU devices, have {len(devices)} "
        f"(XLA_FLAGS={os.environ.get('XLA_FLAGS')!r})"
    )
    nwalkers = 4 * n_devices

    prim = spinel_prim()
    ce = random_expansion(prim, {2: 3.0}, seed=11)
    ensemble = Ensemble.from_cluster_expansion(
        ce,
        np.diag((1, 1, 1)),
        chemical_potentials={
            "Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0
        },
    )
    sampler = Sampler.from_ensemble(
        ensemble, temperature=1000.0, nwalkers=nwalkers, seed=3
    )
    rng = np.random.default_rng(0)
    n_codes = np.array(
        [len(sp) for sp in ensemble.processor.allowed_species], dtype=np.int64
    )
    occu = (rng.random((nwalkers, ensemble.num_sites)) * n_codes).astype(np.int32)
    state = sampler.setup_sample(occu)

    # parallel-tempering ladder across the sharded walker axis
    ladder = make_temperature_ladder(300.0, 3000.0, nwalkers)
    state["beta"] = jnp.asarray(1.0 / (8.617333262145e-5 * ladder))
    state["pt_counter"] = jnp.zeros((), dtype=jnp.int32)

    mesh = walker_mesh(devices)
    state = shard_walker_state(state, mesh)

    base_step = sampler.mckernel.make_step_fn()
    step_fn = make_tempering_step(base_step, exchange_period=1)

    with mesh:
        one_step = jax.jit(step_fn)
        out = one_step(state, jax.random.key(0))
        jax.block_until_ready(out)

    enth = np.asarray(out["enthalpy"])
    assert np.all(np.isfinite(enth)), "non-finite enthalpies in dry run"
    occ_key = "words" if "words" in out else "occupancy"
    assert out[occ_key].shape[0] == nwalkers
    print(
        f"dryrun_multichip OK: {n_devices} devices, {nwalkers} walkers, "
        f"mean H = {enth.mean():.6f}"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
