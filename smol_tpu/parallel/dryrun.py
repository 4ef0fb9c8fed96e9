"""Multi-chip dry run: sharded MC steps for EVERY move type on an N-device mesh.

This module is executed as ``python -m smol_tpu.parallel.dryrun N`` inside an
environment that forces the CPU platform with N virtual host devices (see
``__graft_entry__.dryrun_multichip``, which scrubs the environment and spawns
the subprocess).  It builds spinel cluster-expansion ensembles and, for each
supported move family, shards a walker ensemble over a 1D
``jax.sharding.Mesh`` and jits one full step on tiny shapes:

- ``flip+exchange``: semigrand flips under a parallel-tempering ladder (the
  replica-exchange rolls lower to ICI ppermute collectives),
- ``swap``: canonical two-site exchanges,
- ``table``: charge-neutral composite TableFlip moves,
- ``wang-landau``: flat-histogram flips with per-walker entropy planes.

Counterpart of the reference's multi-walker loop (smol
``moca/sampler/sampler.py:436-440``, sequential Python) — here walkers shard
over the mesh and GSPMD partitions every step.
"""

from __future__ import annotations

import os
import sys

__all__ = ["main"]


def main(n_devices: int) -> None:
    """Run one sharded step of every move type on ``n_devices`` CPU devices."""
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
    mesh = walker_mesh(devices)
    rng = np.random.default_rng(0)

    prim = spinel_prim()
    mu = {"Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0}

    def random_occu(ensemble):
        n_codes = np.array(
            [len(sp) for sp in ensemble.processor.allowed_species],
            dtype=np.int64,
        )
        return (
            rng.random((nwalkers, ensemble.num_sites)) * n_codes
        ).astype(np.int32)

    def run_one(label, sampler, occu, step_fn=None, extra_state=None):
        """Shard the walker state, jit one step, execute, check finiteness."""
        state = sampler.setup_sample(occu)
        if extra_state:
            state.update(extra_state)
        state = shard_walker_state(state, mesh)
        fn = step_fn or sampler.mckernel.make_step_fn()
        with mesh:
            out = jax.jit(fn)(state, jax.random.key(0))
            jax.block_until_ready(out)
        enth = np.asarray(out["enthalpy"])
        assert np.all(np.isfinite(enth)), f"non-finite enthalpies: {label}"
        occ_key = "words" if "words" in out else "occupancy"
        assert out[occ_key].shape[0] == nwalkers
        print(
            f"dryrun[{label}] OK: {n_devices} devices, {nwalkers} walkers, "
            f"mean H = {enth.mean():.6f}"
        )

    # ---- flip + parallel-tempering exchange (the headline path) ----
    ce = random_expansion(prim, {2: 3.0}, seed=11)
    ens = Ensemble.from_cluster_expansion(ce, np.diag((1, 1, 1)),
                                          chemical_potentials=mu)
    sampler = Sampler.from_ensemble(
        ens, temperature=1000.0, nwalkers=nwalkers, seed=3
    )
    ladder = make_temperature_ladder(300.0, 3000.0, nwalkers)
    step_fn = make_tempering_step(
        sampler.mckernel.make_step_fn(), exchange_period=1
    )
    run_one(
        "flip+exchange",
        sampler,
        random_occu(ens),
        step_fn=step_fn,
        extra_state={
            "beta": jnp.asarray(1.0 / (8.617333262145e-5 * ladder)),
            "pt_counter": jnp.zeros((), dtype=jnp.int32),
        },
    )

    # ---- canonical swap ----
    ens_cn = Ensemble.from_cluster_expansion(ce, np.diag((1, 1, 1)))
    run_one(
        "swap",
        Sampler.from_ensemble(
            ens_cn, temperature=800.0, nwalkers=nwalkers, seed=5
        ),
        random_occu(ens_cn),
    )

    # ---- charge-neutral table flips (composite CE + Ewald) ----
    ce_ew = random_expansion(prim, {2: 3.0}, seed=11, ewald=True)
    ens_tf = Ensemble.from_cluster_expansion(ce_ew, np.diag((1, 1, 1)),
                                             chemical_potentials=mu)
    from smol_tpu.capp.generate.random import generate_random_ordered_occupancy

    occ0 = generate_random_ordered_occupancy(
        ens_tf.processor, charge_neutral=True, rng=rng
    )
    run_one(
        "table",
        Sampler.from_ensemble(
            ens_tf, temperature=1000.0, nwalkers=nwalkers, seed=7,
            step_type="table-flip",
        ),
        np.tile(occ0, (nwalkers, 1)).astype(np.int32),
    )

    # ---- Wang-Landau flat-histogram flips ----
    occu_wl = random_occu(ens)
    probe = np.array([
        float(ens.compute_feature_vector(o) @ ens.natural_parameters)
        for o in occu_wl[: min(16, nwalkers)]
    ])
    span = probe.max() - probe.min() + 1e-3
    run_one(
        "wang-landau",
        Sampler.from_ensemble(
            ens,
            kernel_type="wang-landau",
            step_type="flip",
            min_enthalpy=probe.min() - 2 * span,
            max_enthalpy=probe.max() + 2 * span,
            bin_size=span / 10,
            flatness=0.8,
            nwalkers=nwalkers,
            seed=13,
        ),
        occu_wl,
    )

    print(
        f"dryrun_multichip OK: {n_devices} devices, {nwalkers} walkers, "
        "moves = flip+exchange, swap, table, wang-landau"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
