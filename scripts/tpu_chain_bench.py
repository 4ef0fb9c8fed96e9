#!/usr/bin/env python
"""TPU correctness + throughput check of the shared-proposal chain kernel."""
import sys
import time

import numpy as np

import smol_tpu  # noqa: F401
from smol_tpu.benchmarks.systems import random_expansion, spinel_prim
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.ops import pallas_chain

import jax
import jax.numpy as jnp


def main():
    nwalkers = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    ewald = len(sys.argv) > 4 and sys.argv[4] == "ewald"

    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11, ewald=ewald)
    ensemble = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]),
        chemical_potentials={"Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0},
    )
    sampler = Sampler.from_ensemble(
        ensemble, temperature=1000.0, nwalkers=nwalkers, seed=3
    )
    kernel = sampler.mckernel
    tables = pallas_chain.build_chain_tables(
        ensemble.processor, ensemble.sublattices,
        mu_table=ensemble.chemical_potential_table,
    )
    print(f"R={tables.num_ranks} L={tables.n_local} TM={tables.tensor_max} "
          f"binary={tables.binary} ewald={tables.has_ewald}")

    rng = np.random.default_rng(0)
    n_codes = np.array([len(sp) for sp in ensemble.processor.allowed_species])
    occu = (rng.random((nwalkers, ensemble.num_sites)) * n_codes).astype(np.int32)
    state = dict(sampler.setup_sample(occu))
    state.pop("words", None)
    state["occupancy"] = jnp.asarray(occu)

    fn = jax.jit(pallas_chain.make_shared_proposal_chain(tables, n_steps, block_size=bs))
    key = jax.random.key(0)
    t0 = time.perf_counter()
    out = fn(state, key)
    jax.block_until_ready(out["enthalpy"])
    print(f"compile+run: {time.perf_counter()-t0:.1f} s")

    # parity check
    full = kernel.full_features_fn()
    feats = jax.vmap(full)(out["occupancy"])
    exact = feats @ jnp.asarray(kernel.natural_params)
    err = np.max(np.abs(np.asarray(out["enthalpy"]) - np.asarray(exact)))
    rel = err / max(1e-12, float(np.max(np.abs(np.asarray(exact)))))
    print(f"accum-vs-exact: abs {err:.3e} rel {rel:.3e}, "
          f"naccept mean {np.asarray(out['naccept']).mean():.1f}/{n_steps}")

    # throughput (5 reps)
    reps = 5
    keys = jax.random.split(jax.random.key(1), reps)
    st = out
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        st = fn(st, keys[r])
        jax.block_until_ready(st["enthalpy"])
        times.append(time.perf_counter() - t0)
    times = np.array(times)
    rate = nwalkers * n_steps / times.min()
    print(f"times: {', '.join(f'{x*1e3:.1f}ms' for x in times)}")
    print(f"rate (best): {rate/1e6:.1f} M attempts/s  "
          f"({times.min()/n_steps*1e6:.2f} us/step)  vs 1e8: {rate/1e8:.2f}x")


if __name__ == "__main__":
    main()
