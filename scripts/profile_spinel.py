#!/usr/bin/env python
"""Profile the spinel fast path: table shapes + step timing breakdown."""
import time

import numpy as np

import smol_tpu  # noqa: F401
from smol_tpu.benchmarks.systems import random_expansion, spinel_prim
from smol_tpu.moca import Ensemble, Sampler

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    nwalkers = 8192
    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11)
    ensemble = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]),
        chemical_potentials={"Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0},
    )
    sampler = Sampler.from_ensemble(
        ensemble, temperature=1000.0, nwalkers=nwalkers, seed=3
    )
    kernel = sampler.mckernel
    fast = kernel._get_fast_tables()
    tables, kind = fast
    t = tables
    print(f"kind={kind} binary={t.binary} num_sites={t.num_sites} "
          f"num_ranks={t.num_ranks} L={t.n_local} Ko={t.k_other} "
          f"tmax={t.tensor_max} tmax_c={t.tmax_c}")
    print(f"big: {t.big.shape} {t.big.dtype}")
    if t.planes_bf is not None:
        print(f"planes_bf: {t.planes_bf.shape} {t.planes_bf.dtype}")
    bytes_step_intermediate = nwalkers * (t.planes_bf.shape[1] if t.planes_bf is not None else 0) * 4
    print(f"plane-select intermediate if materialized: {bytes_step_intermediate/1e6:.1f} MB")

    # build state
    rng = np.random.default_rng(0)
    n_codes = np.array([len(sp) for sp in ensemble.processor.allowed_species])
    occu = (rng.random((nwalkers, ensemble.num_sites)) * n_codes).astype(np.int32)
    state = sampler.setup_sample(occu)
    step_fn = kernel.make_step_fn()

    # full scan of T steps
    from smol_tpu.ops.mc import run_chain
    for T in (100, 1000):
        key = jax.random.key(0)
        def run(st, k, T=T):
            st2, tr = run_chain(st, k, step_fn, sampler._make_record_fn(T), 1, T)
            return st2["enthalpy"]
        dt = timeit(run, state, key, n=5)
        print(f"scan T={T}: {dt*1e3:.2f} ms -> {nwalkers*T/dt/1e6:.1f} M attempts/s "
              f"({dt/T*1e6:.1f} us/step)")

    # single jitted step
    sj = jax.jit(step_fn)
    key = jax.random.key(1)
    dt = timeit(lambda s, k: sj(s, k)["enthalpy"], state, key)
    print(f"single step (dispatch incl): {dt*1e6:.1f} us")

    # persistent chain kernel (the production fast path)
    from smol_tpu.ops import pallas_chain
    ct = pallas_chain.build_chain_tables(
        ensemble.processor, ensemble.sublattices,
        mu_table=ensemble.chemical_potential_table,
    )
    if ct is not None and pallas_chain.runtime_supported():
        print(f"chain tables: R={ct.num_ranks} L={ct.n_local} "
              f"tmax={ct.tensor_max} binary={ct.binary}")
        for T in (1000,):
            try:
                fn = jax.jit(pallas_chain.make_shared_proposal_chain(ct, T))
                key = jax.random.key(7)
                dt = timeit(lambda s: fn(s, key)["enthalpy"], state, n=5)
                print(f"chain T={T}: {dt*1e3:.2f} ms -> "
                      f"{nwalkers*T/dt/1e6:.1f} M att/s ({dt/T*1e6:.2f} us/step)")
            except Exception as e:
                print(f"chain T={T}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
