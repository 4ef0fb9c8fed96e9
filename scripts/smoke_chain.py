#!/usr/bin/env python
"""Smoke-test the shared-proposal chain kernel in interpret mode (CPU)."""
import numpy as np

import smol_tpu  # noqa: F401
from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion, spinel_prim
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.ops import pallas_chain

import jax
import jax.numpy as jnp


def check(name, ensemble, nwalkers=8, n_steps=200, temperature=800.0):
    sampler = Sampler.from_ensemble(
        ensemble, temperature=temperature, nwalkers=nwalkers, seed=3
    )
    kernel = sampler.mckernel
    tables = pallas_chain.build_chain_tables(
        ensemble.processor,
        ensemble.sublattices,
        mu_table=ensemble.chemical_potential_table,
    )
    if tables is None:
        print(f"{name}: tables unsupported")
        return
    print(f"{name}: R={tables.num_ranks} L={tables.n_local} TM={tables.tensor_max} "
          f"binary={tables.binary} mu={tables.has_mu} ewald={tables.has_ewald}")
    rng = np.random.default_rng(0)
    n_codes = np.array([len(sp) for sp in ensemble.processor.allowed_species])
    occu = (rng.random((nwalkers, ensemble.num_sites)) * n_codes).astype(np.int32)
    state = dict(sampler.setup_sample(occu))
    state.pop("words", None)
    state["occupancy"] = jnp.asarray(occu)

    fn = pallas_chain.make_shared_proposal_chain(
        tables, n_steps, block_size=nwalkers, interpret=True
    )
    out = fn(state, jax.random.key(0))
    # exact recompute of enthalpy from final occupancy
    full = kernel.full_features_fn()
    feats = jax.vmap(full)(out["occupancy"])
    exact = feats @ jnp.asarray(kernel.natural_params)
    err = np.max(np.abs(np.asarray(out["enthalpy"]) - np.asarray(exact)))
    rel = err / max(1e-12, float(np.max(np.abs(np.asarray(exact)))))
    nacc = np.asarray(out["naccept"])
    print(f"  accum-vs-exact enthalpy: abs {err:.3e} rel {rel:.3e}; "
          f"naccept mean {nacc.mean():.1f}/{n_steps}")
    assert rel < 1e-9, f"{name} FAILED parity: rel {rel}"
    assert nacc.mean() > 0, "no accepted moves?"
    print(f"  OK")


def main():
    ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.3, "Cu": 0.0}
    )
    check("fcc-binary-sgc", ens)

    ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))
    check("fcc-binary-canonical-flipspace", ens)

    from smol_tpu.benchmarks.systems import fcc_ternary_prim
    ce = random_expansion(fcc_ternary_prim(), {2: 5.5, 3: 4.0}, seed=7)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]),
        chemical_potentials={"Au": 0.05, "Ag": 0.0, "Cu": -0.05},
    )
    check("fcc-ternary-sgc", ens)

    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([1, 1, 1]),
        chemical_potentials={"Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0},
    )
    check("spinel-1x1x1", ens, temperature=1000.0)

    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11, ewald=True)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([1, 1, 1]),
        chemical_potentials={"Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0},
    )
    check("spinel-ewald-1x1x1", ens, temperature=1000.0)


if __name__ == "__main__":
    main()
