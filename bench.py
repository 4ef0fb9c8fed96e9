#!/usr/bin/env python
"""Headline benchmark: Metropolis flip-attempts/sec/chip on a spinel CE.

Runs canonical Metropolis swaps on a LiMn2O4-type spinel cluster expansion
(2x2x2 supercell of the 14-site prim = 112 sites, 48 active cation sites,
pair+triplet CE) vmapped over thousands of replica walkers, the BASELINE.md
north-star configuration class.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is value / 1e8 (the target flip-attempts/sec/chip).

Usage: python bench.py [--smoke] [--walkers W] [--steps S]
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true", help="small, CPU-friendly run")
    parser.add_argument("--walkers", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--ewald", action="store_true", help="include Ewald term")
    args = parser.parse_args()

    import smol_tpu  # noqa: F401  (enables x64)
    from smol_tpu.benchmarks.systems import random_expansion, spinel_prim
    from smol_tpu.moca import Ensemble, Sampler

    nwalkers = args.walkers or (64 if args.smoke else 8192)
    nsteps = args.steps or (200 if args.smoke else 3000)

    prim = spinel_prim()
    ce = random_expansion(prim, {2: 5.3, 3: 3.7}, seed=11, ewald=args.ewald)
    scm = np.diag([2, 2, 2])  # 112 sites, 48 active
    # single-flip semigrand ensemble: one flip attempt per MC step
    ensemble = Ensemble.from_cluster_expansion(
        ce,
        scm,
        chemical_potentials={"Li+": 0.0, "vacA0+": 0.0, "Mn3+": 0.0, "Mn4+": 0.0},
    )

    rng = np.random.default_rng(0)
    n_codes = np.array(
        [len(sp) for sp in ensemble.processor.allowed_species], dtype=np.int64
    )
    occu = (rng.random((nwalkers, ensemble.num_sites)) * n_codes).astype(np.int32)

    sampler = Sampler.from_ensemble(
        ensemble, temperature=1000.0, nwalkers=nwalkers, seed=3
    )

    # warmup (compile)
    sampler.run(nsteps, occu, thin_by=nsteps)
    sampler.clear_samples()

    t0 = time.perf_counter()
    sampler.run(nsteps, thin_by=nsteps)
    elapsed = time.perf_counter() - t0

    attempts = nwalkers * nsteps
    rate = attempts / elapsed
    print(
        json.dumps(
            {
                "metric": "metropolis_flip_attempts_per_sec_per_chip_spinel112",
                "value": rate,
                "unit": "attempts/s",
                "vs_baseline": rate / 1e8,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
