"""Canonical Monte Carlo with thousands of replica walkers.

Runs fixed-composition (swap-move) Metropolis sampling of an FCC binary
cluster expansion across a temperature sweep. Every walker is an
independent Markov chain; the whole step loop is one compiled lax.scan
vmapped over walkers, so throughput scales with the walker count.

Run: python examples/02_canonical_mc.py
"""

import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.constants import kB
from smol_tpu.moca import Ensemble, Sampler

expansion = random_expansion(fcc_binary_prim(), {2: 5.0, 3: 3.5}, seed=7)

scm = np.diag([4, 4, 4])  # 64 sites
ensemble = Ensemble.from_cluster_expansion(expansion, scm)
nwalkers = _bootstrap.scale(256, 16)

# half Au / half Cu initial occupancies, one per walker
rng = np.random.default_rng(0)
occu = np.zeros((nwalkers, ensemble.num_sites), dtype=np.int32)
for w in range(nwalkers):
    occu[w, rng.choice(ensemble.num_sites, ensemble.num_sites // 2,
                       replace=False)] = 1

print(f"{ensemble.num_sites} sites, {nwalkers} walkers (canonical, swaps)")
print(f"{'T (K)':>8} {'<E> (eV/prim)':>15} {'C_v/kB per prim':>16} "
      f"{'acc rate':>9}")
for temperature in (2000.0, 1000.0, 500.0, 250.0):
    sampler = Sampler.from_ensemble(
        ensemble, temperature=temperature, nwalkers=nwalkers, seed=17
    )
    sampler.run(_bootstrap.scale(2000, 100), occu, thin_by=10)
    discard = _bootstrap.scale(100, 2)  # burn-in samples
    e_mean = sampler.samples.mean_energy(discard=discard)
    e_var = sampler.samples.energy_variance(discard=discard)
    size = ensemble.system_size
    cv = e_var / (kB * temperature**2) / size / kB
    acc = sampler.samples.sampling_efficiency(discard=discard)
    print(f"{temperature:8.0f} {e_mean / size:15.6f} {cv:16.4f} {acc:9.3f}")
    # reuse equilibrated occupancies as the next (colder) starting point
    occu = sampler.samples.get_occupancies(flat=False)[-1]
