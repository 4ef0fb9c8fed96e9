"""Parallel tempering over a device mesh.

Runs a replica ladder spanning 300-3000 K with periodic
nearest-neighbor exchange attempts. On multi-chip hardware the walker axis
shards over the mesh and exchanges lower to ICI ppermute collectives; this
example runs identically on a single chip or a virtual CPU mesh.

Run: python examples/07_parallel_tempering.py
  (optionally with XLA_FLAGS=--xla_force_host_platform_device_count=8
   JAX_PLATFORMS=cpu to exercise an 8-device mesh)
"""

import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.parallel import make_temperature_ladder

expansion = random_expansion(fcc_binary_prim(), {2: 4.0}, seed=2)
ensemble = Ensemble.from_cluster_expansion(
    expansion, np.diag([3, 3, 3]),
    chemical_potentials={"Au": 0.0, "Cu": 0.0},
)

nwalkers = _bootstrap.scale(32, 8)
ladder = make_temperature_ladder(300.0, 3000.0, nwalkers)  # geometric
sampler = Sampler.from_ensemble(
    ensemble,
    temperature=ladder,
    nwalkers=nwalkers,
    seed=11,
    replica_exchange_period=10,  # attempt swaps every 10 sweeps
)

rng = np.random.default_rng(0)
occu = rng.integers(0, 2, (nwalkers, ensemble.num_sites)).astype(np.int32)
sampler.run(_bootstrap.scale(3000, 200), occu, thin_by=10)

temps = sampler.samples.get_temperatures(flat=False)
energies = sampler.samples.get_energies(flat=False)

# the temperature multiset is conserved by exchanges
np.testing.assert_allclose(np.sort(temps[-1]), np.sort(ladder), rtol=1e-12)

# mean energy by temperature rank: colder replicas sit lower
order = np.argsort(temps[-150:], axis=1)
e_by_rank = np.take_along_axis(energies[-150:], order, axis=1).mean(axis=0)
size = ensemble.system_size
print(f"{'rank':>4} {'T (K)':>8} {'<E> (eV/prim)':>14}")
for r in range(0, nwalkers, 4):
    t_r = np.sort(ladder)[r]
    print(f"{r:4d} {t_r:8.0f} {e_by_rank[r] / size:14.6f}")
assert e_by_rank[0] < e_by_rank[-1]

# replica-exchange traversal: each chain should visit many ladder rungs
ranks = np.argsort(np.argsort(temps, axis=1), axis=1)
visited = [len(np.unique(ranks[:, w])) for w in range(nwalkers)]
print(f"\nladder rungs visited per chain: "
      f"min {min(visited)}, median {int(np.median(visited))}, max {max(visited)}")
