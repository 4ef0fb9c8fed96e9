"""Charge-neutral semigrand-canonical MC with Ewald electrostatics.

A Li/Mn oxyfluoride toy system: chemical potentials drive composition,
TableFlip moves (derived from the constrained composition space) keep every
configuration exactly charge-neutral, and an Ewald term adds electrostatics
to the cluster-expansion energy.

Run: python examples/03_semigrand_charge_neutral.py
"""

import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.cofe.expansion import ClusterExpansion
from smol_tpu.cofe.extern import EwaldTerm
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.moca import Ensemble, Sampler

# rocksalt-like prim: cation site Li+/Mn3+ (+ implicit vacancy), anion O2-/F-
a = 4.2
lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
prim = Structure(
    lat,
    [{"Li+": 1 / 3, "Mn3+": 1 / 3}, {"O2-": 0.8, "F-": 0.2}],
    [[0, 0, 0], [0.5, 0.5, 0.5]],
)

subspace = ClusterSubspace.from_cutoffs(prim, {2: 4.5})
subspace.add_external_term(EwaldTerm())  # one extra feature column

rng = np.random.default_rng(5)
coefs = np.concatenate([
    rng.normal(scale=0.02, size=subspace.num_corr_functions), [0.2]
])
coefs[0] = -1.0
expansion = ClusterExpansion(subspace, coefs)

chemical_potentials = {
    "Li+": 0.2, "Mn3+": -0.1, "vacA0+": 0.0, "O2-": 0.0, "F-": 0.1,
}
ensemble = Ensemble.from_cluster_expansion(
    expansion, np.diag([2, 2, 1]), chemical_potentials=chemical_potentials
)

nwalkers = _bootstrap.scale(64, 8)
proc = ensemble.processor
from smol_tpu.capp import generate_random_ordered_occupancy

# charge-neutral random starting configurations, one per walker
occu = np.stack([
    generate_random_ordered_occupancy(proc, charge_neutral=True, rng=rng)
    for _ in range(nwalkers)
])

sampler = Sampler.from_ensemble(
    ensemble,
    temperature=1200.0,
    step_type="table-flip",
    nwalkers=nwalkers,
    seed=9,
)
sampler.run(_bootstrap.scale(4000, 200), occu, thin_by=20)

# composition statistics (species fractions over all active sublattices)
comps = sampler.samples.mean_composition(discard=_bootstrap.scale(50, 2))
print("mean composition (per prim):")
for sp, x in comps.items():
    print(f"  {sp}: {x:.4f}")

# verify every sampled configuration is charge neutral
occus = sampler.samples.get_occupancies(discard=_bootstrap.scale(50, 2)).reshape(
    -1, ensemble.num_sites
)
width = max(len(species) for species in proc.allowed_species)
charges = np.array([
    [sp.oxi_state or 0 for sp in species]
    + [0] * (width - len(species))
    for species in proc.allowed_species
])
net = charges[np.arange(ensemble.num_sites), occus].sum(axis=1)
print(f"max |net charge| over {len(occus)} samples: {np.abs(net).max()}")
assert np.abs(net).max() == 0
