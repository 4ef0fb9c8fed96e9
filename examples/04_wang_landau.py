"""Wang-Landau density-of-states estimation.

Estimates the configurational density of states of a small binary cell by
flat-histogram sampling, then reconstructs thermodynamics (free energy,
entropy) at any temperature from a single run.

Run: python examples/04_wang_landau.py
"""

from itertools import product

import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.constants import kB
from smol_tpu.moca import Ensemble, Sampler

expansion = random_expansion(fcc_binary_prim(), {2: 3.0}, seed=3)
ensemble = Ensemble.from_cluster_expansion(expansion, np.diag([2, 2, 1]))
n = ensemble.num_sites

# exact enumeration (4 sites binary -> 16 states) for validation
exact = {}
for bits in product((0, 1), repeat=n):
    occu = np.array(bits, dtype=np.int32)
    e = round(float(
        ensemble.compute_feature_vector(occu) @ ensemble.natural_parameters
    ), 10)
    exact[e] = exact.get(e, 0) + 1
levels = sorted(exact)
bin_size = min(np.diff(levels)) if len(levels) > 1 else 0.05

sampler = Sampler.from_ensemble(
    ensemble,
    kernel_type="wang-landau",
    step_type="flip",
    min_enthalpy=levels[0] - bin_size / 2,
    max_enthalpy=levels[-1] + bin_size,
    bin_size=bin_size,
    flatness=0.8,
    seed=13,
    nwalkers=1,
)
occu0 = np.zeros((1, n), dtype=np.int32)
sampler.run(_bootstrap.scale(150_000, 2_000), occu0, thin_by=250)

# the WL state (entropy = log g(E), histogram, mod factor) lives in the trace
entropy = sampler.samples.get_trace_value("entropy", flat=False)[-1][0]
mod_factor = sampler.samples.get_trace_value("mod_factor", flat=False)[-1][0]
print(f"final mod factor: {mod_factor:.2e}")

e_lo = levels[0] - bin_size / 2
levels_wl = e_lo + (np.arange(len(entropy)) + 0.5) * bin_size
mask = entropy > 0
logg = entropy[mask] - entropy[mask][0]

print(f"{'E (eV)':>10} {'g_WL':>8} {'g_exact':>8}")
g_first = None
for e_bin, lg in zip(levels_wl[mask], logg):
    match = [g for e, g in exact.items() if abs(e - e_bin) < bin_size / 2]
    g_exact = match[0] if match else 0
    if g_first is None and g_exact:
        g_first = g_exact  # normalize the relative DOS to the first level
    g_wl = g_first * np.exp(lg)
    print(f"{e_bin:10.4f} {g_wl:8.2f} {g_exact:8d}")

# free energy at 300 K from the DOS vs the exact partition function
beta = 1 / (kB * 300.0)
es = np.array(list(exact))
gs = np.array([exact[e] for e in es], dtype=float)
e0 = es.min()
f_exact = -np.log(np.sum(gs * np.exp(-beta * (es - e0)))) / beta + e0
g_wl_all = g_first * np.exp(logg)
f_wl = -np.log(
    np.sum(g_wl_all * np.exp(-beta * (levels_wl[mask] - e0)))
) / beta + e0
print(f"\nF(300K): WL {f_wl:.6f} vs exact {f_exact:.6f} eV")
assert abs(f_wl - f_exact) < 0.05
