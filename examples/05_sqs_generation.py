"""Special quasirandom structure (SQS) generation.

Anneals correlation-vector distance to the fully random state over all
symmetrically distinct supercell shapes of a given size, with walkers
vmapped per shape on device.

Run: python examples/05_sqs_generation.py
"""

import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.benchmarks.systems import fcc_binary_prim
from smol_tpu.capp import StochasticSQSGenerator

prim = fcc_binary_prim()  # 50/50 Au-Cu
generator = StochasticSQSGenerator.from_structure(
    prim, cutoffs={2: 5.0, 3: 3.5}, supercell_size=8
)
print(f"{len(generator.processors)} distinct supercell shapes of size 8")

generator.generate(
    mcmc_steps=_bootstrap.scale(1000, 100),
    temperatures=np.linspace(5.0, 0.02, _bootstrap.scale(6, 2)),  # unitless anneal (kB = 1)
    nwalkers=_bootstrap.scale(16, 4),
    seed=23,
)
print(f"kept {generator.num_structures} candidate structures")

for i, sqs in enumerate(generator.get_best_sqs(num_structures=3)):
    comp = sqs.structure.composition
    print(f"#{i}: score={sqs.score:.4f}  "
          f"composition={comp}  "
          f"scm_det={round(abs(np.linalg.det(sqs.supercell_matrix)))}")
best = generator.get_best_sqs(num_structures=1)[0]
# score = weighted L1 distance of correlations from the random limit
recomputed = generator.compute_score(best.structure, best.supercell_matrix)
assert abs(recomputed - best.score) < 1e-8
print("best-SQS score matches recomputation from the structure.")
