"""smol_tpu: a TPU-native lattice statistical-mechanics framework.

A from-scratch JAX/XLA/Pallas re-design of the cluster-expansion + lattice
Monte Carlo stack (capabilities of CederGroupHub/smol): cluster subspaces and
correlation functions, effective cluster interaction fitting support, and
Monte Carlo sampling (canonical, semigrand-canonical, charge-neutral SGC,
Wang-Landau) with thousands of vmapped replicas per chip and mesh-parallel
replica ensembles over ICI.

Host code (symmetry analysis, structure matching, composition math) is pure
Python/numpy; everything from encoded occupancies onward runs on device as
fixed-shape JAX programs.
"""

__version__ = "0.1.0"

import jax

# f64 energy accumulation is required for the 1e-8 parity target
# (see reference dtype contract, smol orbit.py:248, base.py:230).
jax.config.update("jax_enable_x64", True)
