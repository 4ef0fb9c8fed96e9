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

import os as _os

import jax

# f64 energy accumulation is required for the 1e-8 parity target
# (see reference dtype contract, smol orbit.py:248, base.py:230).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: chain-kernel compiles are expensive
# (minutes fresh on TPU), and all their operands are static-shape with
# table values passed as runtime arrays, so compiled executables are
# fully reusable across processes.  Opt out with
# SMOL_TPU_NO_COMPILE_CACHE=1; override the location with
# SMOL_TPU_COMPILE_CACHE_DIR.
if _os.environ.get("SMOL_TPU_NO_COMPILE_CACHE") != "1":
    _cache_dir = _os.environ.get(
        "SMOL_TPU_COMPILE_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", "smol_tpu", "jax_cache"
        ),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (OSError, AttributeError):  # read-only FS or very old jax
        pass
