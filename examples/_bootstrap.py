"""Make smol_tpu importable when running examples from a source checkout."""

import os
import sys
from pathlib import Path

# honor JAX_PLATFORMS before any backend initializes (plugin platforms may
# otherwise win the auto-selection)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

_repo_root = str(Path(__file__).resolve().parent.parent)
try:
    import smol_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, _repo_root)

# SMOL_TPU_EXAMPLE_SMOKE=1 shrinks every example to a seconds-scale run so
# the test suite can execute them end-to-end (tests/test_examples.py).
SMOKE = os.environ.get("SMOL_TPU_EXAMPLE_SMOKE", "") not in ("", "0")


def scale(normal, smoke):
    """normal value, or the reduced one under SMOL_TPU_EXAMPLE_SMOKE."""
    return smoke if SMOKE else normal
