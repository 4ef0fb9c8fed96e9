"""Make smol_tpu importable when running examples from a source checkout."""

import sys
from pathlib import Path

_repo_root = str(Path(__file__).resolve().parent.parent)
try:
    import smol_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, _repo_root)
