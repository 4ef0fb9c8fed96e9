"""Smoke-run every example end-to-end (reduced sizes).

Each example script is executed as a subprocess with
SMOL_TPU_EXAMPLE_SMOKE=1 (seconds-scale sizes, see examples/_bootstrap.py)
so signature drift or API breakage in the documented workflows fails the
suite (VERDICT round 1, weak #8).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted(
    p for p in (Path(__file__).parent.parent / "examples").glob("0*.py")
)


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script):
    env = dict(os.environ)
    env["SMOL_TPU_EXAMPLE_SMOKE"] = "1"
    # examples must run on the CPU test platform like the rest of the
    # suite — force it (the ambient env may point JAX at a TPU tunnel,
    # and a hung tunnel must not hang the suite)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, str(script)],
        env=env,
        cwd=script.parent,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, (
        f"{script.name} failed:\n{result.stdout[-2000:]}\n{result.stderr[-4000:]}"
    )
