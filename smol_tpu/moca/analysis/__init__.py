"""Analysis tools for MC samples."""

from smol_tpu.moca.analysis.convergence import (
    check_property_converged,
    determine_discard_number,
)

__all__ = ["check_property_converged", "determine_discard_number"]
