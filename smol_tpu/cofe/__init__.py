"""Cluster expansion definition and fitting layer."""

from smol_tpu.cofe.expansion import ClusterExpansion, RegressionData
from smol_tpu.cofe.space import (
    ClusterSubspace,
    PottsSubspace,
    available_site_basis_sets,
)
from smol_tpu.cofe.wrangling.wrangler import StructureWrangler

__all__ = [
    "ClusterSubspace",
    "PottsSubspace",
    "ClusterExpansion",
    "RegressionData",
    "StructureWrangler",
    "available_site_basis_sets",
]
