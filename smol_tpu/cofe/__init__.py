"""Cluster expansion definition and fitting layer."""

from smol_tpu.cofe.space import (
    ClusterSubspace,
    PottsSubspace,
    available_site_basis_sets,
)

__all__ = ["ClusterSubspace", "PottsSubspace", "available_site_basis_sets"]
