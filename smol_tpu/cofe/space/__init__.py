"""Configuration-space definitions: site spaces, bases, clusters, orbits."""

from smol_tpu.cofe.space.basis import (
    IndicatorBasis,
    StandardBasis,
    available_site_basis_sets,
    basis_factory,
)
from smol_tpu.cofe.space.cluster import Cluster
from smol_tpu.cofe.space.clusterspace import (
    ClusterSubspace,
    PottsSubspace,
    invert_mapping,
)
from smol_tpu.cofe.space.domain import (
    SiteSpace,
    Vacancy,
    get_allowed_species,
    get_site_spaces,
    get_species,
)
from smol_tpu.cofe.space.orbit import Orbit

__all__ = [
    "SiteSpace",
    "Vacancy",
    "get_site_spaces",
    "get_allowed_species",
    "get_species",
    "StandardBasis",
    "IndicatorBasis",
    "basis_factory",
    "available_site_basis_sets",
    "Cluster",
    "Orbit",
    "ClusterSubspace",
    "PottsSubspace",
    "invert_mapping",
]
