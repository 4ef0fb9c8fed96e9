"""Training-data wrangling: featurization, weights, selection."""

from smol_tpu.cofe.wrangling.select import (
    composition_select,
    full_row_rank_select,
    gaussian_select,
)
from smol_tpu.cofe.wrangling.tools import (
    max_ewald_energy_indices,
    unique_corr_vector_indices,
    weights_energy_above_composition,
    weights_energy_above_hull,
)
from smol_tpu.cofe.wrangling.wrangler import StructureWrangler

__all__ = [
    "StructureWrangler",
    "unique_corr_vector_indices",
    "max_ewald_energy_indices",
    "weights_energy_above_composition",
    "weights_energy_above_hull",
    "full_row_rank_select",
    "gaussian_select",
    "composition_select",
]
