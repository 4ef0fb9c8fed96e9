"""Processors: fixed-supercell property evaluation for MC sampling."""

from smol_tpu.moca.processor.base import Processor
from smol_tpu.moca.processor.composite import CompositeProcessor
from smol_tpu.moca.processor.ewald import EwaldProcessor
from smol_tpu.moca.processor.expansion import (
    ClusterDecompositionProcessor,
    ClusterExpansionProcessor,
)

__all__ = [
    "Processor",
    "ClusterExpansionProcessor",
    "ClusterDecompositionProcessor",
    "EwaldProcessor",
    "CompositeProcessor",
]
