"""Monte Carlo layer: processors, ensembles, kernels, samplers."""

from smol_tpu.moca.ensemble import Ensemble
from smol_tpu.moca.processor.base import Processor
from smol_tpu.moca.processor.composite import CompositeProcessor
from smol_tpu.moca.processor.ewald import EwaldProcessor
from smol_tpu.moca.processor.expansion import (
    ClusterDecompositionProcessor,
    ClusterExpansionProcessor,
)
from smol_tpu.moca.composition.space import CompositionSpace
from smol_tpu.moca.processor.distance import (
    ClusterInteractionDistanceProcessor,
    CorrelationDistanceProcessor,
)
from smol_tpu.moca.kernel import (
    available_bias_types,
    available_mckernels,
    available_step_types,
)
from smol_tpu.moca.sampler.container import SampleContainer
from smol_tpu.moca.sampler.sampler import Sampler
from smol_tpu.moca.sublattice import Sublattice

__all__ = [
    "available_mckernels",
    "available_step_types",
    "available_bias_types",
    "Processor",
    "ClusterExpansionProcessor",
    "ClusterDecompositionProcessor",
    "EwaldProcessor",
    "CompositeProcessor",
    "Ensemble",
    "Sublattice",
    "Sampler",
    "SampleContainer",
    "CompositionSpace",
    "CorrelationDistanceProcessor",
    "ClusterInteractionDistanceProcessor",
]
