"""Samplers and sample containers."""

from smol_tpu.moca.sampler.container import SampleContainer
from smol_tpu.moca.sampler.sampler import Sampler

__all__ = ["Sampler", "SampleContainer"]
