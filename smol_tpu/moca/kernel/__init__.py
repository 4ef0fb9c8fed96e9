"""MC kernels, ushers and biases."""

from smol_tpu.moca.kernel.base import (
    MCKernel,
    MCKernelInterface,
    StandardSingleStepMixin,
    ThermalKernelMixin,
)
from smol_tpu.moca.kernel.bias import (
    FugacityBias,
    MCBias,
    SquareChargeBias,
    SquareHyperplaneBias,
    available_bias_types,
    mcbias_factory,
)
from smol_tpu.moca.kernel.mcusher import (
    Composite,
    Flip,
    MCUsher,
    MultiStep,
    Swap,
    available_step_types,
    mcusher_factory,
)
from smol_tpu.moca.kernel.metropolis import Metropolis, UniformlyRandom
from smol_tpu.moca.kernel.wanglandau import WangLandau
from smol_tpu.utils.class_utils import class_name_from_str, derived_class_factory

__all__ = [
    "MCKernel",
    "MCKernelInterface",
    "StandardSingleStepMixin",
    "ThermalKernelMixin",
    "Metropolis",
    "UniformlyRandom",
    "WangLandau",
    "MCUsher",
    "Flip",
    "Swap",
    "MultiStep",
    "Composite",
    "TableFlip",
    "MCBias",
    "FugacityBias",
    "SquareChargeBias",
    "SquareHyperplaneBias",
    "mckernel_factory",
    "mcusher_factory",
    "mcbias_factory",
    "available_mckernels",
    "available_step_types",
    "available_bias_types",
]


def available_mckernels() -> tuple:
    """Names of the available MC kernel types.

    Matches reference smol's ``available_mckernels``
    (smol/moca/kernel/__init__.py:26), which walks the common
    MCKernelInterface — here the single-cell ``MCKernel`` tree plus the
    multicell kernels (a separate base in this design).
    """
    from smol_tpu.moca.kernel.multicell import MulticellKernel
    from smol_tpu.utils.class_utils import get_subclasses

    return tuple(get_subclasses(MCKernel)) + tuple(
        get_subclasses(MulticellKernel)
    )


def mckernel_factory(kernel_type, ensemble, step_type, *args, **kwargs):
    """Instantiate an MCKernel by class name string."""
    return derived_class_factory(
        class_name_from_str(kernel_type), MCKernel, ensemble, step_type,
        *args, **kwargs,
    )


def _load_tableflip():
    # TableFlip imports CompositionSpace lazily to avoid a circular import
    from smol_tpu.moca.kernel.tableflip import TableFlip  # noqa: F401

    return TableFlip


try:
    from smol_tpu.moca.kernel.tableflip import TableFlip  # noqa: F401
except ImportError:  # pragma: no cover - until tableflip lands
    TableFlip = None
