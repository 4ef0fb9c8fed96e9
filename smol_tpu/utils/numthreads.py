"""Host thread-count plumbing.

TPU re-reading of the reference's OpenMP thread knobs
(smol/utils/cluster/numthreads.py, smol/utils/_openmp_helpers.pyx): on TPU,
XLA owns all device parallelism and ``num_threads`` has no effect on the
compute path; the knob governs the host-side OpenMP C++ kernels
(smol_tpu/native, used for coordinate mapping and Ewald assembly during
subspace/processor setup).  The throughput lever that replaces OpenMP
threads is the replica count (``nwalkers`` / ``chain_block_size``).
"""

from __future__ import annotations

import os
import warnings

from smol_tpu.utils import native

__all__ = ["DEFAULT_NUM_THREADS", "effective_numthreads", "SetNumThreads", "HostKernels"]


def effective_numthreads(n_threads=None) -> int:
    """Resolve a thread request to an effective host thread count.

    Mirrors the reference's ``_openmp_effective_numthreads``
    (smol/utils/_openmp_helpers.pyx:38): ``None``/0 means the OpenMP
    maximum (honoring ``OMP_NUM_THREADS``), positive counts pass through,
    and negative counts mean "maximum minus |n| plus one" (so -1 is all
    threads).
    """
    max_threads = native.get_max_threads()
    if n_threads is None or n_threads == 0:
        return max_threads
    if n_threads < 0:
        effective = max_threads + 1 + n_threads
        if effective < 1:
            warnings.warn(
                f"n_threads={n_threads} leaves no threads on a "
                f"{max_threads}-thread host; using 1.",
                UserWarning,
            )
            return 1
        return effective
    return int(n_threads)


if os.getenv("OMP_NUM_THREADS") is not None:
    DEFAULT_NUM_THREADS = effective_numthreads()
else:
    DEFAULT_NUM_THREADS = effective_numthreads(n_threads=2)


class SetNumThreads:
    """Descriptor delegating ``num_threads`` to a multithreaded attribute.

    Reference-parity semantics (smol/utils/cluster/numthreads.py:14-54):
    ``None`` resolves to the default, non-ints are rejected, and requests
    above the host maximum are clamped with a warning.  The attributed
    object (e.g. :class:`HostKernels`) must expose the thread attribute.
    """

    def __init__(self, multithreaded_object_name: str, thread_attr_name: str = "num_threads"):
        self._obj_name = multithreaded_object_name
        self._attr_name = thread_attr_name

    def __get__(self, instance, objtype=None):
        if instance is None:
            return self
        return getattr(getattr(instance, self._obj_name), self._attr_name)

    def __set__(self, instance, value):
        if value is None:
            value = DEFAULT_NUM_THREADS
        if not isinstance(value, int):
            raise TypeError("num_threads must be an integer")
        max_threads = effective_numthreads()
        if value > max_threads:
            warnings.warn(
                f"num_threads cannot be greater than {max_threads}. "
                f"Setting to {max_threads}. If you want more threads, set "
                "the OMP_NUM_THREADS environment variable accordingly.",
                UserWarning,
            )
            value = max_threads
        setattr(
            getattr(instance, self._obj_name),
            self._attr_name,
            effective_numthreads(value),
        )


class HostKernels:
    """Handle on the native host kernel library's OpenMP thread count.

    The "multithreaded object" that :class:`SetNumThreads` delegates to:
    setting ``num_threads`` pushes the value to the OpenMP runtime of the
    native library (global for the process, like ``omp_set_num_threads``).
    """

    def __init__(self, num_threads: int | None = None):
        self._num_threads = (
            DEFAULT_NUM_THREADS if num_threads is None else int(num_threads)
        )

    @property
    def num_threads(self) -> int:
        return self._num_threads

    @num_threads.setter
    def num_threads(self, value: int):
        self._num_threads = int(value)
        native.set_num_threads(self._num_threads)
