"""Loader for the native host-runtime library (C++/OpenMP via ctypes).

Builds ``native/smol_host.cpp`` on demand with g++ into a per-user cache and
exposes the kernels with numpy-friendly ctypes wrappers.  Every entry point
has a pure-numpy fallback, so the framework works without a toolchain; set
``SMOL_TPU_NO_NATIVE=1`` to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "smol_host.cpp"


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SMOL_TPU_NO_NATIVE"):
        return None
    try:
        src = _SRC.read_text()
    except OSError:
        return None
    digest = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = Path(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    ) / "smol_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    ext = sysconfig.get_config_var("SHLIB_SUFFIX") or ".so"
    lib_path = cache / f"smol_host_{digest}{ext}"
    if not lib_path.exists():
        cmd = [
            "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
            str(_SRC), "-o", str(lib_path),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            try:  # retry without OpenMP / march
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", str(_SRC), "-o",
                     str(lib_path)],
                    check=True, capture_output=True, timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        return None

    lib.coord_list_mapping_pbc.restype = ctypes.c_int64
    lib.coord_list_mapping_pbc.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ewald_real_sums.restype = None
    lib.ewald_real_sums.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ]
    lib.smol_get_max_threads.restype = ctypes.c_int64
    lib.smol_get_max_threads.argtypes = []
    lib.smol_set_num_threads.restype = None
    lib.smol_set_num_threads.argtypes = [ctypes.c_int64]
    _LIB = lib
    return _LIB


def available() -> bool:
    """True when the native library is built and loadable."""
    return _build_and_load() is not None


def get_max_threads() -> int:
    """Maximum host OpenMP threads (1 without OpenMP; cpu_count fallback)."""
    lib = _build_and_load()
    if lib is None:
        return os.cpu_count() or 1
    return int(lib.smol_get_max_threads())


def set_num_threads(n: int) -> None:
    """Set the host OpenMP thread count for the native kernels (no-op
    without the library; TPU device kernels are unaffected)."""
    lib = _build_and_load()
    if lib is not None and n > 0:
        lib.smol_set_num_threads(int(n))


def _dptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def coord_list_mapping_pbc(subset, superset, atol=1e-8):
    """Native PBC coordinate mapping; returns None when unavailable."""
    if os.environ.get("SMOL_TPU_NO_NATIVE"):
        return None
    lib = _build_and_load()
    if lib is None:
        return None
    sub = np.ascontiguousarray(np.atleast_2d(subset), dtype=np.float64)
    sup = np.ascontiguousarray(np.atleast_2d(superset), dtype=np.float64)
    out = np.empty(len(sub), dtype=np.int64)
    failures = lib.coord_list_mapping_pbc(
        _dptr(sub), len(sub), _dptr(sup), len(sup), atol,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if failures:
        if np.any(out == -2):
            raise ValueError("Some coordinates in subset match multiple rows.")
        raise ValueError("Some coordinates in subset are not in superset.")
    return out


def ewald_real_sums(coords, img_cart, sqrt_eta, rmax):
    """Native real-space Ewald pair sums; returns None when unavailable."""
    if os.environ.get("SMOL_TPU_NO_NATIVE"):
        return None
    lib = _build_and_load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    img = np.ascontiguousarray(img_cart, dtype=np.float64)
    n = len(coords)
    out = np.zeros((n, n), dtype=np.float64)
    lib.ewald_real_sums(
        _dptr(coords), n, _dptr(img), len(img), sqrt_eta, rmax, _dptr(out)
    )
    return out
