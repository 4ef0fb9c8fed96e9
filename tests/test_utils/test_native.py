"""Native C++ host-kernel tests: build, parity with numpy fallbacks."""

import os

import numpy as np
import pytest

from smol_tpu.utils import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


def test_coord_mapping_parity(lib_available, rng):
    sup = rng.random((500, 3))
    perm = rng.permutation(400)
    sub = np.mod(sup[perm] + rng.integers(-2, 3, (400, 3)), 1.0)
    out = native.coord_list_mapping_pbc(sub, sup, atol=1e-8)
    np.testing.assert_array_equal(out, perm)
    # missing coordinate raises
    bad = sub.copy()
    bad[5] = [0.123456, 0.654321, 0.111111]
    with pytest.raises(ValueError):
        native.coord_list_mapping_pbc(bad, sup, atol=1e-10)


def test_coord_mapping_used_by_clusterspace(lib_available):
    """Large-supercell orbit indices agree between native and numpy paths."""
    from smol_tpu.benchmarks.systems import fcc_binary_prim
    from smol_tpu.cofe import ClusterSubspace

    prim = fcc_binary_prim()
    scm = np.diag([4, 4, 4])

    cs1 = ClusterSubspace.from_cutoffs(prim, {2: 5.4})
    inds_native = cs1.get_orbit_indices(scm).arrays

    os.environ["SMOL_TPU_NO_NATIVE"] = "1"
    try:
        cs2 = ClusterSubspace.from_cutoffs(prim, {2: 5.4})
        inds_numpy = cs2.get_orbit_indices(scm).arrays
    finally:
        del os.environ["SMOL_TPU_NO_NATIVE"]
    for a, b in zip(inds_native, inds_numpy):
        np.testing.assert_array_equal(a, b)


def test_ewald_native_parity(lib_available):
    """Native real-space Ewald matches the numpy path on physical entries."""
    from smol_tpu.crystal import Lattice, Structure
    from smol_tpu.crystal.ewald import EwaldSummation

    a = 5.0
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    s = Structure(lat, ["Na+", "Cl-"], [[0, 0, 0], [0.5, 0.5, 0.5]])
    ew_native = EwaldSummation(s)

    os.environ["SMOL_TPU_NO_NATIVE"] = "1"
    try:
        import smol_tpu.utils.native as native_mod

        # force re-evaluation of availability inside this block
        ew_numpy = EwaldSummation(s)
    finally:
        del os.environ["SMOL_TPU_NO_NATIVE"]
    np.testing.assert_allclose(
        ew_native.total_energy_matrix, ew_numpy.total_energy_matrix, atol=1e-10
    )
