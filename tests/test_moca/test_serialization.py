"""Serialization round trips: processors, ensembles, containers, work files.

Mirrors the reference's MSON round-trip tests (smol tests/test_moca/test_*.py
via assert_msonable) plus HDF5 container persistence
(smol/moca/sampler/container.py:615-692) and smol/io.py work files.
"""

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.cofe.expansion import ClusterExpansion
from smol_tpu.cofe.extern import EwaldTerm
from smol_tpu.io import load_work, save_work
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.serial import dumps_obj, loads_obj


@pytest.fixture(scope="module")
def ensemble():
    cs = ClusterSubspace.from_cutoffs(fcc_binary_prim(), {2: 4.2})
    rng = np.random.default_rng(11)
    coefs = rng.normal(scale=0.02, size=cs.num_corr_functions)
    coefs[0] = -1.0
    exp = ClusterExpansion(cs, coefs)
    return Ensemble.from_cluster_expansion(exp, np.diag([2, 2, 2]))


@pytest.fixture(scope="module")
def sampled(ensemble):
    rng = np.random.default_rng(7)
    occu = rng.integers(0, 2, (4, ensemble.num_sites)).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ensemble, temperature=1500.0, nwalkers=4, seed=3
    )
    sampler.run(200, occu, thin_by=10)
    return sampler


def test_ensemble_roundtrip(ensemble):
    ens2 = loads_obj(dumps_obj(ensemble))
    assert isinstance(ens2, Ensemble)
    assert ens2.num_sites == ensemble.num_sites
    rng = np.random.default_rng(0)
    occu = rng.integers(0, 2, ensemble.num_sites).astype(np.int32)
    np.testing.assert_allclose(
        ens2.compute_feature_vector(occu),
        ensemble.compute_feature_vector(occu),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        ens2.natural_parameters, ensemble.natural_parameters
    )


def test_ensemble_with_chemical_potentials_roundtrip(ensemble):
    ens = loads_obj(dumps_obj(ensemble))
    ens.chemical_potentials = {"Au": 0.1, "Cu": -0.3}
    ens2 = loads_obj(dumps_obj(ens))
    assert ens2.chemical_potentials is not None
    rng = np.random.default_rng(1)
    occu = rng.integers(0, 2, ens.num_sites).astype(np.int32)
    np.testing.assert_allclose(
        ens2.compute_feature_vector(occu),
        ens.compute_feature_vector(occu),
        atol=1e-12,
    )


def test_composite_processor_roundtrip():
    """CE + Ewald composite processor survives a polymorphic round trip."""
    from smol_tpu.crystal import Lattice, Structure
    from smol_tpu.moca.processor import Processor

    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat, [{"Li+": 0.5, "Mn3+": 0.5}, {"O2-": 1.0}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    cs = ClusterSubspace.from_cutoffs(prim, {2: 4.0})
    cs.add_external_term(EwaldTerm())
    rng = np.random.default_rng(2)
    coefs = rng.normal(scale=0.05, size=cs.num_corr_functions + 1)
    exp = ClusterExpansion(cs, coefs)
    ens = Ensemble.from_cluster_expansion(exp, np.diag([2, 1, 1]))

    proc2 = Processor.from_dict(ens.processor.as_dict())
    assert type(proc2) is type(ens.processor)
    occu = rng.integers(0, 2, ens.num_sites).astype(np.int32)
    np.testing.assert_allclose(
        proc2.compute_feature_vector(occu),
        ens.processor.compute_feature_vector(occu),
        atol=1e-10,
    )


def test_container_mson_roundtrip(sampled):
    cont = sampled.samples
    cont2 = loads_obj(dumps_obj(cont))
    assert cont2.num_samples == cont.num_samples
    np.testing.assert_array_equal(
        cont2.get_occupancies(), cont.get_occupancies()
    )
    np.testing.assert_allclose(
        cont2.get_enthalpies(), cont.get_enthalpies(), atol=1e-12
    )


def test_container_hdf5_roundtrip(sampled, tmp_path):
    h5py = pytest.importorskip("h5py")  # noqa: F841
    from smol_tpu.moca.sampler.container import SampleContainer

    cont = sampled.samples
    path = str(tmp_path / "chains.h5")
    cont.to_hdf5(path)
    cont2 = SampleContainer.from_hdf5(path, swmr_mode=False)
    assert cont2.num_samples == cont.num_samples
    np.testing.assert_array_equal(
        cont2.get_occupancies(), cont.get_occupancies()
    )
    np.testing.assert_allclose(
        cont2.get_enthalpies(), cont.get_enthalpies(), atol=1e-12
    )


def test_streaming_run_matches_memory(ensemble, tmp_path):
    """Sampler.run with HDF5 streaming reproduces the in-memory chain."""
    pytest.importorskip("h5py")
    from smol_tpu.moca.sampler.container import SampleContainer

    rng = np.random.default_rng(9)
    occu = rng.integers(0, 2, (2, ensemble.num_sites)).astype(np.int32)

    s1 = Sampler.from_ensemble(ensemble, temperature=1000.0, nwalkers=2, seed=5)
    s1.run(300, occu.copy(), thin_by=10)

    path = str(tmp_path / "stream.h5")
    s2 = Sampler.from_ensemble(ensemble, temperature=1000.0, nwalkers=2, seed=5)
    s2.run(300, occu.copy(), thin_by=10, stream_chunk=10, stream_file=path)

    streamed = SampleContainer.from_hdf5(path, swmr_mode=False)
    np.testing.assert_array_equal(
        streamed.get_occupancies(), s1.samples.get_occupancies()
    )
    np.testing.assert_allclose(
        streamed.get_enthalpies(), s1.samples.get_enthalpies(), atol=1e-12
    )


def test_save_load_work(ensemble, tmp_path):
    cs = ensemble.processor.cluster_subspace
    exp = ClusterExpansion(
        cs, np.ones(cs.num_corr_functions)
    )
    path = str(tmp_path / "work.json")
    save_work(path, cs, exp, ensemble)
    work = load_work(path)
    assert set(work) == {"ClusterSubspace", "ClusterExpansion", "Ensemble"}
    assert work["ClusterSubspace"].num_corr_functions == cs.num_corr_functions
    # duplicate class rejected
    with pytest.raises(AttributeError):
        save_work(str(tmp_path / "dup.json"), cs, cs)


def test_unfinished_hdf5_run_recovery(ensemble, tmp_path):
    """A crashed streaming run (allocated > written) loads cleanly.

    The backend allocates dataset space up front; if the process dies
    before all samples flush, from_hdf5 must warn and recover exactly the
    samples that were written (reference container.py:649-657 behavior).
    """
    pytest.importorskip("h5py")
    from smol_tpu.moca.sampler.container import SampleContainer

    rng = np.random.default_rng(9)
    occu = rng.integers(0, 2, (2, ensemble.num_sites)).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ensemble, temperature=1000.0, nwalkers=2, seed=5
    )
    sampler.run(100, occu, thin_by=10)  # 10 samples in memory

    expected_occ = sampler.samples.get_occupancies().copy()
    expected_enth = sampler.samples.get_enthalpies().copy()

    # simulate the crash: allocate space for 30 samples, flush only the 10
    # sampled ones (flush clears memory), then "die" without trimming
    path = str(tmp_path / "crashed.h5")
    backend = sampler.samples.get_backend(path, alloc_nsamples=30)
    sampler.samples.flush_to_backend(backend)
    backend.close()

    with pytest.warns(UserWarning, match="written"):
        recovered = SampleContainer.from_hdf5(path, swmr_mode=False)
    assert recovered.num_samples == 10
    np.testing.assert_array_equal(recovered.get_occupancies(), expected_occ)
    np.testing.assert_allclose(
        recovered.get_enthalpies(), expected_enth, atol=1e-12
    )
    # and a resumed Sampler continues from the recovered last sample
    s2 = Sampler(sampler.mckernel, recovered, nwalkers=2)
    s2.run(50, thin_by=10)
    assert s2.samples.num_samples == 15
