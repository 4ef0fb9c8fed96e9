"""Reference public-API parity surfaces added in round 3.

Each test exercises an API that exists on the reference's public surface
(class names, methods, module functions) and validates it does real work —
not just that the name resolves.
"""

import json

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.cofe import ClusterSubspace, RegressionData
from smol_tpu.cofe.space.cluster import Cluster
from smol_tpu.cofe.space.clusterspace import get_complete_mapping, invert_mapping
from smol_tpu.moca import Ensemble
from smol_tpu.moca.ensemble import ChemicalPotentialManager
from smol_tpu.moca.kernel import (
    MCKernel,
    MCKernelInterface,
    Metropolis,
    StandardSingleStepMixin,
)
from smol_tpu.moca.kernel.mcusher import Composite, Flip, Swap
from smol_tpu.moca.kernel.multicell import MulticellMetropolis
from smol_tpu.moca.processor.distance import (
    CorrelationDistanceProcessor,
    DistanceProcessor,
)
from smol_tpu.ops import ref as refops


@pytest.fixture(scope="module")
def subspace():
    return ClusterSubspace.from_cutoffs(fcc_binary_prim(), {2: 4.2, 3: 3.0})


@pytest.fixture(scope="module")
def ensemble():
    ce = random_expansion(fcc_binary_prim(), {2: 4.0, 3: 2.8}, seed=7)
    return Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))


# ---------------- Cluster site-collection API ----------------


def test_cluster_sites_and_distance(subspace):
    orbit = subspace.orbits_by_size[2][0]
    cluster = orbit.base_cluster
    sites = cluster.sites
    assert len(sites) == len(cluster) == 2
    d01 = cluster.get_distance(0, 1)
    assert d01 == pytest.approx(cluster.diameter)
    # __getitem__ returns the same site objects layout
    assert cluster[0].frac_coords == pytest.approx(sites[0].frac_coords)


def test_cluster_copy_io_roundtrip(subspace, tmp_path):
    cluster = subspace.orbits[0].base_cluster
    dup = cluster.copy()
    assert dup == cluster and dup is not cluster
    assert Cluster.from_str(cluster.to(fmt="json"), "json") == cluster
    assert Cluster.from_str(cluster.to(fmt="yaml"), "yaml") == cluster
    path = tmp_path / "cluster.json"
    cluster.to(filename=str(path))
    assert Cluster.from_file(str(path)) == cluster
    with pytest.raises(ValueError):
        cluster.to(fmt="xyz")


def test_cluster_from_sites_roundtrip(subspace):
    cluster = subspace.orbits_by_size[2][0].base_cluster
    rebuilt = Cluster.from_sites(cluster.sites)
    assert rebuilt == cluster


# ---------------- ClusterSubspace evaluator / orbit lists ----------------


def test_evaluator_object_matches_module_path(subspace, rng):
    scm = np.diag([2, 2, 2])
    occu = rng.integers(0, 2, size=8).astype(np.int32)
    evaluator = subspace.evaluator
    corr_eval = evaluator.correlations_from_occupancy(
        occu, subspace.supercell_orbit_mappings(scm)
    )
    corr_direct = subspace.corr_from_occupancy(occu, scm)
    np.testing.assert_allclose(corr_eval, corr_direct, rtol=1e-12)


def test_gen_orbit_list_layout(subspace):
    scm = np.diag([2, 2, 2])
    orbit_list = subspace.gen_orbit_list(scm)
    assert len(orbit_list) == len(subspace.orbits)
    bit_id, strides, tensors, inds = orbit_list[0]
    assert bit_id == subspace.orbits[0].bit_id
    assert tensors.ndim == 2 and inds.dtype == np.int32
    assert strides.shape[0] == inds.shape[1]


def test_legacy_single_flip_functions(subspace, rng):
    """Legacy correlations.pyx-style functions agree with full recompute."""
    scm = np.diag([2, 2, 2])
    occu_i = rng.integers(0, 2, size=8).astype(np.int32)
    occu_f = occu_i.copy()
    occu_f[3] = 1 - occu_f[3]
    num_corr = subspace.num_corr_functions

    # build the site-local orbit list for site 3 with exact cluster ratios
    site_orbit_list = []
    for bit_id, strides, tensors, inds in subspace.gen_orbit_list(scm):
        local = inds[np.any(inds == 3, axis=1)]
        if len(local):
            ratio = len(inds) / len(local)
            site_orbit_list.append((bit_id, ratio, strides, tensors, local))
    delta = refops.delta_corr_single_flip(
        occu_f, occu_i, num_corr, site_orbit_list
    )
    full_delta = subspace.corr_from_occupancy(
        occu_f, scm
    ) - subspace.corr_from_occupancy(occu_i, scm)
    np.testing.assert_allclose(delta, full_delta, atol=1e-12)

    # distance flavor: |corr - ref| pairs
    ref_corr = subspace.corr_from_occupancy(occu_i, scm)
    dists = refops.corr_distance_single_flip(
        occu_f, occu_i, ref_corr, num_corr, subspace.gen_orbit_list(scm)
    )
    assert dists.shape == (2, num_corr)
    np.testing.assert_allclose(dists[0][1:], 0.0, atol=1e-12)
    np.testing.assert_allclose(
        dists[1][1:],
        np.abs(subspace.corr_from_occupancy(occu_f, scm) - ref_corr)[1:],
        atol=1e-12,
    )


def test_complete_mapping_closure():
    mapping = [[1, 2], [3], [3], []]
    complete = get_complete_mapping(mapping)
    assert sorted(complete[0]) == [1, 2, 3]
    assert complete[1] == [3] and complete[2] == [3] and complete[3] == []
    # inverse of the one-level mapping stays one-level
    assert invert_mapping(mapping)[3] == [1, 2]


# ---------------- moca framework names ----------------


def test_chemical_potential_manager_descriptor(ensemble):
    assert isinstance(type(ensemble).chemical_potentials, ChemicalPotentialManager)
    n_coefs = len(ensemble.natural_parameters)
    ensemble.chemical_potentials = {"Au": 0.1, "Cu": -0.1}
    assert len(ensemble.natural_parameters) == n_coefs + 1
    assert ensemble.natural_parameters[-1] == -1.0
    table = ensemble.chemical_potential_table
    assert table.shape[0] == ensemble.num_sites
    ensemble.chemical_potentials = None
    assert len(ensemble.natural_parameters) == n_coefs
    assert ensemble.chemical_potential_table is None
    with pytest.raises(ValueError):
        ensemble.chemical_potentials = {"Au": 0.1}  # missing Cu


def test_kernel_interface_hierarchy(ensemble):
    assert issubclass(Metropolis, MCKernel)
    assert issubclass(MCKernel, MCKernelInterface)
    assert issubclass(MCKernel, StandardSingleStepMixin)
    assert issubclass(MulticellMetropolis, MCKernelInterface)
    kernel = Metropolis(ensemble, "swap", temperature=500.0, seed=5)
    occu = np.zeros(ensemble.num_sites, dtype=np.int32)
    occu[:4] = 1
    trace = kernel.single_step(occu.copy())
    assert hasattr(trace, "delta_trace")


def test_composite_usher_weight(ensemble):
    composite = Composite(
        ensemble.sublattices,
        [Flip(ensemble.sublattices), Swap(ensemble.sublattices)],
        mcusher_weights=[3, 1],
    )
    assert composite.weight == [3, 1]
    assert composite.probabilities == pytest.approx([0.75, 0.25])


def test_distance_processor_base_and_distance_change(subspace, ensemble, rng):
    proc = CorrelationDistanceProcessor(subspace, np.diag([2, 2, 2]))
    assert isinstance(proc, DistanceProcessor)
    occu = rng.integers(0, 2, size=8).astype(np.int32)
    flips = [(2, np.int32(1 - occu[2]))]
    target = rng.random(len(subspace))
    change = proc.compute_feature_vector_distance_change(target, occu, flips)
    occu_f = occu.copy()
    occu_f[2] = flips[0][1]
    expected = np.abs(
        proc._base_feature_vector(occu_f) / proc.size - target
    ) - np.abs(proc._base_feature_vector(occu) / proc.size - target)
    np.testing.assert_allclose(change, expected, atol=1e-12)
    # the plain processor base declares (and refuses) the interface
    with pytest.raises(NotImplementedError):
        ensemble.processor.compute_feature_vector_distance_change(
            target, occu, flips
        )


def test_regression_data_from_object():
    def my_fit(X, y):
        return np.linalg.lstsq(X, y, rcond=None)[0]

    X = np.eye(3)
    y = np.arange(3.0)
    data = RegressionData.from_object(my_fit, X, y, parameters={"rcond": None})
    assert data.estimator_name == "my_fit"
    assert data.parameters == {"rcond": None}
    np.testing.assert_array_equal(data.feature_matrix, X)
    # and the dict round-trips through JSON
    loaded = RegressionData.from_dict(json.loads(json.dumps(data.as_dict())))
    assert loaded.estimator_name == "my_fit"


# ---------------- round-3 parity tail: host kernels & knobs ----------------


def test_local_eval_data(ensemble):
    """Per-site local-update views of the packed tables (reference
    expansion.py:24-36)."""
    proc = ensemble.processor
    packed = proc.packed
    led = proc.get_local_eval_data(3)
    assert led.site_index == 3
    # every listed cluster contains the site
    for c in led.cluster_indices:
        sites = packed.cluster_sites[c][packed.cluster_strides[c] != 0]
        assert 3 in set(int(s) for s in sites)
    # ratios are total/local counts, >= 1
    for orbit_id, ratio in led.cluster_ratio.items():
        assert ratio >= 1.0
        local = (packed.cluster_orbit[led.cluster_indices] == orbit_id).sum()
        assert ratio == pytest.approx(
            float(packed.orbit_cluster_count[orbit_id]) / int(local)
        )


def test_distance_processor_polymorphic_from_dict(subspace):
    """DistanceProcessor.from_dict dispatches on @class (reference
    distance.py:186-208)."""
    from smol_tpu.moca.processor.distance import (
        ClusterInteractionDistanceProcessor,
    )

    scm = np.diag([2, 2, 2])
    for cls in (CorrelationDistanceProcessor, ClusterInteractionDistanceProcessor):
        proc = cls(subspace, scm)
        again = DistanceProcessor.from_dict(proc.as_dict())
        assert type(again) is cls
        np.testing.assert_allclose(again.target_vector, proc.target_vector)
        occu = np.array([0, 1] * 4, dtype=np.int32)
        np.testing.assert_allclose(
            again.compute_feature_vector(occu), proc.compute_feature_vector(occu)
        )
    with pytest.raises(NameError):
        DistanceProcessor.from_dict({"@class": "NotAProcessor"})


def test_set_num_threads_descriptor(subspace):
    """The evaluator carries the reference's host-thread knob semantics
    (reference numthreads.py:14-54): default, clamping, type checks."""
    import warnings

    from smol_tpu.utils.numthreads import effective_numthreads

    evaluator = subspace.evaluator
    assert isinstance(evaluator.num_threads, int)
    evaluator.num_threads = 1
    assert evaluator.num_threads == 1
    max_threads = effective_numthreads()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        evaluator.num_threads = max_threads + 10**6
        assert evaluator.num_threads == max_threads
        assert any("num_threads" in str(w.message) for w in caught)
    with pytest.raises(TypeError):
        evaluator.num_threads = 1.5
    # negative counts leave |n|-1 threads unused (reference helpers :74-77)
    assert effective_numthreads(-1) == max_threads
    assert effective_numthreads(None) == max_threads


def test_sqs_sampler_property_host_run():
    """StochasticSQSGenerator.sampler exposes a runnable multicell
    Metropolis stack (reference sqs.py:526-546) through the host sampling
    loop; stored features/enthalpies stay exactly consistent with the
    current kernel's processor."""
    from smol_tpu.capp.generate.special.sqs import StochasticSQSGenerator
    from smol_tpu.cofe import ClusterSubspace

    cs = ClusterSubspace.from_cutoffs(
        fcc_binary_prim(), {2: 4.0}, basis="indicator",
        orthonormal=True, use_concentration=True,
    )
    gen = StochasticSQSGenerator(cs, 4)
    sampler = gen.sampler
    assert sampler is gen.sampler  # memoized
    kernel = sampler.mckernels[0]
    assert len(kernel.mckernels) == len(gen._processors)
    assert kernel.kB == 1.0

    occu = np.array([0, 1, 0, 1], dtype=np.int32)
    sampler.anneal([5.0, 1.0], 20, initial_occupancies=occu[None], thin_by=5)
    container = sampler.samples
    assert container.num_samples == 8
    # stored features equal a fresh evaluation of the stored occupancy by
    # the kernel the sample was taken in
    last = container.num_samples - 1
    occ = container.get_occupancies(flat=False)[-1][0].astype(np.int32)
    kernel_index = int(container._trace.kernel_index[last, 0])
    feats = gen._processors[kernel_index].compute_feature_vector(occ)
    np.testing.assert_allclose(
        container._trace.features[last, 0], feats, atol=1e-9
    )
    enthalpy = container.get_energies(flat=False)[-1, 0]
    assert enthalpy == pytest.approx(
        float(np.dot(kernel.natural_params, feats)), abs=1e-9
    )
    rates = container._trace.accept_rate[: container.num_samples]
    assert np.all((rates >= 0) & (rates <= 1))
