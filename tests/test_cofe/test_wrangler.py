"""StructureWrangler tests: the full train-data path with synthetic data.

Mirrors the reference strategy (tests/utils.py:81-112): random ECIs and
random ordered structures replace DFT data; a fit on synthetic energies
must recover them exactly (the feature matrix path is consistent).
"""

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim
from smol_tpu.capp import generate_random_ordered_occupancy
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.cofe.expansion import ClusterExpansion, RegressionData
from smol_tpu.cofe.wrangling import (
    StructureWrangler,
    full_row_rank_select,
    gaussian_select,
    unique_corr_vector_indices,
    weights_energy_above_composition,
    weights_energy_above_hull,
)
from smol_tpu.crystal.entries import ComputedStructureEntry
from smol_tpu.moca.processor.expansion import ClusterExpansionProcessor
from smol_tpu.serial import dumps_obj, loads_obj


@pytest.fixture(scope="module")
def wrangler_with_data():
    prim = fcc_binary_prim()
    subspace = ClusterSubspace.from_cutoffs(prim, {2: 4.0, 3: 2.8})
    rng = np.random.default_rng(8)
    coefs = rng.normal(scale=0.1, size=subspace.num_corr_functions)
    coefs[0] = -2.0

    # synthetic training data: random ordered supercell structures with
    # energies from the "true" ECIs
    wrangler = StructureWrangler(subspace)
    entries = []
    for scm in (np.diag([2, 2, 2]), np.diag([2, 2, 1]), np.diag([3, 1, 1])):
        processor = ClusterExpansionProcessor(
            subspace, scm, np.ones(subspace.num_corr_functions)
        )
        for _ in range(6):
            occu = generate_random_ordered_occupancy(processor, rng=rng)
            structure = processor.structure_from_occupancy(occu)
            size = processor.size
            energy = float(
                coefs @ subspace.corr_from_occupancy(occu, scm) * size
            )
            entries.append(ComputedStructureEntry(structure, energy))
    for entry in entries:
        wrangler.add_entry(entry, verbose=False)
    return wrangler, coefs


def test_wrangler_feature_matrix(wrangler_with_data):
    wrangler, coefs = wrangler_with_data
    assert wrangler.num_structures > 10
    matrix = wrangler.feature_matrix
    assert matrix.shape[1] == len(coefs)
    # energies normalized per prim must equal features @ coefs exactly
    energies = wrangler.get_property_vector("energy")
    np.testing.assert_allclose(matrix @ coefs, energies, atol=1e-10)


def test_fit_recovers_ecis(wrangler_with_data):
    wrangler, coefs = wrangler_with_data
    matrix = wrangler.feature_matrix
    energies = wrangler.get_property_vector("energy")
    fit, *_ = np.linalg.lstsq(matrix, energies, rcond=None)
    # predicted energies must match (exact fit within data rank)
    np.testing.assert_allclose(matrix @ fit, energies, atol=1e-8)
    expansion = ClusterExpansion(
        wrangler.cluster_subspace,
        fit,
        RegressionData(feature_matrix=matrix, property_vector=energies),
    )
    structure = wrangler.structures[0]
    predicted = expansion.predict(structure, normalized=True)
    assert predicted == pytest.approx(energies[0], abs=1e-8)


def test_diagnostics(wrangler_with_data):
    wrangler, _ = wrangler_with_data
    rank = wrangler.get_feature_matrix_rank()
    assert 0 < rank <= wrangler.num_features
    cond = wrangler.get_condition_number()
    assert cond >= 1
    gram = wrangler.get_gram_matrix()
    assert gram.shape == (wrangler.num_features, wrangler.num_features)
    assert np.allclose(gram, gram.T)
    # constant feature 0 present
    dups = wrangler.get_duplicate_corr_indices()
    assert isinstance(dups, list)


def test_tools_and_select(wrangler_with_data):
    wrangler, _ = wrangler_with_data
    indices = unique_corr_vector_indices(wrangler, "energy")
    assert len(indices) <= wrangler.num_structures
    weights = weights_energy_above_composition(
        wrangler.structures, wrangler.get_property_vector("energy", False)
    )
    assert np.all((0 < weights) & (weights <= 1))
    weights_hull = weights_energy_above_hull(
        wrangler.structures, wrangler.get_property_vector("energy", False)
    )
    assert np.all((0 < weights_hull) & (weights_hull <= 1 + 1e-12))
    rows = full_row_rank_select(wrangler.feature_matrix)
    assert np.linalg.matrix_rank(wrangler.feature_matrix) == len(rows)
    picks = gaussian_select(wrangler.feature_matrix, 5, rng=3)
    assert len(picks) == 5


def test_wrangler_serialization(wrangler_with_data):
    wrangler, _ = wrangler_with_data
    loaded = loads_obj(dumps_obj(wrangler))
    assert loaded.num_structures == wrangler.num_structures
    np.testing.assert_allclose(
        loaded.feature_matrix, wrangler.feature_matrix, atol=1e-12
    )


def test_wrangler_relaxed_entries():
    """Relaxed-DFT-style entries (rotated + strained + rattled) map correctly.

    The reference relies on pymatgen's StructureMatcher for this
    (wrangler.py:670-797); the native matcher must process such entries and
    produce the same correlation vectors as the ideal structures.
    """
    from tests.test_crystal.test_matcher import _distort, _rotation

    prim = fcc_binary_prim()
    subspace = ClusterSubspace.from_cutoffs(prim, {2: 4.0})
    rng = np.random.default_rng(21)
    coefs = rng.normal(scale=0.1, size=subspace.num_corr_functions)
    coefs[0] = -2.0

    wrangler = StructureWrangler(subspace)
    scm = np.diag([2, 2, 2])
    processor = ClusterExpansionProcessor(
        subspace, scm, np.ones(subspace.num_corr_functions)
    )
    ideal_corrs = []
    for k in range(5):
        occu = generate_random_ordered_occupancy(processor, rng=rng)
        structure = processor.structure_from_occupancy(occu)
        corr = subspace.corr_from_occupancy(occu, scm)
        energy = float(coefs @ corr * processor.size)
        distorted = _distort(
            structure,
            rotate=_rotation([1, k + 1, 2], 0.3 + 0.1 * k),
            strain=np.diag([0.02, -0.01, 0.015]),
            rattle=0.06,
            translate=[0.2, 0.1, -0.3],
            seed=k,
        )
        wrangler.add_entry(
            ComputedStructureEntry(distorted, energy), verbose=False
        )
        ideal_corrs.append(corr)
    assert wrangler.num_structures == 5
    np.testing.assert_allclose(
        wrangler.feature_matrix, np.array(ideal_corrs), atol=1e-10
    )
    energies = wrangler.get_property_vector("energy")
    np.testing.assert_allclose(
        wrangler.feature_matrix @ coefs, energies, atol=1e-10
    )


def test_composition_select_biases_toward_target(rng):
    from smol_tpu.cofe.wrangling import composition_select

    concentrations = rng.random((40, 2))
    concentrations /= concentrations.sum(axis=1, keepdims=True)
    target = np.array([0.5, 0.5])
    sizes = rng.integers(1, 5, 40)
    picks = composition_select(concentrations, target, sizes, 12, rng=7)
    assert len(picks) == 12
    assert picks == sorted(picks)
    assert len(set(picks)) == 12
    assert all(0 <= p < 40 for p in picks)
    # selection is biased toward the target composition
    dist = np.linalg.norm(concentrations - target, axis=1)
    assert dist[picks].mean() < dist.mean()
    # never more samples than structures
    assert len(composition_select(concentrations, target, sizes, 100, rng=7)) == 40


def test_max_ewald_energy_indices():
    from smol_tpu.benchmarks.systems import spinel_prim
    from smol_tpu.capp import generate_random_ordered_occupancy
    from smol_tpu.cofe.extern import EwaldTerm
    from smol_tpu.cofe.wrangling import max_ewald_energy_indices
    from smol_tpu.moca.processor.expansion import ClusterExpansionProcessor

    subspace = ClusterSubspace.from_cutoffs(spinel_prim(), {2: 4.0})
    # without an Ewald term the filter must refuse
    plain = StructureWrangler(subspace)
    with pytest.raises(RuntimeError):
        max_ewald_energy_indices(plain, 1.0)

    subspace_ew = ClusterSubspace.from_cutoffs(spinel_prim(), {2: 4.0})
    subspace_ew.add_external_term(EwaldTerm())
    wrangler = StructureWrangler(subspace_ew)
    rng = np.random.default_rng(11)
    scm = np.diag([1, 1, 1])
    processor = ClusterExpansionProcessor(
        subspace_ew, scm, np.ones(subspace_ew.num_corr_functions)
    )
    for _ in range(5):
        occu = generate_random_ordered_occupancy(
            processor, charge_neutral=True, rng=rng
        )
        structure = processor.structure_from_occupancy(occu)
        wrangler.add_entry(
            ComputedStructureEntry(structure, 0.0), verbose=False
        )
    ewald = wrangler.feature_matrix[:, -1]
    span = float(ewald.max() - ewald.min())
    assert span > 0  # random charge-neutral decorations differ
    keep = max_ewald_energy_indices(wrangler, span / 2)
    expected = np.nonzero(ewald - ewald.min() <= span / 2)[0]
    np.testing.assert_array_equal(keep, expected)
    keep2, dropped = max_ewald_energy_indices(
        wrangler, span / 2, return_compliment=True
    )
    np.testing.assert_array_equal(keep2, expected)
    assert set(keep2) | set(dropped) == set(range(wrangler.num_structures))
    assert not set(keep2) & set(dropped)
