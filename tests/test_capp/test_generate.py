"""capp tests: supercell enumeration, random occupancies, SQS generation."""

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim
from smol_tpu.capp import (
    StochasticSQSGenerator,
    enumerate_supercell_matrices,
    generate_random_ordered_occupancy,
)
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.crystal import Lattice, Structure, get_symmetry_operations
from smol_tpu.crystal.species import Composition
from smol_tpu.moca.processor.distance import CorrelationDistanceProcessor


def test_enumerate_supercell_matrices():
    prim = fcc_binary_prim()
    symops = get_symmetry_operations(prim)
    # known counts of distinct supercells of an FCC lattice:
    # size 2 -> 2, size 4 -> 7 (Hart & Forcade PRB 77, 224115 Table IV fcc)
    scms2 = enumerate_supercell_matrices(2, symops)
    scms4 = enumerate_supercell_matrices(4, symops)
    assert len(scms2) == 2
    assert len(scms4) == 7
    for scm in scms2:
        assert round(abs(np.linalg.det(scm))) == 2


@pytest.fixture(scope="module")
def processor():
    prim = fcc_binary_prim()
    cs = ClusterSubspace.from_cutoffs(prim, {2: 4.0}, basis="indicator",
                                      orthonormal=True, use_concentration=True)
    scm = np.diag([2, 2, 2])
    return CorrelationDistanceProcessor(cs, scm)


def test_random_occupancy_unconstrained(processor, rng):
    occu = generate_random_ordered_occupancy(processor, rng=rng)
    assert occu.shape == (8,)
    assert occu.dtype == np.int32
    assert set(np.unique(occu)) <= {0, 1}


def test_random_occupancy_composition(processor, rng):
    comp = [Composition({"Au": 0.5, "Cu": 0.5})]
    occu = generate_random_ordered_occupancy(
        processor, composition=comp, rng=rng
    )
    assert (occu == 0).sum() == 4
    assert (occu == 1).sum() == 4


def test_random_occupancy_charge_neutral(rng):
    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat,
        [{"Li+": 0.5, "Mn3+": 0.5}, {"O2-": 0.5, "F-": 0.5}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    cs = ClusterSubspace.from_cutoffs(prim, {2: 3.1})
    from smol_tpu.moca.processor.expansion import ClusterExpansionProcessor

    proc = ClusterExpansionProcessor(
        cs, np.diag([2, 2, 2]), np.ones(cs.num_corr_functions)
    )
    occu = generate_random_ordered_occupancy(proc, charge_neutral=True, rng=rng)
    charge = sum(
        (proc.allowed_species[i][occu[i]].oxi_state or 0)
        for i in range(len(occu))
    )
    assert charge == 0


def test_stochastic_sqs_generator():
    prim = fcc_binary_prim()
    generator = StochasticSQSGenerator.from_structure(
        prim, {2: 4.0, 3: 2.8}, supercell_size=8
    )
    assert len(generator.processors) > 1
    generator.generate(
        mcmc_steps=300,
        temperatures=np.linspace(4.0, 0.05, 6),
        nwalkers=8,
        seed=7,
    )
    assert generator.num_structures > 0
    best = generator.get_best_sqs(num_structures=3)
    assert len(best) >= 1
    # scores are ranked and match recomputation
    scores = [sqs.score for sqs in best]
    assert scores == sorted(scores)
    recomputed = generator.compute_score(
        best[0].structure, best[0].supercell_matrix
    )
    assert recomputed == pytest.approx(best[0].score, abs=1e-8)
    # the best structure has the right composition (4 Au, 4 Cu per 8 sites)
    comp = best[0].structure.composition
    from smol_tpu.crystal.species import Element

    assert comp[Element("Au")] == pytest.approx(4.0)
    assert comp[Element("Cu")] == pytest.approx(4.0)
    # an SQS anneal should find a configuration with decent pair matching
    assert best[0].score < 1.0


def test_sqs_from_processors():
    """SQSGenerator.from_processors round-trips generator config
    (reference sqs.py:238)."""
    import numpy as np

    from smol_tpu.benchmarks.systems import fcc_binary_prim
    from smol_tpu.capp import StochasticSQSGenerator

    gen = StochasticSQSGenerator.from_structure(
        fcc_binary_prim(), cutoffs={2: 4.2}, supercell_size=4
    )
    gen2 = StochasticSQSGenerator.from_processors(gen.processors)
    assert len(gen2.processors) == len(gen.processors)
    assert gen2.feature_type == gen.feature_type
    assert gen2.supercell_size == gen.supercell_size
    p0, q0 = gen.processors[0], gen2.processors[0]
    np.testing.assert_allclose(p0.target_vector, q0.target_vector)
    np.testing.assert_allclose(p0.coefs, q0.coefs)


def test_distance_tables_only_for_correlation_flavor():
    """The SQS chain kernel's tables index by correlation-function id;
    the cluster-interaction flavor (orbit-id index space) must fall back
    to the XLA path rather than anneal a wrong objective."""
    from smol_tpu.moca.processor.distance import (
        ClusterInteractionDistanceProcessor,
        CorrelationDistanceProcessor,
    )
    from smol_tpu.ops import pallas_sqs

    cs = ClusterSubspace.from_cutoffs(
        fcc_binary_prim(), {2: 4.0}, basis="indicator",
        orthonormal=True, use_concentration=True,
    )
    scm = np.diag([2, 2, 1])
    corr_proc = CorrelationDistanceProcessor(cs, scm)
    inter_proc = ClusterInteractionDistanceProcessor(cs, scm)
    assert (
        pallas_sqs.build_distance_tables(
            inter_proc, inter_proc.get_sublattices()
        )
        is None
    )
    # positive control: the correlation flavor builds tables
    tables = pallas_sqs.build_distance_tables(
        corr_proc, corr_proc.get_sublattices()
    )
    assert tables is not None
