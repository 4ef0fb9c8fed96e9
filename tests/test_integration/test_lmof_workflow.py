"""End-to-end workflow on the reference's real LMOF DFT dataset.

tests/data/lmof_prim.json and lmof_entries.json are copied verbatim from
the reference's shipped example data (reference
docs/src/notebooks/data/lmof_{prim,entries}.json): a disordered
Li-Mn-O-F rock-salt prim and 26 relaxed DFT structures (the system of the
reference's OpenMP perf notebook, cutoffs {2: 5, 3: 4}).  This drives the
full host pipeline — structure matching of genuinely relaxed cells with
vacancies, wrangling, fitting — and the device MC path on the result.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from smol_tpu.cofe import ClusterExpansion, ClusterSubspace, StructureWrangler
from smol_tpu.crystal.entries import ComputedStructureEntry
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.serial import process_decoded

DATA = Path(__file__).resolve().parent.parent / "data"


@pytest.fixture(scope="module")
def lmof_wrangler():
    prim = process_decoded(json.loads((DATA / "lmof_prim.json").read_text()))
    subspace = ClusterSubspace.from_cutoffs(prim, {2: 5.0, 3: 4.0})
    wrangler = StructureWrangler(subspace)
    import warnings

    for ed in json.loads((DATA / "lmof_entries.json").read_text()):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            wrangler.add_entry(ComputedStructureEntry.from_dict(ed), verbose=False)
    return wrangler


def test_relaxed_entries_match(lmof_wrangler):
    """23 of the 26 relaxed DFT structures map onto the prim.

    The reference's own parallel-wrangling notebook matches only 17/26 on
    this dataset (reference docs/src/notebooks/
    adding-structures-in-parallel.ipynb, output "Matched 17/26
    structures", with ltol=0.15/stol=0.2/angle_tol=15 and species-count
    supercell sizing).  The 3 rejected here are genuinely unmappable:
    their best achievable normalized site displacement is ~0.85-0.95
    against every candidate supercell basis (stol = 0.3), and entry 10's
    near-cubic relaxed cell has no det-48 parent within lattice tolerance
    at all.
    """
    wrangler = lmof_wrangler
    assert wrangler.num_structures >= 23
    matrix = wrangler.feature_matrix
    assert matrix.shape == (
        wrangler.num_structures,
        wrangler.cluster_subspace.num_corr_functions,
    )
    # empty-cluster column is exactly 1; no NaNs anywhere
    np.testing.assert_allclose(matrix[:, 0], 1.0)
    assert np.all(np.isfinite(matrix))
    # supercell sizes recovered from the matcher are consistent with the
    # structure atom counts (vacancies make len(structure) <= 4 * size)
    for entry in wrangler.entries:
        size = entry.data["size"]
        scm = np.asarray(entry.data["supercell_matrix"])
        assert round(abs(np.linalg.det(scm))) == size
        assert len(entry.structure) <= 4 * size


def test_fit_predict_and_mc(lmof_wrangler):
    """A least-squares CE on the real data reproduces training energies
    in-sample and drives a drift-free MC run."""
    wrangler = lmof_wrangler
    matrix = wrangler.feature_matrix
    energies = wrangler.get_property_vector("energy")
    coefs, *_ = np.linalg.lstsq(matrix, energies, rcond=None)
    expansion = ClusterExpansion(wrangler.cluster_subspace, coefs)
    # underdetermined lstsq interpolates up to duplicated correlation rows
    # with different energies (this dataset has them; the reference's
    # notebook warns about exactly that) — residuals stay small
    pred = matrix @ coefs
    rmse = float(np.sqrt(np.mean((pred - energies) ** 2)))
    assert rmse < 0.01  # eV/prim
    # predict() re-derives the feature row through the full matcher +
    # evaluator path and must agree with the wrangled matrix row exactly
    entry = wrangler.entries[0]
    per_prim = expansion.predict(entry.structure, normalized=True)
    assert per_prim == pytest.approx(pred[0], abs=1e-8)

    ensemble = Ensemble.from_cluster_expansion(expansion, np.diag([2, 2, 2]))
    occu = np.zeros((1, ensemble.num_sites), dtype=np.int32)
    forward_drift, reverse_drift = ensemble.processor.compute_average_drift(
        iterations=200
    )
    assert abs(forward_drift) < 1e-10 and abs(reverse_drift) < 1e-10
    sampler = Sampler.from_ensemble(ensemble, temperature=2000.0, nwalkers=1)
    sampler.run(200, occu, thin_by=20)
    en = sampler.samples.get_energies(flat=False)
    occ_last = sampler.samples.get_occupancies(flat=False)[-1][0]
    recomputed = ensemble.processor.compute_property(
        np.asarray(occ_last, dtype=np.int32)
    )
    assert en[-1, 0] == pytest.approx(recomputed, rel=1e-10)
