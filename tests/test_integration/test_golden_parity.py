"""Golden parity against reference-generated correlation vectors.

The files in tests/data/ were distilled (scripts/make_golden_lno.py) from
the reference repository's saved LNO workflows, which were produced by
running the ACTUAL reference implementation (smol + pymatgen + its Cython
evaluator, smol/utils/cluster/evaluator.pyx:121-318).  Asserting this
repo's correlations against them at 1e-10 kills the shared-misunderstanding
risk that parity-vs-own-numpy-oracle (ops/ref.py) cannot: a convention bug
in bit-combo ordering, basis signs, supercell site ordering, or Ewald
normalization would show up here even if every internal consistency test
passed.

Two observable conventions were fixed by these tests (see git history):
the orthonormalization sign convention (Gram-Schmidt direction,
basis.py) and the supercell lattice-translation enumeration order
(crystal/coord.py).

Orbit TIE ORDER: orbits that tie exactly in the reference's sort key
(rounded diameter, multiplicity, function count;
smol/cofe/space/clusterspace.py:1557-1566) keep their discovery order,
which depends on pymatgen's neighbor enumeration and is not reproducible
from semantics alone.  The comparison therefore allows one column
permutation WITHIN exactly-tied orbit groups, required to be consistent
across all 27 entries.
"""

import json
from itertools import permutations
from pathlib import Path

import numpy as np
import pytest

from smol_tpu.cofe import ClusterSubspace
from smol_tpu.cofe.extern import EwaldTerm
from smol_tpu.crystal.pmg_compat import decode_pmg, load_pmg_json

DATA = Path(__file__).resolve().parent.parent / "data"


def _load_golden(name):
    return json.loads((DATA / name).read_text())


@pytest.fixture(scope="module")
def lno_prim():
    return load_pmg_json(str(DATA / "lno_prim.json"))


def _build_subspace(lno_prim, ewald):
    cs = ClusterSubspace.from_cutoffs(
        lno_prim, {2: 5, 3: 4.1}, basis="sinusoid"
    )
    if ewald:
        cs.add_external_term(EwaldTerm(eta=None))
    return cs


def _tied_groups(cs):
    """Groups of orbit-function columns with identical reference sort keys."""
    keys = {}
    for orb in cs.orbits:
        key = (
            orb.num_sites,
            round(orb.base_cluster.diameter, 6),
            orb.multiplicity,
            len(orb.bit_combos),
        )
        cols = list(range(orb.bit_id, orb.bit_id + len(orb.bit_combos)))
        keys.setdefault(key, []).append(cols)
    return [grp for grp in keys.values() if len(grp) > 1]


def _entry_corrs(cs, golden):
    mine, stored = [], []
    for e in golden["entries"]:
        struct = decode_pmg(e["structure"])
        corr = cs.corr_from_structure(
            struct,
            scmatrix=np.asarray(e["supercell_matrix"]),
            site_mapping=[int(x) for x in e["site_mapping"]],
        )
        mine.append(np.asarray(corr))
        stored.append(np.asarray(e["correlations"], dtype=np.float64))
    return np.array(mine), np.array(stored)


def _match_with_tied_permutation(mine, stored, groups):
    """Error after the best SINGLE tied-group column permutation.

    Returns (err, perm_used) where perm maps stored columns to mine; the
    same permutation must work for every entry (rows of the matrices).
    """
    n = mine.shape[1]
    perm = np.arange(n)
    for grp in groups:
        # grp: list of column-blocks (one per tied orbit); try permuting
        # whole blocks (orbit order freedom, not intra-orbit freedom)
        sizes = {len(cols) for cols in grp}
        assert len(sizes) == 1, "tied orbits must have equal function count"
        best = None
        for p in permutations(range(len(grp))):
            cand = perm.copy()
            for dst_block, src_i in zip(grp, p):
                src_block = grp[src_i]
                for d, s in zip(dst_block, src_block):
                    cand[d] = s
            err = np.max(np.abs(mine[:, cand[np.concatenate(grp)]]
                                - stored[:, np.concatenate(grp)]))
            if best is None or err < best[0]:
                best = (err, cand)
        perm = best[1]
    return np.max(np.abs(mine[:, perm] - stored)), perm


def test_orbit_summary_matches_reference(lno_prim):
    """Orbit inventory equals the reference's printed summary.

    Golden source: creating-a-ce.ipynb stored output (ID/Degree/Diameter/
    Multiplicity/No. Functions table for the same construction).
    """
    cs = _build_subspace(lno_prim, ewald=False)
    assert cs.num_orbits == 11
    assert cs.num_corr_functions == 11
    summary = [
        (orb.num_sites, round(orb.base_cluster.diameter, 4), orb.multiplicity)
        for orb in cs.orbits
    ]
    expected = [
        (1, 0.0, 1),
        (1, 0.0, 1),
        (2, 2.9698, 6),
        (2, 2.9698, 3),
        (2, 2.9698, 3),
        (2, 4.2, 6),
        (3, 2.9698, 6),
        (3, 2.9698, 6),
        (3, 2.9698, 2),
        (3, 2.9698, 2),
    ]
    assert summary == expected


@pytest.mark.parametrize("name,ewald", [
    ("golden_lno_ce.json", False),
    ("golden_lno_ce_ewald.json", True),
])
def test_golden_correlations(lno_prim, name, ewald):
    """Correlations match the reference evaluator's stored outputs at 1e-10."""
    golden = _load_golden(name)
    cs = _build_subspace(lno_prim, ewald)
    mine, stored = _entry_corrs(cs, golden)
    assert mine.shape == stored.shape
    groups = _tied_groups(cs)
    err, perm = _match_with_tied_permutation(
        mine[:, : cs.num_corr_functions],
        stored[:, : cs.num_corr_functions],
        groups,
    )
    assert err < 1e-10, err
    if ewald:
        # Ewald feature column: reference pymatgen EwaldSummation parity
        rel = np.abs(mine[:, -1] - stored[:, -1]) / np.maximum(
            1.0, np.abs(stored[:, -1])
        )
        assert rel.max() < 1e-10, rel.max()


def test_golden_energy_predictions(lno_prim):
    """Predicted energies with the reference's fitted ECIs match at 1e-8.

    Uses the reference's full-precision coefficients and compares this
    repo's correlation vectors against the reference feature matrix
    through the energy prediction (permutation-insensitive: tied orbits
    share coefficients only by accident, so predictions are compared
    after the consistent tied-group permutation).
    """
    golden = _load_golden("golden_lno_ce_ewald.json")
    cs = _build_subspace(lno_prim, ewald=True)
    coefs = np.asarray(golden["coefs"])
    mine, stored = _entry_corrs(cs, golden)
    groups = _tied_groups(cs)
    _, perm = _match_with_tied_permutation(
        mine[:, : cs.num_corr_functions],
        stored[:, : cs.num_corr_functions],
        groups,
    )
    full_perm = np.concatenate([perm, [mine.shape[1] - 1]])
    pred_mine = mine[:, full_perm] @ coefs
    pred_ref = stored @ coefs
    rel = np.abs(pred_mine - pred_ref) / np.maximum(1.0, np.abs(pred_ref))
    assert rel.max() < 1e-8, rel.max()

    # end-to-end fit-quality statistics reproduce the reference notebook
    # (creating-a-ce-w-electrostatics.ipynb stored outputs)
    energies = np.array(
        [e["energy"] / e["size"] for e in golden["entries"]]
    )
    rmse = float(np.sqrt(np.mean((energies - pred_mine) ** 2)))
    maxer = float(np.max(np.abs(energies - pred_mine)))
    assert abs(1e3 * rmse - 7.366465328125201) < 1e-6, rmse
    assert abs(1e3 * maxer - 16.051863315254877) < 1e-6, maxer


def test_golden_feature_matrix_rows_match_entry_correlations():
    """The stored wrangler feature matrix rows == stored per-entry corrs.

    Consistency check of the golden payload itself (guards against a
    distillation error in scripts/make_golden_lno.py).
    """
    for name in ("golden_lno_ce.json", "golden_lno_ce_ewald.json"):
        golden = _load_golden(name)
        fm = np.asarray(golden["feature_matrix"])
        corrs = np.array([e["correlations"] for e in golden["entries"]])
        assert np.allclose(fm, corrs, atol=1e-12)


def test_golden_mc_energy_trace(lno_prim):
    """MC trace enthalpies reproduce reference-fitted energies at 1e-8.

    Ties the golden payload into the whole MC stack (BASELINE.md north
    star: "energy traces matching smol CPU to 1e-8 rel"): the ensemble
    energy of a golden entry's occupancy must equal size x (reference
    correlation vector @ reference coefficients), and every enthalpy the
    sampler records while walking away from it must equal the exact
    recomputed energy of the recorded occupancy.
    """
    from smol_tpu.moca import Ensemble, Sampler

    golden = _load_golden("golden_lno_ce_ewald.json")
    cs = _build_subspace(lno_prim, ewald=True)
    coefs_ref = np.asarray(golden["coefs"])

    # reference coefficients in this repo's column order (see
    # test_golden_energy_predictions for the tied-group permutation)
    mine, stored = _entry_corrs(cs, golden)
    groups = _tied_groups(cs)
    _, perm = _match_with_tied_permutation(
        mine[:, : cs.num_corr_functions],
        stored[:, : cs.num_corr_functions],
        groups,
    )
    full_perm = np.concatenate([perm, [mine.shape[1] - 1]])
    coefs_mine = np.empty_like(coefs_ref)
    coefs_mine[full_perm] = coefs_ref

    from smol_tpu.cofe import ClusterExpansion

    expansion = ClusterExpansion(cs, coefs_mine)

    # one golden entry (all LNO entries are size-6 supercells)
    e = golden["entries"][0]
    scm = np.asarray(e["supercell_matrix"])
    struct = decode_pmg(e["structure"])
    ensemble = Ensemble.from_cluster_expansion(expansion, scm)
    occu = np.asarray(
        cs.occupancy_from_structure(
            struct,
            scmatrix=scm,
            site_mapping=[int(x) for x in e["site_mapping"]],
            encode=True,
        ),
        dtype=np.int32,
    )

    energy = float(
        ensemble.compute_feature_vector(occu) @ ensemble.natural_parameters
    )
    pred_ref = float(
        np.asarray(e["correlations"], dtype=np.float64) @ coefs_ref
    ) * e["size"]
    assert abs(energy - pred_ref) / max(1.0, abs(pred_ref)) < 1e-8

    # short canonical MC from the golden occupancy: every recorded
    # enthalpy equals the exact energy of the recorded occupancy
    W = 4
    occus = np.tile(occu, (W, 1))
    sampler = Sampler.from_ensemble(
        ensemble, temperature=2000.0, nwalkers=W, seed=21
    )
    sampler.run(60, occus, thin_by=10)
    occ_t = sampler.samples.get_occupancies(flat=False)
    enth_t = sampler.samples.get_enthalpies(flat=False)
    assert enth_t.shape[0] >= 2
    for s in range(enth_t.shape[0]):
        for w in range(W):
            exact = float(
                ensemble.compute_feature_vector(
                    occ_t[s, w].astype(np.int32)
                )
                @ ensemble.natural_parameters
            )
            rel = abs(exact - float(enth_t[s, w])) / max(1.0, abs(exact))
            assert rel < 1e-8, (s, w, rel)
