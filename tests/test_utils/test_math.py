"""Integer/lattice math utilities (reference tests/test_utils/test_math_utils.py).

Property-based invariants: HNF enumeration completeness, SNF factorization
identities, Diophantine solution validity, rationalization, flip-basis
optimization/ergodicity/connectivity, mask semantics, partition sampling.
"""

from itertools import product

import numpy as np
import pytest

from smol_tpu.utils.math import (
    choose_section_from_partition,
    compute_snf,
    connectivity,
    count_row_matches,
    flip_size,
    flip_weights_mask,
    gcdex,
    get_ergodic_vectors,
    get_natural_solutions,
    get_nonneg_float_vertices,
    get_optimal_basis,
    integerize_multiple,
    integerize_vector,
    is_connected,
    rationalize_number,
    solve_diophantines,
    yield_hermite_normal_forms,
)


def n_hnfs(determinant):
    """Number of 3x3 HNFs of a determinant: sigma-like classic formula check
    by direct construction."""
    return sum(1 for _ in yield_hermite_normal_forms(determinant))


@pytest.mark.parametrize("det,expected", [(1, 1), (2, 7), (3, 13), (4, 35), (6, 91)])
def test_hnf_counts(det, expected):
    """Known HNF counts for 3x3 (OEIS A001001)."""
    assert n_hnfs(det) == expected


@pytest.mark.parametrize("det", [2, 3, 4])
def test_hnf_shape_and_determinant(det):
    seen = set()
    for h in yield_hermite_normal_forms(det):
        assert round(np.linalg.det(h)) == det
        # lower triangular with positive diagonal, subdiagonal bounded
        assert h[0, 1] == h[0, 2] == h[1, 2] == 0
        assert h[0, 0] > 0 and h[1, 1] > 0 and h[2, 2] > 0
        assert 0 <= h[1, 0] < h[1, 1]
        assert 0 <= h[2, 0] < h[2, 2] and 0 <= h[2, 1] < h[2, 2]
        seen.add(tuple(h.ravel()))
    assert len(seen) == n_hnfs(det)  # all distinct


@pytest.mark.parametrize("a,b", [(12, 18), (35, 64), (0, 5), (7, 0), (1, 1)])
def test_gcdex(a, b):
    x, y, g = gcdex(a, b)
    assert a * x + b * y == g
    assert g == np.gcd(a, b)


def test_rationalize_and_integerize():
    p, q = rationalize_number(0.75)
    assert (p, q) == (3, 4)
    with pytest.raises(ValueError):
        rationalize_number(np.pi, max_denominator=10, dtol=1e-12)
    vec, mul = integerize_vector([0.5, 1.0 / 3, 0.25])
    np.testing.assert_array_equal(vec, [6, 4, 3])
    assert mul == 12
    mat, mul = integerize_multiple([[0.5, 1.5], [1.0, 2.0]])
    np.testing.assert_array_equal(mat, [[1, 3], [2, 4]])
    assert mul == 2


def _int_det(mat):
    """Exact integer determinant (Bareiss fraction-free elimination).

    Transform matrices from compute_snf can carry entries far beyond
    float precision, so np.linalg.det is useless for the unimodularity
    check.
    """
    m = [[int(x) for x in row] for row in np.asarray(mat)]
    n = len(m)
    sign, prev = 1, 1
    for k in range(n - 1):
        if m[k][k] == 0:
            for i in range(k + 1, n):
                if m[i][k]:
                    m[k], m[i] = m[i], m[k]
                    sign = -sign
                    break
            else:
                return 0
        for i in range(k + 1, n):
            for j in range(k + 1, n):
                m[i][j] = (m[i][j] * m[k][k] - m[i][k] * m[k][j]) // prev
        prev = m[k][k]
    return sign * m[n - 1][n - 1]


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize(
    "shape,lim", [((3, 4), 4), ((4, 3), 4), ((5, 5), 30), ((2, 6), 12)]
)
def test_snf_identities(seed, shape, lim, rng):
    a = rng.integers(-lim, lim + 1, size=shape)
    s, m, t = compute_snf(a)
    # factorization: m = s @ a @ t, with unimodular s, t (exact ints)
    sa = np.asarray(a, dtype=object)
    np.testing.assert_array_equal(
        np.asarray(m, dtype=object),
        np.asarray(s, dtype=object) @ sa @ np.asarray(t, dtype=object),
    )
    assert abs(_int_det(s)) == 1
    assert abs(_int_det(t)) == 1
    # diagonal with divisibility chain
    off = m.copy()
    np.fill_diagonal(off, 0)
    assert np.all(off == 0)
    diag = np.abs(np.diag(m))
    nz = diag[diag > 0]
    for i in range(len(nz) - 1):
        assert nz[i + 1] % nz[i] == 0
    # zero diagonal entries trail the nonzero ones (solve_diophantines
    # relies on this ordering to split the kernel basis)
    if len(nz):
        assert np.all(diag[: len(nz)] > 0)


def test_solve_diophantines_charge_neutral():
    # two species of charge +1/-1 on 4 sites: n1 - n2 = 0, n1 + n2 = 4
    a = np.array([[1, -1], [1, 1]])
    b = np.array([0, 4])
    n0, vs = solve_diophantines(a, b)
    np.testing.assert_array_equal(a @ n0, b)
    # the kernel basis spans integer solutions of the homogeneous system
    for v in vs:
        np.testing.assert_array_equal(a @ v, 0)
    # infeasible RHS raises
    with pytest.raises(ValueError):
        solve_diophantines(np.array([[2, 2]]), np.array([3]))


def test_solution_enumeration_matches_brute_force():
    # ternary charge balance on 6 sites: +2, +1, -1 charges
    a = np.array([[2, 1, -1], [1, 1, 1]])
    b = np.array([0, 6])
    n0, vs = solve_diophantines(a, b)
    xs = get_natural_solutions(n0, vs)  # lattice coordinates
    compositions = xs @ vs + n0
    expected = {
        tup
        for tup in product(range(7), repeat=3)
        if sum(tup) == 6 and 2 * tup[0] + tup[1] - tup[2] == 0
    }
    assert {tuple(map(int, s)) for s in compositions} == expected
    # polytope vertices satisfy the equalities and nonnegativity
    verts = get_nonneg_float_vertices(a, b)
    assert len(verts) >= 1
    for v in verts:
        np.testing.assert_allclose(a @ v, b, atol=1e-9)
        assert np.all(np.asarray(v) >= -1e-9)


def test_flip_size_and_connectivity():
    assert flip_size([2, -1, -1]) == 2
    with pytest.raises(ValueError):
        flip_size([1, 1, -1])
    ns = np.array([[0, 0], [1, 0], [2, 0], [0, 1]])
    assert count_row_matches(ns, ns) == 4
    assert connectivity([1, 0], ns) == 2  # (0,0)->(1,0), (1,0)->(2,0)
    assert is_connected([0, 0], np.array([[1, 0]]), ns)
    assert not is_connected([0, 1], np.array([[1, 0]]), ns)


def test_optimal_basis_minimizes_flip_sizes():
    # grid of a 1D family: basis vector (2, -2) should reduce to (1, -1)-like
    a = np.array([[1, 1]])
    b = np.array([6])
    n0, vs = solve_diophantines(a, b)
    sols = get_natural_solutions(n0, vs)
    xs = np.array([(s - n0) @ np.linalg.pinv(vs).round().astype(int) for s in sols])
    # inflate the basis to a doubled vector
    vs_bad = 2 * vs
    xs_bad = np.array([x // 2 for x in xs])
    opt = get_optimal_basis(n0, vs_bad, xs_bad)
    sizes = [flip_size(u) for u in opt]
    assert max(sizes) <= max(flip_size(u) for u in vs_bad)


def test_ergodic_vectors_connect_all_points():
    # an intentionally too-coarse basis leaves grid points unreachable
    ns_basis = np.array([[2, -2]])
    n0 = np.array([3, 3])
    xs = np.array([[-1], [0], [1]])  # reachable by the coarse basis
    ns = xs @ ns_basis + n0
    # add the full grid of sum == 6 points as the xs-grid: (k, 6-k)
    full_xs = np.array([[k] for k in range(-3, 4)])
    out = get_ergodic_vectors(n0, ns_basis, full_xs)
    ns_all = full_xs @ ns_basis + n0
    for p in ns_all:
        assert is_connected(p, out, ns_all)
    assert out.shape[0] >= ns_basis.shape[0]


def test_flip_weights_mask():
    flips = np.array([[1, -1], [2, -2]])
    # counts (0, 4): -flip directions would drive n negative
    mask = flip_weights_mask(flips, [0, 4])
    # directions order: +u1, -u1, +u2, -u2
    np.testing.assert_array_equal(mask, [True, False, True, False])
    # with max_n, forward directions can also be blocked
    mask = flip_weights_mask(flips, [3, 1], max_n=4)
    np.testing.assert_array_equal(mask, [True, True, False, True])


def test_choose_section_from_partition(rng):
    counts = np.zeros(3, dtype=int)
    for _ in range(3000):
        counts[choose_section_from_partition([0.2, 0.3, 0.5], rng)] += 1
    np.testing.assert_allclose(counts / 3000, [0.2, 0.3, 0.5], atol=0.05)
    # all-zero weights fall back to uniform; negatives are rejected
    idx = choose_section_from_partition([0.0, 0.0], rng)
    assert idx in (0, 1)
    with pytest.raises(ValueError):
        choose_section_from_partition([-0.5, 1.0], rng)
