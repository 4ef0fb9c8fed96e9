"""CompositionSpace tests: SNF solutions, flip tables, grids, translations."""

import numpy as np
import pytest

from smol_tpu.cofe.space.domain import Vacancy
from smol_tpu.crystal.species import Species
from smol_tpu.moca.composition import CompositionSpace, flip_vec_to_reaction
from smol_tpu.serial import dumps_obj, loads_obj
from smol_tpu.utils.math import (
    compute_snf,
    get_natural_solutions,
    solve_diophantines,
    yield_hermite_normal_forms,
)


def test_hnf_count():
    # number of HNFs with determinant n is sigma-like; known values:
    # det 1 -> 1, det 2 -> 7, det 4 -> 35
    assert len(list(yield_hermite_normal_forms(1))) == 1
    assert len(list(yield_hermite_normal_forms(2))) == 7
    assert len(list(yield_hermite_normal_forms(4))) == 35
    for h in yield_hermite_normal_forms(6):
        assert round(np.linalg.det(h)) == 6


def test_snf_reconstruction(rng):
    for _ in range(20):
        a = rng.integers(-5, 6, (rng.integers(2, 5), rng.integers(2, 5)))
        s, m, t = compute_snf(a)
        assert np.array_equal(s @ a @ t, m)
        # m diagonal
        assert np.all(m[~np.eye(*m.shape, dtype=bool)] == 0)
        assert abs(abs(round(np.linalg.det(s))) - 1) < 1e-9
        assert abs(abs(round(np.linalg.det(t))) - 1) < 1e-9


def test_diophantine_solutions(rng):
    a = np.array([[1, 1, 1, 0, 0], [0, 0, 0, 1, 1], [2, -1, 0, 1, -1]])
    b = np.array([4, 2, 0])
    n0, vs = solve_diophantines(a, b)
    assert np.array_equal(a @ n0, b)
    for v in vs:
        assert np.array_equal(a @ v, np.zeros(3))
    # all integer combos remain solutions
    for _ in range(10):
        x = rng.integers(-3, 4, len(vs))
        assert np.array_equal(a @ (n0 + x @ vs), b)


@pytest.fixture(scope="module")
def licavbr_space():
    # two sublattices: (Li+, Ca2+, vac) and (Br-,) -- charge neutral
    bits = [
        [Species("Li", 1), Species("Ca", 2), Vacancy()],
        [Species("Br", -1)],
    ]
    return CompositionSpace(bits, [1, 1])


def test_composition_space_basics(licavbr_space):
    space = licavbr_space
    # charge neutrality + 2 sublattice constraints
    assert space._A.shape == (3, 4)
    n0 = space.get_supercell_base_solution(space.min_supercell_size)
    assert np.array_equal(
        space._A @ n0, np.round(space._b * space.min_supercell_size)
    )
    ft = space.flip_table
    for u in ft:
        assert np.array_equal(space._A @ u, np.zeros(3))
    reaction = flip_vec_to_reaction(ft[0], space.site_spaces)
    assert "->" in reaction


def test_composition_grid_brute_force(licavbr_space):
    """Grid enumeration matches brute-force enumeration of valid counts."""
    space = licavbr_space
    size = space.min_supercell_size
    grid = space.get_composition_grid(supercell_size=size)
    ns = grid @ space.basis + space.get_supercell_base_solution(size)
    found = {tuple(n) for n in ns}
    # brute force: n_li + n_ca + n_vac = size; n_br = size; charge 0
    expected = set()
    for n_li in range(size + 1):
        for n_ca in range(size + 1 - n_li):
            n_vac = size - n_li - n_ca
            n_br = size
            if n_li + 2 * n_ca - n_br == 0:
                expected.add((n_li, n_ca, n_vac, n_br))
    assert found == expected


def test_translate_formats(licavbr_space):
    space = licavbr_space
    size = space.min_supercell_size
    x = space.get_composition_grid(size)[0]
    n = space.translate_format(x, size, "coordinates", "counts", rounding=True)
    x_back = space.translate_format(n, size, "counts", "coordinates", rounding=True)
    assert np.array_equal(x, x_back)
    comps = space.translate_format(n, size, "counts", "compositions")
    n_back = space.translate_format(
        comps, size, "compositions", "counts", rounding=True
    )
    assert np.array_equal(n, n_back)
    sp_counts = space.translate_format(n, size, "counts", "species-counts")
    assert sp_counts.sum() == pytest.approx(n.sum())


def test_constraint_strings():
    bits = [
        [Species("Li", 1), Species("Mn", 3), Vacancy()],
        [Species("O", -2), Species("F", -1)],
    ]
    space = CompositionSpace(
        bits, [1, 1], other_constraints=["Li+ == 0.5", "F- <= 0.3"]
    )
    # eq constraint appended to A
    assert space._A.shape[0] == 4
    assert space._A_leq is not None
    # centroid composition satisfies all constraints
    size = space.min_supercell_size
    x = space.get_centroid_composition(size)
    n = space.basis.T @ x + space.get_supercell_base_solution(size)
    assert np.all(n >= 0)
    assert np.allclose(space._A @ n, np.round(space._b * size))


def test_space_serialization(licavbr_space):
    space2 = loads_obj(dumps_obj(licavbr_space))
    assert np.array_equal(space2._A, licavbr_space._A)
    assert np.array_equal(space2.flip_table, licavbr_space.flip_table)


def test_natural_solutions_bounded():
    n0 = np.array([2, 0, 1])
    vs = np.array([[1, -1, 0], [0, 1, -1]])
    sols = get_natural_solutions(n0, vs)
    for x in sols:
        assert np.all(n0 + x @ vs >= 0)
    # brute force count
    count = 0
    for x0 in range(-10, 10):
        for x1 in range(-10, 10):
            if np.all(n0 + np.array([x0, x1]) @ vs >= 0):
                count += 1
    assert len(sols) == count


def test_side_string_sign_and_number_rules():
    """Tokenizer matches the reference's sign/number semantics
    (reference constraints.py:13-52): consecutive signs multiply, and a
    species preceded by two numbers is malformed."""
    from smol_tpu.moca.composition.constraints import handle_side_string

    # consecutive signs before a coefficient multiply together
    packed, intercept = handle_side_string("- - 2 Li+")
    assert len(packed) == 1
    coef, sp, subl = packed[0]
    assert coef == 2 and str(sp) == "Li+" and subl is None
    # consecutive signs before a trailing intercept
    packed, intercept = handle_side_string("Li+ - + 1")
    assert intercept == -1
    assert packed[0][0] == 1
    # three signs
    packed, _ = handle_side_string("- + - 3 Mn3+(0)")
    assert packed[0][0] == 3 and packed[0][2] == 0
    packed, _ = handle_side_string("- 3 Mn3+")
    assert packed[0][0] == -3
    # two consecutive number literals before a species are rejected
    with pytest.raises(ValueError, match="preceded by"):
        handle_side_string("3 4 Li+")
