"""Site basis construction: flavors, iterators, orthonormalization.

Mirrors the reference's basis semantics (smol/cofe/space/basis.py): the
vectorized array path must agree exactly with the reference-compatible
BasisIterator path, and user-defined iterator subclasses must be
constructible by name through basis_factory.
"""

import numpy as np
import pytest

from smol_tpu.cofe.space.basis import (
    BASIS_FLAVORS,
    BasisIterator,
    ChebyshevIterator,
    DiscreteBasis,
    IndicatorBasis,
    IndicatorIterator,
    LegendreIterator,
    PolynomialIterator,
    SinusoidIterator,
    StandardBasis,
    available_site_basis_sets,
    basis_factory,
    cos_f,
    encode_domain,
    indicator,
    sin_f,
    sinusoid_factory,
)
from smol_tpu.cofe.space.domain import SiteSpace
from smol_tpu.crystal.species import Composition

ITERATORS = {
    "indicator": IndicatorIterator,
    "sinusoid": SinusoidIterator,
    "polynomial": PolynomialIterator,
    "chebyshev": ChebyshevIterator,
    "legendre": LegendreIterator,
}

SPECIES_POOL = ("Li+", "Mn2+", "Mn3+", "Ti4+", "Ni2+")


def _space(n):
    comp = Composition({sp: 1.0 / n for sp in SPECIES_POOL[:n]})
    return SiteSpace(comp)


@pytest.mark.parametrize("flavor", BASIS_FLAVORS)
@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_iterator_path_matches_array_path(flavor, n):
    space = _space(n)
    fast = StandardBasis(space, flavor)
    via_iter = StandardBasis(space, ITERATORS[flavor](tuple(space.keys())))
    assert via_iter.flavor == flavor
    np.testing.assert_allclose(
        via_iter.full_function_array, fast.full_function_array, atol=1e-14
    )


@pytest.mark.parametrize("n", [2, 3, 4])
def test_factory_equals_direct_construction(n):
    space = _space(n)
    for flavor in BASIS_FLAVORS:
        b = basis_factory(flavor, space)
        assert b == StandardBasis(space, flavor)


def test_custom_iterator_via_factory():
    class ParityIterator(BasisIterator):
        """+1/-1 alternating by species index (a custom user basis)."""

        flavor = "parity"

        def __init__(self, species):
            super().__init__(species)
            self._idx = {s: i for i, s in enumerate(species)}

        def __next__(self):
            sp0 = next(self.species_iter)
            shift = self._idx[sp0]

            def func(s, _shift=shift, _idx=self._idx):
                return float((-1) ** (_idx[s] + _shift))

            return func

    space = _space(3)
    b = basis_factory("parity", space)
    assert b.flavor == "parity"
    # row 0 constant, rows 1..n-1 from the first n-1 iterator functions
    arr = b.full_function_array
    np.testing.assert_allclose(arr[0], np.ones(3))
    np.testing.assert_allclose(arr[1], [1, -1, 1])
    np.testing.assert_allclose(arr[2], [-1, 1, -1])
    assert "parity" in available_site_basis_sets()


def test_iterator_species_mismatch_raises():
    space = _space(3)
    with pytest.raises(ValueError):
        StandardBasis(space, SinusoidIterator(("Li+", "Mn2+")))


def test_unknown_flavor_raises():
    with pytest.raises((ValueError, NotImplementedError)):
        basis_factory("nosuchbasis", _space(2))


@pytest.mark.parametrize("n", [2, 3, 4])
def test_orthonormalize(n):
    space = _space(n)
    b = StandardBasis(space, "sinusoid")
    b.orthonormalize()
    assert b.is_orthonormal
    assert b.orthonormalization_array is not None


def test_measure_array_and_vector():
    space = _space(4)
    b = StandardBasis(space, "indicator")
    np.testing.assert_allclose(b.measure_array, np.diag(b.measure_vector))
    assert b.measure_vector.sum() == pytest.approx(1.0)


def test_discrete_basis_polymorphic_from_dict():
    space = _space(3)
    std = StandardBasis(space, "chebyshev")
    ind = IndicatorBasis(space)
    for obj in (std, ind):
        loaded = DiscreteBasis.from_dict(obj.as_dict())
        assert type(loaded) is type(obj)
        assert loaded == obj


def test_module_function_definitions():
    # sinusoid_factory index parity (van de Walle): odd -> -cos, even -> -sin
    m = 4
    f1, f2 = sinusoid_factory(1, m), sinusoid_factory(2, m)
    assert f1(0) == pytest.approx(-1.0)  # -cos(0)
    assert f2(0) == pytest.approx(0.0)  # -sin(0)
    assert sin_f(1, a=1, m=4) == pytest.approx(-1.0)
    assert cos_f(2, a=1, m=4) == pytest.approx(1.0)
    assert indicator("A", "A") == 1.0 and indicator("A", "B") == 0.0
    enc = encode_domain({"A": 0, "B": 1})(lambda s: 2 * s)
    assert enc("B") == 2
