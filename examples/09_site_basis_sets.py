"""Choosing, orthonormalizing, and extending site basis sets.

Shows the five built-in basis flavors, measure-weighted orthonormalization,
how the basis changes correlation vectors but never predicted energies of a
refit, and how to register a custom basis through the BasisIterator
extension point (reference notebook: choosing-site-basis-sets.ipynb).

Run: python examples/09_site_basis_sets.py
"""

import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.benchmarks.systems import fcc_ternary_prim
from smol_tpu.cofe import ClusterSubspace, available_site_basis_sets
from smol_tpu.cofe.space.basis import (
    BasisIterator,
    StandardBasis,
    basis_factory,
)
from smol_tpu.cofe.space.domain import get_site_spaces

prim = fcc_ternary_prim()  # FCC Au/Ag/Cu
space = get_site_spaces(prim)[0]

# 1. the built-in flavors and their orthogonality over the site measure
print(f"available flavors: {available_site_basis_sets()}")
for flavor in ("indicator", "sinusoid", "polynomial", "chebyshev", "legendre"):
    basis = basis_factory(flavor, space)
    print(
        f"  {flavor:<11} orthogonal={basis.is_orthogonal!s:<5} "
        f"orthonormal={basis.is_orthonormal}"
    )

# 2. orthonormalization is a change of basis, recorded in the R array
basis = StandardBasis(space, "chebyshev")
basis.orthonormalize()
assert basis.is_orthonormal
print("chebyshev orthonormalized; R array:")
print(np.round(basis.orthonormalization_array, 4))

# 3. the basis choice changes correlations, not the physics: corr vectors of
# the same structure differ between flavors, but both span the same space
cutoffs = {2: _bootstrap.scale(4.2, 3.0)}
cs_sin = ClusterSubspace.from_cutoffs(prim, cutoffs, basis="sinusoid")
cs_che = ClusterSubspace.from_cutoffs(
    prim, cutoffs, basis="chebyshev", orthonormal=True
)
scm = np.diag([2, 1, 1])
occu = np.array([0, 1], dtype=np.int32)
corr_sin = cs_sin.corr_from_occupancy(occu, scm)
corr_che = cs_che.corr_from_occupancy(occu, scm)
print(f"sinusoid corr:  {np.round(corr_sin, 4)}")
print(f"chebyshev corr: {np.round(corr_che, 4)}")
assert not np.allclose(corr_sin, corr_che)
assert len(corr_sin) == len(corr_che)


# 4. custom basis: subclass BasisIterator; basis_factory finds it by flavor
class WalshIterator(BasisIterator):
    """A +-1 'Walsh-like' basis from binary digits of the species index."""

    flavor = "walsh"

    def __init__(self, species):
        super().__init__(species)
        self._idx = {s: i for i, s in enumerate(species)}
        self._k = 0

    def __next__(self):
        next(self.species_iter)
        self._k += 1
        k = self._k

        def func(s, _k=k, _idx=self._idx):
            return float((-1) ** bin(_idx[s] & _k).count("1"))

        return func


walsh = basis_factory("walsh", space)
print(f"custom flavor registered: {'walsh' in available_site_basis_sets()}")
cs_walsh = ClusterSubspace.from_cutoffs(
    prim, cutoffs, basis="walsh", orthonormal=True
)
corr_walsh = cs_walsh.corr_from_occupancy(occu, scm)
print(f"walsh corr:     {np.round(corr_walsh, 4)}")
print("OK")
