"""MC bias terms.

Mirrors the reference biases (smol/moca/kernel/bias.py): a bias adds
``delta_bias`` to the Metropolis exponent.  Each bias exposes the host
compute_bias / compute_bias_change API plus a pure device delta function
``(occu, sites, codes, valid) -> f64`` composed into the compiled step.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from math import log

import numpy as np

from jax.tree_util import Partial

from smol_tpu.cofe.space.domain import get_species
from smol_tpu.moca.metadata import Metadata
from smol_tpu.utils.class_utils import (
    class_name_from_str,
    derived_class_factory,
    get_subclasses_str,
)

def _generic_bias_delta(bias_fn, occu, sites, codes, valid):
    import jax.numpy as jnp

    safe = jnp.where(valid, codes, occu[sites])
    occu_next = occu.at[sites].set(safe)
    return bias_fn(occu_next) - bias_fn(occu)


def _fugacity_bias(log_table, occu):
    import jax.numpy as jnp

    return jnp.sum(log_table[jnp.arange(occu.shape[0]), occu])


def _fugacity_delta(log_table, occu, sites, codes, valid):
    import jax.numpy as jnp

    # apply sequentially so repeated sites use the last flip only
    safe = jnp.where(valid, codes, occu[sites])
    occu_next = occu.at[sites].set(safe)
    old = log_table[sites, occu[sites]]
    new = log_table[sites, occu_next[sites]]
    return jnp.sum(jnp.where(valid, new - old, 0.0))


def _square_charge_bias(table, penalty, occu):
    import jax.numpy as jnp

    c = jnp.sum(table[jnp.arange(occu.shape[0]), occu])
    return -penalty * c**2


def _hyperplane_bias(table, A, b, penalty, occu):
    import jax.numpy as jnp

    d = A.shape[1]
    dims = table[jnp.arange(occu.shape[0]), occu]
    counts = jnp.zeros(d + 1).at[jnp.where(dims >= 0, dims, d)].add(1.0)[:-1]
    return -penalty * jnp.sum((A @ counts - b) ** 2)


__all__ = [
    "MCBias",
    "FugacityBias",
    "SquareChargeBias",
    "SquareHyperplaneBias",
    "mcbias_factory",
    "available_bias_types",
]


def get_oxi_state(sp) -> float:
    """Oxidation state of a species (0 for vacancies/elements without one)."""
    return float(sp.oxi_state or 0.0)


class MCBias(ABC):
    """Abstract bias term."""

    def __init__(self, sublattices, rng=None, **kwargs):
        self.sublattices = sublattices
        self.active_sublattices = [s for s in sublattices if s.is_active]
        self._rng = np.random.default_rng(rng)
        self.spec = Metadata(type(self).__name__)

    @abstractmethod
    def compute_bias(self, occupancy) -> float:
        """Absolute bias value of an occupancy."""

    def compute_bias_change(self, occupancy, step) -> float:
        occu_next = np.asarray(occupancy).copy()
        for site, code in step:
            occu_next[site] = code
        return self.compute_bias(occu_next) - self.compute_bias(occupancy)

    @abstractmethod
    def device_bias_fn(self):
        """Pure (occu) -> bias value f64."""

    def device_delta_fn(self):
        """Pure (occu, sites, codes, valid) -> bias change f64."""
        return Partial(_generic_bias_delta, self.device_bias_fn())


class FugacityBias(MCBias):
    """Per-site log-fugacity-fraction bias (reference bias.py:96-233)."""

    def __init__(self, sublattices, fugacity_fractions=None, rng=None, **kwargs):
        super().__init__(sublattices, rng=rng, **kwargs)
        self._fus = None
        self._fu_table = None
        self._species = [
            set(s.site_space.keys()) for s in self.active_sublattices
        ]
        if fugacity_fractions is not None:
            fugacity_fractions = [
                {get_species(k): v for k, v in sub.items()}
                for sub in fugacity_fractions
            ]
        else:
            fugacity_fractions = [
                dict(s.site_space) for s in self.active_sublattices
            ]
        self.fugacity_fractions = fugacity_fractions
        self.spec.fugacity_fractions = [
            {str(k): v for k, v in sub.items()} for sub in self._fus
        ]

    @property
    def fugacity_fractions(self):
        return self._fus

    @fugacity_fractions.setter
    def fugacity_fractions(self, value):
        value = [{get_species(k): v for k, v in sub.items()} for sub in value]
        if not all(abs(sum(f.values()) - 1) < 1e-12 for f in value):
            raise ValueError("Fugacity fractions must add to one.")
        for spec, vals in zip(self._species, value):
            if spec != set(vals.keys()):
                raise ValueError(
                    f"Fugacity fractions missing species; need all of {self._species}."
                )
        self._fus = value
        self._fu_table = self._build_fu_table(value)

    def _build_fu_table(self, fugacity_fractions) -> np.ndarray:
        num_cols = max(max(s.encoding) for s in self.sublattices) + 1
        num_rows = sum(len(s.sites) for s in self.sublattices)
        table = np.ones((num_rows, num_cols))
        for fus, sublatt in zip(fugacity_fractions, self.active_sublattices):
            ordered = np.array([fus[sp] for sp in sublatt.site_space])
            table[sublatt.sites[:, None], sublatt.encoding] = ordered[None, :]
        return table

    def compute_bias(self, occupancy) -> float:
        return float(
            np.log(self._fu_table[np.arange(len(occupancy)), occupancy]).sum()
        )

    def compute_bias_change(self, occupancy, step) -> float:
        steps = {site: code for site, code in step}
        return sum(
            log(self._fu_table[site, code] / self._fu_table[site, occupancy[site]])
            for site, code in steps.items()
        )

    def device_bias_fn(self):
        import jax.numpy as jnp

        return Partial(_fugacity_bias, jnp.asarray(np.log(self._fu_table)))

    def device_delta_fn(self):
        """Table-lookup delta (cheaper than two full evaluations)."""
        import jax.numpy as jnp

        return Partial(_fugacity_delta, jnp.asarray(np.log(self._fu_table)))


class SquareChargeBias(MCBias):
    """-penalty * (net charge)^2 bias (reference bias.py:236)."""

    def __init__(self, sublattices, penalty=0.5, rng=None, **kwargs):
        super().__init__(sublattices, rng=rng, **kwargs)
        if penalty <= 0:
            raise ValueError("Penalty factor should be > 0!")
        self.penalty = penalty
        num_cols = max(max(s.encoding) for s in self.sublattices) + 1
        num_rows = sum(len(s.sites) for s in self.sublattices)
        table = np.zeros((num_rows, num_cols))
        for sublatt in self.sublattices:
            cs = np.array([get_oxi_state(sp) for sp in sublatt.species])
            table[sublatt.sites[:, None], sublatt.encoding] = cs[None, :]
        self._c_table = table
        self.spec.penalty = penalty

    def compute_bias(self, occupancy) -> float:
        c = np.sum(self._c_table[np.arange(len(occupancy)), occupancy])
        return float(-self.penalty * c**2)

    def device_bias_fn(self):
        import jax.numpy as jnp

        return Partial(
            _square_charge_bias,
            jnp.asarray(self._c_table),
            jnp.float64(self.penalty),
        )


class SquareHyperplaneBias(MCBias):
    """-penalty * ||A n - b||^2 composition-constraint bias (bias.py:290)."""

    def __init__(
        self,
        sublattices,
        hyperplane_normals,
        hyperplane_intercepts,
        penalty=0.5,
        rng=None,
        **kwargs,
    ):
        super().__init__(sublattices, rng=rng, **kwargs)
        if penalty <= 0:
            raise ValueError("Penalty factor should be > 0!")
        self.penalty = penalty
        self._A = np.array(hyperplane_normals, dtype=np.float64)
        self._b = np.array(hyperplane_intercepts, dtype=np.float64)
        from smol_tpu.moca.occu_utils import get_dim_ids_table

        self._dim_ids_table = get_dim_ids_table(self.sublattices)
        self.d = sum(len(s.species) for s in sublattices)
        self.spec.penalty = penalty
        self.spec.hyperplane_normals = self._A.tolist()
        self.spec.hyperplane_intercepts = self._b.tolist()

    def _counts(self, occupancy) -> np.ndarray:
        from smol_tpu.moca.occu_utils import occu_to_counts

        return occu_to_counts(occupancy, self.d, self._dim_ids_table)

    def compute_bias(self, occupancy) -> float:
        n = self._counts(occupancy)
        return float(-self.penalty * np.sum((self._A @ n - self._b) ** 2))

    def device_bias_fn(self):
        import jax.numpy as jnp

        return Partial(
            _hyperplane_bias,
            jnp.asarray(self._dim_ids_table),
            jnp.asarray(self._A),
            jnp.asarray(self._b),
            jnp.float64(self.penalty),
        )


def mcbias_factory(bias_type, sublattices, *args, **kwargs):
    """Instantiate an MCBias by class name string."""
    return derived_class_factory(
        class_name_from_str(bias_type), MCBias, sublattices, *args, **kwargs
    )


def available_bias_types() -> tuple:
    return get_subclasses_str(MCBias)
