"""MC step proposers (ushers).

Host classes mirroring the reference ushers (smol/moca/kernel/mcusher.py)
with two faces: a numpy ``propose_step`` for host-side use/tests, and a
``device_proposal()`` returning the pure JAX proposal function + step width
used inside the compiled MC loop (smol_tpu.ops.mc).

TableFlip (charge-neutral semigrand composition moves) lives in
smol_tpu.moca.kernel.tableflip.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from smol_tpu.moca.metadata import Metadata
from smol_tpu.ops import mc as devmc
from smol_tpu.utils.class_utils import (
    class_name_from_str,
    derived_class_factory,
    get_subclasses_str,
)

__all__ = [
    "MCUsher",
    "Flip",
    "Swap",
    "MultiStep",
    "Composite",
    "mcusher_factory",
    "available_step_types",
]


class MCUsher(ABC):
    """Abstract MC step proposer."""

    def __init__(self, sublattices, sublattice_probabilities=None, rng=None):
        self.sublattices = sublattices
        self.active_sublattices = [s for s in sublattices if s.is_active]
        if sublattice_probabilities is None:
            self._sublatt_probs = np.full(
                len(self.active_sublattices), 1.0 / len(self.active_sublattices)
            )
        else:
            if len(sublattice_probabilities) != len(self.active_sublattices):
                raise AttributeError(
                    "Sublattice probabilities must match number of active "
                    "sublattices."
                )
            if abs(sum(sublattice_probabilities) - 1) > 1e-12:
                raise ValueError("Sublattice probabilities must sum to one.")
            self._sublatt_probs = np.asarray(sublattice_probabilities)
        self._rng = np.random.default_rng(rng)
        self.spec = Metadata(
            type(self).__name__,
            sublattices=[[str(sp) for sp in s.species] for s in self.sublattices],
            sublattice_probabilities=self._sublatt_probs.tolist(),
        )
        self._tables = None

    @property
    def sublattice_probabilities(self):
        return self._sublatt_probs

    @sublattice_probabilities.setter
    def sublattice_probabilities(self, value):
        if len(value) != len(self.active_sublattices):
            raise AttributeError(
                "Sublattice probabilities must match number of active sublattices."
            )
        if abs(sum(value) - 1) > 1e-12:
            raise ValueError("Sublattice probabilities must sum to one.")
        self._sublatt_probs = np.asarray(value)
        self._tables = None

    @property
    def tables(self) -> devmc.SublatticeTables:
        if self._tables is None:
            self._tables = devmc.sublattice_tables(
                self.sublattices, self._sublatt_probs
            )
        return self._tables

    @abstractmethod
    def propose_step(self, occupancy) -> list:
        """Host proposal: list of (site, code) flips."""

    @abstractmethod
    def device_proposal(self):
        """Return (pure proposal fn, step width)."""

    def compute_log_priori_factor(self, occupancy, step) -> float:
        """Log a-priori factor for detailed balance (0 for symmetric moves)."""
        return 0.0

    def device_log_priori(self):
        """Pure (occu, sites, codes, valid) -> log factor, or None."""
        return None

    def update_aux_state(self, step, *args, **kwargs):
        return

    def set_aux_state(self, occupancy, *args, **kwargs):
        return

    def get_random_sublattice(self):
        return self._rng.choice(self.active_sublattices, p=self._sublatt_probs)


class Flip(MCUsher):
    """Single-site flip to a different allowed species."""

    def propose_step(self, occupancy):
        sublattice = self.get_random_sublattice()
        site = self._rng.choice(sublattice.active_sites)
        choices = sorted(set(sublattice.encoding.tolist()) - {int(occupancy[site])})
        return [(int(site), int(self._rng.choice(choices)))]

    def device_proposal(self):
        return devmc.make_flip_proposal(self.tables), 1


class Swap(MCUsher):
    """Canonical swap of two differently-occupied sites in one sublattice."""

    def propose_step(self, occupancy):
        sublattice = self.get_random_sublattice()
        site1 = self._rng.choice(sublattice.active_sites)
        species1 = occupancy[site1]
        sublattice_occu = occupancy[sublattice.active_sites]
        options = sublattice.active_sites[sublattice_occu != species1]
        if options.size > 0:
            site2 = self._rng.choice(options)
            return [(int(site1), int(occupancy[site2])), (int(site2), int(species1))]
        return []

    def device_proposal(self):
        return devmc.make_swap_proposal(self.tables), 2


class MultiStep(MCUsher):
    """Several chained sub-steps of a base usher."""

    def __init__(
        self,
        sublattices,
        mcusher,
        step_lengths,
        step_probabilities=None,
        rng=None,
    ):
        super().__init__(sublattices, rng=rng)
        if isinstance(step_lengths, int):
            self._step_lens = np.array([step_lengths], dtype=int)
        else:
            self._step_lens = np.array(step_lengths, dtype=int)
        if step_probabilities is not None:
            if abs(sum(step_probabilities) - 1) > 1e-12:
                raise ValueError("step_probabilities must sum to 1.")
            if len(step_probabilities) != len(self._step_lens):
                raise ValueError("step_lengths and step_probabilities mismatch.")
            self._step_p = np.array(step_probabilities)
        else:
            self._step_p = np.full(len(self._step_lens), 1 / len(self._step_lens))
        if isinstance(mcusher, str):
            mcusher = mcusher_factory(mcusher, self.sublattices, rng=rng)
        self._mcusher = mcusher
        self.spec.step = self._mcusher.spec
        self.spec.step_lengths = self._step_lens.tolist()
        self.spec.step_probabilities = self._step_p.tolist()

    @property
    def sublattice_probabilities(self):
        return self._mcusher.sublattice_probabilities

    @sublattice_probabilities.setter
    def sublattice_probabilities(self, value):
        self._mcusher.sublattice_probabilities = value

    def propose_step(self, occupancy):
        step_length = self._rng.choice(self._step_lens, p=self._step_p)
        occu = np.asarray(occupancy).copy()
        steps = [self._mcusher.propose_step(occu)]
        for site, code in steps[-1]:
            occu[site] = code
        for _ in range(step_length - 1):
            step = self._mcusher.propose_step(occu)
            if all(
                s not in (s0 for st in steps for s0, _ in st) for s, _ in step
            ):
                steps.append(step)
                for site, code in step:
                    occu[site] = code
        return [flip for step in steps for flip in step]

    def device_proposal(self):
        base_fn, base_width = self._mcusher.device_proposal()
        fn = devmc.make_multistep_proposal(
            base_fn, base_width, self._step_lens, self._step_p
        )
        return fn, int(self._step_lens.max()) * base_width


class Composite(MCUsher):
    """A mixture of several usher types chosen with given weights."""

    def __init__(self, sublattices, mcushers, mcusher_weights=None, rng=None):
        super().__init__(sublattices, rng=rng)
        self._mcushers = []
        self._weights = []
        self.spec.steps = []
        if mcusher_weights is None:
            mcusher_weights = len(mcushers) * [1]
        for weight, usher in zip(mcusher_weights, mcushers):
            if isinstance(usher, str):
                usher = mcusher_factory(usher, self.sublattices, rng=rng)
            self.add_mcusher(usher, weight)

    @property
    def mcushers(self):
        return self._mcushers

    @property
    def weight(self):
        """Weights associated with each mcusher (reference mcusher.py:368)."""
        return self._weights

    @property
    def probabilities(self):
        total = sum(self._weights)
        return [w / total for w in self._weights]

    def add_mcusher(self, mcusher, weight=1):
        self._mcushers.append(mcusher)
        self._weights.append(weight)
        self.spec.steps.append(mcusher.spec)
        self.spec.weights = list(self._weights)

    def propose_step(self, occupancy):
        usher = self._rng.choice(self._mcushers, p=self.probabilities)
        return usher.propose_step(occupancy)

    def device_proposal(self):
        fns, widths = zip(*(u.device_proposal() for u in self._mcushers))
        fn = devmc.make_composite_proposal(
            list(fns), list(widths), self.probabilities
        )
        return fn, max(widths)


def mcusher_factory(usher_type, sublattices, *args, **kwargs):
    """Instantiate an MCUsher by class name string."""
    return derived_class_factory(
        class_name_from_str(usher_type), MCUsher, sublattices, *args, **kwargs
    )


def available_step_types() -> tuple:
    return get_subclasses_str(MCUsher)
