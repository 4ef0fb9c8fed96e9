"""MC kernel base classes.

Kernels implement specific MC algorithms over an Ensemble.  Mirrors the
reference structure (smol/moca/kernel/base.py) with a dual interface:

- host: ``single_step(occupancy) -> StepTrace`` (numpy, one walker) for API
  parity and fine-grained testing;
- device: ``make_step_fn()`` / ``initial_state(occupancies)`` composing the
  compiled batched step used by the Sampler (the whole MC loop runs as one
  ``lax.scan`` on device — the core TPU-native design inversion).
"""

from __future__ import annotations

import secrets
from abc import ABC, abstractmethod
from math import log

import numpy as np

from smol_tpu.constants import kB
from smol_tpu.moca.kernel.bias import MCBias, mcbias_factory
from smol_tpu.moca.kernel.mcusher import MCUsher, mcusher_factory
from smol_tpu.moca.metadata import Metadata
from smol_tpu.moca.trace import StepTrace, Trace
from smol_tpu.ops import mc as devmc
from smol_tpu.utils.class_utils import class_name_from_str, get_subclasses

__all__ = [
    "MCKernelInterface",
    "StandardSingleStepMixin",
    "MCKernel",
    "ThermalKernelMixin",
    "ALL_MCUSHERS",
    "ALL_BIAS",
]


def _sum_log_priori(fns, occu, sites, codes, valid):
    total = 0.0
    for f in fns:
        total = total + f(occu, sites, codes, valid)
    return total


def _features_no_mu(feat_fn, occu):
    return feat_fn(occu, None)


def _features_with_mu(feat_fn, mu, occu):
    import jax.numpy as jnp

    work = jnp.sum(mu[jnp.arange(occu.shape[0]), occu])
    return jnp.concatenate([feat_fn(occu, None), jnp.atleast_1d(work)])


def _all_mcushers():
    return list(get_subclasses(MCUsher).keys())


def _all_bias():
    return list(get_subclasses(MCBias).keys())


# evaluated lazily since subclasses may be defined later; staticmethod so
# class-attribute access does not bind them as methods
ALL_MCUSHERS = staticmethod(_all_mcushers)
ALL_BIAS = staticmethod(_all_bias)


class MCKernelInterface(ABC):
    """The contract every MC kernel satisfies.

    Mirrors the reference interface (smol/moca/kernel/base.py:20-80): a
    kernel exposes a ``trace`` of the last step, a reproducibility ``spec``,
    ``single_step``, ``compute_initial_trace``, and ``set_aux_state``.
    Implement this directly for kernels that do not follow the standard
    propose/accept decomposition (e.g. MulticellKernel).
    """

    @property
    def trace(self):
        """StepTrace of the last single_step."""
        return self._trace

    @property
    def spec(self):
        """Metadata specification for reproducibility."""
        return self._spec

    @abstractmethod
    def single_step(self, occupancy):
        """Run one MC step on one occupancy; return the step trace."""

    @abstractmethod
    def compute_initial_trace(self, occupancy):
        """Absolute-value trace of an occupancy (for sample containers)."""

    def set_aux_state(self, occupancy, *args, **kwargs):
        """Set auxiliary state from an initial or checkpoint occupancy."""


class StandardSingleStepMixin:
    """The standard propose -> trace -> accept -> apply -> post step.

    Factors the reference's single-step decomposition
    (smol/moca/kernel/base.py:145-166): subclasses supply ``_accept_step``;
    ``_do_post_step`` is a hook (Wang-Landau uses it for histogram updates).
    Requires the host attributes ``mcusher``, ``_trace``, ``_ensemble``,
    ``natural_params``, and optional ``_bias``.
    """

    def _compute_step_trace(self, occupancy, step):
        delta_trace = self._trace.delta_trace
        delta_trace.features = self._ensemble.compute_feature_vector_change(
            occupancy, step
        )
        delta_trace.enthalpy = np.array(
            np.dot(self.natural_params, delta_trace.features), dtype=np.float64
        )
        if self._bias is not None:
            delta_trace.bias = np.array(
                self._bias.compute_bias_change(occupancy, step), dtype=np.float64
            )

    @abstractmethod
    def _accept_step(self, occupancy, step) -> bool:
        """Accept/reject the step based on the current delta trace."""

    def _do_accept_step(self, occupancy, step):
        for site, code in step:
            occupancy[site] = code
        self.mcusher.update_aux_state(step)
        return occupancy

    def _do_post_step(self):
        return

    def single_step(self, occupancy):
        """One MC step on one occupancy (modified in place)."""
        step = self.mcusher.propose_step(occupancy)
        self._compute_step_trace(occupancy, step)
        if self._accept_step(occupancy, step):
            occupancy = self._do_accept_step(occupancy, step)
        self._trace.occupancy = occupancy
        self._do_post_step()
        return self._trace


class MCKernel(StandardSingleStepMixin, MCKernelInterface):
    """Abstract MC transition kernel."""

    valid_mcushers = None
    valid_bias = None
    track_features: bool = False  # maintain features by delta on device

    def __init__(
        self,
        ensemble,
        step_type,
        *args,
        seed=None,
        bias_type=None,
        bias_kwargs=None,
        **kwargs,
    ):
        self.natural_params = np.asarray(ensemble.natural_parameters)
        self._seed = seed if seed is not None else secrets.randbits(63)
        self._rng = np.random.default_rng(self._seed)
        self._ensemble = ensemble
        self._trace = StepTrace(accepted=np.array(True))
        self._usher, self._bias = None, None

        mcusher_name = class_name_from_str(step_type)
        self.mcusher = mcusher_factory(
            mcusher_name, ensemble.sublattices, *args, rng=self._rng, **kwargs
        )

        self._spec = Metadata(
            type(self).__name__, seed=self._seed, step=self.mcusher.spec
        )

        if bias_type is not None:
            bias_name = class_name_from_str(bias_type)
            bias_kwargs = bias_kwargs or {}
            self.bias = mcbias_factory(
                bias_name, ensemble.sublattices, rng=self._rng, **bias_kwargs
            )
            self._spec.bias = self.bias.spec

    # ---------------- properties ----------------

    @property
    def ensemble(self):
        return self._ensemble

    @property
    def trace(self):
        return self._trace

    @property
    def spec(self):
        return self._spec

    @property
    def seed(self):
        return self._seed

    @property
    def mcusher(self):
        return self._usher

    @mcusher.setter
    def mcusher(self, usher):
        valid = self.valid_mcushers() if callable(self.valid_mcushers) else self.valid_mcushers
        if valid is not None and type(usher).__name__ not in valid:
            raise ValueError(f"{type(usher)} is not a valid MCUsher for this kernel.")
        self._usher = usher

    @property
    def bias(self):
        return self._bias

    @bias.setter
    def bias(self, bias):
        valid = self.valid_bias() if callable(self.valid_bias) else self.valid_bias
        if valid is None or type(bias).__name__ not in (valid or []):
            raise ValueError(f"{type(bias)} is not a valid MCBias for this kernel.")
        if "bias" not in self._trace.delta_trace.names:
            self._trace.delta_trace.bias = np.zeros(1)
        self._bias = bias

    # ---------------- host single-walker path ----------------

    def set_aux_state(self, occupancy, *args, **kwargs):
        """Set auxiliary state from an initial or checkpoint occupancy."""
        self.mcusher.set_aux_state(occupancy, *args, **kwargs)

    def compute_initial_trace(self, occupancy) -> Trace:
        """Absolute-value trace of an occupancy (for sample containers)."""
        trace = Trace()
        trace.occupancy = occupancy
        trace.features = self._ensemble.compute_feature_vector(occupancy)
        trace.enthalpy = np.array(
            [np.dot(self.natural_params, trace.features)], dtype=np.float64
        )
        if self._bias is not None:
            trace.bias = np.array(
                [self._bias.compute_bias(occupancy)], dtype=np.float64
            )
        trace.accepted = np.array([True], dtype=bool)
        return trace

    # ---------------- device path ----------------

    def _device_applier(self):
        """Step applier with the ensemble's energy/feature functions."""
        processor = self._ensemble.processor
        mu_table = self._ensemble.chemical_potential_table
        if self.track_features:
            return devmc.make_step_applier(
                processor.delta_energy_fn,
                mu_table=mu_table,
                delta_features_fn=processor.delta_features_fn,
                num_features=len(self.natural_params),
            )
        return devmc.make_step_applier(processor.delta_energy_fn, mu_table=mu_table)

    def _device_log_priori(self):
        """Combined usher priori + bias change pure function (or None)."""
        from jax.tree_util import Partial

        usher_fn = self.mcusher.device_log_priori()
        bias_fn = None if self._bias is None else self._bias.device_delta_fn()
        fns = [f for f in (usher_fn, bias_fn) if f is not None]
        if not fns:
            return None
        if len(fns) == 1:
            return fns[0]
        return Partial(_sum_log_priori, tuple(fns))

    def full_features_fn(self):
        """Pure (occu) -> full feature vector incl. chemical work."""
        import jax.numpy as jnp
        from jax.tree_util import Partial

        processor = self._ensemble.processor
        feat_fn = processor.features_fn
        mu_table = self._ensemble.chemical_potential_table
        if mu_table is None:
            return Partial(_features_no_mu, feat_fn)
        return Partial(_features_with_mu, feat_fn, jnp.asarray(mu_table))

    @abstractmethod
    def make_step_fn(self):
        """Build the pure batched step function state -> state."""

    def restore_aux_state(self, state: dict, container) -> dict:
        """Restore kernel auxiliary state from a container's last sample.

        Called by ``Sampler.run`` when resuming from stored samples; the
        default kernel has no auxiliary state.  WangLandau restores its
        histogram/entropy/mod-factor record (closing the reference's open
        TODO at smol/moca/sampler/sampler.py:299-301).
        """
        return state

    def make_chain_fn(self, n_steps: int):
        """Optional fused multi-step chain function, or None.

        When a kernel supports a persistent-chain device kernel (whole
        windows of steps fused into one launch — see
        smol_tpu.ops.pallas_chain), this returns ``fn(state, key) ->
        state`` executing ``n_steps`` steps; the Sampler prefers it over
        scanning :meth:`make_step_fn`.
        """
        return None

    def _get_fast_tables(self):
        """Fast-path tables when this kernel/usher supports them, else None.

        Cached; kernels that support the zero-gather path override
        ``_build_fast_tables``.
        """
        if not hasattr(self, "_fast_tables_cache"):
            self._fast_tables_cache = self._build_fast_tables()
        return self._fast_tables_cache

    def _build_fast_tables(self):
        return None

    def _fast_code_bits(self):
        """Packing width of the fast-path occupancy words (1 or 4 bits)."""
        fast = self._get_fast_tables()
        tables = fast[0] if isinstance(fast, tuple) else fast
        return 1 if getattr(tables, "binary", False) else 4

    def state_occupancy(self, state):
        """[W, N] int32 occupancies of a device state."""
        if "words" in state:
            from smol_tpu.ops.fastmc import unpack_occupancy

            return unpack_occupancy(
                state["words"], self._ensemble.num_sites,
                self._fast_code_bits(),
            )
        return state["occupancy"]

    def initial_state(self, occupancies) -> dict:
        """Batched walker state from [W, N] int32 occupancies."""
        import jax
        import jax.numpy as jnp

        occupancies = np.atleast_2d(np.asarray(occupancies, dtype=np.int32))
        nsites = self._ensemble.num_sites
        if occupancies.shape[1] != nsites:
            raise ValueError(
                f"occupancies have {occupancies.shape[1]} sites per walker "
                f"but the ensemble supercell has {nsites}"
            )
        nwalkers = occupancies.shape[0]
        feats = np.asarray(
            devmc.batched_features(
                self.full_features_fn(), jnp.asarray(occupancies)
            )
        )
        enthalpy = feats @ self.natural_params
        state = {
            "enthalpy": jnp.asarray(enthalpy),
            "accepted": jnp.ones(nwalkers, dtype=bool),
            "naccept": jnp.zeros(nwalkers, dtype=jnp.int32),
        }
        if self._get_fast_tables() is not None:
            from smol_tpu.ops.fastmc import pack_occupancy

            state["words"] = pack_occupancy(
                jnp.asarray(occupancies), self._ensemble.num_sites,
                self._fast_code_bits(),
            )
        else:
            state["occupancy"] = jnp.asarray(occupancies)
        if self.track_features:
            state["features"] = jnp.asarray(feats)
        return state


class ThermalKernelMixin:
    """Mixin adding a temperature / beta to a kernel."""

    _kB: float = kB

    def __init__(self, temperature, *args, **kwargs):
        self.beta = 1.0 / (self.kB * np.asarray(temperature, dtype=np.float64))
        super().__init__(*args, **kwargs)
        self.temperature = temperature

    @property
    def kB(self):
        return self._kB

    @kB.setter
    def kB(self, value):
        self._kB = value
        self.beta = 1.0 / (self._kB * self.temperature)

    @property
    def temperature(self):
        """Temperature (scalar, or per-walker array for tempering ladders)."""
        t = np.asarray(self.trace.temperature)
        return float(t) if t.ndim == 0 else t

    @temperature.setter
    def temperature(self, temperature):
        self.trace.temperature = np.array(temperature, dtype=np.float64)
        self.beta = 1.0 / (self.kB * np.asarray(temperature, dtype=np.float64))

    def compute_initial_trace(self, occupancy):
        trace = super().compute_initial_trace(occupancy)
        trace.temperature = np.array([self.trace.temperature], dtype=np.float64)
        return trace

    def initial_state(self, occupancies) -> dict:
        import jax.numpy as jnp

        state = super().initial_state(occupancies)
        nwalkers = state["enthalpy"].shape[0]
        state["beta"] = jnp.broadcast_to(
            jnp.asarray(self.beta, dtype=jnp.float64), (nwalkers,)
        )
        return state


class MetropolisAcceptMixin:
    """Host Metropolis-Hastings acceptance criterion."""

    def _accept_step(self, occupancy, step):
        log_factor = self.mcusher.compute_log_priori_factor(occupancy, step)
        exponent = -self.beta * self.trace.delta_trace.enthalpy + log_factor
        if self.bias is not None:
            exponent += self.trace.delta_trace.bias
        self.trace.accepted = np.array(
            True if exponent >= 0 else exponent > log(self._rng.random())
        )
        return self.trace.accepted
