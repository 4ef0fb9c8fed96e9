"""Metropolis and UniformlyRandom kernels."""

from __future__ import annotations

from smol_tpu.moca.kernel.base import (
    ALL_BIAS,
    ALL_MCUSHERS,
    MCKernel,
    MetropolisAcceptMixin,
    ThermalKernelMixin,
)
from smol_tpu.ops import mc as devmc

__all__ = ["Metropolis", "UniformlyRandom"]


class Metropolis(MetropolisAcceptMixin, ThermalKernelMixin, MCKernel):
    """The classic Metropolis-Hastings kernel."""

    valid_mcushers = ALL_MCUSHERS
    valid_bias = ALL_BIAS

    def __init__(
        self,
        ensemble,
        step_type,
        temperature,
        *args,
        seed=None,
        bias_type=None,
        bias_kwargs=None,
        **kwargs,
    ):
        super().__init__(
            temperature,
            ensemble,
            step_type,
            *args,
            seed=seed,
            bias_type=bias_type,
            bias_kwargs=bias_kwargs,
            **kwargs,
        )

    def make_step_fn(self):
        propose_fn, _ = self.mcusher.device_proposal()
        return devmc.make_metropolis_step(
            propose_fn, self._device_applier(), self._device_log_priori()
        )


class UniformlyRandom(MCKernel):
    """Infinite-temperature kernel: every proposed step is accepted."""

    valid_mcushers = ALL_MCUSHERS
    valid_bias = ALL_BIAS

    def _accept_step(self, occupancy, step):
        import numpy as np
        from math import log

        log_factor = self.mcusher.compute_log_priori_factor(occupancy, step)
        exponent = log_factor
        if self.bias is not None:
            exponent += self.trace.delta_trace.bias
        self.trace.accepted = np.array(
            True if exponent >= 0 else exponent > log(self._rng.random())
        )
        return self.trace.accepted

    def make_step_fn(self):
        propose_fn, _ = self.mcusher.device_proposal()
        log_priori = self._device_log_priori()
        if log_priori is None:
            return devmc.make_uniform_step(propose_fn, self._device_applier())
        # with a bias/priori factor an accept test is still required at beta=0

        def zero_beta_step(state, key):
            import jax.numpy as jnp

            st = dict(state)
            st["beta"] = jnp.zeros_like(state["enthalpy"])
            st = devmc.make_metropolis_step(
                propose_fn, self._device_applier(), log_priori
            )(st, key)
            st.pop("beta", None)
            return st

        return zero_beta_step

    def initial_state(self, occupancies) -> dict:
        return super().initial_state(occupancies)
