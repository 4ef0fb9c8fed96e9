"""Parallel tempering (replica exchange) over the walker axis.

Walkers carry a temperature ladder in ``state["beta"]``; every
``exchange_period`` steps adjacent-temperature pairs attempt to exchange
temperatures with the standard criterion

    P(swap) = min(1, exp[(beta_i - beta_j)(H_i - H_j)])

which preserves detailed balance of the extended ensemble.  Pairings
alternate between (0,1),(2,3),... and (1,2),(3,4),... phases.  The exchange
is written as plain jnp ops over the (possibly mesh-sharded) walker axis, so
under a `jax.sharding.Mesh` the boundary exchanges lower to ICI ppermute
collectives automatically.

Exchanging temperatures (rather than configurations) moves O(1) scalars per
pair regardless of system size — the bandwidth-optimal choice on ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "tempering_exchange",
    "make_tempering_step",
    "make_tempering_chain",
    "make_temperature_ladder",
]


def make_temperature_ladder(
    t_min: float, t_max: float, nwalkers: int, geometric: bool = True
) -> np.ndarray:
    """A temperature ladder over walkers (geometric spacing by default)."""
    if geometric:
        return np.geomspace(t_min, t_max, nwalkers)
    return np.linspace(t_min, t_max, nwalkers)


def tempering_exchange(state: dict, key, phase) -> dict:
    """One replica-exchange sweep over adjacent walker pairs.

    Args:
        state: walker state with "beta" and "enthalpy" [W] entries.
        key: PRNG key.
        phase: 0 pairs (0,1),(2,3)...; 1 pairs (1,2),(3,4)... (wrapping pair
            disabled).

    Returns:
        state with exchanged betas.
    """
    beta = state["beta"]
    enthalpy = state["enthalpy"]
    w = beta.shape[0]
    idx = jnp.arange(w)
    # pair partners: i even(+phase) pairs with i+1
    is_left = (idx % 2) == (phase % 2)
    partner = jnp.where(is_left, idx + 1, idx - 1)
    valid = (partner >= 0) & (partner < w)

    beta_right = jnp.roll(beta, -1)
    beta_left = jnp.roll(beta, 1)
    h_right = jnp.roll(enthalpy, -1)
    beta_p = jnp.where(is_left, beta_right, beta_left)

    # acceptance decided at the left member, shared with the right
    delta_left = (beta - beta_right) * (enthalpy - h_right)
    u = jax.random.uniform(key, (w,), dtype=jnp.float64)
    accept_left = (delta_left >= 0) | (delta_left > jnp.log(u))
    # each pair uses the left member's decision
    accept = jnp.where(is_left, accept_left, jnp.roll(accept_left, 1))
    accept = accept & valid

    new_beta = jnp.where(accept, beta_p, beta)
    out = dict(state)
    out["beta"] = new_beta
    return out


def make_tempering_chain(chain_fn, n_segments: int):
    """Fused-chain parallel tempering: segments + exchanges.

    ``chain_fn(state, key) -> state`` runs one exchange period's worth of
    MC steps (e.g. the shared-proposal Pallas chain); a replica-exchange
    sweep runs between segments with alternating pairing phases.  The
    state's "pt_counter" counts SEGMENTS here (the step-wise wrapper
    counts steps).
    """

    def fn(state, key):
        def body(st, k):
            k_seg, k_ex = jax.random.split(k)
            st = chain_fn(st, k_seg)
            counter = st["pt_counter"] + 1
            exchanged = tempering_exchange(st, k_ex, counter % 2)
            st = dict(st)
            st["beta"] = exchanged["beta"]
            st["pt_counter"] = counter
            return st, None

        keys = jax.random.split(key, n_segments)
        state, _ = jax.lax.scan(body, state, keys)
        return state

    return fn


def make_tempering_step(step_fn, exchange_period: int = 10):
    """Wrap a kernel step with periodic replica-exchange sweeps.

    The state must carry an int32 scalar "pt_counter" entry (the Sampler
    adds it when replica exchange is enabled).
    """

    def step(state, key):
        k_step, k_ex = jax.random.split(key)
        state = step_fn(state, k_step)
        counter = state["pt_counter"] + 1
        do_exchange = (counter % exchange_period) == 0
        phase = (counter // exchange_period) % 2
        exchanged = tempering_exchange(state, k_ex, phase)
        out = {
            k: jnp.where(do_exchange, exchanged[k], state[k])
            if k == "beta"
            else state[k]
            for k in state
        }
        out["pt_counter"] = counter
        return out

    return step
