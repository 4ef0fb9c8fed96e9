"""Wang-Landau kernel: multicanonical density-of-states estimation.

Mirrors the reference (smol/moca/kernel/wanglandau.py): entropy/histogram
over enthalpy bins, acceptance on entropy differences, per-bin cumulative
mean features, flatness-triggered modification-factor reduction.  On device
every walker carries an independent window state (vmapped), so a replica
ensemble explores the DOS in parallel.
"""

from __future__ import annotations

import numpy as np

from smol_tpu.moca.kernel.base import ALL_MCUSHERS, MCKernel
from smol_tpu.ops import mc as devmc

__all__ = ["WangLandau"]


class WangLandau(MCKernel):
    """Wang-Landau sampling kernel."""

    valid_mcushers = ALL_MCUSHERS
    valid_bias = None
    track_features = True

    def __init__(
        self,
        ensemble,
        step_type,
        min_enthalpy,
        max_enthalpy,
        bin_size,
        *args,
        flatness=0.8,
        mod_factor=1.0,
        check_period=1000,
        update_period=1,
        mod_update=None,
        seed=None,
        shared_proposals=True,
        chain_block_size=1024,
        proposal_mode="random",
        **kwargs,
    ):
        if proposal_mode not in ("random", "sweep"):
            raise ValueError(f"unknown proposal mode: {proposal_mode!r}")
        self.shared_proposals = bool(shared_proposals)
        self.chain_block_size = int(chain_block_size)
        self.proposal_mode = str(proposal_mode)
        if min_enthalpy > max_enthalpy:
            raise ValueError("min_enthalpy cannot be larger than max_enthalpy.")
        if (max_enthalpy - min_enthalpy) / bin_size <= 1:
            raise ValueError("Window and bin size give a single bin!")
        if mod_factor <= 0:
            raise ValueError("mod_factor must be greater than 0.")

        self.flatness = flatness
        self.check_period = check_period
        self.update_period = update_period
        self._m = mod_factor
        self._window = (min_enthalpy, max_enthalpy, bin_size)
        self._mod_divisor = float(mod_update) if mod_update is not None else 2.0
        self._levels = np.arange(min_enthalpy, max_enthalpy, bin_size)

        # host single-walker aux state
        self._current_enthalpy = np.inf
        self._current_features = None
        self._entropy = np.zeros(len(self._levels))
        self._histogram = np.zeros(len(self._levels), dtype=int)
        self._occurrences = np.zeros(len(self._levels), dtype=int)
        self._mean_features = None
        self._steps_counter = 0

        super().__init__(ensemble, step_type, *args, seed=seed, **kwargs)
        self._current_features = np.zeros(len(self.natural_params))
        self._mean_features = np.zeros(
            (len(self._levels), len(self.natural_params))
        )

        self.spec.min_enthalpy = min_enthalpy
        self.spec.max_enthalpy = max_enthalpy
        self.spec.bin_size = bin_size
        self.spec.flatness = flatness
        self.spec.check_period = check_period
        self.spec.update_period = update_period

    # ---------------- host properties ----------------

    @property
    def bin_size(self):
        return self._window[2]

    @property
    def levels(self):
        return self._levels[self._entropy > 0]

    @property
    def entropy(self):
        return self._entropy[self._entropy > 0]

    @property
    def dos(self):
        return np.exp(self.entropy - self.entropy.min())

    @property
    def histogram(self):
        return self._histogram[self._entropy > 0]

    @property
    def mod_factor(self):
        return self._m

    def _get_bin_id(self, e):
        if e == np.inf:
            return np.inf
        return int((e - self._window[0]) // self._window[2])

    # ---------------- host single-walker path ----------------

    def _accept_step(self, occupancy, step):
        from math import log

        bin_id = self._get_bin_id(self._current_enthalpy)
        new_enthalpy = self._current_enthalpy + float(
            self.trace.delta_trace.enthalpy
        )
        if new_enthalpy < self._window[0] or new_enthalpy >= self._window[1]:
            self.trace.accepted = np.array(False)
        else:
            new_bin = self._get_bin_id(new_enthalpy)
            log_factor = self.mcusher.compute_log_priori_factor(occupancy, step)
            exponent = self._entropy[bin_id] - self._entropy[new_bin] + log_factor
            self.trace.accepted = np.array(
                True if exponent >= 0 else exponent > log(self._rng.random())
            )
        return self.trace.accepted

    def _do_accept_step(self, occupancy, step):
        occupancy = super()._do_accept_step(occupancy, step)
        self._current_features = self._current_features + np.asarray(
            self.trace.delta_trace.features
        )
        self._current_enthalpy += float(self.trace.delta_trace.enthalpy)
        return occupancy

    def _do_post_step(self):
        bin_id = self._get_bin_id(self._current_enthalpy)
        if 0 <= bin_id < len(self._levels):
            self._steps_counter += 1
            total = self._occurrences[bin_id]
            self._mean_features[bin_id] = (
                self._current_features + total * self._mean_features[bin_id]
            ) / (total + 1)
            if self._steps_counter % self.update_period == 0:
                self._entropy[bin_id] += self._m
                self._histogram[bin_id] += 1
                self._occurrences[bin_id] += 1
        self.trace.histogram = self._histogram
        self.trace.occurrences = self._occurrences
        self.trace.entropy = self._entropy
        self.trace.cumulative_mean_features = self._mean_features
        self.trace.mod_factor = np.array([self._m])
        if self._steps_counter and self._steps_counter % self.check_period == 0:
            histogram = self._histogram[self._entropy > 0]
            if len(histogram) >= 2 and (
                histogram > self.flatness * histogram.mean()
            ).all():
                self._histogram[:] = 0
                self._m /= self._mod_divisor

    def compute_initial_trace(self, occupancy):
        trace = super().compute_initial_trace(occupancy)
        trace.histogram = self._histogram
        trace.occurrences = self._occurrences
        trace.entropy = self._entropy
        trace.cumulative_mean_features = self._mean_features
        trace.mod_factor = np.array([self._m])
        return trace

    def set_aux_state(self, occupancy, *args, **kwargs):
        features = np.array(self._ensemble.compute_feature_vector(occupancy))
        self._current_features = features
        self._current_enthalpy = float(np.dot(features, self.natural_params))
        self.mcusher.set_aux_state(occupancy)

    # ---------------- device path ----------------

    def make_step_fn(self):
        propose_fn, _ = self.mcusher.device_proposal()
        return devmc.make_wang_landau_step(
            propose_fn,
            self._device_applier(),
            min_enthalpy=self._window[0],
            bin_size=self._window[2],
            num_levels=len(self._levels),
            flatness=self.flatness,
            check_period=self.check_period,
            update_period=self.update_period,
            mod_divisor=self._mod_divisor,
        )

    def _get_chain_tables(self):
        if not hasattr(self, "_chain_tables_cache"):
            self._chain_tables_cache = self._build_chain_tables()
        return self._chain_tables_cache

    def _build_chain_tables(self):
        """Shared-proposal chain tables for Flip/Swap Wang-Landau.

        Same applicability constraints as the Metropolis chain path (see
        smol_tpu.ops.pallas_chain); histogram/entropy bookkeeping runs
        inside the kernel (pallas_chain.WLChain).
        """
        from smol_tpu.moca.kernel.mcusher import Flip, Swap
        from smol_tpu.ops import pallas_chain

        if not self.shared_proposals and self.proposal_mode != "sweep":
            return None  # sweep schedules are walker-independent anyway
        if self._bias is not None:
            return None
        if type(self.mcusher) not in (Flip, Swap):
            return None
        if self.mcusher.device_log_priori() is not None:
            return None
        move = "flip" if type(self.mcusher) is Flip else "swap"
        tables = pallas_chain.build_chain_tables(
            self._ensemble.processor,
            self._ensemble.sublattices,
            mu_table=(
                self._ensemble.chemical_potential_table
                if move == "flip" else None
            ),
            sublattice_probabilities=self.mcusher.sublattice_probabilities,
        )
        if tables is None:
            return None
        return tables, move

    def make_chain_fn(self, n_steps: int):
        """Persistent-chain Wang-Landau: whole thinning windows on device.

        The in-kernel bookkeeping covers entropy/histogram/occurrences/
        mod-factor exactly (pallas_chain.WLChain); per-bin cumulative mean
        features — the one [bins, features]-sized record — update once per
        thinning window here from EXACT boundary features (the same
        estimator on the thinned subchain; the reference updates per step,
        smol/moca/kernel/wanglandau.py:233-238).  Boundary recomputation
        also resets the chain's double-float enthalpy to exact f64.
        """
        import jax
        import jax.numpy as jnp

        from smol_tpu.ops import pallas_chain

        if not pallas_chain.runtime_supported():
            return None
        built = self._get_chain_tables()
        if built is None:
            return None
        tables, move = built
        if self.proposal_mode == "sweep" and move != "flip":
            return None  # deterministic sweeps are defined for flips only
        wl = pallas_chain.WLChain(
            min_enthalpy=float(self._window[0]),
            bin_size=float(self._window[2]),
            num_levels=len(self._levels),
            flatness=float(self.flatness),
            check_period=int(self.check_period),
            update_period=int(self.update_period),
            mod_divisor=float(self._mod_divisor),
        )
        inner = pallas_chain.make_shared_proposal_chain(
            tables,
            n_steps,
            block_size=self.chain_block_size,
            interpret=pallas_chain.interpret_mode(),
            move=move,
            wl=wl,
            proposal_mode=self.proposal_mode,
        )
        full_features = self.full_features_fn()
        natural_params = jnp.asarray(self.natural_params)
        min_e, bs = self._window[0], self._window[2]
        nlev = len(self._levels)

        def fn(state, key):
            st = inner(state, key)
            feats = jax.vmap(full_features)(st["occupancy"])
            st["features"] = feats
            st["enthalpy"] = feats @ natural_params
            e = st["enthalpy"]
            b = jnp.clip(
                jnp.floor((e - min_e) / bs).astype(jnp.int32), 0, nlev - 1
            )
            valid = (e >= min_e) & (e < min_e + nlev * bs)
            oh = (jnp.arange(nlev)[None, :] == b[:, None]) & valid[:, None]
            counts = st["wl_mean_counts"]  # [W, B] boundary-update counts
            n = jnp.sum(jnp.where(oh, counts, 0), axis=1)  # [W]
            mean = st["mean_features"]  # [W, B, F]
            cur = jnp.sum(jnp.where(oh[:, :, None], mean, 0.0), axis=1)
            new = (feats + n[:, None] * cur) / (n[:, None] + 1)
            st["mean_features"] = jnp.where(
                oh[:, :, None], new[:, None, :], mean
            )
            st["wl_mean_counts"] = counts + oh.astype(jnp.int32)
            return st

        return fn

    def restore_aux_state(self, state: dict, container) -> dict:
        """Resume WL aux state (histogram/entropy/...) from stored samples.

        The reference leaves this as an open TODO (its sampler restarts the
        histogram on resume, smol/moca/sampler/sampler.py:299-301); here the
        last recorded sample restores the full Wang-Landau record.  The
        flatness-check step counter restarts at zero, which only delays the
        next check by at most ``check_period`` steps.
        """
        import jax.numpy as jnp

        if container.num_samples == 0:
            return state
        state = dict(state)
        # bulky cumulative planes live on the container's aux cadence; the
        # last aux record carries the full Wang-Landau bookkeeping
        mapping = {
            "histogram": "histogram",
            "occurrences": "occurrences",
            "entropy": "entropy",
            "mean_features": "cumulative_mean_features",
            # chain-path per-boundary mean weights; absent in old records
            # (then the restored means re-seed at weight zero)
            "wl_mean_counts": "cumulative_mean_counts",
            "mod_factor": "mod_factor",
        }
        for key, name in mapping.items():
            try:
                arr = container.get_trace_value(name, flat=False)
            except AttributeError:
                continue
            if len(arr):
                state[key] = jnp.asarray(arr[-1]).astype(state[key].dtype)
        return state

    def initial_state(self, occupancies) -> dict:
        import jax.numpy as jnp

        state = super().initial_state(occupancies)
        nwalkers, num_levels = state["occupancy"].shape[0], len(self._levels)
        nfeat = len(self.natural_params)
        state["entropy"] = jnp.zeros((nwalkers, num_levels))
        state["histogram"] = jnp.zeros((nwalkers, num_levels), dtype=jnp.int32)
        state["occurrences"] = jnp.zeros((nwalkers, num_levels), dtype=jnp.int32)
        state["mean_features"] = jnp.zeros((nwalkers, num_levels, nfeat))
        state["mod_factor"] = jnp.full(nwalkers, self._m, dtype=jnp.float64)
        state["wl_counter"] = jnp.zeros(nwalkers, dtype=jnp.int32)
        # boundary-update counts for the chain path's per-bin mean
        # features (unused by the per-step XLA path)
        state["wl_mean_counts"] = jnp.zeros(
            (nwalkers, num_levels), dtype=jnp.int32
        )
        return state
