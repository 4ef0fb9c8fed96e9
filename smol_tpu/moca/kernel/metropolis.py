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


def _zero_beta_step(metro_step, state, key):
    import jax.numpy as jnp

    st = dict(state)
    st["beta"] = jnp.zeros_like(state["enthalpy"])
    st = metro_step(st, key)
    st.pop("beta", None)
    return st


class Metropolis(MetropolisAcceptMixin, ThermalKernelMixin, MCKernel):
    """The classic Metropolis-Hastings kernel.

    Args:
        shared_proposals: allow the shared-proposal persistent-chain Pallas
            kernel (smol_tpu.ops.pallas_chain) for single-flip steps on
            TPU.  Walkers within one kernel block then share the proposal
            SITE sequence (each chain stays an exact Metropolis chain; see
            the pallas_chain module docstring for the statistical
            contract).  Set False for fully independent per-walker
            proposals.
        chain_block_size: walkers per chain-kernel block (also the sharing
            granularity).
        proposal_mode: ``"random"`` (default) draws proposal sites
            randomly (shared within a block when ``shared_proposals``);
            ``"sweep"`` (single-flip steps only) visits the active sites
            in a fixed deterministic cyclic order instead — systematic-
            scan Metropolis.  The schedule carries no randomness, so the
            walkers are FULLY INDEPENDENT chains at full chain-kernel
            speed: the statistically clean choice for across-walker
            averaging (see the pallas_chain docstring contract).
    """

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

    def initial_state(self, occupancies) -> dict:
        import jax.numpy as jnp

        state = super().initial_state(occupancies)
        from smol_tpu.moca.kernel.mcusher import Swap

        if type(self.mcusher) is Swap:
            # cumulative non-null proposal count: with the chain kernel's
            # exogenous pair draw, proposals where both sites hold the
            # same species are identity moves; this counter makes the
            # reference-equivalent (null-free) move rate measurable
            state["nmove"] = jnp.zeros_like(state["naccept"])
        return state

    def _build_fast_tables(self):
        """Zero-gather fast path for Flip/Swap/TableFlip Metropolis.

        Applies when no features are tracked and no bias is set (see
        smol_tpu.ops.fastmc for the table constraints: <= 16 codes/site,
        tensor size <= 128).  TableFlip additionally supports a composite
        CE + Ewald processor (the Ewald delta runs as an additive one-hot
        term, smol_tpu.ops.fastmc.EwaldFlipTables).
        """
        from smol_tpu.moca.kernel.mcusher import Flip, Swap
        from smol_tpu.moca.kernel.tableflip import TableFlip
        from smol_tpu.ops import fastmc

        if self.track_features or self._bias is not None:
            return None
        if type(self.mcusher) in (Flip, Swap):
            if self.mcusher.device_log_priori() is not None:
                return None
            tables = fastmc.build_fast_tables(
                self._ensemble.processor,
                self._ensemble.sublattices,
                mu_table=self._ensemble.chemical_potential_table,
                sublattice_probabilities=self.mcusher.sublattice_probabilities,
            )
            if tables is None:
                return None
            return (tables, "flip" if type(self.mcusher) is Flip else "swap")
        if type(self.mcusher) is TableFlip:
            built = self._build_tableflip_fast()
            if built is not None:
                return built
        return None

    def _build_tableflip_fast(self):
        """(tables, "tableflip", rank_map, ewald_tables) or None."""
        import numpy as np

        from smol_tpu.moca.processor.ewald import EwaldProcessor
        from smol_tpu.ops import fastmc

        processor = self._ensemble.processor
        ce_proc, ewald_proc = processor, None
        subs = getattr(processor, "processors", None)
        if subs is not None:
            ce_parts = [p for p in subs if getattr(p, "fast_path_ok", False)]
            ew_parts = [p for p in subs if isinstance(p, EwaldProcessor)]
            if len(ce_parts) != 1 or len(ce_parts) + len(ew_parts) != len(subs):
                return None
            ce_proc = ce_parts[0]
            ewald_proc = ew_parts[0] if ew_parts else None
        tables = fastmc.build_fast_tables(
            ce_proc,
            self._ensemble.sublattices,
            mu_table=self._ensemble.chemical_potential_table,
        )
        if tables is None:
            return None
        n = self._ensemble.num_sites
        rank_map = np.zeros(n, dtype=np.int32)
        rank = 0
        cmax = 1
        for sl in self._ensemble.sublattices:
            cmax = max(cmax, len(sl.encoding))
            if not sl.is_active:
                continue
            for s in sl.active_sites:
                rank_map[int(s)] = rank
                rank += 1
        ew_tables = None
        if ewald_proc is not None:
            ew_tables = fastmc.build_ewald_flip_tables(ewald_proc, n, cmax)
            if ew_tables is None:
                return None
        return (tables, "tableflip", rank_map, ew_tables)

    def make_step_fn(self):
        from smol_tpu.ops import fastmc

        fast = self._get_fast_tables()
        if fast is not None:
            if fast[1] == "flip":
                return fastmc.make_fast_flip_step(fast[0])
            if fast[1] == "swap":
                return fastmc.make_fast_swap_step(fast[0])
            tables, _, rank_map, ew_tables = fast
            propose_fn, _ = self.mcusher.device_proposal()
            priori_fn = self.mcusher.device_log_priori()
            return fastmc.make_fast_tableflip_step(
                tables, rank_map, propose_fn, priori_fn, ew_tables
            )
        propose_fn, _ = self.mcusher.device_proposal()
        return devmc.make_metropolis_step(
            propose_fn, self._device_applier(), self._device_log_priori()
        )

    def _get_chain_tables(self):
        if not hasattr(self, "_chain_tables_cache"):
            self._chain_tables_cache = self._build_chain_tables()
        return self._chain_tables_cache

    def _build_chain_tables(self):
        """Shared-proposal chain tables for Flip/Swap/TableFlip Metropolis.

        Applies for plain Flip (semigrand), Swap (canonical), and
        TableFlip (constrained-composition semigrand, e.g. charge-neutral
        SGC) ushers with no bias and no tracked features; see
        smol_tpu.ops.pallas_chain for the full applicability constraints
        (incl. composite CE + Ewald support).  The TableFlip chain uses
        an exogenous SYMMETRIC proposal (pallas_chain.TableMove) that
        samples the same stationary distribution as the reference usher
        through a different proposal process — its a-priori factor is
        identically zero, so no gammaln evaluation runs on device.
        Returns (tables, move, table_move | None).
        """
        from smol_tpu.moca.kernel.mcusher import Flip, Swap
        from smol_tpu.moca.kernel.tableflip import TableFlip
        from smol_tpu.ops import pallas_chain

        if not self.shared_proposals and self.proposal_mode != "sweep":
            return None  # sweep schedules are walker-independent anyway
        if self.track_features or self._bias is not None:
            return None
        if type(self.mcusher) not in (Flip, Swap):
            if type(self.mcusher) is TableFlip:
                return self._build_tableflip_chain()
            return None
        if self.mcusher.device_log_priori() is not None:
            return None
        move = "flip" if type(self.mcusher) is Flip else "swap"
        tables = pallas_chain.build_chain_tables(
            self._ensemble.processor,
            self._ensemble.sublattices,
            # swaps conserve composition: the chemical work term is
            # identically zero, so the mu table is not needed
            mu_table=(
                self._ensemble.chemical_potential_table
                if move == "flip" else None
            ),
            sublattice_probabilities=self.mcusher.sublattice_probabilities,
        )
        if tables is None:
            return None
        return tables, move, None

    def _build_tableflip_chain(self):
        from smol_tpu.ops import pallas_chain

        tables = pallas_chain.build_chain_tables(
            self._ensemble.processor,
            self._ensemble.sublattices,
            mu_table=self._ensemble.chemical_potential_table,
            # the embedded swap moves follow the swapper's sublattice
            # probabilities; flip directions carry their own sublattices
            sublattice_probabilities=(
                self.mcusher._swapper.sublattice_probabilities
            ),
        )
        if tables is None:
            return None
        table_move = pallas_chain.build_table_move(tables, self.mcusher)
        if table_move is None:
            return None
        return tables, "table", table_move

    def make_chain_fn(self, n_steps: int):
        from smol_tpu.ops import pallas_chain

        if not pallas_chain.runtime_supported():
            return None
        built = self._get_chain_tables()
        if built is None:
            return None
        tables, move, table_move = built
        if self.proposal_mode == "sweep" and move != "flip":
            return None  # deterministic sweeps are defined for flips only
        inner = pallas_chain.make_shared_proposal_chain(
            tables,
            n_steps,
            block_size=self.chain_block_size,
            interpret=pallas_chain.interpret_mode(),
            move=move,
            table_move=table_move,
            proposal_mode=self.proposal_mode,
        )
        if self._get_fast_tables() is None:
            return inner

        # the canonical walker state is packed (words): convert per window
        from smol_tpu.ops.fastmc import pack_occupancy, unpack_occupancy

        bits = self._fast_code_bits()
        num_sites = self._ensemble.num_sites

        def fn(state, key):
            st = dict(state)
            st["occupancy"] = unpack_occupancy(
                st.pop("words"), num_sites, bits
            )
            st = inner(st, key)
            st["words"] = pack_occupancy(
                st.pop("occupancy"), num_sites, bits
            )
            return st

        return fn


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
        from jax.tree_util import Partial

        propose_fn, _ = self.mcusher.device_proposal()
        log_priori = self._device_log_priori()
        if log_priori is None:
            return devmc.make_uniform_step(propose_fn, self._device_applier())
        # with a bias/priori factor an accept test is still required at beta=0
        return Partial(
            _zero_beta_step,
            devmc.make_metropolis_step(
                propose_fn, self._device_applier(), log_priori
            ),
        )

    def initial_state(self, occupancies) -> dict:
        return super().initial_state(occupancies)
