"""Sampler: drives compiled MC chains and stores traces.

The TPU-native inversion of the reference Sampler (smol/moca/sampler/
sampler.py): instead of a Python loop calling ``kernel.single_step`` per
walker per step, the whole (nwalkers x nsteps) loop runs on device as one
``lax.scan`` (smol_tpu.ops.mc.run_chain) in chunks; only thinned traces come
back to host, where they stream into the SampleContainer (optionally to
HDF5).  ``nwalkers`` is therefore a throughput lever (thousands per chip),
not an outer loop.
"""

from __future__ import annotations

import os
from datetime import datetime
from warnings import warn

import numpy as np

from smol_tpu.constants import kB
from smol_tpu.moca.sampler.container import SampleContainer
from smol_tpu.moca.trace import Trace

__all__ = ["Sampler"]


class Sampler:
    """Runs MCMC sampling simulations."""

    def __init__(self, kernel, container, nwalkers=1, replica_exchange_period=None):
        """Initialize a Sampler.

        Prefer :meth:`from_ensemble`.

        Args:
            kernel: an MCKernel defining the algorithm (one kernel drives
                all walkers — the TPU replica-batch design).
            container: a SampleContainer for the samples.
            nwalkers: number of vmapped walkers.
            replica_exchange_period: if set, walkers form a parallel
                tempering ensemble (pass an array ``temperature`` ladder to
                the kernel) exchanging temperatures every this many steps.
        """
        self._kernel = kernel
        self._container = container
        self._nwalkers = nwalkers
        self._state = None  # device state between runs
        self._replica_exchange_period = replica_exchange_period
        self._container.metadata.kernels = [kernel.spec]
        # cache compiled-function building blocks: rebuilding them creates
        # new closures and would defeat jit caching across run() calls
        self._step_fn = None
        self._record_fns = {}
        self._chain_fns = {}
        if "features" in container._trace.names:
            self._register_derived_features()

    @classmethod
    def from_ensemble(
        cls,
        ensemble,
        *args,
        step_type=None,
        kernel_type=None,
        seeds=None,
        seed=None,
        nwalkers=1,
        replica_exchange_period=None,
        **kwargs,
    ):
        """Create a Sampler from an Ensemble.

        Default step type is flip for semigrand (chemical potentials set)
        and swap for canonical ensembles, kernel type Metropolis — matching
        the reference defaults (sampler.py:94-104).  Pass an array
        ``temperature`` ladder plus ``replica_exchange_period`` for parallel
        tempering.
        """
        from smol_tpu.moca.kernel import mckernel_factory

        if step_type is None:
            step_type = (
                "flip" if ensemble.chemical_potentials is not None else "swap"
            )
        if kernel_type is None:
            kernel_type = "Metropolis"
        if seed is None and seeds:
            seed = seeds[0]
        kernel = mckernel_factory(
            kernel_type, ensemble, step_type, *args, seed=seed, **kwargs
        )
        container = cls._empty_container(ensemble, kernel, nwalkers)
        return cls(
            kernel,
            container,
            nwalkers=nwalkers,
            replica_exchange_period=replica_exchange_period,
        )

    @staticmethod
    def _empty_container(ensemble, kernel, nwalkers):
        nfeat = len(ensemble.natural_parameters)
        nsites = ensemble.num_sites
        trace_arrays = {
            "occupancy": np.empty((0, nwalkers, nsites), dtype=np.int32),
            "features": np.empty((0, nwalkers, nfeat), dtype=np.float64),
            "enthalpy": np.empty((0, nwalkers), dtype=np.float64),
            "accepted": np.empty((0, nwalkers), dtype=bool),
            "accept_rate": np.empty((0, nwalkers), dtype=np.float64),
        }
        if hasattr(kernel, "temperature"):
            trace_arrays["temperature"] = np.empty((0, nwalkers), dtype=np.float64)
        if hasattr(kernel, "current_kernel"):  # MulticellKernel host sampling
            trace_arrays["kernel_index"] = np.empty((0, nwalkers), dtype=int)
        aux_arrays = {}
        if type(kernel).__name__ == "WangLandau":
            nlev = len(kernel._levels)
            trace_arrays["mod_factor"] = np.empty(
                (0, nwalkers), dtype=np.float64
            )
            # the bulky cumulative WL planes go on the aux cadence: each
            # record is cumulative, so per-sample device-to-host transfers
            # (tens of MB each) would dominate the run for zero extra
            # information — the last record IS the DOS result
            aux_arrays.update(
                histogram=np.empty((0, nwalkers, nlev), dtype=np.int32),
                occurrences=np.empty((0, nwalkers, nlev), dtype=np.int32),
                entropy=np.empty((0, nwalkers, nlev), dtype=np.float64),
                cumulative_mean_features=np.empty(
                    (0, nwalkers, nlev, nfeat), dtype=np.float64
                ),
                cumulative_mean_counts=np.empty(
                    (0, nwalkers, nlev), dtype=np.int32
                ),
            )
        return SampleContainer(
            kernel.ensemble,
            Trace(**trace_arrays),
            ensemble.thermo_boundaries,
            aux_trace=Trace(**aux_arrays) if aux_arrays else None,
        )

    # ---------------- properties ----------------

    @property
    def mckernels(self):
        """List with the single batched kernel (API parity)."""
        return [self._kernel]

    @property
    def mckernel(self):
        return self._kernel

    @property
    def seeds(self):
        return [self._kernel.seed]

    @property
    def samples(self) -> SampleContainer:
        return self._container

    @property
    def nwalkers(self) -> int:
        return self._nwalkers

    def efficiency(self, discard=0, flat=True):
        return self._container.sampling_efficiency(discard=discard, flat=flat)

    def clear_samples(self):
        self._container.clear()

    # ---------------- trace recording ----------------

    def _make_record_fn(self, thin_by: int):
        kernel = self._kernel
        track_features = kernel.track_features
        is_wl = type(kernel).__name__ == "WangLandau"

        def record(state):
            occupancy = kernel.state_occupancy(state)
            rec = {
                "occupancy": occupancy,
                "enthalpy": state["enthalpy"],
                "accepted": state["accepted"],
                "accept_rate": state["window_naccept"] / thin_by,
            }
            if track_features:
                rec["features"] = state["features"]
            # else: the container computes exact-f64 features lazily from
            # the recorded occupancies (see _register_derived_features);
            # recomputing them at every thin point would dominate the
            # run, and the recorded enthalpy is the kernel's double-float
            # accumulation (~2^-45 relative), inside the 1e-8 contract.
            if "beta" in state:
                rec["temperature"] = 1.0 / (kB * state["beta"])
            if is_wl:
                rec["mod_factor"] = state["mod_factor"]
            return rec

        return record

    def _register_derived_features(self):
        """Serve the ``features`` trace lazily for non-tracking kernels.

        The derived fn recomputes exact-f64 feature vectors from stored
        occupancies in bounded host->device chunks, only when a reader
        (getter, HDF5 flush, or MSON serialization) actually needs them.
        """
        import jax
        import jax.numpy as jnp

        if self._kernel.track_features:
            return
        full_features = jax.jit(jax.vmap(self._kernel.full_features_fn()))

        def derived(occupancies):
            k, nwalkers, nsites = occupancies.shape
            flat = occupancies.reshape(-1, nsites)
            chunk = max(1, (64 << 20) // max(nsites * 4, 1))
            parts = []
            for start in range(0, len(flat), chunk):
                parts.append(
                    np.asarray(
                        full_features(jnp.asarray(flat[start : start + chunk]))
                    )
                )
            feats = np.concatenate(parts) if parts else np.empty((0, 0))
            return feats.reshape(k, nwalkers, -1)

        self._container.set_derived_value("features", derived)

    def _aux_record(self, state):
        """One aux record from the current device state.

        Returns the state's own (immutable) device arrays: the container
        defers the host copy until the record is actually read, so saving
        a record costs nothing on the sampling path (the WL planes are
        tens of MB and the device link may be a slow tunnel).
        """
        kernel = self._kernel
        if type(kernel).__name__ != "WangLandau":
            return None
        return {
            "histogram": state["histogram"],
            "occurrences": state["occurrences"],
            "entropy": state["entropy"],
            "cumulative_mean_features": state["mean_features"],
            "cumulative_mean_counts": state["wl_mean_counts"],
        }

    # ---------------- running ----------------

    def _get_chain_fn(self, thin_by: int):
        """Fused multi-step chain function for thin_by, or None.

        Prefers the kernel's persistent-chain device kernel (one launch per
        thinning window).  With replica exchange enabled the chain runs in
        exchange-period segments with exchange sweeps between them (needs
        thin_by divisible by the period).
        """
        if thin_by in self._chain_fns:
            return self._chain_fns[thin_by]
        fn = None
        period = self._replica_exchange_period
        if period is None:
            fn = self._kernel.make_chain_fn(thin_by)
        elif thin_by % period == 0:
            inner = self._kernel.make_chain_fn(int(period))
            if inner is not None:
                from smol_tpu.parallel.tempering import make_tempering_chain

                fn = make_tempering_chain(inner, thin_by // period)
        self._chain_fns[thin_by] = fn
        return fn

    def execution_path(self, thin_by: int = 1) -> str:
        """The execution path ``run(thin_by=...)`` will dispatch.

        One machine-readable string sourced from the actual dispatch logic
        (not prose), recorded in benchmark artifacts so a measured rate is
        attributable to a specific code path: the persistent Pallas chain
        kernel vs the per-step XLA fallback, streamed vs VMEM-resident
        tables, shared vs independent proposal streams, and replica
        exchange.  Example: ``"pallas-chain[flip]+vmem-tables+
        shared-proposals"``.
        """
        parts = []
        if self._get_chain_fn(int(thin_by)) is not None:
            kern = self._kernel
            built = (
                kern._get_chain_tables()
                if hasattr(kern, "_get_chain_tables")
                else None
            )
            move = built[1] if built else "?"
            parts.append(f"pallas-chain[{move}]")
            if built:
                from smol_tpu.ops import pallas_chain

                t = built[0]
                if t.ising:
                    parts.append("ising")
                elif t.qary:
                    parts.append(f"qary{t.qary}")
                table_bytes = 2 * t.gm.size + 4 * t.gcat.size
                parts.append(
                    "streamed-tables"
                    if table_bytes > pallas_chain.VMEM_TABLE_BUDGET
                    else "vmem-tables"
                )
            if getattr(kern, "proposal_mode", "random") == "sweep":
                # deterministic site schedule: no shared randomness, so
                # the walkers are fully independent chains
                parts.append("sweep-schedule+independent-walkers")
            else:
                parts.append("shared-proposals")
        else:
            parts.append("xla-step")
            fast = (
                self._kernel._get_fast_tables()
                if hasattr(self._kernel, "_get_fast_tables")
                else None
            )
            parts.append(f"fast[{fast[1]}]" if fast else "general")
            parts.append("independent-proposals")
        if self._replica_exchange_period is not None:
            parts.append(f"replica-exchange@{self._replica_exchange_period}")
        return "+".join(parts)

    def setup_sample(self, initial_occupancies):
        """Initialize the device state from initial occupancies [W, N]."""
        occupancies = np.atleast_2d(np.asarray(initial_occupancies, dtype=np.int32))
        if occupancies.shape[0] != self._nwalkers:
            if occupancies.shape[0] == 1:
                occupancies = np.repeat(occupancies, self._nwalkers, axis=0)
            else:
                raise AttributeError(
                    f"Initial occupancies have {occupancies.shape[0]} walkers; "
                    f"expected {self._nwalkers}."
                )
        self._state = self._kernel.initial_state(occupancies)
        if self._replica_exchange_period is not None:
            import jax.numpy as jnp

            self._state["pt_counter"] = jnp.zeros((), dtype=jnp.int32)
        return self._state

    def run(
        self,
        nsteps,
        initial_occupancies=None,
        thin_by=1,
        progress=False,
        stream_chunk=0,
        stream_file=None,
        keep_last_chunk=False,
        swmr_mode=False,
        samples_per_launch=None,
        profile_dir=None,
        aux_every=None,
    ):
        """Run an MC simulation saving a sample every ``thin_by`` steps.

        Args:
            nsteps: total MC steps per walker.
            initial_occupancies: [W, N] (or [N]) int array. When None,
                continues from the current state or the last stored sample.
            thin_by: steps between saved samples.
            progress: print per-launch progress with measured
                flip-attempts/s throughput.
            stream_chunk: if > 0, flush samples to HDF5 in chunks this size.
            stream_file: HDF5 path (auto-named when omitted).
            keep_last_chunk: keep the last chunk in memory after streaming.
            swmr_mode: open the HDF5 backend in SWMR mode.
            samples_per_launch: samples computed per device launch (tunes
                trace-memory vs dispatch overhead; default ~64MB of traces).
            profile_dir: when set, wrap the run in a ``jax.profiler.trace``
                writing a TensorBoard-loadable profile to this directory
                (SURVEY.md section 5 observability).
            aux_every: cadence (in samples) of AUX records — bulky
                cumulative kernel state such as the Wang-Landau
                entropy/histogram/mean-feature planes (see
                ``SampleContainer.aux_traced_values``).  Default None
                records aux state once, at the end of the run; every aux
                record is cumulative, so intermediate records only add
                monitoring granularity at the cost of a device-to-host
                transfer of the full planes each time (the reference
                records them per sample, smol/moca/kernel/wanglandau.py:
                222-266 — pass ``aux_every=1`` for that behavior).
        """
        import contextlib
        import time as _time

        import jax

        from smol_tpu.ops.mc import run_chain

        if not hasattr(self._kernel, "make_step_fn"):
            # host-only kernels (e.g. MulticellKernel) take the reference's
            # per-flip Python loop instead of the device lax.scan path
            if stream_chunk > 0 or profile_dir is not None:
                raise ValueError(
                    "Host-kernel sampling supports neither HDF5 streaming "
                    "nor profiling; run without stream_chunk/profile_dir."
                )
            return self._run_host(nsteps, initial_occupancies, thin_by, progress)

        if nsteps % thin_by != 0:
            warn(
                f"nsteps {nsteps} is not a multiple of thin_by {thin_by}; "
                f"the last {nsteps % thin_by} steps are ignored.",
                RuntimeWarning,
            )
        if initial_occupancies is not None:
            if self._container.num_samples > 0:
                warn(
                    "Initial occupancies provided with pre-existing samples. "
                    "Reset the container if this is not what you want.",
                    RuntimeWarning,
                )
            self.setup_sample(initial_occupancies)
        elif self._state is None:
            try:
                occupancies = self._container.get_occupancies(flat=False)[-1]
            except IndexError as err:
                raise RuntimeError(
                    "No saved samples to take initial occupancies from; "
                    "they must be provided."
                ) from err
            self.setup_sample(occupancies)
            # restore kernel aux state (e.g. Wang-Landau histograms) from
            # the stored record
            self._state = self._kernel.restore_aux_state(
                self._state, self._container
            )

        nsamples = nsteps // thin_by
        if samples_per_launch is None:
            # bound per-launch trace memory to ~256 MB (records stay in
            # HBM until read; fewer, larger launches also mean fewer
            # buffered batches for the device-side statistics to reduce)
            bytes_per_sample = sum(
                int(np.prod(v.shape[1:])) * v.dtype.itemsize
                for _, v in self._container._trace.items()
            )
            samples_per_launch = max(
                1, min(nsamples, (256 << 20) // max(bytes_per_sample, 1))
            )
        has_aux = bool(self._container.aux_traced_values)
        if has_aux and aux_every is not None:
            # aux records land at launch boundaries: cap the launch size
            samples_per_launch = min(samples_per_launch, int(aux_every))
        chain_fn = self._get_chain_fn(thin_by)
        step_fn = None
        if chain_fn is None:
            if self._step_fn is None:
                step_fn = self._kernel.make_step_fn()
                if self._replica_exchange_period is not None:
                    from smol_tpu.parallel.tempering import make_tempering_step

                    step_fn = make_tempering_step(
                        step_fn, self._replica_exchange_period
                    )
                self._step_fn = step_fn
            step_fn = self._step_fn
        if thin_by not in self._record_fns:
            self._record_fns[thin_by] = self._make_record_fn(thin_by)
        record_fn = self._record_fns[thin_by]

        backend = None
        if stream_chunk > 0:
            if stream_file is None:
                now = datetime.now()
                stream_file = os.path.join(
                    os.getcwd(),
                    "moca-samples-" + now.strftime("%Y-%m-%d-%H%M%S%f") + ".h5",
                )
            backend = self._container.get_backend(
                stream_file, nsamples, swmr_mode=swmr_mode
            )

        key = jax.random.key(self._kernel.seed % (2**63))
        # fold in the number of samples already taken so reruns differ
        key = jax.random.fold_in(key, self._container.num_samples)

        done = 0
        since_flush = 0
        since_aux = 0
        profile_ctx = (
            jax.profiler.trace(profile_dir)
            if profile_dir is not None
            else contextlib.nullcontext()
        )
        with profile_ctx:
            while done < nsamples:
                launch = min(samples_per_launch, nsamples - done)
                key, subkey = jax.random.split(key)
                t_launch = _time.perf_counter()
                if chain_fn is not None:
                    from smol_tpu.ops.mc import run_chain_fused

                    self._state, traces = run_chain_fused(
                        self._state, subkey, chain_fn, record_fn, int(launch)
                    )
                else:
                    self._state, traces = run_chain(
                        self._state, subkey, step_fn, record_fn, int(launch),
                        int(thin_by),
                    )
                # device arrays pass through AS A PLAIN DICT; the container
                # keeps them device-resident until something reads them, so
                # the sampling loop never blocks on the device->host link.
                # (Wrapping in Trace here would np.asarray every array —
                # a synchronous device->host copy per launch.)
                self._container.save_sampled_traces(traces, thinned_by=thin_by)
                done += launch
                since_flush += launch
                since_aux += launch
                if has_aux and (
                    done >= nsamples
                    or (aux_every is not None and since_aux >= aux_every)
                ):
                    self._container.save_aux_record(
                        self._aux_record(self._state),
                        sample_index=self._container.num_samples - 1,
                    )
                    since_aux = 0
                if backend is not None and since_flush >= stream_chunk:
                    self._container.flush_to_backend(backend)
                    since_flush = 0
                if progress:
                    # dispatch is async; wait so the printed rate reflects
                    # device work, not enqueue time (only when reporting)
                    jax.block_until_ready(self._state)
                    elapsed = _time.perf_counter() - t_launch
                    attempts = launch * thin_by * self._nwalkers
                    print(
                        f"sampled {done}/{nsamples} (x{thin_by} steps, "
                        f"{attempts / max(elapsed, 1e-9) / 1e6:.1f} M "
                        f"attempts/s)"
                    )

        if backend is not None:
            if self._container.num_samples > 0:
                self._container.flush_to_backend(backend)
            backend.close()
            if not keep_last_chunk:
                self.clear_samples()

    def _run_host(self, nsteps, initial_occupancies=None, thin_by=1, progress=False):
        """Sample a host kernel with the reference's per-step loop.

        Mirrors the reference Sampler.sample accumulation (reference
        sampler.py:164-210): per walker, per step, call
        ``kernel.single_step`` and fold accepted delta traces into absolute
        features/enthalpy.  Used for kernels with no device step function
        (MulticellKernel hops depend on host-held per-kernel state); the
        device ``lax.scan`` path is orders of magnitude faster and remains
        the default for every device kernel.
        """
        import time as _time

        kernel = self._kernel
        if nsteps % thin_by != 0:
            warn(
                f"nsteps {nsteps} is not a multiple of thin_by {thin_by}; "
                f"the last {nsteps % thin_by} steps are ignored.",
                RuntimeWarning,
            )
        if initial_occupancies is None:
            try:
                initial_occupancies = self._container.get_occupancies(flat=False)[-1]
            except IndexError as err:
                raise RuntimeError(
                    "No saved samples to take initial occupancies from; "
                    "they must be provided."
                ) from err
        occupancies = np.atleast_2d(
            np.asarray(initial_occupancies, dtype=np.int32)
        ).copy()
        if occupancies.shape[0] != self._nwalkers:
            raise AttributeError(
                f"Initial occupancies have {occupancies.shape[0]} walkers; "
                f"expected {self._nwalkers}."
            )
        nwalkers = occupancies.shape[0]
        multicell = hasattr(kernel, "current_kernel")
        if multicell and nwalkers != 1:
            raise ValueError(
                "Host multicell sampling supports a single walker (the hop "
                "state lives on the kernel)."
            )
        if multicell:
            kernel.set_aux_state(occupancies[0])

        feats = np.zeros((nwalkers, len(kernel.natural_params)))
        enth = np.zeros(nwalkers)
        for w in range(nwalkers):
            trace0 = kernel.compute_initial_trace(occupancies[w])
            feats[w] = np.asarray(trace0.features, dtype=np.float64).reshape(-1)
            enth[w] = float(np.asarray(trace0.enthalpy).reshape(-1)[0])

        nsamples = nsteps // thin_by
        batch = {
            name: np.zeros((nsamples,) + arr.shape[1:], arr.dtype)
            for name, arr in self._container._trace.items()
        }
        t0 = _time.perf_counter()
        for s in range(nsamples):
            accepted_ct = np.zeros(nwalkers)
            last_acc = np.zeros(nwalkers, dtype=bool)
            for _ in range(thin_by):
                for w in range(nwalkers):
                    trace = kernel.single_step(occupancies[w])
                    acc = bool(np.asarray(trace.accepted))
                    if acc:
                        feats[w] += np.asarray(
                            trace.delta_trace.features, dtype=np.float64
                        ).reshape(-1)
                        enth[w] += float(
                            np.asarray(trace.delta_trace.enthalpy).reshape(-1)[0]
                        )
                    accepted_ct[w] += acc
                    last_acc[w] = acc
            batch["occupancy"][s] = occupancies
            batch["features"][s] = feats
            batch["enthalpy"][s] = enth
            batch["accepted"][s] = last_acc
            batch["accept_rate"][s] = accepted_ct / thin_by
            if "temperature" in batch:
                batch["temperature"][s] = kernel.temperature
            if "kernel_index" in batch:
                batch["kernel_index"][s] = kernel._current_kernel_index
        self._container.save_sampled_traces(Trace(**batch), thinned_by=thin_by)
        if progress:
            elapsed = _time.perf_counter() - t0
            attempts = nsamples * thin_by * nwalkers
            print(
                f"host-sampled {nsamples} samples (x{thin_by} steps, "
                f"{attempts / max(elapsed, 1e-9):.0f} attempts/s)"
            )

    def sample(self, nsteps, initial_occupancies, thin_by=1, progress=False):
        """Generator yielding a host Trace every thin_by steps.

        Provided for reference-API parity; prefer :meth:`run` which batches
        samples per device launch.
        """
        import jax

        from smol_tpu.ops.mc import run_chain

        self.setup_sample(initial_occupancies)
        if self._step_fn is None:
            step_fn = self._kernel.make_step_fn()
            if self._replica_exchange_period is not None:
                from smol_tpu.parallel.tempering import make_tempering_step

                step_fn = make_tempering_step(
                    step_fn, self._replica_exchange_period
                )
            self._step_fn = step_fn
        step_fn = self._step_fn
        if thin_by not in self._record_fns:
            self._record_fns[thin_by] = self._make_record_fn(thin_by)
        record_fn = self._record_fns[thin_by]
        key = jax.random.key(self._kernel.seed % (2**63))
        for _ in range(nsteps // thin_by):
            key, subkey = jax.random.split(key)
            self._state, traces = run_chain(
                self._state, subkey, step_fn, record_fn, 1, int(thin_by)
            )
            yield Trace(**{k: np.asarray(v)[0] for k, v in traces.items()})

    def anneal(
        self,
        temperatures,
        mcmc_steps,
        initial_occupancies=None,
        thin_by=1,
        progress=False,
        stream_chunk=0,
        stream_file=None,
        swmr_mode=True,
    ):
        """Simulated annealing: run at each temperature in sequence."""
        if temperatures[0] < temperatures[-1]:
            raise ValueError(
                "End temperature is greater than start temperature: "
                f"{temperatures[-1]:.2f} > {temperatures[0]:.2f}."
            )
        self._kernel.temperature = temperatures[0]
        self.run(
            mcmc_steps,
            initial_occupancies=initial_occupancies,
            thin_by=thin_by,
            progress=progress,
            stream_chunk=stream_chunk,
            stream_file=stream_file,
            swmr_mode=swmr_mode,
            keep_last_chunk=True,
        )
        import jax.numpy as jnp

        for temperature in temperatures[1:]:
            self._kernel.temperature = temperature
            if self._state is not None and "beta" in self._state:
                self._state["beta"] = jnp.full_like(
                    self._state["beta"], self._kernel.beta
                )
            self.run(
                mcmc_steps,
                thin_by=thin_by,
                progress=progress,
                stream_chunk=stream_chunk,
                stream_file=stream_file,
                swmr_mode=swmr_mode,
                keep_last_chunk=True,
            )
        if stream_chunk > 0:
            self.clear_samples()
