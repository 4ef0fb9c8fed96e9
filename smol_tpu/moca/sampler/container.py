"""SampleContainer: storage and statistics of sampled MC traces.

Mirrors the reference (smol/moca/sampler/container.py): traces are stacked
arrays with leading axes [n_samples, n_walkers, ...]; getters provide
energies, compositions, species counts, minima and efficiency; an HDF5
backend supports chunked streaming (SWMR) and full save/load round trips.
"""

from __future__ import annotations

import os
import warnings
from collections import defaultdict

import numpy as np

from smol_tpu.moca.metadata import Metadata
from smol_tpu.moca.trace import Trace
from smol_tpu.serial import MSONable, jsanitize, process_decoded

__all__ = ["SampleContainer"]


class SampleContainer(MSONable):
    """Holds sampled traces of an MC run."""

    def __init__(
        self,
        ensemble,
        sample_trace: Trace,
        sampling_metadata=None,
        aux_trace: Trace | None = None,
    ):
        """Initialize a SampleContainer.

        Args:
            ensemble: the Ensemble sampled from (or a dict of its specs).
            sample_trace: an empty Trace with arrays shaped
                [0, nwalkers, ...] defining what will be recorded.
            sampling_metadata: optional metadata dict.
            aux_trace: optional empty Trace of AUXILIARY quantities recorded
                on their own (sparser) cadence — bulky cumulative kernel
                state such as Wang-Landau entropy/histogram planes, whose
                per-sample device-to-host transfer would dominate the run
                (each record is cumulative, so the last one carries the
                full result).  Aux records append via
                :meth:`save_aux_record`; :meth:`get_trace_value` serves
                them transparently by name.
        """
        if isinstance(ensemble, dict):
            self._ensemble_specs = ensemble
            self._ensemble = None
        else:
            self._ensemble = ensemble
            self._ensemble_specs = {
                "num_sites": ensemble.num_sites,
                "system_size": ensemble.system_size,
                "natural_parameters": np.asarray(ensemble.natural_parameters),
                "num_energy_coefs": ensemble.num_energy_coefs,
            }
        self._sublattices = (
            ensemble.sublattices if not isinstance(ensemble, dict) else []
        )
        meta = dict(sampling_metadata or {})
        meta.pop("cls_name", None)
        self.metadata = Metadata("SampleContainer", **meta)
        self._trace = sample_trace
        self._nsamples = 0
        self._aux_trace = aux_trace if aux_trace is not None else Trace()
        self._naux = 0
        # the (main-trace) sample index each aux record was taken at
        self._aux_indices = np.empty(0, dtype=np.int64)
        # aux records saved but not yet copied to host: list of
        # (record dict of device/host arrays, sample_index).  Aux planes
        # are large (tens of MB for Wang-Landau) and the device->host
        # link may be slow (tunneled TPU: ~10 MB/s), so records stay
        # device-resident until something actually reads them.
        self._aux_pending = []
        # sampled-trace batches saved but not yet copied to host: list of
        # (dict of arrays [k, nwalkers, ...], k).  Like aux records, the
        # per-launch device->host copy would sit inside the sampling loop
        # (tunneled TPU: ~10 MB/s), so batches stay device-resident until
        # a reader materializes them — bounded by _PENDING_BYTES_MAX so
        # long runs cannot pin unbounded HBM.
        self._pending_samples = []
        self._pending_nsamples = 0
        self._pending_bytes = 0
        # trace entries computed lazily from stored occupancies on first
        # read (e.g. exact-f64 feature vectors): name -> fn(occu [k,W,N])
        # -> [k,W,...].  Keeps the per-thin-point recompute off the
        # sampling path entirely; see set_derived_value.
        self._derived = {}
        self._derived_filled = {}
        self.total_mc_steps_per_sample = 1
        self._backend = None

    # keep at most this many buffered device bytes before forcing a copy
    # (bounds record HBM, not correctness; the device->host link may be
    # orders of magnitude slower than HBM, so the bound is generous)
    _PENDING_BYTES_MAX = int(
        os.environ.get("SMOL_TPU_PENDING_BYTES_MAX", 2 << 30)
    )

    # ---------------- basic properties ----------------

    @property
    def ensemble(self):
        return self._ensemble

    @property
    def sublattices(self):
        return self._sublattices

    @property
    def natural_parameters(self) -> np.ndarray:
        return np.asarray(self._ensemble_specs["natural_parameters"])

    @property
    def _num_energy_coefs(self) -> int:
        return int(self._ensemble_specs["num_energy_coefs"])

    @property
    def num_samples(self) -> int:
        return self._nsamples + self._pending_nsamples

    @property
    def total_mc_steps(self) -> int:
        return self.total_mc_steps_per_sample * self.num_samples

    @property
    def shape(self) -> tuple:
        """(nwalkers, num_sites)."""
        return (
            self._trace.occupancy.shape[1],
            self._ensemble_specs["num_sites"],
        )

    @property
    def traced_values(self) -> list:
        return self._trace.names + self._aux_trace.names

    @property
    def aux_traced_values(self) -> list:
        return self._aux_trace.names

    @property
    def num_aux_records(self) -> int:
        return self._naux + len(self._aux_pending)

    @property
    def aux_sample_indices(self) -> np.ndarray:
        """Main-trace sample index of each aux record."""
        self._materialize_aux()
        return self._aux_indices[: self._naux]

    # ---------------- trace access ----------------

    @staticmethod
    def _flatten(values):
        """Merge the samples and walkers axes."""
        return values.reshape(-1, *values.shape[2:])

    def set_derived_value(self, name, fn):
        """Declare a traced quantity computed lazily from occupancies.

        ``fn(occupancies)`` maps a host ``[k, nwalkers, nsites]`` int32
        array to ``[k, nwalkers, ...]`` values.  The entry must exist in
        the trace spec; its rows are filled on first read (or before any
        serialization) instead of on the sampling path.  The Sampler uses
        this for exact-f64 feature vectors: recomputing them at every
        thin point would dominate the run, while the accumulated
        double-float enthalpy already meets the accuracy contract.
        """
        if name not in self._trace.names:
            raise ValueError(f"{name} is not a traced quantity.")
        self._derived[name] = fn
        self._derived_filled.setdefault(name, 0)

    def _materialize_derived(self):
        """Fill lazily-computed trace entries up to the current sample."""
        if not self._derived:
            return
        self._materialize_samples()
        for name, fn in self._derived.items():
            filled = self._derived_filled.get(name, 0)
            if filled >= self._nsamples:
                continue
            occus = self._trace.occupancy[filled : self._nsamples]
            getattr(self._trace, name)[filled : self._nsamples] = fn(occus)
            self._derived_filled[name] = self._nsamples

    def get_trace_value(self, name, discard=0, thin_by=1, flat=True):
        """Sampled values of one traced quantity.

        Aux quantities (see ``aux_traced_values``) are served from the aux
        record axis: ``discard``/``thin_by`` then index aux RECORDS, not
        samples (aux records are cumulative; the last one is the result).
        """
        if name in self._aux_trace.names:
            self._materialize_aux()
            value = getattr(self._aux_trace, name)[: self._naux]
        else:
            self._materialize_samples()
            if name in self._derived:
                self._materialize_derived()
            value = getattr(self._trace, name)[: self._nsamples]
        value = value[discard + thin_by - 1 :: thin_by]
        return self._flatten(value) if flat else value

    def mean_trace_value(self, name, discard=0, thin_by=1, flat=True):
        moments = self._device_moments(name, discard, thin_by, flat)
        if moments is not None:
            return moments[0]
        return self.get_trace_value(name, discard, thin_by, flat).mean(axis=0)

    def trace_value_variance(self, name, discard=0, thin_by=1, flat=True):
        moments = self._device_moments(name, discard, thin_by, flat, var=True)
        if moments is not None:
            return moments[1]
        return self.get_trace_value(name, discard, thin_by, flat).var(axis=0)

    # ---------------- device-side reductions ----------------
    #
    # Sample batches buffered from chain launches stay device-resident
    # (see save_sampled_traces); on a slow device->host link, pulling the
    # raw records just to take a mean would dominate an analysis.  These
    # helpers compute the reductions where the data lives and move only
    # the per-walker (or pooled) results.

    def _sample_segments(self, name):
        """(values, is_device) segments covering all samples, in order."""
        segments = []
        if self._nsamples:
            if name in self._derived and self._derived_filled.get(name, 0) < self._nsamples:
                return None
            segments.append((getattr(self._trace, name)[: self._nsamples], False))
        for batch, _ in self._pending_samples:
            if name not in batch:
                return None
            segments.append((batch[name], True))
        return segments

    @staticmethod
    def _selection_mask(k, offset, sel_start, thin_by):
        idx = np.arange(k) + offset
        return (idx >= sel_start) & ((idx - sel_start) % thin_by == 0)

    def _device_stats(self, name, discard=0, thin_by=1, flat=True):
        """(mean, variance, min) over selected samples without bulk copies.

        Returns None when the device path does not apply (no pending
        device batches, aux quantity, or a derived quantity not yet
        filled) — callers then fall back to the materializing path.
        Matches ``.mean(axis=0)`` / ``.var(axis=0)`` / ``.min(axis=0)``
        of the flattened (or per-walker) getter output.  Results are
        cached until new samples arrive, so the three statistics of one
        quantity share a single two-pass device reduction.
        """
        if not self._pending_samples or name in self._aux_trace.names:
            return None
        key = (name, discard, thin_by, flat)
        cached = getattr(self, "_stats_cache", {}).get(key)
        if cached is not None and cached[0] == self.num_samples:
            return cached[1]
        segments = self._sample_segments(name)
        if segments is None:
            return None
        from smol_tpu.ops.reductions import masked_stats_segments

        sel_start = discard + thin_by - 1
        masks, offset = [], 0
        for values, _ in segments:
            masks.append(self._selection_mask(len(values), offset, sel_start, thin_by))
            offset += len(values)
        count = sum(int(m.sum()) for m in masks)
        if count == 0:
            return None
        stats = masked_stats_segments(segments, masks, count, pool_walkers=flat)
        if not hasattr(self, "_stats_cache"):
            self._stats_cache = {}
        self._stats_cache[key] = (self.num_samples, stats)
        return stats

    def _device_moments(self, name, discard=0, thin_by=1, flat=True, var=False):
        stats = self._device_stats(name, discard, thin_by, flat)
        return None if stats is None else (stats[0], stats[1])

    def _device_min(self, name, discard=0, thin_by=1, flat=True):
        stats = self._device_stats(name, discard, thin_by, flat)
        return None if stats is None else stats[2]

    def get_occupancies(self, discard=0, thin_by=1, flat=True):
        return self.get_trace_value("occupancy", discard, thin_by, flat)

    def get_enthalpies(self, discard=0, thin_by=1, flat=True):
        return self.get_trace_value("enthalpy", discard, thin_by, flat)

    def get_feature_vectors(self, discard=0, thin_by=1, flat=True):
        return self.get_trace_value("features", discard, thin_by, flat)

    def get_energies(self, discard=0, thin_by=1, flat=True):
        """Energies (excluding chemical work when mu were set)."""
        if len(self.natural_parameters) == self._num_energy_coefs:
            return self.get_enthalpies(discard, thin_by, flat)
        features = self.get_feature_vectors(discard, thin_by, flat)
        return features[..., : self._num_energy_coefs] @ self.natural_parameters[
            : self._num_energy_coefs
        ]

    def get_temperatures(self, discard=0, thin_by=1, flat=True):
        return self.get_trace_value("temperature", discard, thin_by, flat)

    def get_orbit_factors(
        self, function_orbit_ids, discard=0, thin_by=1, flat=True
    ):
        """Per-orbit sums of natural-parameter-weighted features.

        Reference container.py:269 (its boolean-mask application only
        works for a single sample row; here the grouping is applied along
        the feature axis of every sample).
        """
        vals = self.natural_parameters * self.get_feature_vectors(
            discard=discard, thin_by=thin_by, flat=flat
        )
        ids = np.asarray(function_orbit_ids)
        return np.stack(
            [
                vals[..., ids == i].sum(axis=-1)
                for i in range(int(ids.max()) + 1)
            ],
            axis=-1,
        )

    def sampling_efficiency(self, discard=0, flat=True):
        """Mean acceptance fraction of the recorded windows."""
        name = (
            "accept_rate" if "accept_rate" in self._trace.names else "accepted"
        )
        return self.mean_trace_value(name, discard, flat=flat)

    # ---------------- statistics ----------------

    def mean_enthalpy(self, discard=0, thin_by=1, flat=True):
        return self.mean_trace_value("enthalpy", discard, thin_by, flat)

    def enthalpy_variance(self, discard=0, thin_by=1, flat=True):
        return self.trace_value_variance("enthalpy", discard, thin_by, flat)

    def mean_energy(self, discard=0, thin_by=1, flat=True):
        if len(self.natural_parameters) == self._num_energy_coefs:
            return self.mean_enthalpy(discard, thin_by, flat)
        return self.get_energies(discard, thin_by, flat).mean(axis=0)

    def energy_variance(self, discard=0, thin_by=1, flat=True):
        if len(self.natural_parameters) == self._num_energy_coefs:
            return self.enthalpy_variance(discard, thin_by, flat)
        return self.get_energies(discard, thin_by, flat).var(axis=0)

    def mean_feature_vector(self, discard=0, thin_by=1, flat=True):
        return self.mean_trace_value("features", discard, thin_by, flat)

    def feature_vector_variance(self, discard=0, thin_by=1, flat=True):
        return self.trace_value_variance("features", discard, thin_by, flat)

    def get_minimum_enthalpy(self, discard=0, thin_by=1, flat=True):
        low = self._device_min("enthalpy", discard, thin_by, flat)
        if low is not None:
            return low
        return self.get_enthalpies(discard, thin_by, flat).min(axis=0)

    def get_minimum_energy(self, discard=0, thin_by=1, flat=True):
        return self.get_energies(discard, thin_by, flat).min(axis=0)

    def get_minimum_enthalpy_occupancy(self, discard=0, thin_by=1, flat=True):
        inds = self.get_enthalpies(discard, thin_by, flat).argmin(axis=0)
        occus = self.get_occupancies(discard, thin_by, flat)
        if flat:
            return occus[inds]
        return occus[inds, np.arange(self.shape[0])]

    def get_minimum_energy_occupancy(self, discard=0, thin_by=1, flat=True):
        inds = self.get_energies(discard, thin_by, flat).argmin(axis=0)
        occus = self.get_occupancies(discard, thin_by, flat)
        if flat:
            return occus[inds]
        return occus[inds, np.arange(self.shape[0])]

    def get_sublattice_species_counts(self, sublattice, discard=0, thin_by=1, flat=True):
        """Per-sample counts of each species of a sublattice (encoding order)."""
        if sublattice not in self._sublattices:
            raise ValueError("Sublattice provided is not recognized.")
        occus = self.get_occupancies(discard, thin_by, flat=False)
        sub_occus = occus[..., sublattice.sites]  # [S, W, n_sub_sites]
        counts = np.stack(
            [(sub_occus == code).sum(axis=-1) for code in sublattice.encoding],
            axis=-1,
        ).astype(np.float64)
        return self._flatten(counts) if flat else counts

    def get_sublattice_compositions(self, sublattice, discard=0, thin_by=1, flat=True):
        counts = self.get_sublattice_species_counts(sublattice, discard, thin_by, flat)
        return counts / len(sublattice.sites)

    def get_species_counts(self, discard=0, thin_by=1, flat=True):
        """Dict species -> per-sample counts across all sublattices."""
        counts = defaultdict(float)
        for sublattice in self._sublattices:
            sub = self.get_sublattice_species_counts(sublattice, discard, thin_by, flat)
            for species, count in zip(sublattice.species, np.moveaxis(sub, -1, 0)):
                counts[species] = counts[species] + count
        return dict(counts)

    def get_compositions(self, discard=0, thin_by=1, flat=True):
        counts = self.get_species_counts(discard, thin_by, flat)
        return {sp: c / self.shape[1] for sp, c in counts.items()}

    def mean_composition(self, discard=0, thin_by=1, flat=True):
        return {
            sp: c.mean(axis=0)
            for sp, c in self.get_compositions(discard, thin_by, flat).items()
        }

    def composition_variance(self, discard=0, thin_by=1, flat=True):
        return {
            sp: c.var(axis=0)
            for sp, c in self.get_compositions(discard, thin_by, flat).items()
        }

    def mean_sublattice_composition(self, sublattice, discard=0, thin_by=1, flat=True):
        return self.get_sublattice_compositions(
            sublattice, discard, thin_by, flat
        ).mean(axis=0)

    def sublattice_composition_variance(self, sublattice, discard=0, thin_by=1, flat=True):
        return self.get_sublattice_compositions(
            sublattice, discard, thin_by, flat
        ).var(axis=0)

    def get_sampled_structures(self, indices=None, flat=True):
        """Decode sampled occupancies into Structures (needs the ensemble)."""
        if self._ensemble is None:
            raise RuntimeError("Ensemble is not available in this container.")
        occus = self.get_occupancies(flat=flat)
        indices = range(len(occus)) if indices is None else indices
        return [
            self._ensemble.processor.structure_from_occupancy(occus[i])
            for i in indices
        ]

    # ---------------- storage ----------------

    def allocate(self, nsamples: int):
        """Pre-allocate space for nsamples more samples."""
        for name, value in self._trace.items():
            grown = np.empty((nsamples, *value.shape[1:]), dtype=value.dtype)
            setattr(self._trace, name, np.concatenate([value[: self._nsamples], grown]))

    def save_sampled_trace(self, trace, thinned_by: int = 1):
        """Append one sampled trace (arrays shaped [nwalkers, ...])."""
        self._materialize_samples()
        if self._nsamples >= len(self._trace.occupancy):
            self.allocate(max(1, self._nsamples))
        for name, value in trace.items():
            getattr(self._trace, name)[self._nsamples] = value
        self._nsamples += 1
        self.total_mc_steps_per_sample = thinned_by

    def save_sampled_traces(self, traces, thinned_by: int = 1):
        """Append a batch of samples (arrays shaped [nsamples, nwalkers, ...]).

        The batch's arrays may live on device; they are NOT copied to host
        here (see ``_pending_samples``).  The first read of any sampled
        quantity, a backend flush, or serialization materializes them;
        batches exceeding ``_PENDING_BYTES_MAX`` in aggregate are copied
        eagerly so long runs cannot pin unbounded device memory.
        """
        batch = dict(traces.items())
        n_new = len(batch["occupancy"])
        self._pending_samples.append((batch, n_new))
        self._pending_nsamples += n_new
        self._pending_bytes += sum(
            int(np.prod(v.shape)) * v.dtype.itemsize for v in batch.values()
        )
        self.total_mc_steps_per_sample = thinned_by
        if self._pending_bytes > self._PENDING_BYTES_MAX:
            self._materialize_samples()

    def _materialize_samples(self):
        """Copy pending (device-resident) sample batches into host storage."""
        if not self._pending_samples:
            return
        pending, self._pending_samples = self._pending_samples, []
        self._pending_nsamples = 0
        self._pending_bytes = 0
        n_new = sum(n for _, n in pending)
        if self._nsamples + n_new > len(self._trace.occupancy):
            self.allocate(self._nsamples + n_new - len(self._trace.occupancy))
        for name in pending[0][0]:
            target = getattr(self._trace, name)
            at = self._nsamples
            for batch, n in pending:
                target[at : at + n] = np.asarray(batch[name])
                at += n
        self._nsamples += n_new

    def save_aux_record(self, record: dict, sample_index: int | None = None):
        """Append one aux record (arrays shaped [nwalkers, ...]).

        The record's arrays may live on device; they are NOT copied to
        host here.  They stay device-resident (keeping their HBM alive)
        until the first read of an aux quantity, a backend flush, or
        serialization — or are dropped wholesale by :meth:`clear`.

        Args:
            record: mapping of aux trace names to values for all walkers.
            sample_index: the main-trace sample index this record was taken
                at (defaults to the latest sample).
        """
        if sample_index is None:
            sample_index = self.num_samples - 1
        self._aux_pending.append((dict(record), int(sample_index)))

    def _materialize_aux(self):
        """Copy pending (device-resident) aux records into host storage."""
        if not self._aux_pending:
            return
        pending, self._aux_pending = self._aux_pending, []
        n_new = len(pending)
        for name in pending[0][0]:
            target = getattr(self._aux_trace, name)
            if self._naux + n_new > len(target):
                grown = np.empty(
                    (
                        max(n_new, self._naux + n_new - len(target)),
                        *target.shape[1:],
                    ),
                    target.dtype,
                )
                target = np.concatenate([target[: self._naux], grown])
            for k, (record, _) in enumerate(pending):
                target[self._naux + k] = np.asarray(record[name])
            setattr(self._aux_trace, name, target)
        if self._naux + n_new > len(self._aux_indices):
            self._aux_indices = np.concatenate(
                [
                    self._aux_indices[: self._naux],
                    np.empty(
                        max(n_new, self._naux + n_new - len(self._aux_indices)),
                        dtype=np.int64,
                    ),
                ]
            )
        for k, (_, sample_index) in enumerate(pending):
            self._aux_indices[self._naux + k] = sample_index
        self._naux += n_new

    def clear(self):
        """Drop all samples."""
        for name, value in self._trace.items():
            setattr(self._trace, name, np.empty((0, *value.shape[1:]), value.dtype))
        self._nsamples = 0
        for name, value in self._aux_trace.items():
            setattr(
                self._aux_trace,
                name,
                np.empty((0, *value.shape[1:]), value.dtype),
            )
        self._naux = 0
        self._aux_indices = np.empty(0, dtype=np.int64)
        self._aux_pending = []
        self._pending_samples = []
        self._pending_nsamples = 0
        self._pending_bytes = 0
        self._derived_filled = {name: 0 for name in self._derived}
        self._stats_cache = {}

    def vacuum(self):
        """Trim over-allocated space."""
        self._materialize_aux()
        self._materialize_samples()
        self._materialize_derived()
        for name, value in self._trace.items():
            setattr(self._trace, name, np.ascontiguousarray(value[: self._nsamples]))
        for name, value in self._aux_trace.items():
            setattr(
                self._aux_trace,
                name,
                np.ascontiguousarray(value[: self._naux]),
            )
        self._aux_indices = np.ascontiguousarray(self._aux_indices[: self._naux])

    # ---------------- HDF5 backend ----------------

    def get_backend(self, file_path, alloc_nsamples=0, swmr_mode=False):
        """Open (or create) an HDF5 streaming backend."""
        import h5py

        if os.path.isfile(file_path):
            backend = h5py.File(file_path, mode="r+", libver="latest")
            self._check_backend(backend)
            self._grow_backend(backend, alloc_nsamples)
        else:
            backend = h5py.File(file_path, mode="w-", libver="latest")
            self._init_backend(backend, alloc_nsamples)
        if swmr_mode:
            backend.swmr_mode = True
        return backend

    def _check_backend(self, backend):
        if tuple(backend.attrs["shape"]) != self.shape:
            raise RuntimeError(
                f"Backend shape {tuple(backend.attrs['shape'])} does not "
                f"match container shape {self.shape}."
            )

    def _init_backend(self, backend, nsamples):
        backend.attrs["shape"] = self.shape
        backend.attrs["nsamples"] = 0
        backend.attrs["total_mc_steps_per_sample"] = self.total_mc_steps_per_sample
        backend.attrs["metadata"] = str(jsanitize(vars(self.metadata)))
        group = backend.create_group("trace")
        for name, value in self._trace.items():
            group.create_dataset(
                name,
                shape=(nsamples, *value.shape[1:]),
                maxshape=(None, *value.shape[1:]),
                dtype=value.dtype,
            )
        if self._aux_trace.names:
            backend.attrs["naux"] = 0
            aux = backend.create_group("aux_trace")
            for name, value in self._aux_trace.items():
                aux.create_dataset(
                    name,
                    shape=(0, *value.shape[1:]),
                    maxshape=(None, *value.shape[1:]),
                    dtype=value.dtype,
                )
            aux.create_dataset(
                "sample_indices", shape=(0,), maxshape=(None,), dtype=np.int64
            )

    @staticmethod
    def _grow_backend(backend, nsamples):
        for name in backend["trace"]:
            dataset = backend["trace"][name]
            dataset.resize(dataset.shape[0] + nsamples, axis=0)

    def flush_to_backend(self, backend):
        """Write buffered samples to the backend and clear memory."""
        self._materialize_aux()
        self._materialize_samples()
        self._materialize_derived()
        start = int(backend.attrs["nsamples"])
        for name, value in self._trace.items():
            backend["trace"][name][start : start + self._nsamples] = value[
                : self._nsamples
            ]
        backend.attrs["nsamples"] = start + self._nsamples
        if self._naux and "aux_trace" in backend:
            astart = int(backend.attrs.get("naux", 0))
            sample_offset = start  # buffered sample indices are run-local
            aux = backend["aux_trace"]
            for name, value in self._aux_trace.items():
                aux[name].resize(astart + self._naux, axis=0)
                aux[name][astart : astart + self._naux] = value[: self._naux]
            aux["sample_indices"].resize(astart + self._naux, axis=0)
            aux["sample_indices"][astart : astart + self._naux] = (
                self._aux_indices[: self._naux] + sample_offset
            )
            backend.attrs["naux"] = astart + self._naux
        backend.attrs["total_mc_steps_per_sample"] = self.total_mc_steps_per_sample
        backend.flush()
        self.clear()

    def to_hdf5(self, file_path):
        """Save the full container to an HDF5 file."""
        self.vacuum()
        backend = self.get_backend(file_path, alloc_nsamples=self._nsamples)
        backend.attrs["nsamples"] = 0
        nsamples = self._nsamples
        steps = self.total_mc_steps_per_sample
        self.flush_to_backend(backend)
        backend.close()
        # flush clears memory; restore in-memory samples
        self_restored = SampleContainer.from_hdf5(file_path, ensemble=self._ensemble)
        self._trace = self_restored._trace
        self._aux_trace = self_restored._aux_trace
        self._naux = self_restored._naux
        self._aux_indices = self_restored._aux_indices
        self._nsamples = nsamples
        self.total_mc_steps_per_sample = steps

    @classmethod
    def from_hdf5(cls, file_path, swmr_mode=True, ensemble=None):
        """Load a container from an HDF5 file."""
        import h5py

        with h5py.File(file_path, mode="r", swmr=swmr_mode, libver="latest") as f:
            nsamples = int(f.attrs["nsamples"])
            written = {name: np.array(f["trace"][name]) for name in f["trace"]}
            steps = int(f.attrs.get("total_mc_steps_per_sample", 1))
            naux = int(f.attrs.get("naux", 0))
            aux_written = {}
            aux_indices = np.empty(0, dtype=np.int64)
            if "aux_trace" in f:
                aux_written = {
                    name: np.array(f["aux_trace"][name])
                    for name in f["aux_trace"]
                    if name != "sample_indices"
                }
                aux_indices = np.array(f["aux_trace"]["sample_indices"])
        if nsamples < next(iter(written.values())).shape[0]:
            warnings.warn(
                f"The hdf5 file {file_path} contains {nsamples} written "
                "samples of allocated space; loading only written samples."
            )
        trace = Trace(**{k: v[:nsamples] for k, v in written.items()})
        nwalkers = trace.occupancy.shape[1] if nsamples else 1
        specs = {
            "num_sites": written["occupancy"].shape[-1],
            "system_size": 0,
            "natural_parameters": np.zeros(1),
            "num_energy_coefs": 1,
        }
        aux_trace = Trace(**{k: v[:naux] for k, v in aux_written.items()})
        container = cls(
            ensemble if ensemble is not None else specs, trace,
            aux_trace=aux_trace,
        )
        container._nsamples = nsamples
        container._naux = naux
        container._aux_indices = aux_indices[:naux]
        container.total_mc_steps_per_sample = steps
        return container

    def __len__(self):
        return self.num_samples

    def as_dict(self) -> dict:
        self.vacuum()
        return {
            "@module": type(self).__module__,
            "@class": type(self).__name__,
            "ensemble_specs": jsanitize(self._ensemble_specs),
            "metadata": jsanitize(vars(self.metadata)),
            "trace": {k: v.tolist() for k, v in self._trace.items()},
            "trace_dtypes": {k: str(v.dtype) for k, v in self._trace.items()},
            "aux_trace": {k: v.tolist() for k, v in self._aux_trace.items()},
            "aux_dtypes": {
                k: str(v.dtype) for k, v in self._aux_trace.items()
            },
            "aux_indices": self._aux_indices[: self._naux].tolist(),
            "nsamples": self._nsamples,
            "total_mc_steps_per_sample": self.total_mc_steps_per_sample,
            "sublattices": [s.as_dict() for s in self._sublattices],
        }

    @classmethod
    def from_dict(cls, d, ensemble=None):
        trace = Trace(
            **{
                k: np.array(v, dtype=d["trace_dtypes"][k])
                for k, v in d["trace"].items()
            }
        )
        specs = dict(d["ensemble_specs"])
        specs["natural_parameters"] = np.array(specs["natural_parameters"])
        aux_trace = Trace(
            **{
                k: np.array(v, dtype=d["aux_dtypes"][k])
                for k, v in d.get("aux_trace", {}).items()
            }
        )
        container = cls(
            ensemble if ensemble is not None else specs, trace, d.get("metadata"),
            aux_trace=aux_trace,
        )
        container._sublattices = [process_decoded(s) for s in d.get("sublattices", [])]
        container._nsamples = d["nsamples"]
        container._naux = len(d.get("aux_indices", []))
        container._aux_indices = np.array(
            d.get("aux_indices", []), dtype=np.int64
        )
        container.total_mc_steps_per_sample = d["total_mc_steps_per_sample"]
        return container
