"""Thermodynamic ensemble: processor + sublattices + chemical potentials.

Mirrors the reference Ensemble (smol/moca/ensemble.py): the natural
parameters are the processor coefficients plus -1 for the chemical work when
chemical potentials are set; the per-(site, code) chemical-potential table
feeds both host feature evaluation and the device MC step.
"""

from __future__ import annotations

import numpy as np

from smol_tpu.cofe.space.domain import get_species
from smol_tpu.moca.processor.base import Processor
from smol_tpu.moca.processor.composite import CompositeProcessor
from smol_tpu.moca.processor.ewald import EwaldProcessor
from smol_tpu.moca.processor.expansion import (
    ClusterDecompositionProcessor,
    ClusterExpansionProcessor,
)
from smol_tpu.moca.sublattice import Sublattice
from smol_tpu.serial import MSONable, jsanitize, process_decoded

__all__ = ["ChemicalPotentialManager", "Ensemble"]


class ChemicalPotentialManager:
    """Descriptor managing an Ensemble's chemical potentials.

    Mirrors the reference's descriptor (smol/moca/ensemble.py:22-99): setting
    chemical potentials validates and species-maps the dict, builds the
    per-(site, code) mu table, appends the -1 natural parameter for the
    chemical-work feature, and records the values in ``thermo_boundaries``;
    setting ``None`` removes all of that again.
    """

    natural_parameter: float = -1.0

    def __set_name__(self, owner, name):
        self.private_name = "_" + name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        data = getattr(obj, self.private_name, None)
        return None if data is None else data["value"]

    def __set__(self, obj, value):
        if value is None:
            if getattr(obj, self.private_name, None) is not None:
                setattr(obj, self.private_name, None)
                obj.thermo_boundaries.pop("chemical_potentials", None)
                if obj.num_energy_coefs < len(obj._params):
                    obj._params = obj._params[:-1]
            return
        value = {get_species(k): v for k, v in value.items()}
        value = {k: v for k, v in value.items() if k in obj.species}
        if set(value.keys()) != set(obj.species):
            raise ValueError(
                "Chemical potentials are missing species; need values for "
                f"each of: {obj.species}"
            )
        if getattr(obj, self.private_name, None) is None:
            obj._params = np.append(obj._params, self.natural_parameter)
        setattr(
            obj,
            self.private_name,
            {"value": value, "table": self._build_mu_table(obj, value)},
        )
        obj.thermo_boundaries["chemical_potentials"] = {
            str(k): v for k, v in value.items()
        }

    @staticmethod
    def _build_mu_table(obj, value) -> np.ndarray:
        """[num_sites, max_code+1] f64 per-(site, code) chemical potentials."""
        num_cols = max(max(sl.encoding) for sl in obj.sublattices) + 1
        table = np.zeros((obj.num_sites, num_cols))
        for sublatt in obj.active_sublattices:
            ordered = [value[sp] for sp in sublatt.site_space]
            table[sublatt.sites[:, None], sublatt.encoding] = ordered
        return table


class Ensemble(MSONable):
    """A thermodynamic ensemble over a fixed supercell."""

    natural_parameter: float = -1.0  # for the chemical work feature

    chemical_potentials = ChemicalPotentialManager()

    def __init__(self, processor, sublattices=None, chemical_potentials=None):
        if sublattices is None:
            sublattices = processor.get_sublattices()
        self.thermo_boundaries = {}
        self._params = np.asarray(processor.coefs, dtype=np.float64)
        self._processor = processor
        self._sublattices = sublattices
        self._chemical_potentials = None
        if chemical_potentials is not None:
            self.chemical_potentials = chemical_potentials

    @classmethod
    def from_cluster_expansion(
        cls,
        cluster_expansion,
        supercell_matrix,
        processor_type="decomposition",
        use_concentration=False,
        **kwargs,
    ):
        """Build an ensemble with the appropriate processor(s).

        Mirrors reference ensemble.py:132-217: decomposition (default) or
        expansion processor, composed with an EwaldProcessor when the
        subspace carries an EwaldTerm.
        """
        subspace = cluster_expansion.cluster_subspace
        if processor_type == "decomposition":
            def make_ce_processor():
                return ClusterDecompositionProcessor(
                    subspace,
                    supercell_matrix,
                    cluster_expansion.cluster_interaction_tensors,
                    use_concentration=use_concentration,
                )
        elif processor_type == "expansion":
            def make_ce_processor():
                n_ext = len(subspace.external_terms)
                coefs = (
                    cluster_expansion.coefs[:-n_ext]
                    if n_ext
                    else cluster_expansion.coefs
                )
                return ClusterExpansionProcessor(
                    subspace, supercell_matrix, coefs,
                    use_concentration=use_concentration,
                )
        else:
            raise ValueError(f"Processor type {processor_type} not supported!")

        if len(subspace.external_terms) > 0:
            processor = CompositeProcessor(
                subspace, supercell_matrix, use_concentration=use_concentration
            )
            processor.add_processor(make_ce_processor())
            ewald_term = subspace.external_terms[0]
            processor.add_processor(
                EwaldProcessor(
                    subspace,
                    supercell_matrix,
                    ewald_term=ewald_term,
                    coefficient=cluster_expansion.coefs[-1],
                    use_concentration=use_concentration,
                )
            )
        else:
            processor = make_ce_processor()
        return cls(processor, **kwargs)

    # ---------------- properties ----------------

    @property
    def processor(self) -> Processor:
        return self._processor

    @property
    def num_sites(self) -> int:
        return self._processor.num_sites

    @property
    def num_energy_coefs(self) -> int:
        return len(self._processor.coefs)

    @property
    def system_size(self) -> int:
        return self._processor.size

    @property
    def sublattices(self) -> list[Sublattice]:
        return self._sublattices

    @property
    def active_sublattices(self) -> list[Sublattice]:
        return [s for s in self._sublattices if s.is_active]

    @property
    def restricted_sites(self) -> np.ndarray:
        return np.concatenate([s.restricted_sites for s in self._sublattices])

    @property
    def species(self) -> list:
        return list(
            {sp for subl in self.active_sublattices for sp in subl.site_space}
        )

    @property
    def natural_parameters(self) -> np.ndarray:
        return self._params

    @property
    def chemical_potential_table(self):
        """[num_sites, max_code+1] f64 per-(site, code) chemical potentials."""
        if self._chemical_potentials is None:
            return None
        return self._chemical_potentials["table"]

    # ---------------- feature evaluation (host) ----------------

    def compute_feature_vector(self, occupancy) -> np.ndarray:
        features = self._processor.compute_feature_vector(occupancy)
        if self._chemical_potentials is not None:
            table = self._chemical_potentials["table"]
            work = float(table[np.arange(len(occupancy)), occupancy].sum())
            features = np.append(features, work)
        return features

    def compute_feature_vector_change(self, occupancy, step) -> np.ndarray:
        delta = self._processor.compute_feature_vector_change(occupancy, step)
        if self._chemical_potentials is not None:
            table = self._chemical_potentials["table"]
            dwork = sum(
                table[site][code] - table[site][occupancy[site]]
                for site, code in step
            )
            delta = np.append(delta, dwork)
        return delta

    # ---------------- sublattice management ----------------

    def split_sublattice_by_species(self, sublattice_id, occu, species_in_partitions):
        """Split a sublattice by its occupied species (topotactic workflows)."""
        splits = self._sublattices[sublattice_id].split_by_species(
            occu, species_in_partitions
        )
        self._sublattices = (
            self._sublattices[:sublattice_id]
            + splits
            + self._sublattices[sublattice_id + 1 :]
        )
        if self.chemical_potentials is not None:
            value = {
                sp: mu for sp, mu in self.chemical_potentials.items()
                if sp in self.species
            }
            self._chemical_potentials = None
            self._params = self._params[:-1]
            self.chemical_potentials = value

    def restrict_sites(self, sites):
        for sublattice in self._sublattices:
            sublattice.restrict_sites(sites)

    def reset_restricted_sites(self):
        for sublattice in self._sublattices:
            sublattice.reset_restricted_sites()

    def as_dict(self) -> dict:
        return {
            "@module": type(self).__module__,
            "@class": type(self).__name__,
            "thermo_boundaries": jsanitize(self.thermo_boundaries),
            "processor": self._processor.as_dict(),
            "sublattices": [s.as_dict() for s in self._sublattices],
        }

    @classmethod
    def from_dict(cls, d):
        ensemble = cls(
            Processor.from_dict(d["processor"]),
            [process_decoded(s) for s in d["sublattices"]],
        )
        mus = d.get("thermo_boundaries", {}).get("chemical_potentials")
        if mus is not None:
            ensemble.chemical_potentials = mus
        return ensemble
