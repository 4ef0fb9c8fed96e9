"""StructureWrangler: training data preparation for CE fits.

Mirrors the reference (smol/cofe/wrangling/wrangler.py): holds
ComputedStructureEntry objects, matches each structure to the prim
(supercell matrix + site mapping), computes correlation feature vectors and
normalized property vectors, and provides fit diagnostics (rank, condition
number, Gram matrix, duplicate detection).
"""

from __future__ import annotations

import warnings

import numpy as np

from smol_tpu.crystal.entries import ComputedStructureEntry
from smol_tpu.moca.metadata import Metadata
from smol_tpu.serial import MSONable, jsanitize, process_decoded
from smol_tpu.utils.exceptions import StructureMatchError

__all__ = ["StructureWrangler"]


class StructureWrangler(MSONable):
    """Prepares training structures and properties for CE fitting."""

    def __init__(self, cluster_subspace):
        """Initialize a StructureWrangler.

        Args:
            cluster_subspace: the ClusterSubspace to compute features with.
        """
        self._subspace = cluster_subspace
        self._entries = []
        self._ind_sets = {}
        self._metadata = Metadata("StructureWrangler", applied_filters=[])

    # ---------------- properties ----------------

    @property
    def cluster_subspace(self):
        return self._subspace

    @property
    def num_structures(self) -> int:
        return len(self._entries)

    @property
    def num_features(self) -> int:
        return 0 if not self._entries else len(self._entries[0].data["correlations"])

    @property
    def available_properties(self) -> list:
        return list(
            {
                key
                for entry in self._entries
                for key in entry.data.get("properties", {})
            }
        )

    @property
    def available_indices(self) -> list:
        return list(self._ind_sets.keys())

    @property
    def available_weights(self) -> list:
        return list(
            {
                key
                for entry in self._entries
                for key in entry.data.get("weights", {})
            }
        )

    @property
    def structures(self) -> list:
        return [entry.structure for entry in self._entries]

    @property
    def refined_structures(self) -> list:
        return [entry.data.get("refined_structure") for entry in self._entries]

    @property
    def feature_matrix(self) -> np.ndarray:
        """[n_structures, n_features] normalized correlation vectors."""
        return np.array([entry.data["correlations"] for entry in self._entries])

    @property
    def sizes(self) -> np.ndarray:
        return np.array([entry.data["size"] for entry in self._entries])

    @property
    def occupancy_strings(self) -> list:
        return [entry.data.get("occupancy") for entry in self._entries]

    @property
    def supercell_matrices(self) -> np.ndarray:
        return np.array(
            [entry.data["supercell_matrix"] for entry in self._entries]
        )

    @property
    def structure_site_mappings(self) -> list:
        return [entry.data["site_mapping"] for entry in self._entries]

    @property
    def entries(self) -> list:
        return self._entries

    @property
    def metadata(self):
        return self._metadata

    def data_indices(self, key):
        return self._ind_sets[key]

    # ---------------- diagnostics ----------------

    def get_feature_matrix_rank(self, rows=None, cols=None) -> int:
        matrix = self.feature_matrix
        rows = rows if rows is not None else range(len(matrix))
        cols = cols if cols is not None else range(matrix.shape[1])
        return int(np.linalg.matrix_rank(matrix[np.ix_(list(rows), list(cols))]))

    def get_feature_matrix_orbit_rank(self, orbit_id, rows=None) -> int:
        cols = np.nonzero(self._subspace.function_orbit_ids == orbit_id)[0]
        return self.get_feature_matrix_rank(rows=rows, cols=cols.tolist())

    def get_condition_number(self, rows=None, cols=None, norm_p=2) -> float:
        matrix = self.feature_matrix
        rows = rows if rows is not None else range(len(matrix))
        cols = cols if cols is not None else range(matrix.shape[1])
        return float(
            np.linalg.cond(matrix[np.ix_(list(rows), list(cols))], p=norm_p)
        )

    def get_gram_matrix(self, rows=None, cols=None, normalize=True) -> np.ndarray:
        matrix = self.feature_matrix
        rows = rows if rows is not None else range(len(matrix))
        cols = cols if cols is not None else range(matrix.shape[1])
        matrix = matrix[np.ix_(list(rows), list(cols))]
        if normalize:
            norms = np.linalg.norm(matrix, axis=0)
            norms[norms == 0] = 1
            matrix = matrix / norms
        return matrix.T @ matrix

    def get_duplicate_corr_indices(self, decimals=12):
        """Groups of entry indices with identical correlation vectors."""
        if len(self._entries) == 0:
            return []
        matrix = np.round(self.feature_matrix, decimals=decimals)
        _, inverse = np.unique(matrix, axis=0, return_inverse=True)
        groups = [
            np.nonzero(inverse == group)[0].tolist()
            for group in np.unique(inverse)
        ]
        return [g for g in groups if len(g) > 1]

    def get_matching_corr_duplicate_indices(self, decimals=12, **matcher_kwargs):
        """Duplicate-correlation groups whose structures also match."""
        from smol_tpu.crystal.matcher import StructureMatcher

        matcher = StructureMatcher(**matcher_kwargs)
        duplicates = []
        for group in self.get_duplicate_corr_indices(decimals):
            matching = []
            for i in group:
                found = False
                for sub in matching:
                    if matcher.fit(
                        self._entries[i].structure, self._entries[sub[0]].structure
                    ):
                        sub.append(i)
                        found = True
                        break
                if not found:
                    matching.append([i])
            duplicates += [sub for sub in matching if len(sub) > 1]
        return duplicates

    def get_constant_features(self) -> np.ndarray:
        """Indices of correlation functions constant over the data (bar 0)."""
        matrix = self.feature_matrix
        constant = np.all(matrix == matrix[0], axis=0)
        return np.nonzero(constant[1:])[0] + 1

    def get_similarity_matrix(self, rows=None, cols=None, rtol=1e-5) -> np.ndarray:
        matrix = self.feature_matrix
        rows = list(rows) if rows is not None else list(range(len(matrix)))
        cols = list(cols) if cols is not None else list(range(matrix.shape[1]))
        matrix = matrix[np.ix_(rows, cols)]
        num = len(matrix)
        sim = np.eye(num)
        for i in range(num):
            for j in range(i + 1, num):
                sim[i, j] = sim[j, i] = np.isclose(
                    matrix[i], matrix[j], rtol=rtol
                ).sum() / len(cols)
        return sim

    # ---------------- properties / weights ----------------

    def get_property_vector(self, key, normalize=True) -> np.ndarray:
        """Property vector, optionally normalized per prim cell."""
        properties = np.array(
            [entry.data["properties"][key] for entry in self._entries]
        )
        if normalize:
            properties = properties / self.sizes
        return properties

    def add_data_indices(self, key, indices):
        if not all(0 <= i < self.num_structures for i in indices):
            raise ValueError("One or more indices are out of range.")
        self._ind_sets[key] = list(indices)

    def get_weights(self, key) -> np.ndarray:
        return np.array(
            [entry.data["weights"][key] for entry in self._entries]
        )

    def add_weights(self, key, weights):
        if self.num_structures != len(weights):
            raise AttributeError(
                "Number of weights does not match number of structures."
            )
        for weight, entry in zip(weights, self._entries):
            entry.data.setdefault("weights", {})[key] = weight

    def add_properties(self, key, property_vector):
        if self.num_structures != len(property_vector):
            raise AttributeError(
                "Number of properties does not match number of structures."
            )
        for prop, entry in zip(property_vector, self._entries):
            entry.data.setdefault("properties", {})[key] = prop

    def remove_properties(self, *property_keys):
        for key in property_keys:
            try:
                for entry in self._entries:
                    del entry.data["properties"][key]
            except KeyError:
                warnings.warn(f"Property {key} does not exist.", RuntimeWarning)

    def remove_entry(self, entry):
        if entry in self._entries:
            self._entries.remove(entry)
        else:
            warnings.warn(
                f"Entry {entry} was not found. Nothing has been removed.",
                RuntimeWarning,
            )

    # ---------------- entry processing ----------------

    def add_entry(
        self,
        entry,
        properties=None,
        weights=None,
        supercell_matrix=None,
        site_mapping=None,
        verbose=True,
        raise_failed=False,
    ):
        """Process and add a ComputedStructureEntry to the training set.

        Matches the structure to the prim, computes the normalized
        correlation vector, size, and refined structure
        (reference wrangler.py:455-520).
        """
        processed = self.process_entry(
            entry,
            properties,
            weights,
            supercell_matrix,
            site_mapping,
            verbose,
            raise_failed,
        )
        if processed is not None:
            self._entries.append(processed)
            if verbose:
                self._corr_duplicate_warning(self.num_structures - 1)

    def append_entries(self, entries):
        """Append previously processed entries (feature lengths must match)."""
        for entry in entries:
            if "correlations" not in entry.data:
                raise ValueError("Entry was not processed; use add_entry.")
            if self.num_structures and len(entry.data["correlations"]) != (
                self.num_features
            ):
                raise ValueError("Feature-vector length mismatch.")
            self._entries.append(entry)

    def process_entry(
        self,
        entry,
        properties=None,
        weights=None,
        supercell_matrix=None,
        site_mapping=None,
        verbose=False,
        raise_failed=False,
    ):
        """Match, featurize, and annotate one entry (wrangler.py:670-797)."""
        try:
            structure = entry.structure
            if supercell_matrix is None:
                supercell_matrix = self._subspace.scmatrix_from_structure(structure)
            size = self._subspace.num_prims_from_matrix(supercell_matrix)
            if site_mapping is None:
                supercell = self._subspace.structure.copy().make_supercell(
                    supercell_matrix
                )
                site_mapping = self._subspace.structure_site_mapping(
                    supercell, structure
                )
            occu = self._subspace.occupancy_from_structure(
                structure,
                scmatrix=supercell_matrix,
                site_mapping=site_mapping,
                encode=True,
            )
            corr = self._subspace.corr_from_occupancy(occu, supercell_matrix)
            if self._subspace.external_terms:
                supercell = self._subspace.structure.copy().make_supercell(
                    supercell_matrix
                )
                extras = [
                    np.atleast_1d(term.value_from_occupancy(occu, supercell)) / size
                    for term in self._subspace.external_terms
                ]
                corr = np.concatenate([corr, *extras])
            refined = self._subspace.refine_structure(
                structure, scmatrix=supercell_matrix, site_mapping=site_mapping
            )
        except StructureMatchError as err:
            if raise_failed:
                raise err
            if verbose:
                warnings.warn(
                    f"Unable to match {entry.structure.composition} with "
                    f"energy {entry.energy} to supercell_structure. Throwing "
                    f"out.\n Error message: {err}",
                    UserWarning,
                )
            return None

        data = dict(entry.data)
        data["correlations"] = corr
        data["size"] = size
        data["supercell_matrix"] = np.asarray(supercell_matrix)
        data["site_mapping"] = site_mapping
        data["occupancy"] = occu
        data["refined_structure"] = refined
        data.setdefault("properties", {})["energy"] = entry.energy
        if properties is not None:
            data["properties"].update(properties)
        if weights is not None:
            data["weights"] = dict(weights)
        return ComputedStructureEntry(
            entry.structure, entry.energy, data=data, entry_id=entry.entry_id
        )

    def change_subspace(self, cluster_subspace):
        """Swap the subspace and recompute all feature vectors."""
        self._subspace = cluster_subspace
        self.update_features()

    def update_features(self):
        """Recompute correlation vectors for all entries."""
        for i, entry in enumerate(self._entries):
            scm = entry.data["supercell_matrix"]
            mapping = entry.data["site_mapping"]
            occu = self._subspace.occupancy_from_structure(
                entry.structure, scmatrix=scm, site_mapping=mapping, encode=True
            )
            corr = self._subspace.corr_from_occupancy(occu, scm)
            size = entry.data["size"]
            if self._subspace.external_terms:
                supercell = self._subspace.structure.copy().make_supercell(scm)
                extras = [
                    np.atleast_1d(term.value_from_occupancy(occu, supercell)) / size
                    for term in self._subspace.external_terms
                ]
                corr = np.concatenate([corr, *extras])
            entry.data["correlations"] = corr

    def remove_all_data(self):
        self._entries = []

    def _corr_duplicate_warning(self, index):
        for duplicates in self.get_duplicate_corr_indices():
            if index in duplicates:
                warnings.warn(
                    "The entry just added has a duplicate correlation vector "
                    f"with entries {duplicates}. Consider checking your data.",
                    UserWarning,
                )

    def __len__(self):
        return self.num_structures

    def as_dict(self) -> dict:
        return {
            "@module": type(self).__module__,
            "@class": type(self).__name__,
            "cluster_subspace": self._subspace.as_dict(),
            "entries": [
                self._serialize_entry(entry) for entry in self._entries
            ],
            "ind_sets": jsanitize(self._ind_sets),
            "metadata": jsanitize(vars(self._metadata)),
        }

    @staticmethod
    def _serialize_entry(entry) -> dict:
        d = entry.as_dict()
        data = dict(entry.data)
        data["correlations"] = np.asarray(data["correlations"]).tolist()
        data["supercell_matrix"] = np.asarray(data["supercell_matrix"]).tolist()
        data["occupancy"] = np.asarray(data["occupancy"]).tolist()
        refined = data.get("refined_structure")
        if refined is not None and not isinstance(refined, dict):
            data["refined_structure"] = refined.as_dict()
        d["data"] = jsanitize(data)
        return d

    @classmethod
    def from_dict(cls, d):
        wrangler = cls(process_decoded(d["cluster_subspace"]))
        for ed in d["entries"]:
            entry = ComputedStructureEntry.from_dict(ed)
            entry.data["correlations"] = np.array(entry.data["correlations"])
            entry.data["supercell_matrix"] = np.array(
                entry.data["supercell_matrix"]
            )
            entry.data["occupancy"] = np.array(
                entry.data["occupancy"], dtype=np.int32
            )
            wrangler._entries.append(entry)
        wrangler._ind_sets = d.get("ind_sets", {})
        return wrangler
