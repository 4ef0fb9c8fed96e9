"""ComputedStructureEntry: a structure with a computed property (energy).

Light replacement for pymatgen.entries.computed_entries used by the
reference StructureWrangler.
"""

from __future__ import annotations

from smol_tpu.serial import MSONable, jsanitize, process_decoded

__all__ = ["ComputedStructureEntry"]


class ComputedStructureEntry(MSONable):
    """A structure plus its computed total energy and auxiliary data."""

    def __init__(self, structure, energy, data=None, entry_id=None):
        self.structure = structure
        self.energy = float(energy)
        self.data = data or {}
        self.entry_id = entry_id

    @property
    def composition(self):
        return self.structure.composition

    @property
    def energy_per_atom(self) -> float:
        return self.energy / self.structure.composition.num_atoms

    def __repr__(self):
        return (
            f"ComputedStructureEntry({self.structure.composition}, "
            f"E={self.energy:.6f})"
        )

    def as_dict(self) -> dict:
        return {
            "@module": type(self).__module__,
            "@class": type(self).__name__,
            "structure": self.structure.as_dict(),
            "energy": self.energy,
            "data": jsanitize(self.data),
            "entry_id": self.entry_id,
        }

    @classmethod
    def from_dict(cls, d):
        return cls(
            process_decoded(d["structure"]),
            d["energy"],
            data=d.get("data"),
            entry_id=d.get("entry_id"),
        )
