"""Parsing of composition-constraint equation strings.

Mirrors the reference constraint grammar (smol/moca/composition/
constraints.py): strings like ``"2 Ag+(0) + Cl-(1) <= 3 Mn2+ + 4"`` are
parsed into (coefficient vector over the "counts" dimensions, intercept,
relation).  A species without a sublattice index applies to every sublattice
containing it; trailing bare numbers are intercepts.
"""

from __future__ import annotations

import re

import numpy as np

from smol_tpu.cofe.space.domain import Vacancy, get_species
from smol_tpu.moca.occu_utils import get_dim_ids_by_sublattice

__all__ = ["parse_constraint_string", "CompositionConstraintsManager"]

_RELATIONS = ("==", "<=", ">=", "=")


def _species_dims(species_str, site_spaces, dim_ids):
    """Dims of a species token, optionally restricted to one sublattice."""
    match = re.match(r"^(.*?)(?:\((\d+)\))?$", species_str.strip())
    sp_str, sublatt = match.group(1), match.group(2)
    sp = get_species(sp_str)
    dims = []
    for sl_id, (sl_species, sl_dims) in enumerate(zip(site_spaces, dim_ids)):
        if sublatt is not None and sl_id != int(sublatt):
            continue
        for s, d in zip(sl_species, sl_dims):
            if (isinstance(sp, Vacancy) and isinstance(s, Vacancy)) or s == sp:
                dims.append(d)
    if not dims:
        raise ValueError(
            f"Species {species_str} not found on any (specified) sublattice."
        )
    return dims


def _parse_side(side_str, site_spaces, dim_ids, num_dims):
    """Parse one side of an equation into (vector a, intercept)."""
    a = np.zeros(num_dims)
    intercept = 0.0
    # operators are space-delimited tokens; species strings may contain +/-
    # operators are standalone space-delimited "+"/"-" words; species strings
    # may themselves contain +/- (e.g. "Li+", "O2-")
    terms, current = [], ["+"]
    for word in side_str.split():
        if word in ("+", "-"):
            if len(current) > 1:
                terms.append(current)
            current = [word]
        else:
            current.append(word)
    if len(current) > 1:
        terms.append(current)
    for term in terms:
        sign, parts = term[0], term[1:]
        factor = 1.0 if sign == "+" else -1.0
        if len(parts) == 1:
            try:
                intercept += factor * float(parts[0])
                continue
            except ValueError:
                coef, species_str = 1.0, parts[0]
        elif len(parts) == 2:
            coef, species_str = float(parts[0]), parts[1]
        else:
            raise ValueError(f"Cannot parse constraint term {' '.join(parts)!r}.")
        for d in _species_dims(species_str, site_spaces, dim_ids):
            a[d] += factor * coef
    return a, intercept


def parse_constraint_string(constraint_str, site_spaces):
    """Parse a constraint string into (a, b, relation).

    Relation is "eq" or "leq" with the constraint in the form a @ n <= b or
    a @ n == b (">=" inputs are negated into "<=").
    """
    dim_ids = get_dim_ids_by_sublattice(site_spaces)
    num_dims = sum(len(s) for s in site_spaces)
    relation = None
    for rel in _RELATIONS:
        if f" {rel} " in constraint_str:
            relation = rel
            left_str, right_str = constraint_str.split(f" {rel} ")
            break
    if relation is None:
        raise ValueError(
            f"Constraint {constraint_str!r} contains no relation symbol "
            f"among {_RELATIONS} (spaces around the symbol are required)."
        )
    a_left, b_left = _parse_side(left_str, site_spaces, dim_ids, num_dims)
    a_right, b_right = _parse_side(right_str, site_spaces, dim_ids, num_dims)
    a = a_left - a_right
    b = b_right - b_left
    if relation in ("==", "="):
        return a, b, "eq"
    if relation == "<=":
        return a, b, "leq"
    return -a, -b, "leq"  # >= becomes <=


class CompositionConstraintsManager:
    """Descriptor normalizing user constraints into {"eq": [...], "leq": [...]}.

    Accepts strings (parsed with the grammar above) or tuples
    ``(a_vector, b, relation)`` / ``(a_vector, b)`` (relation defaults to eq).
    """

    def __set_name__(self, owner, name):
        self.private_name = "_" + name

    def __get__(self, obj, objtype=None):
        return getattr(obj, self.private_name, None)

    def __set__(self, obj, value):
        if value is None:
            setattr(obj, self.private_name, None)
            return
        eqs, leqs = [], []
        for entry in value:
            if isinstance(entry, str):
                a, b, rel = parse_constraint_string(entry, obj.site_spaces)
            elif len(entry) == 3:
                a, b, rel = entry
                a = np.asarray(a, dtype=np.float64)
                if rel == "geq":
                    a, b, rel = -a, -b, "leq"
            else:
                a, b = entry
                a = np.asarray(a, dtype=np.float64)
                rel = "eq"
            (eqs if rel == "eq" else leqs).append((np.asarray(a), float(b)))
        setattr(obj, self.private_name, {"eq": eqs, "leq": leqs})
