"""Lightweight JSON serialization protocol.

The reference relies on ``monty.json.MSONable`` for every public object
(smol uses ``as_dict``/``from_dict`` with ``@module``/``@class`` tags).  monty
is not available here, so this module provides a self-contained equivalent:

- :class:`MSONable`: mixin providing the serialization contract.
- :func:`jsanitize`, :class:`SmolJSONEncoder`: numpy-aware JSON encoding.
- :func:`loads_obj` / :func:`dumps_obj`: round-trip helpers resolving the
  ``@module``/``@class`` tags back to classes.
"""

from __future__ import annotations

import importlib
import json

import numpy as np


class MSONable:
    """Mixin providing dict-based JSON serialization.

    Subclasses should override :meth:`as_dict` and :meth:`from_dict`.  The
    default implementation serializes ``__init__`` args found as identically
    named attributes (with or without a leading underscore).
    """

    def as_dict(self) -> dict:
        """Return a JSON-serializable dict representation."""
        d = {
            "@module": type(self).__module__,
            "@class": type(self).__name__,
        }
        import inspect

        sig = inspect.signature(type(self).__init__)
        for name in list(sig.parameters)[1:]:
            for attr in (name, "_" + name):
                if hasattr(self, attr):
                    d[name] = jsanitize(getattr(self, attr))
                    break
        return d

    @classmethod
    def from_dict(cls, d: dict):
        """Reconstruct an instance from its dict representation."""
        kwargs = {
            k: process_decoded(v) for k, v in d.items() if not k.startswith("@")
        }
        return cls(**kwargs)

    def to_json(self) -> str:
        """Serialize to a JSON string."""
        return json.dumps(self.as_dict(), cls=SmolJSONEncoder)


def jsanitize(obj):
    """Recursively convert an object into JSON-serializable primitives."""
    if isinstance(obj, MSONable):
        return obj.as_dict()
    if isinstance(obj, dict):
        return {_key_str(k): jsanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [jsanitize(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    return obj


def _key_str(key):
    if isinstance(key, (str, int, float, bool)) or key is None:
        return key
    return str(key)


class SmolJSONEncoder(json.JSONEncoder):
    """JSON encoder handling numpy scalars/arrays and MSONable objects."""

    def default(self, o):  # noqa: D102
        if isinstance(o, MSONable):
            return o.as_dict()
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        if isinstance(o, np.bool_):
            return bool(o)
        return super().default(o)


def process_decoded(obj):
    """Recursively resolve ``@module``/``@class`` tagged dicts to objects.

    Documents tagged with pymatgen/numpy modules (as written by the
    reference through monty) are translated to the native crystal types
    via :mod:`smol_tpu.crystal.pmg_compat`.
    """
    if isinstance(obj, dict):
        if "@class" in obj and "@module" in obj:
            from smol_tpu.crystal import pmg_compat

            if pmg_compat.is_pmg_dict(obj):
                decoded = pmg_compat.decode_pmg(obj)
                if decoded is not None:
                    return decoded
            mod = importlib.import_module(obj["@module"])
            cls = getattr(mod, obj["@class"])
            return cls.from_dict(obj)
        return {k: process_decoded(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [process_decoded(v) for v in obj]
    return obj


def dumps_obj(obj) -> str:
    """Serialize any MSONable (or plain) object to JSON."""
    return json.dumps(jsanitize(obj), cls=SmolJSONEncoder)


def loads_obj(s: str):
    """Load an object serialized with :func:`dumps_obj`."""
    return process_decoded(json.loads(s))
