"""Workflow save/load: one object per class in a JSON work file.

Mirrors smol/io.py: save_work/load_work serialize a set of framework
objects (subspace, wrangler, expansion, ensemble, container, ...) keyed by
class name.
"""

from __future__ import annotations

import json

from smol_tpu.serial import SmolJSONEncoder, process_decoded

__all__ = ["save_work", "load_work"]


def save_work(file_path, *objects):
    """Save a set of MSONable framework objects to a JSON work file.

    Only one object per class is allowed (objects are keyed by class name).
    """
    work = {}
    for obj in objects:
        name = type(obj).__name__
        if name in work:
            raise AttributeError(
                f"More than one {name} object was given; only one instance "
                "per class can be saved."
            )
        work[name] = obj.as_dict()
    with open(file_path, "w", encoding="utf-8") as handle:
        json.dump(work, handle, cls=SmolJSONEncoder)


def load_work(file_path) -> dict:
    """Load a work file back into {class name: object}."""
    with open(file_path, encoding="utf-8") as handle:
        work = json.load(handle)
    return {name: process_decoded(d) for name, d in work.items()}
