#!/usr/bin/env python
"""Full-638 DRX matcher audit: which entries fail to map, and why.

Runs the reference LMO-DRX tutorial's wrangling (subspace settings from
reference lmo-drx-ce-mc.ipynb) over ALL 638 relaxed DFT entries
(reference docs/src/notebooks/data/lmo_drx_entries.json) and records a
per-entry verdict to DRX_MATCH_AUDIT.json.  The reference notebook's
recorded output is a (238, 387) feature matrix — 238 matched structures;
this artifact tracks the native matcher against that number (VERDICT
round 3, missing item 3 / next-round item 4).

Usage: python scripts/drx_match_audit.py [entries.json] [--limit N]
"""

import json
import sys
import time
import warnings
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np  # noqa: E402

from smol_tpu.cofe import ClusterSubspace, StructureWrangler  # noqa: E402
from smol_tpu.cofe.extern.ewald import EwaldTerm  # noqa: E402
from smol_tpu.crystal.entries import ComputedStructureEntry  # noqa: E402
from smol_tpu.serial import process_decoded  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    limit = None
    for a in sys.argv[1:]:
        if a.startswith("--limit"):
            limit = int(a.split("=", 1)[1])
    entries_path = (
        Path(args[0])
        if args
        else Path("/root/reference/docs/src/notebooks/data/lmo_drx_entries.json")
    )
    prim = process_decoded(
        json.loads((ROOT / "tests/data/lmo_drx_prim.json").read_text())
    )
    subspace = ClusterSubspace.from_cutoffs(
        prim,
        {2: 6.0, 3: 4.0, 4: 2.0},
        basis="sinusoid",
        orthonormal=False,
        ltol=0.15,
        stol=0.2,
        angle_tol=15,
        supercell_size=("O2-",),
    )
    subspace.add_external_term(EwaldTerm())
    wrangler = StructureWrangler(subspace)

    raw = json.loads(entries_path.read_text())
    if limit:
        raw = raw[:limit]
    records = []
    t0 = time.time()
    for i, ed in enumerate(raw):
        entry = ComputedStructureEntry.from_dict(ed)
        n_before = wrangler.num_structures
        err = None
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                wrangler.add_entry(entry, verbose=False)
        except Exception as exc:  # noqa: BLE001 - audit records all causes
            err = f"{type(exc).__name__}: {exc}"
        matched = wrangler.num_structures > n_before
        records.append(
            {
                "index": i,
                "matched": bool(matched),
                "num_sites": len(entry.structure),
                "composition": str(entry.structure.composition),
                "error": err if not matched else None,
            }
        )
        if (i + 1) % 50 == 0:
            n_ok = sum(r["matched"] for r in records)
            print(
                f"{i + 1}/{len(raw)}: matched {n_ok} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    n_ok = sum(r["matched"] for r in records)
    out = {
        "entries": len(raw),
        "matched": n_ok,
        "reference_recorded": 238,
        "feature_width": subspace.num_corr_functions
        + len(subspace.external_terms),
        "misses": [r for r in records if not r["matched"]],
    }
    (ROOT / "DRX_MATCH_AUDIT.json").write_text(json.dumps(out, indent=1))
    print(
        f"done: {n_ok}/{len(raw)} matched "
        f"(reference recorded 238/638); misses="
        f"{[r['index'] for r in out['misses']]}"
    )


if __name__ == "__main__":
    main()
