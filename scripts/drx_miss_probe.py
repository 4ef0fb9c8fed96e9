#!/usr/bin/env python
"""Tolerance-sensitivity probe over the DRX matcher misses.

For every entry the native matcher fails to map at the tutorial's
tolerances (ltol=0.15, stol=0.2, angle_tol=15), retries at scaled
tolerances and records the minimal scale that matches plus the failure
stage at the nominal tolerance.  Near-edge entries (those that match at
a small scale-up) are the candidates for the 2-structure recall gap vs
the reference's recorded 238/638 (VERDICT round 3, next item 4).

Writes DRX_MISS_PROBE.json.
"""

import json
import os
import sys
import time
import warnings
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from smol_tpu.cofe import ClusterSubspace, StructureWrangler  # noqa: E402
from smol_tpu.cofe.extern.ewald import EwaldTerm  # noqa: E402
from smol_tpu.crystal.entries import ComputedStructureEntry  # noqa: E402
from smol_tpu.serial import process_decoded  # noqa: E402

SCALES = (1.0, 1.25, 1.5, 2.0)


def build_wrangler(prim, scale):
    subspace = ClusterSubspace.from_cutoffs(
        prim,
        {2: 6.0, 3: 4.0, 4: 2.0},
        basis="sinusoid",
        orthonormal=False,
        ltol=0.15 * scale,
        stol=0.2 * scale,
        angle_tol=15 * scale,
        supercell_size=("O2-",),
    )
    subspace.add_external_term(EwaldTerm())
    return StructureWrangler(subspace)


def main():
    prim = process_decoded(
        json.loads((ROOT / "tests/data/lmo_drx_prim.json").read_text())
    )
    audit = json.loads((ROOT / "DRX_MATCH_AUDIT.json").read_text())
    miss_idx = [m["index"] for m in audit["misses"]]
    entries_path = Path(
        os.environ.get(
            "SMOL_TPU_DRX_ENTRIES",
            "/root/reference/docs/src/notebooks/data/lmo_drx_entries.json",
        )
    )
    raw = json.loads(entries_path.read_text())
    wranglers = {s: build_wrangler(prim, s) for s in SCALES}

    records = {}
    t0 = time.time()
    for k, i in enumerate(miss_idx):
        entry = ComputedStructureEntry.from_dict(raw[i])
        rec = {"index": i, "num_sites": len(entry.structure)}
        for s in SCALES:
            try:
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    p = wranglers[s].process_entry(entry, raise_failed=True)
                ok = p is not None
                err = None
            except Exception as exc:  # noqa: BLE001
                ok = False
                err = f"{type(exc).__name__}: {exc}"
            if s == 1.0:
                rec["stage"] = err
            if ok:
                rec["min_scale"] = s
                break
        records[i] = rec
        if (k + 1) % 25 == 0:
            n_near = sum("min_scale" in r for r in records.values())
            print(
                f"{k + 1}/{len(miss_idx)}: {n_near} match at <= x"
                f"{SCALES[-1]} ({time.time() - t0:.0f}s)",
                flush=True,
            )

    out = {
        "scales": SCALES,
        "nominal": {"ltol": 0.15, "stol": 0.2, "angle_tol": 15},
        "near_misses": sorted(
            (r for r in records.values() if "min_scale" in r),
            key=lambda r: (r["min_scale"], r["index"]),
        ),
        "hard_misses": sum("min_scale" not in r for r in records.values()),
        "stage_counts": {},
    }
    for r in records.values():
        stage = (r.get("stage") or "none").split(".")[0]
        out["stage_counts"][stage] = out["stage_counts"].get(stage, 0) + 1
    (ROOT / "DRX_MISS_PROBE.json").write_text(json.dumps(out, indent=1))
    print(
        f"done: {len(out['near_misses'])} near-misses "
        f"(match at <= x{SCALES[-1]}), {out['hard_misses']} hard; "
        f"stages={out['stage_counts']}"
    )


if __name__ == "__main__":
    main()
