"""Visualizing structures, clusters, and orbits.

The matplotlib equivalent of the reference's cluster-visualization
notebook (crystal-toolkit rendering + hand-rolled plotly): plot the
primitive structure, a pair and a triplet cluster, overlay a whole
orbit, and export a viewer-agnostic JSON scene.

Run: python examples/10_visualize_clusters.py
Writes PNGs and a scene JSON into ./viz_out/.
"""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import _bootstrap  # noqa: F401  (sys.path setup for source checkouts)
from smol_tpu.benchmarks.systems import spinel_prim
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.utils.visualize import (
    cluster_scene,
    plot_cluster,
    plot_orbit,
    plot_structure,
    scene_to_json,
)

out = "viz_out"
os.makedirs(out, exist_ok=True)

prim = spinel_prim()  # Li/vac + Mn3/Mn4 spinel with O2- frame
subspace = ClusterSubspace.from_cutoffs(prim, cutoffs={2: 5.3, 3: 3.7})
print(subspace)

# 1. the primitive structure (sites colored by element, cell drawn)
ax = plot_structure(subspace.structure)
ax.figure.savefig(f"{out}/structure.png", dpi=120, bbox_inches="tight")

# 2. a pair and a triplet cluster, with the host structure for context
pair = subspace.orbits_by_size[2][0].base_cluster
print(pair)
ax = plot_cluster(pair, structure=subspace.structure)
ax.figure.savefig(f"{out}/pair_cluster.png", dpi=120, bbox_inches="tight")

triplets = subspace.orbits_by_size.get(3, [])
if triplets:
    triplet = triplets[0].base_cluster
    print(triplet)
    ax = plot_cluster(triplet, structure=subspace.structure)
    ax.figure.savefig(f"{out}/triplet_cluster.png", dpi=120,
                      bbox_inches="tight")

# 3. every symmetry-equivalent copy of the first pair orbit
orbit = subspace.orbits_by_size[2][0]
ax = plot_orbit(orbit, structure=subspace.structure)
ax.figure.savefig(f"{out}/pair_orbit.png", dpi=120, bbox_inches="tight")
print(f"orbit {orbit.id}: {len(orbit.clusters)} equivalent clusters")

# 4. viewer-agnostic export (rebuild the notebook's plotly figure from it)
scene = cluster_scene(pair, structure=subspace.structure)
scene_to_json(scene, filename=f"{out}/pair_scene.json")
print(
    f"wrote {out}/: structure.png, pair_cluster.png, "
    f"{'triplet_cluster.png, ' if triplets else ''}pair_orbit.png, "
    f"pair_scene.json ({len(scene['sites'])} sites, "
    f"{len(scene['bonds'])} bonds, {len(scene['background'])} bg sites)"
)
plt.close("all")
