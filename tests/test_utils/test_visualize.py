"""Cluster/structure visualization: scene export and matplotlib rendering.

Covers the capability of the reference's cluster-visualization notebook
(structure view, pair cluster, triplet cluster, orbit overlay) without
crystal-toolkit.
"""

import json

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from smol_tpu.cofe import ClusterSubspace
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.utils.visualize import (
    cell_edges,
    cluster_scene,
    plot_cluster,
    plot_orbit,
    plot_structure,
    scene_to_json,
)


@pytest.fixture(scope="module")
def subspace():
    lattice = Lattice(4.05 * np.eye(3))
    prim = Structure(
        lattice,
        [{"Li+": 0.5, "Mn3+": 0.5}, {"O2-": 1.0}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    return ClusterSubspace.from_cutoffs(prim, cutoffs={2: 6.0, 3: 6.0})


def test_cell_edges_geometry():
    segs = cell_edges(Lattice(np.diag([2.0, 3.0, 4.0])))
    assert segs.shape == (12, 2, 3)
    lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
    # an orthorhombic cell has 4 edges of each axis length
    assert sorted(np.round(lengths, 9)) == [2.0] * 4 + [3.0] * 4 + [4.0] * 4


def test_cluster_scene_counts_and_json(subspace, tmp_path):
    triplet = subspace.orbits_by_size[3][0].base_cluster
    scene = cluster_scene(triplet, structure=subspace.structure)
    assert len(scene["cell"]) == 12
    assert len(scene["sites"]) == 3
    assert len(scene["bonds"]) == 3  # 3 choose 2
    assert len(scene["background"]) == len(subspace.structure)
    assert scene["diameter"] == pytest.approx(triplet.diameter)
    for bond in scene["bonds"]:
        assert bond["length"] <= scene["diameter"] + 1e-9
    out = tmp_path / "scene.json"
    text = scene_to_json(scene, filename=str(out))
    assert json.loads(out.read_text()) == json.loads(text)


def test_plot_structure_and_cluster(subspace):
    ax = plot_structure(subspace.structure)
    # one scatter per distinct element present
    assert len(ax.collections) >= 2
    pair = subspace.orbits_by_size[2][0].base_cluster
    ax2 = plot_cluster(pair, structure=subspace.structure)
    # background sites + 2 cluster sites all scattered
    assert len(ax2.collections) == len(subspace.structure) + 2
    # one bond line + 12 cell edges
    assert len(ax2.lines) == 12 + 1
    matplotlib.pyplot.close("all")


def test_plot_orbit_overlays_all_equivalents(subspace):
    orbit = subspace.orbits_by_size[2][0]
    ax = plot_orbit(orbit)
    # one scatter per equivalent cluster
    assert len(ax.collections) == len(orbit.clusters)
    matplotlib.pyplot.close("all")
