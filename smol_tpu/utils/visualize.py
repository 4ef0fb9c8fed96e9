"""Cluster and structure visualization without external viewers.

Ports the capability of the reference's cluster-visualization workflow
(reference docs/src/notebooks/cluster-visualization.ipynb), which leans
on crystal-toolkit jupyter rendering plus a hand-rolled plotly example.
Here the same three views — primitive structure, a single cluster, and a
whole orbit — render with matplotlib (always available in this stack),
and :func:`cluster_scene` exports a viewer-agnostic JSON scene (cell
edges, sites, bonds) for users who prefer plotly/crystal-toolkit.

Nothing in this module touches JAX: visualization is host-side tooling.
"""

from __future__ import annotations

import json

import numpy as np

__all__ = [
    "cell_edges",
    "cluster_scene",
    "scene_to_json",
    "plot_structure",
    "plot_cluster",
    "plot_orbit",
]

# Muted CPK-ish colors for common species; anything else falls through to
# a stable categorical cycle keyed by first appearance.
_ELEMENT_COLORS = {
    "H": "#e8e8e8", "Li": "#cc80ff", "O": "#d43d2f", "F": "#90e050",
    "Na": "#ab5cf2", "Mg": "#8aff00", "Al": "#bfa6a6", "Si": "#f0c8a0",
    "Cl": "#1ff01f", "Ca": "#3dff00", "Ti": "#bfc2c7", "Cr": "#8a99c7",
    "Mn": "#9c7ac7", "Fe": "#e06633", "Co": "#f090a0", "Ni": "#50d050",
    "Cu": "#c88033", "Zn": "#7d80b0", "Br": "#a62929", "Vacancy": "#bbbbbb",
}
_FALLBACK_CYCLE = (
    "#4c72b0", "#dd8452", "#55a868", "#c44e52",
    "#8172b3", "#937860", "#da8bc3", "#8c8c8c",
)


def _element_symbol(species) -> str:
    """Best-effort bare element symbol for a site's species/composition."""
    # Composition-like: take the dominant entry
    items = getattr(species, "items", None)
    if callable(items):
        entries = list(items())
        if entries:
            species = max(entries, key=lambda kv: kv[1])[0]
    sym = getattr(species, "symbol", None) or getattr(species, "element", None)
    if sym is None:
        sym = str(species)
    sym = str(sym)
    # strip any oxidation-state suffix ("Mn3+" -> "Mn")
    return sym.rstrip("0123456789+-") or sym


def _color_for(symbol: str, seen: dict) -> str:
    if symbol in _ELEMENT_COLORS:
        return _ELEMENT_COLORS[symbol]
    if symbol not in seen:
        seen[symbol] = _FALLBACK_CYCLE[len(seen) % len(_FALLBACK_CYCLE)]
    return seen[symbol]


def cell_edges(lattice) -> np.ndarray:
    """The 12 unit-cell edges as a (12, 2, 3) cartesian segment array."""
    m = np.asarray(lattice.matrix, dtype=np.float64)
    corners = np.array(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        dtype=np.float64,
    )
    cart = corners @ m
    segs = []
    for a in range(8):
        for b in range(a + 1, 8):
            # an edge joins corners differing in exactly one frac axis
            if np.sum(np.abs(corners[a] - corners[b])) == 1:
                segs.append((cart[a], cart[b]))
    return np.array(segs)


def cluster_scene(cluster, structure=None) -> dict:
    """Viewer-agnostic scene dict for a cluster (and optional host structure).

    Returns ``{"cell": [...12 edges...], "sites": [...], "bonds": [...],
    "background": [...]}`` with cartesian coordinates throughout — enough
    to rebuild the reference notebook's plotly figure verbatim, or feed
    any 3D viewer.
    """
    lat = cluster.lattice
    cart = lat.get_cartesian_coords(cluster.frac_coords)
    seen: dict = {}
    sites = []
    for space, xyz in zip(cluster.site_spaces, cart):
        sym = _element_symbol(space)
        sites.append(
            {
                "element": sym,
                "cart": [float(v) for v in xyz],
                "color": _color_for(sym, seen),
            }
        )
    n = len(cart)
    bonds = [
        {
            "ends": [i, j],
            "length": float(np.linalg.norm(cart[i] - cart[j])),
        }
        for i in range(n)
        for j in range(i + 1, n)
    ]
    background = []
    if structure is not None:
        for site in structure.sites:
            sym = _element_symbol(site.species)
            background.append(
                {
                    "element": sym,
                    "cart": [float(v) for v in site.coords],
                    "color": _color_for(sym, seen),
                }
            )
    return {
        "cell": [[list(map(float, p)) for p in seg] for seg in cell_edges(lat)],
        "sites": sites,
        "bonds": bonds,
        "background": background,
        "diameter": float(cluster.diameter) if n > 1 else 0.0,
    }


def scene_to_json(scene: dict, filename: str | None = None) -> str:
    """Serialize a :func:`cluster_scene` dict; optionally write it out."""
    text = json.dumps(scene, indent=1)
    if filename is not None:
        with open(filename, "w") as fh:
            fh.write(text)
    return text


def _new_axes():
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.set_xlabel("x (Å)")
    ax.set_ylabel("y (Å)")
    ax.set_zlabel("z (Å)")
    try:
        ax.set_box_aspect((1, 1, 1))
    except AttributeError:
        pass
    return ax


def _draw_cell(ax, lattice, color="0.6"):
    for a, b in cell_edges(lattice):
        ax.plot(*zip(a, b), color=color, lw=0.8, zorder=1)


def _legend_unique(ax):
    handles, labels = ax.get_legend_handles_labels()
    uniq = dict(zip(labels, handles))
    if uniq:
        ax.legend(uniq.values(), uniq.keys(), loc="upper right")


def plot_structure(structure, ax=None, show_cell=True, size=120.0):
    """3D scatter of a (primitive or super) structure's sites.

    Equivalent of typing the structure name in the reference's
    crystal-toolkit notebook cell.  Returns the matplotlib Axes.
    """
    if ax is None:
        ax = _new_axes()
    if show_cell:
        _draw_cell(ax, structure.lattice)
    seen: dict = {}
    by_symbol: dict = {}
    for site in structure.sites:
        sym = _element_symbol(site.species)
        by_symbol.setdefault(sym, []).append(site.coords)
    for sym, pts in by_symbol.items():
        pts = np.asarray(pts)
        ax.scatter(
            pts[:, 0], pts[:, 1], pts[:, 2],
            s=size, color=_color_for(sym, seen),
            edgecolors="k", linewidths=0.5, label=sym, depthshade=False,
        )
    _legend_unique(ax)
    return ax


def plot_cluster(cluster, structure=None, ax=None, size=160.0,
                 bond_color="#333333"):
    """Plot one cluster: its sites joined by bonds, inside the unit cell.

    Pass the host ``structure`` (e.g. ``subspace.structure``) to render
    the remaining lattice sites faintly for context.  Returns the Axes.
    """
    if ax is None:
        ax = _new_axes()
    scene = cluster_scene(cluster, structure)
    _draw_cell(ax, cluster.lattice)
    for entry in scene["background"]:
        x, y, z = entry["cart"]
        ax.scatter([x], [y], [z], s=size * 0.25, color=entry["color"],
                   alpha=0.25, depthshade=False)
    cart = np.array([s["cart"] for s in scene["sites"]])
    for bond in scene["bonds"]:
        i, j = bond["ends"]
        ax.plot(*zip(cart[i], cart[j]), color=bond_color, lw=2.0, zorder=2)
    seen: dict = {}
    for entry in scene["sites"]:
        x, y, z = entry["cart"]
        ax.scatter(
            [x], [y], [z], s=size, color=entry["color"],
            edgecolors="k", linewidths=0.8, label=entry["element"],
            depthshade=False, zorder=3,
        )
    _legend_unique(ax)
    if len(cart) > 1:
        ax.set_title(f"{len(cart)}-site cluster, diameter "
                     f"{scene['diameter']:.3f} Å")
    return ax


def plot_orbit(orbit, structure=None, ax=None, size=110.0):
    """Overlay every symmetry-equivalent cluster of an orbit.

    Each equivalent cluster's bonds get one color from the fallback
    cycle; sites keep element colors.  Returns the Axes.
    """
    if ax is None:
        ax = _new_axes()
    _draw_cell(ax, orbit.base_cluster.lattice)
    if structure is not None:
        seen: dict = {}
        for site in structure.sites:
            sym = _element_symbol(site.species)
            ax.scatter(*[[v] for v in site.coords], s=size * 0.25,
                       color=_color_for(sym, seen), alpha=0.2,
                       depthshade=False)
    for k, cluster in enumerate(orbit.clusters):
        cart = cluster.lattice.get_cartesian_coords(cluster.frac_coords)
        color = _FALLBACK_CYCLE[k % len(_FALLBACK_CYCLE)]
        n = len(cart)
        for i in range(n):
            for j in range(i + 1, n):
                ax.plot(*zip(cart[i], cart[j]), color=color, lw=1.2,
                        alpha=0.8, zorder=2)
        ax.scatter(cart[:, 0], cart[:, 1], cart[:, 2], s=size,
                   color=color, edgecolors="k", linewidths=0.5,
                   depthshade=False, zorder=3)
    ax.set_title(f"orbit {orbit.id}: {len(orbit.clusters)} equivalent "
                 f"clusters ({len(orbit.base_cluster)} sites)")
    return ax
