"""Structure selection for training sets.

Mirrors the reference (smol/cofe/wrangling/select.py): LU full-row-rank
selection, Gaussian incoherence selection, and composition-weighted
multinomial selection.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import lu

__all__ = ["full_row_rank_select", "gaussian_select", "composition_select"]


def full_row_rank_select(feature_matrix, tol=1e-15, nrows=None):
    """Indices of structures giving a full-row-rank feature matrix (LU pivots)."""
    matrix = np.asarray(feature_matrix)
    nrows = nrows if nrows is not None else matrix.shape[0]
    _, _, u_mat = lu(matrix.T)
    pivots = []
    row = 0
    for col in range(min(u_mat.shape[1], nrows)):
        if row >= u_mat.shape[0]:
            break
        if abs(u_mat[row, col]) > tol:
            pivots.append(col)
            row += 1
    return pivots


def gaussian_select(feature_matrix, num_samples, orthogonalize=False, rng=None):
    """Select rows most aligned with random Gaussian directions.

    Incoherence-style selection (reference select.py:42).
    """
    rng = np.random.default_rng(rng)
    matrix = np.asarray(feature_matrix).copy()[:, 1:]  # ignore constant
    matrix = matrix / np.linalg.norm(matrix, axis=1)[:, None]
    gauss = rng.normal(size=(num_samples, matrix.shape[1]))
    if orthogonalize:
        gauss, _ = np.linalg.qr(gauss.T)
        gauss = gauss.T
    gauss = gauss / np.linalg.norm(gauss, axis=1)[:, None]
    indices = set()
    for vector in gauss:
        alignment = matrix @ vector
        for i in np.argsort(-alignment):
            if int(i) not in indices:
                indices.add(int(i))
                break
    return sorted(indices)


def composition_select(composition_vector, composition, cell_sizes, num_samples,
                       rng=None):
    """Multinomially select structures near a target composition.

    Args:
        composition_vector: per-structure species concentration vectors.
        composition: target concentration vector.
        cell_sizes: size (number of prims) of each structure.
        num_samples: number of samples to draw.

    Returns:
        list of selected indices (reference select.py:76).
    """
    rng = np.random.default_rng(rng)
    compositions = np.asarray(composition_vector)
    composition = np.asarray(composition)
    cell_sizes = np.asarray(cell_sizes)
    distances = np.linalg.norm(compositions - composition, axis=1)
    # multinomial-like weights favoring closeness, scaled by cell size
    weights = np.exp(-distances * np.sqrt(cell_sizes))
    weights = weights / weights.sum()
    num_samples = min(num_samples, len(compositions))
    return sorted(
        rng.choice(len(compositions), size=num_samples, replace=False, p=weights)
        .tolist()
    )
