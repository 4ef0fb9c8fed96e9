"""Device (JAX) Ewald energy kernels.

The full configuration energy is a dense quadratic form ``b @ M @ b`` on the
MXU; the single-flip delta is two row gathers + masked dots (the O(n)
analog of the reference's native kernel, smol/utils/cluster/ewald.pyx:9).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["ewald_occupancy_vector", "ewald_energy", "delta_ewald_single_flip"]


@partial(jax.jit, static_argnames=("num_ewald_sites",))
def ewald_occupancy_vector(occu, ewald_inds, num_ewald_sites: int):
    """0/1 occupied-row vector [n_ew] f64 from an encoded occupancy.

    ewald_inds[site, code] = Ewald row or -1 for vacancies.
    """
    rows = ewald_inds[jnp.arange(occu.shape[0]), occu]  # [n_sites]
    b = jnp.zeros(num_ewald_sites + 1, dtype=jnp.float64)
    b = b.at[jnp.where(rows >= 0, rows, num_ewald_sites)].set(1.0)
    return b[:-1]


@jax.jit
def ewald_energy(occu, ewald_matrix, ewald_inds):
    """Total Ewald energy of an occupancy: b @ M @ b (MXU matvec + dot)."""
    b = ewald_occupancy_vector(occu, ewald_inds, ewald_matrix.shape[0])
    return b @ (ewald_matrix @ b)


@jax.jit
def delta_ewald_single_flip(occu, site, new_code, ewald_matrix, ewald_inds):
    """Energy change of flipping ``site`` to ``new_code``.

    With b_c the occupied vector of all OTHER sites (the flipped site's row
    zeroed), removing row r and adding row a gives
    dE = 2(M[a].b_c - M[r].b_c) + M[aa] - M[rr], each term masked out when
    the corresponding row is a vacancy (-1).  The removed row must not enter
    the dots: co-located rows of one site carry near-singular matrix entries
    that physical kernels never touch (matches ewald.pyx:43-58, which loops
    per site and so never reads M[a, r]).
    """
    n_ew = ewald_matrix.shape[0]
    b = ewald_occupancy_vector(occu, ewald_inds, n_ew)
    a = ewald_inds[site, new_code]
    r = ewald_inds[site, occu[site]]
    a_valid = a >= 0
    r_valid = r >= 0
    a_safe = jnp.where(a_valid, a, 0)
    r_safe = jnp.where(r_valid, r, 0)
    # zero the flipped site's occupied row out of b
    b_c = jnp.where(r_valid, b.at[r_safe].set(0.0), b)
    ma_b = jnp.where(a_valid, ewald_matrix[a_safe] @ b_c, 0.0)
    mr_b = jnp.where(r_valid, ewald_matrix[r_safe] @ b_c, 0.0)
    maa = jnp.where(a_valid, ewald_matrix[a_safe, a_safe], 0.0)
    mrr = jnp.where(r_valid, ewald_matrix[r_safe, r_safe], 0.0)
    return 2 * (ma_b - mr_b) + maa - mrr
