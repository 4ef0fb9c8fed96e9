"""Sharded single-supercell correlation evaluation (SURVEY section 5).

Parity of the mesh-sharded pair-table evaluation against the single-device
kernel on large supercells, over the suite's virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from smol_tpu.benchmarks.systems import fcc_binary_prim
from smol_tpu.cofe import ClusterSubspace
from smol_tpu.ops.correlations import corr_from_occupancy, to_device
from smol_tpu.ops.packing import pack_supercell
from smol_tpu.ops.sharded import make_sharded_corr_fn


@pytest.mark.parametrize("diag", [4, 8], ids=["4x4x4", "8x8x8"])
def test_sharded_corr_parity(diag):
    prim = fcc_binary_prim()
    subspace = ClusterSubspace.from_cutoffs(prim, {2: 5.0, 3: 3.0})
    scm = np.diag([diag] * 3)
    packed = pack_supercell(subspace, scm)
    assert packed.num_sites == diag**3

    mesh = Mesh(np.array(jax.devices()), ("clusters",))
    fn = make_sharded_corr_fn(packed, mesh)

    rng = np.random.default_rng(7)
    dp = to_device(packed)
    for seed in range(3):
        occu = rng.integers(0, 2, packed.num_sites).astype(np.int32)
        ref = corr_from_occupancy(occu, dp, packed.num_corr)
        out = fn(occu)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=1e-12
        )
