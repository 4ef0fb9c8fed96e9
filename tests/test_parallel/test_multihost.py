"""Two-process multi-host mesh test (CPU-simulated pod).

Spawns two subprocesses that join one ``jax.distributed`` job (each with 4
virtual CPU devices), build the global walker mesh spanning all 8 devices,
and run a jitted parallel-tempering exchange on globally sharded walker
state — the cross-process collective path of SURVEY.md section 2.6.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

WORKER = textwrap.dedent(
    """
    import sys

    coordinator, pid = sys.argv[1], int(sys.argv[2])

    import jax
    import numpy as np

    from smol_tpu.parallel import distributed
    from smol_tpu.parallel.mesh import shard_walker_state
    from smol_tpu.parallel.tempering import tempering_exchange

    ok = distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert ok, "distributed runtime not active"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    mesh = distributed.global_walker_mesh()
    assert mesh.devices.size == 8

    # global walker state: ladder of betas + made-up enthalpies
    W = 16
    
    beta_g = np.linspace(1.0, 2.5, W)
    enth_g = np.sin(np.arange(W) * 0.7) * 2.0

    from jax.sharding import NamedSharding, PartitionSpec

    sl = distributed.process_walker_slice(mesh, W)
    sharding = NamedSharding(mesh, PartitionSpec("walkers"))
    beta = jax.make_array_from_process_local_data(sharding, beta_g[sl], (W,))
    enth = jax.make_array_from_process_local_data(sharding, enth_g[sl], (W,))
    state = {"beta": beta, "enthalpy": enth}

    from jax.experimental import multihost_utils

    ex = jax.jit(lambda s, k: tempering_exchange(s, k, 0))
    out = ex(state, jax.random.key(0))
    new_beta = np.asarray(
        multihost_utils.process_allgather(out["beta"], tiled=True)
    )[:W]

    # reference result computed redundantly on every process
    ref = dict(state)
    import jax.numpy as jnp
    ref_out = tempering_exchange(
        {"beta": jnp.asarray(beta_g), "enthalpy": jnp.asarray(enth_g)},
        jax.random.key(0), 0,
    )
    np.testing.assert_allclose(new_beta, np.asarray(ref_out["beta"]))
    # the exchange must move at least one temperature across walkers
    assert not np.allclose(new_beta, beta_g)
    print(f"proc {pid} OK")
    """
)


def test_two_process_tempering(tmp_path):
    repo = str(Path(__file__).resolve().parent.parent.parent)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)

    env = dict(os.environ)
    # scrub anything that could route the children at a TPU/plugin backend
    for var in [
        k for k in env if k.startswith(("PALLAS_AXON", "TPU_", "PJRT_"))
    ]:
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}\n{err[-4000:]}"
        assert f"proc {i} OK" in out


CHAIN_WORKER = textwrap.dedent(
    """
    import os
    import sys

    coordinator, pid = sys.argv[1], int(sys.argv[2])
    os.environ["SMOL_TPU_CHAIN_INTERPRET"] = "1"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from smol_tpu.parallel import distributed
    from smol_tpu.parallel.tempering import tempering_exchange

    ok = distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert ok and len(jax.devices()) == 8

    mesh = distributed.global_walker_mesh()

    # 20 walkers cannot shard over 8 devices: the slice helper must
    # REJECT it (jax silently yields a replicated index map) and the
    # padding helper must round up to the next shardable count
    try:
        distributed.process_walker_slice(mesh, 20)
        raise SystemExit("non-divisible walker count was not rejected")
    except ValueError as err:
        assert "pad_walker_count" in str(err)
    W = distributed.pad_walker_count(mesh, 20)
    assert W == 24
    sl = distributed.process_walker_slice(mesh, W)
    w_local = sl.stop - sl.start
    assert w_local == 12, (pid, sl)

    # each process runs the persistent-chain kernel on its local block
    from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
    from smol_tpu.moca import Ensemble, Sampler

    ce = random_expansion(fcc_binary_prim(), {2: 6.0}, seed=3)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.2, "Cu": 0.0}
    )
    sampler = Sampler.from_ensemble(
        ens, temperature=800.0, nwalkers=w_local, seed=7 + pid
    )
    kernel = sampler.mckernel
    fn = kernel.make_chain_fn(50)
    assert fn is not None, "chain kernel unavailable in worker"
    rng = np.random.default_rng(41 + pid)
    occu = rng.integers(0, 2, (w_local, ens.num_sites)).astype(np.int32)
    state = dict(sampler.setup_sample(occu))
    out = fn(state, jax.random.key(100 + pid))
    occ_out = kernel.state_occupancy(out)
    feats = jax.vmap(kernel.full_features_fn())(occ_out)
    exact = np.asarray(feats @ jnp.asarray(kernel.natural_params))
    err = np.max(np.abs(np.asarray(out["enthalpy"]) - exact))
    assert err < 1e-8 * max(1.0, np.abs(exact).max()), err

    # stitch local chain results into globally sharded state + exchange
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec("walkers"))
    beta_g = np.linspace(1.0, 2.5, W)
    beta = jax.make_array_from_process_local_data(
        sharding, beta_g[sl], (W,)
    )
    enth = jax.make_array_from_process_local_data(
        sharding, np.asarray(out["enthalpy"]), (W,)
    )
    ex = jax.jit(lambda s, k: tempering_exchange(s, k, 0))
    exd = ex({"beta": beta, "enthalpy": enth}, jax.random.key(5))
    from jax.experimental import multihost_utils

    nb = np.asarray(
        multihost_utils.process_allgather(exd["beta"], tiled=True)
    )[:W]
    assert sorted(np.round(nb, 12)) == sorted(np.round(beta_g, 12))
    print(f"proc {pid} OK")
    """
)


def test_two_process_chain_kernel_unequal_shards(tmp_path):
    """Chain kernel on per-process blocks + exchange, unequal shards.

    VERDICT r2 weak #8 / next #10: the walker-slice construction must
    handle walker counts not divisible by the device count, and the
    persistent-chain kernel must run under the multi-process runtime.
    """
    repo = str(Path(__file__).resolve().parent.parent.parent)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = tmp_path / "chain_worker.py"
    worker.write_text(CHAIN_WORKER)

    env = dict(os.environ)
    for var in [
        k for k in env if k.startswith(("PALLAS_AXON", "TPU_", "PJRT_"))
    ]:
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}\n{err[-4000:]}"
        assert f"proc {i} OK" in out
