#!/usr/bin/env python
"""Headline benchmark: Metropolis flip-attempts/sec/chip on a spinel CE.

Default run: single-flip semigrand Metropolis on a LiMn2O4-type spinel
cluster expansion (2x2x2 supercell of the 14-site prim = 112 sites, 48
active cation sites, pair+triplet CE) vmapped over thousands of replica
walkers — the BASELINE.md north-star configuration class.  Prints ONE JSON
line:

    {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is value / 1e8 (the target flip-attempts/sec/chip).

The other BASELINE.json benchmark configs are selectable with --config:

    canonical   binary FCC Au-Cu CE, 4x4x4 supercell, 300 K swaps
    sgc         semigrand ternary alloy CE, 6x6x6 supercell
    spinel      (default) charge-neutral-class spinel SGC flips
    spinel-ewald  spinel SGC with Ewald electrostatics (CompositeProcessor)
    tempering   8192 replicas + parallel-tempering exchanges

Usage: python bench.py [--config C] [--smoke] [--walkers W] [--steps S]
"""

import argparse
import json
import sys
import time

import numpy as np


# runs per _rate call: one warmup + three timed reps (cumulative state
# counters like nmove span all of them)
_RATE_RUNS = 4


def _analysis_reads(sampler):
    """A realistic post-run analysis: mean/variance/min enthalpy and the
    acceptance fraction.  The container reduces the (device-resident)
    sample records where they live, so only per-walker results cross the
    device->host link (smol_tpu.ops.reductions)."""
    container = sampler.samples
    return (
        container.mean_enthalpy(),
        container.enthalpy_variance(),
        container.get_minimum_enthalpy(),
        container.sampling_efficiency(),
    )


def _rate(sampler, occu, nsteps, nwalkers, thin_by=None, reps=3,
          analysis=False):
    """Median attempts/s over reps through Sampler.run (compile excluded).

    With ``analysis=True`` (dense-thinning rows) each timed rep also
    includes the standard analysis reads over all recorded samples.
    Prints per-rep diagnostics (rates, std, config) to stderr; the caller
    prints the single JSON result line to stdout.
    """
    import jax

    thin_by = thin_by or nsteps
    t0 = time.perf_counter()
    sampler.run(nsteps, occu, thin_by=thin_by)  # warmup (includes compile)
    jax.block_until_ready(sampler._state)
    if analysis:
        _analysis_reads(sampler)
    warmup = time.perf_counter() - t0
    rates = []
    for _ in range(reps):
        sampler.clear_samples()
        t0 = time.perf_counter()
        sampler.run(nsteps, thin_by=thin_by)
        # sample records stay device-resident (lazy container), so run()
        # no longer blocks on the device; wait for the chain itself
        jax.block_until_ready(sampler._state)
        if analysis:
            _analysis_reads(sampler)
        rates.append(nwalkers * nsteps / (time.perf_counter() - t0))
    rates = np.array(rates)
    print(
        f"bench: nsteps={nsteps} thin_by={thin_by} nwalkers={nwalkers} "
        f"reps={reps} warmup={warmup:.1f}s "
        f"rates_M={np.array2string(rates / 1e6, precision=1)} "
        f"median={np.median(rates)/1e6:.1f}M std={rates.std()/1e6:.1f}M",
        file=sys.stderr,
    )
    return float(np.median(rates))


ALL_CONFIGS = (
    "canonical", "sgc", "spinel", "spinel-ewald", "tempering",
    "wang-landau", "sqs",
    # spinel with fully independent walkers via the deterministic-sweep
    # chain schedule (zero shared randomness at chain speed)
    "spinel-independent",
    # legacy independent mode: RANDOM per-walker proposal streams on the
    # XLA step path — prices the proposal-sharing tradeoff directly
    "spinel-independent-random",
    # spinel at a realistic recording cadence (300 trace records/run):
    # includes the thin-point exact-f64 feature recompute that the
    # default thin_by=nsteps amortizes to nothing
    "spinel-thin100",
)


def _probe_devices(timeout=300):
    """Bounded jax.devices() check in a subprocess.

    When the axon TPU tunnel is down, any jax device lookup hangs
    indefinitely in make_c_api_client (the sitecustomize hook re-pins
    jax_platforms to "axon,cpu" in every process, so JAX_PLATFORMS=cpu
    cannot dodge it).  Probing in a throwaway subprocess converts that
    infinite hang into a bounded, self-describing failure.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return f"device probe timed out after {timeout}s (TPU tunnel down?)"
    if proc.returncode != 0:
        return f"device probe failed: {proc.stderr.strip()[-200:]}"
    return None


def _run_all(args):
    """Run every benchmark config in its own subprocess, one at a time.

    Each config gets a fresh process (TPU state does not accumulate, and
    a worker crash in one config cannot poison the rest); results land in
    BENCH_configs.json next to this script.
    """
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    results = []
    for cfg in ALL_CONFIGS:
        base = (
            cfg.removesuffix("-independent-random")
            .removesuffix("-independent")
            .removesuffix("-thin100")
        )
        cmd = [sys.executable, os.path.abspath(__file__), "--config", base]
        if cfg.endswith("-independent-random"):
            cmd.append("--independent-random")
        elif cfg.endswith("-independent"):
            cmd.append("--independent")
        if cfg.endswith("-thin100"):
            cmd += ["--thin", "100"]
        if args.smoke:
            cmd.append("--smoke")
        # forward the size overrides so --all sweeps honor them
        if args.walkers is not None:
            cmd += ["--walkers", str(args.walkers)]
        if args.steps is not None:
            cmd += ["--steps", str(args.steps)]
        if args.block_size is not None:
            cmd += ["--block-size", str(args.block_size)]
        print(f"bench --all: running {cfg} ...", file=sys.stderr)
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=3600
            )
            sys.stderr.write(proc.stderr)
            line = next(
                (
                    ln
                    for ln in reversed(proc.stdout.splitlines())
                    if ln.startswith("{")
                ),
                None,
            )
            if proc.returncode == 0 and line:
                rec = json.loads(line)
            else:
                rec = {
                    "metric": cfg,
                    "error": f"rc={proc.returncode}",
                    "stdout_tail": proc.stdout[-300:],
                    # the stderr tail is the diagnostic that matters on a
                    # crash (tracebacks go there); without it a failed row
                    # is unactionable from artifacts alone
                    "stderr_tail": proc.stderr[-2000:],
                }
        except subprocess.TimeoutExpired:
            rec = {"metric": cfg, "error": "timeout"}
        rec["config"] = cfg
        results.append(rec)
        print(json.dumps(rec))
    with open(os.path.join(here, "BENCH_configs.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(
        f"bench --all: wrote {len(results)} results to BENCH_configs.json",
        file=sys.stderr,
    )
    return 0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config",
        choices=[
            "canonical", "sgc", "spinel", "spinel-ewald", "tempering",
            "wang-landau", "sqs",
        ],
        default="spinel",
    )
    parser.add_argument("--smoke", action="store_true", help="small, CPU-friendly run")
    parser.add_argument("--walkers", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument(
        "--independent",
        action="store_true",
        help="fully independent walkers: for single-flip configs this "
        "selects the deterministic-sweep chain schedule (zero shared "
        "randomness at full chain speed); for other moves it disables "
        "the shared-proposal chain kernel (independent XLA step path)",
    )
    parser.add_argument(
        "--independent-random",
        action="store_true",
        help="legacy independent mode: shared_proposals=False with "
        "RANDOM per-walker proposal streams (the XLA step path) — "
        "prices the old proposal-sharing tradeoff directly",
    )
    parser.add_argument(
        "--thin",
        type=int,
        default=None,
        help="record a trace sample every THIN steps (default: once per "
        "run) — prices the thin-point exact-f64 recompute + recording",
    )
    parser.add_argument(
        "--block-size",
        type=int,
        default=None,
        help="chain_block_size: walkers per chain-kernel block (the "
        "proposal-sharing granularity; smaller = more independent "
        "sequences)",
    )
    parser.add_argument(
        "--all",
        action="store_true",
        help="run every config sequentially (one subprocess at a time; "
        "concurrent TPU processes corrupt measurements) and record one "
        "JSON object per config in BENCH_configs.json",
    )
    args = parser.parse_args()

    import os

    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    cpu_only = bool(env_platforms) and "axon" not in env_platforms
    if not cpu_only and not os.environ.get("SMOL_TPU_SKIP_PROBE"):
        err = _probe_devices()
        if err:
            # transient tunnel outages recover within minutes; retry twice
            # with backoff before giving up so a blip does not zero a run
            import time as _time

            for wait in (120, 300):
                print(
                    f"bench: {err}; retrying in {wait}s ...", file=sys.stderr
                )
                _time.sleep(wait)
                err = _probe_devices()
                if err is None:
                    break
        if err:
            print(json.dumps({"metric": "bench", "error": err}))
            return 1
        os.environ["SMOL_TPU_SKIP_PROBE"] = "1"  # inherited by --all children

    if args.all:
        return _run_all(args)

    # Honor JAX_PLATFORMS even where a site hook re-pins jax_platforms at
    # interpreter start (the axon sitecustomize does config.update, which
    # silently overrides the env var): re-apply the env value explicitly so
    # JAX_PLATFORMS=cpu smoke runs stay off a (possibly down) TPU tunnel.
    if cpu_only:
        import jax

        jax.config.update("jax_platforms", env_platforms)

    import jax

    import smol_tpu  # noqa: F401  (enables x64)
    from smol_tpu.benchmarks.systems import (
        fcc_binary_prim,
        fcc_ternary_prim,
        random_expansion,
        spinel_prim,
    )
    from smol_tpu.moca import Ensemble, Sampler

    nwalkers = args.walkers or (64 if args.smoke else 8192)
    nsteps = args.steps or (200 if args.smoke else 30000)
    rng = np.random.default_rng(0)
    kernel_opts = {}
    if args.independent_random:
        kernel_opts["shared_proposals"] = False
    elif args.independent:
        # single-flip configs ride the deterministic-sweep chain schedule
        # (independent walkers at chain speed); swap/table configs fall
        # back to shared_proposals=False (sweeps are flip-only)
        if args.config in ("spinel", "sgc", "wang-landau", "tempering"):
            kernel_opts["proposal_mode"] = "sweep"
        else:
            kernel_opts["shared_proposals"] = False
    if args.block_size:
        kernel_opts["chain_block_size"] = args.block_size

    cfg = args.config
    if cfg == "canonical" and "chain_block_size" not in kernel_opts:
        # measured on v5e: the swap chain is flat across 512/1024 and
        # drops at 256 and 2048 (ising path: 362M at 512; select path:
        # 169/171/144/132M at 512/1024/256/2048)
        kernel_opts["chain_block_size"] = 512
    if cfg == "canonical":
        ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
        scm = np.diag([2, 2, 2] if args.smoke else [4, 4, 4])
        ensemble = Ensemble.from_cluster_expansion(ce, scm)
        n = ensemble.num_sites
        occu = np.zeros((nwalkers, n), dtype=np.int32)
        for w in range(nwalkers):
            occu[w, rng.choice(n, n // 2, replace=False)] = 1
        sampler = Sampler.from_ensemble(
            ensemble, temperature=300.0, nwalkers=nwalkers, seed=3,
            **kernel_opts,
        )
        metric = "metropolis_swap_attempts_per_sec_per_chip_aucu_fcc"
    elif cfg == "sgc":
        ce = random_expansion(fcc_ternary_prim(), {2: 5.5, 3: 4.0}, seed=7)
        scm = np.diag([3, 3, 3] if args.smoke else [6, 6, 6])
        ensemble = Ensemble.from_cluster_expansion(
            ce, scm, chemical_potentials={"Au": 0.05, "Ag": 0.0, "Cu": -0.05}
        )
        n_codes = np.array(
            [len(sp) for sp in ensemble.processor.allowed_species]
        )
        occu = (
            rng.random((nwalkers, ensemble.num_sites)) * n_codes
        ).astype(np.int32)
        sampler = Sampler.from_ensemble(
            ensemble, temperature=800.0, nwalkers=nwalkers, seed=3,
            **kernel_opts,
        )
        metric = "metropolis_flip_attempts_per_sec_per_chip_ternary_sgc"
    elif cfg in ("spinel", "spinel-ewald"):
        # spinel: BASELINE north-star config class (single-flip SGC).
        # spinel-ewald: BASELINE config 3 — charge-neutral SGC with Ewald
        # electrostatics, run with the ACTUAL TableFlip move type
        # (reference smol/moca/kernel/mcusher.py:397-711) through the
        # persistent-chain kernel's exogenous symmetric table proposal.
        ewald = cfg == "spinel-ewald"
        ce = random_expansion(
            spinel_prim(), {2: 5.3, 3: 3.7}, seed=11, ewald=ewald,
        )
        scm = np.diag([2, 2, 2])  # 112 sites, 48 active
        ensemble = Ensemble.from_cluster_expansion(
            ce, scm,
            chemical_potentials={
                "Li+": 0.1, "vacA0+": 0.0, "Mn3+": 0.05, "Mn4+": 0.0
            },
        )
        n_codes = np.array(
            [len(sp) for sp in ensemble.processor.allowed_species]
        )
        if ewald:
            # start on the charge-neutral manifold (all walkers share one
            # neutral arrangement; the chain decorrelates them immediately)
            from smol_tpu.capp.generate.random import (
                generate_random_ordered_occupancy,
            )

            occ0 = generate_random_ordered_occupancy(
                ensemble.processor, charge_neutral=True, rng=rng
            )
            occu = np.tile(occ0, (nwalkers, 1)).astype(np.int32)
            sampler = Sampler.from_ensemble(
                ensemble, temperature=1000.0, nwalkers=nwalkers, seed=3,
                step_type="table-flip", **kernel_opts,
            )
        else:
            occu = (
                rng.random((nwalkers, ensemble.num_sites)) * n_codes
            ).astype(np.int32)
            sampler = Sampler.from_ensemble(
                ensemble, temperature=1000.0, nwalkers=nwalkers, seed=3,
                **kernel_opts,
            )
        metric = (
            "metropolis_flip_attempts_per_sec_per_chip_spinel112"
            if cfg == "spinel"
            else "tableflip_attempts_per_sec_per_chip_spinel112_ewald"
        )
    elif cfg == "wang-landau":
        # BASELINE config 4a: flat-histogram DOS sampling, windowed
        # walkers; the dispatched path (chain kernel vs per-step XLA
        # fallback) is recorded in the result's "path" field
        nwalkers = args.walkers or (64 if args.smoke else 2048)
        nsteps = args.steps or (200 if args.smoke else 10000)
        ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
        ensemble = Ensemble.from_cluster_expansion(
            ce, np.diag([2, 2, 2] if args.smoke else [3, 3, 3])
        )
        n = ensemble.num_sites
        occu = rng.integers(0, 2, (nwalkers, n)).astype(np.int32)
        # a generous window around the energies reachable from random starts
        probe = np.array([
            float(
                ensemble.compute_feature_vector(o) @ ensemble.natural_parameters
            )
            for o in occu[:64]
        ])
        span = probe.max() - probe.min() + 1e-3
        sampler = Sampler.from_ensemble(
            ensemble,
            kernel_type="wang-landau",
            step_type="flip",
            min_enthalpy=probe.min() - 2 * span,
            max_enthalpy=probe.max() + 2 * span,
            bin_size=span / 50,
            flatness=0.8,
            nwalkers=nwalkers,
            seed=13,
            **kernel_opts,
        )
        metric = "wang_landau_flip_attempts_per_sec_per_chip"
    elif cfg == "sqs":
        # BASELINE config 4b: SQS score-annealing attempts across shapes
        from smol_tpu.capp import StochasticSQSGenerator

        prim = fcc_binary_prim()
        generator = StochasticSQSGenerator.from_structure(
            prim, cutoffs={2: 5.0, 3: 3.5},
            supercell_size=4 if args.smoke else 8,
        )
        # multicell distance annealing: per-shape persistent-chain
        # launches; sized so the per-launch chain windows dominate the
        # per-shape host overheads (initial states, exact rescores)
        n_shapes = len(generator.processors)
        sqs_walkers = args.walkers or (16 if args.smoke else 2048)
        sqs_steps = args.steps or (100 if args.smoke else 8000)
        temps = np.linspace(5.0, 0.02, 3 if args.smoke else 4)
        attempts = n_shapes * len(temps) * sqs_steps * sqs_walkers

        t0 = time.perf_counter()  # warmup incl. compile
        generator.generate(
            mcmc_steps=sqs_steps, temperatures=temps,
            nwalkers=sqs_walkers, seed=23,
        )
        warmup = time.perf_counter() - t0
        rates = []
        for rep in range(3):
            t0 = time.perf_counter()
            generator.generate(
                mcmc_steps=sqs_steps, temperatures=temps,
                nwalkers=sqs_walkers, seed=24 + rep,
            )
            rates.append(attempts / (time.perf_counter() - t0))
        rate = float(np.median(rates))
        print(
            f"bench: shapes={n_shapes} temps={len(temps)} steps={sqs_steps} "
            f"walkers={sqs_walkers} warmup={warmup:.1f}s "
            f"median={rate/1e6:.1f}M",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "sqs_anneal_attempts_per_sec_per_chip",
                    "value": rate,
                    "unit": "attempts/s",
                    "vs_baseline": rate / 1e8,
                    "platform": jax.default_backend(),
                    "smoke": bool(args.smoke),
                    "path": generator.execution_path,
                }
            )
        )
        return 0
    else:  # tempering
        from smol_tpu.parallel import make_temperature_ladder

        ce = random_expansion(fcc_binary_prim(), {2: 6.0, 3: 4.0}, seed=7)
        ensemble = Ensemble.from_cluster_expansion(
            ce, np.diag([3, 3, 3]),
            chemical_potentials={"Au": 0.0, "Cu": 0.0},
        )
        ladder = make_temperature_ladder(300.0, 3000.0, nwalkers)
        occu = rng.integers(
            0, 2, (nwalkers, ensemble.num_sites)
        ).astype(np.int32)
        sampler = Sampler.from_ensemble(
            ensemble, temperature=ladder, nwalkers=nwalkers, seed=3,
            replica_exchange_period=10, **kernel_opts,
        )
        metric = "tempering_flip_attempts_per_sec_per_chip_8192_replicas"

    thin_by = nsteps
    if args.thin:
        thin_by = args.thin
        metric += f"_thin{args.thin}"
    elif cfg == "tempering":
        thin_by = nsteps - nsteps % 10 or nsteps
    elif cfg == "wang-landau":
        # chain-kernel WL runs whole thinning windows per launch; the
        # per-step XLA fallback needs seconds-scale launches (very long
        # single launches can trip worker execution deadlines).  WL users
        # thin sparsely (the result lives in the cumulative aux planes,
        # recorded lazily), so size for long windows: per-sample trace
        # transfers over the ~10 MB/s tunnel would otherwise dominate.
        chain_ok = sampler.mckernel.make_chain_fn(1) is not None
        if chain_ok and args.steps is None and not args.smoke:
            nsteps = 90000  # chain speed needs a longer run to measure
        thin_by = min(15000 if chain_ok else 500, nsteps)
    dense_thinning = bool(args.thin) and thin_by < nsteps
    rate = _rate(
        sampler, occu, nsteps, nwalkers, thin_by=thin_by,
        analysis=dense_thinning,
    )
    record = {
        "metric": metric,
        "value": rate,
        "unit": "attempts/s",
        "vs_baseline": rate / 1e8,
        "platform": jax.default_backend(),
        "smoke": bool(args.smoke),
        # the actually-dispatched execution path, sourced from the
        # sampler's dispatch logic (not prose)
        "path": sampler.execution_path(thin_by),
    }
    if dense_thinning:
        record["path"] += "+device-resident-records+on-device-analysis"
        record["includes"] = (
            "per-window trace recording + mean/var/min enthalpy and "
            "acceptance reads (reduced on device; exact-f64 features "
            "remain available lazily via SampleContainer)"
        )
    if cfg == "canonical":
        # the chain kernel's exogenous pair draw proposes identity moves
        # (same species at both sites); the reference Swap usher proposes
        # null-free moves, so the comparable number is the kernel-counted
        # non-null move rate, and vs_baseline is computed from it
        nmove = float(np.asarray(sampler._state["nmove"], dtype=np.float64).sum())
        attempts = float(_RATE_RUNS * nsteps) * nwalkers
        frac = nmove / attempts
        record["effective_move_fraction"] = frac
        record["effective_moves_per_sec"] = rate * frac
        record["vs_baseline"] = rate * frac / 1e8
        record["vs_baseline_basis"] = "null-free moves (reference-equivalent)"

    # Shared-proposal ESS fraction: walkers within one chain block share
    # the proposal site sequence, so across-walker averages carry
    # positive correlation (tests/test_ops/test_chain_ess.py).  Blocks
    # use independent sequences, so the block structure of the final
    # equilibrated enthalpies estimates the loss for free:
    #     f = var(within-block) / (block_size * var(block means)),
    # ~1 for independent walkers, ~1/block for perfect correlation.
    # Skipped when walkers are not identically distributed (tempering's
    # per-walker temperature ladder) or fewer than 4 blocks exist.
    if "sweep-schedule" in record["path"]:
        record["ess_fraction"] = 1.0
        record["ess_fraction_basis"] = (
            "deterministic schedule: walkers are iid by construction"
        )
        record["effective_samples_per_sec"] = rate
    if (
        "shared-proposals" in record["path"]
        and cfg in ("canonical", "sgc", "spinel", "spinel-ewald")
    ):
        chain_block = getattr(sampler.mckernel, "chain_block_size", 1024)
        bs = min(int(chain_block), nwalkers)
        nblocks = nwalkers // bs
        if nblocks >= 4:
            X = np.asarray(
                sampler._state["enthalpy"], dtype=np.float64
            )[: nblocks * bs].reshape(nblocks, bs)
            var_within = X.var(axis=1, ddof=1).mean()
            var_bm = X.mean(axis=1).var(ddof=1)
            f_ess = float(var_within / (bs * max(var_bm, 1e-300)))
            record["ess_fraction"] = f_ess
            record["ess_fraction_dof"] = nblocks - 1
            record["effective_samples_per_sec"] = rate * min(f_ess, 1.0)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
