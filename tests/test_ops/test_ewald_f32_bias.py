"""Bound the f32 Ewald-delta ACCEPTANCE-DECISION bias at bench scale.

The chain kernel computes the electrostatic part of each move delta with
two f32 dot products over split-f64 row tables plus a compensated add
(``ewald_delta`` in ops/pallas_chain.py); acceptance then evaluates in
f32.  These tests replicate that arithmetic word-for-word on the kernel's
own ChainTables (worst-case SEQUENTIAL f32 summation — the hardware's
pipelined reductions round no worse) and measure, over equilibrated
112-site (benched spinel 2x2x2) and 378-site (3x3x3) states:

- the per-move acceptance-decision disagreement probability
  E|p_f32 - p_f64| (for uniform accept thresholds this IS the probability
  that a decision flips), and
- the absolute delta error and its supercell-size growth.

Measured (seeds below): mean disagreement 2e-14 (112 sites) / 4e-13
(378 sites); max delta error 2.3e-7 eV / 9.5e-7 eV, growing ~linearly
with the mean Ewald row L1 norm (2.3 -> 6.5 eV).  The worst-case bound
beta * max|err| stays < 1e-5 per move at 2000 K.  Exactness standard of
the reference: smol/utils/cluster/ewald.pyx:9 (plain f64 on host).
"""

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import random_expansion, spinel_prim
from smol_tpu.capp.generate.random import generate_random_ordered_occupancy
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.ops.pallas_chain import build_chain_tables

kB = 8.617333262145e-5
TEMPERATURE = 2000.0


def _df_add_np(ah, al, bh, bl):
    """numpy transliteration of ops.prims.df_add (all-f32 two-sum)."""
    f = np.float32
    s = f(ah + bh)
    v = f(s - ah)
    e = f(f(ah - f(s - v)) + f(bh - v))
    e = f(f(e + al) + bl)
    hi = f(s + e)
    lo = f(e - f(hi - s))
    return hi, lo


def _f32_dot_seq(v32, occ32):
    """Sequential f32 accumulation: worst-case rounding order."""
    acc = np.float32(0.0)
    for x in (v32 * occ32):
        acc = np.float32(acc + x)
    return acc


def _measure(diag, nw, nsteps, nthin, seed=2):
    """(mean |p32-p64|, max |p32-p64|, max |d32-d64|, mean row L1)."""
    ce = random_expansion(spinel_prim(), {2: 5.3, 3: 3.7}, seed=11, ewald=True)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag(diag),
        chemical_potentials={
            "Li+": 0.1, "vacA0+": 0.0, "Mn3+": 0.05, "Mn4+": 0.0
        },
    )
    tables = build_chain_tables(
        ens.processor, ens.sublattices, mu_table=ens.chemical_potential_table
    )
    assert tables is not None and tables.has_ewald
    R, rpad = tables.num_ranks, tables.rpad
    ew_v = np.asarray(tables.ew_v, dtype=np.float32)  # [R, 2, rpad]
    ew_c = np.asarray(tables.ew_c, dtype=np.float32)  # [1, 2R]
    rank_sites = np.asarray(tables.rank_sites)
    # split-f64 pairs recombine exactly: the f64 reference uses the very
    # same table values, isolating accumulation-precision effects only
    V64 = ew_v[:, 0].astype(np.float64) + ew_v[:, 1].astype(np.float64)
    C64 = ew_c[0, :R].astype(np.float64) + ew_c[0, R:].astype(np.float64)

    rng = np.random.default_rng(seed)
    occ0 = generate_random_ordered_occupancy(
        ens.processor, charge_neutral=True, rng=rng
    )
    occu = np.tile(occ0, (nw, 1)).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ens, temperature=TEMPERATURE, nwalkers=nw, seed=11,
        step_type="table-flip", shared_proposals=False,
    )
    sampler.run(nsteps, occu, thin_by=nsteps // nthin)
    occs = sampler.samples.get_trace_value("occupancy", flat=False)

    beta = 1.0 / (kB * TEMPERATURE)
    dis, errs = [], []
    for state in occs.reshape(-1, occs.shape[-1]):
        codes = state[rank_sites].astype(np.float64)  # binary 0/1
        occ32 = np.zeros(rpad, dtype=np.float32)
        occ32[:R] = codes
        occ64 = occ32.astype(np.float64)
        for u in range(R):
            sign = 1.0 if codes[u] == 0 else -1.0
            h1 = _f32_dot_seq(ew_v[u, 0], occ32)
            l1 = _f32_dot_seq(ew_v[u, 1], occ32)
            eh, el = _df_add_np(h1, l1, ew_c[0, u], ew_c[0, R + u])
            d32 = sign * (float(eh) + float(el))
            d64 = sign * (C64[u] + V64[u] @ occ64)
            p32 = min(1.0, np.exp(np.float32(-beta * d32)))
            p64 = min(1.0, np.exp(-beta * d64))
            dis.append(abs(p32 - p64))
            errs.append(abs(d32 - d64))
    dis, errs = np.array(dis), np.array(errs)
    row_l1 = float(np.abs(V64).sum(axis=1).mean())
    return dis.mean(), dis.max(), errs.max(), row_l1, beta


@pytest.fixture(scope="module")
def bias_112():
    return _measure((2, 2, 2), nw=8, nsteps=300, nthin=3)


def test_acceptance_disagreement_rate_112_sites(bias_112):
    """Benched 112-site spinel: decision-flip probability is negligible."""
    mean_dis, max_dis, max_err, _, beta = bias_112
    assert mean_dis < 1e-11, mean_dis  # measured 2.0e-14
    assert max_dis < 1e-8, max_dis  # measured 1.5e-11
    # distribution-free worst case: a decision can only flip when the
    # threshold lands within beta*err of the exponent
    assert beta * max_err < 1e-5, (beta, max_err)  # measured 1.4e-6


def test_acceptance_bias_supercell_scaling(bias_112):
    """3x3x3 (378 sites): error grows ~linearly with Ewald row L1 norm.

    Pins the scaling claim in the ops/pallas_chain numerical contract:
    delta error tracks the row norm (~ active-site count), so acceptance
    bias stays bounded well past bench scale rather than blowing up.
    """
    _, _, err_112, l1_112, beta = bias_112
    mean_dis, max_dis, err_378, l1_378, _ = _measure(
        (3, 3, 3), nw=4, nsteps=120, nthin=2
    )
    assert mean_dis < 1e-10, mean_dis  # measured 4.0e-13
    assert beta * err_378 < 2e-5, (beta, err_378)  # measured 5.5e-6
    # growth no worse than ~2x linear in the mean row L1 norm
    assert err_378 / err_112 < 2.0 * (l1_378 / l1_112), (
        err_378, err_112, l1_378, l1_112
    )
