"""MC bias tests: biased stationary distributions vs exact enumeration."""

from itertools import product

import numpy as np
import pytest

from smol_tpu.benchmarks.systems import fcc_binary_prim, random_expansion
from smol_tpu.constants import kB
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.moca import Ensemble, Sampler
from smol_tpu.moca.kernel.bias import (
    FugacityBias,
    SquareChargeBias,
    mcbias_factory,
)


def test_fugacity_bias_tables_and_change(rng):
    ce = random_expansion(fcc_binary_prim(), {2: 3.0}, seed=1)
    ens = Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))
    bias = FugacityBias(ens.sublattices)
    occu = rng.integers(0, 2, 8).astype(np.int32)
    b0 = bias.compute_bias(occu)
    step = [(0, 1 - int(occu[0]))]
    delta = bias.compute_bias_change(occu, step)
    occu2 = occu.copy()
    occu2[0] = step[0][1]
    assert delta == pytest.approx(bias.compute_bias(occu2) - b0, abs=1e-12)
    # device delta matches host
    import jax.numpy as jnp

    fn = bias.device_delta_fn()
    d_dev = float(
        fn(
            jnp.asarray(occu),
            jnp.asarray([0], dtype=jnp.int32),
            jnp.asarray([step[0][1]], dtype=jnp.int32),
            jnp.asarray([True]),
        )
    )
    assert d_dev == pytest.approx(delta, abs=1e-12)


def test_biased_sgc_matches_enumeration():
    """Flip MC with a fugacity bias samples exp(-beta H + bias)."""
    ce = random_expansion(fcc_binary_prim(), {2: 3.0}, seed=5)
    ens = Ensemble.from_cluster_expansion(
        ce, np.diag([2, 2, 2]), chemical_potentials={"Au": 0.0, "Cu": 0.0}
    )
    temperature = 2000.0
    beta = 1 / (kB * temperature)
    fractions = [{"Au": 0.75, "Cu": 0.25}]
    bias = FugacityBias(ens.sublattices, fugacity_fractions=fractions)

    hs, weights = [], []
    for bits in product((0, 1), repeat=8):
        occ = np.array(bits, dtype=np.int32)
        h = float(ens.compute_feature_vector(occ) @ ens.natural_parameters)
        hs.append(h)
        weights.append(-beta * h + bias.compute_bias(occ))
    hs = np.array(hs)
    weights = np.exp(np.array(weights) - np.max(weights))
    weights /= weights.sum()
    exact_h = float(hs @ weights)
    # mean Au occupancy under the bias
    au_counts = np.array(
        [8 - sum(bits) for bits in product((0, 1), repeat=8)]
    )
    exact_au = float(au_counts @ weights)

    nwalkers = 64
    rng = np.random.default_rng(1)
    occu = rng.integers(0, 2, (nwalkers, 8)).astype(np.int32)
    sampler = Sampler.from_ensemble(
        ens,
        step_type="flip",
        temperature=temperature,
        nwalkers=nwalkers,
        seed=3,
        bias_type="fugacity-bias",
        bias_kwargs={"fugacity_fractions": fractions},
    )
    sampler.run(12000, occu, thin_by=10)
    mc_h = sampler.samples.mean_enthalpy(discard=300)
    occs = sampler.samples.get_occupancies(discard=300)
    mc_au = float((occs == 0).sum(axis=1).mean())
    sem = np.sqrt(
        sampler.samples.enthalpy_variance(discard=300)
        / sampler.samples.get_enthalpies(discard=300).shape[0]
    )
    assert abs(mc_h - exact_h) < max(10 * sem, 3e-3), (mc_h, exact_h)
    assert abs(mc_au - exact_au) < 0.1, (mc_au, exact_au)


def test_square_charge_bias():
    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat,
        [{"Li+": 0.5, "Mn3+": 0.5}, {"O2-": 0.5, "F-": 0.5}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    ce = random_expansion(prim, {2: 3.1}, seed=2)
    ens = Ensemble.from_cluster_expansion(
        ce,
        np.diag([2, 1, 1]),
        chemical_potentials={
            "Li+": 0.0, "Mn3+": 0.0, "O2-": 0.0, "F-": 0.0
        },
    )
    bias = mcbias_factory("square-charge-bias", ens.sublattices, penalty=2.0)
    # neutral occupancy has zero bias; charged has negative
    occu_neutral = np.array([0, 0, 1, 1], dtype=np.int32)  # LiLi FF
    charge = sum(
        (ens.processor.allowed_species[i][occu_neutral[i]].oxi_state or 0)
        for i in range(4)
    )
    assert charge == 0
    assert bias.compute_bias(occu_neutral) == pytest.approx(0.0)
    occu_charged = np.array([0, 0, 0, 0], dtype=np.int32)
    assert bias.compute_bias(occu_charged) < 0

    # a biased flip run drives the system toward neutrality
    nwalkers = 16
    sampler = Sampler.from_ensemble(
        ens,
        step_type="flip",
        temperature=1000.0,
        nwalkers=nwalkers,
        seed=5,
        bias_type="square-charge-bias",
        bias_kwargs={"penalty": 2.0},
    )
    occu0 = np.tile(occu_charged, (nwalkers, 1))
    sampler.run(3000, occu0, thin_by=30)
    occs = sampler.samples.get_occupancies(discard=50)
    charges = np.array(
        [
            sum(
                (ens.processor.allowed_species[i][o[i]].oxi_state or 0)
                for i in range(4)
            )
            for o in occs
        ]
    )
    assert np.abs(charges).mean() < 1.0


def test_square_hyperplane_bias(rng):
    """-penalty * ||A n - b||^2 over species counts, host + device parity."""
    from smol_tpu.moca.kernel.bias import SquareHyperplaneBias

    ce = random_expansion(fcc_binary_prim(), {2: 3.0}, seed=3)
    ens = Ensemble.from_cluster_expansion(ce, np.diag([2, 2, 2]))
    # one hyperplane: exactly 4 Au (dim 0) in the 8-site cell
    bias = mcbias_factory(
        "square-hyperplane-bias",
        ens.sublattices,
        hyperplane_normals=[[1.0, 0.0]],
        hyperplane_intercepts=[4.0],
        penalty=1.5,
    )
    assert isinstance(bias, SquareHyperplaneBias)
    with pytest.raises(ValueError):
        SquareHyperplaneBias(
            ens.sublattices, [[1.0, 0.0]], [4.0], penalty=-1.0
        )

    occu = rng.integers(0, 2, 8).astype(np.int32)
    n_au = int(np.sum(occu == 0))
    assert bias.compute_bias(occu) == pytest.approx(-1.5 * (n_au - 4.0) ** 2)
    occu_on = np.array([0, 0, 0, 0, 1, 1, 1, 1], dtype=np.int32)
    assert bias.compute_bias(occu_on) == pytest.approx(0.0)

    # change consistency and device-fn parity on a flip
    step = [(2, 1 - int(occu[2]))]
    occu2 = occu.copy()
    occu2[2] = step[0][1]
    delta = bias.compute_bias_change(occu, step)
    assert delta == pytest.approx(
        bias.compute_bias(occu2) - bias.compute_bias(occu), abs=1e-12
    )
    import jax.numpy as jnp

    fn = bias.device_delta_fn()
    d_dev = float(
        fn(
            jnp.asarray(occu),
            jnp.asarray([2], dtype=jnp.int32),
            jnp.asarray([step[0][1]], dtype=jnp.int32),
            jnp.asarray([True]),
        )
    )
    assert d_dev == pytest.approx(delta, abs=1e-10)
