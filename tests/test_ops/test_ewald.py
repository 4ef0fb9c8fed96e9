"""Ewald tests: Madelung constants, term values, device delta parity."""

import numpy as np
import pytest

from smol_tpu.cofe.extern import EwaldTerm
from smol_tpu.crystal import Lattice, Structure
from smol_tpu.crystal.ewald import CONV_FACT, EwaldSummation
from smol_tpu.ops import ewald as dev_ewald
from smol_tpu.ops import ref as refops


def test_nacl_madelung():
    a = 5.0
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    s = Structure(lat, ["Na+", "Cl-"], [[0, 0, 0], [0.5, 0.5, 0.5]])
    ew = EwaldSummation(s)
    alpha = -ew.total_energy * (a / 2) / CONV_FACT
    assert alpha == pytest.approx(1.7475645946, abs=1e-8)


def test_eta_independence_and_symmetry():
    lat = Lattice.cubic(4.0)
    s = Structure(lat, ["Cs+", "Cl-"], [[0, 0, 0], [0.5, 0.5, 0.5]])
    ew1 = EwaldSummation(s)
    ew2 = EwaldSummation(s, eta=ew1.eta * 2.0)
    assert ew1.total_energy == pytest.approx(ew2.total_energy, abs=1e-6)
    M = ew1.total_energy_matrix
    assert np.allclose(M, M.T)


@pytest.fixture(scope="module")
def ewald_setup():
    # rocksalt Li/vacancy + fixed O sublattice, 2x2x2 supercell
    a = 4.2
    lat = Lattice(np.array([[0, 0.5, 0.5], [0.5, 0, 0.5], [0.5, 0.5, 0]]) * a)
    prim = Structure(
        lat,
        [{"Li+": 0.5, "Mn3+": 0.5}, {"O2-": 1.0}],
        [[0, 0, 0], [0.5, 0.5, 0.5]],
    )
    sc = prim.copy().make_supercell(np.diag([2, 2, 2]))
    term = EwaldTerm()
    struct, inds = term.get_ewald_structure(sc)
    summation = EwaldSummation(struct)
    matrix = term.get_ewald_matrix(summation)
    rng = np.random.default_rng(11)
    n_codes = np.array([2 if i < 8 else 1 for i in range(len(sc))])
    # site ordering after make_supercell: first 8 = cation, next 8 = O
    occu = (rng.random(16) * n_codes).astype(np.int32)
    return sc, term, matrix, inds, occu, n_codes, rng


def test_term_value_vs_matrix(ewald_setup):
    sc, term, matrix, inds, occu, *_ = ewald_setup
    val = term.value_from_occupancy(occu, sc)[0]
    ew_occu = term.get_ewald_occu(occu, matrix.shape[0], inds)
    assert val == pytest.approx(matrix[np.ix_(ew_occu, ew_occu)].sum())


def test_device_energy_matches_host(ewald_setup):
    sc, term, matrix, inds, occu, *_ = ewald_setup
    host = term.value_from_occupancy(occu, sc)[0]
    dev = float(dev_ewald.ewald_energy(occu, matrix, inds))
    assert dev == pytest.approx(host, rel=1e-12)


def test_device_delta_matches_full_and_ref(ewald_setup):
    sc, term, matrix, inds, occu, n_codes, rng = ewald_setup
    occu = occu.copy()
    for _ in range(25):
        site = int(rng.integers(len(occu)))
        new = int(rng.integers(n_codes[site]))
        occu_f = occu.copy()
        occu_f[site] = new
        e_i = float(dev_ewald.ewald_energy(occu, matrix, inds))
        e_f = float(dev_ewald.ewald_energy(occu_f, matrix, inds))
        delta_dev = float(
            dev_ewald.delta_ewald_single_flip(occu, site, new, matrix, inds)
        )
        delta_ref = refops.delta_ewald_single_flip(occu_f, occu, matrix, inds, site)
        assert delta_dev == pytest.approx(e_f - e_i, abs=1e-9)
        assert delta_dev == pytest.approx(delta_ref, abs=1e-9)
        occu = occu_f
