"""Tensor-mode evolution + C_l (models/tensors.py).

Oracles, in increasing integration depth:
  1. exact radiation-era metric solution h = j_0(k tau) (the tensor wave
     equation in RD has a'/a = 1/tau) — pins the evolution machinery;
  2. Weinberg's free-streaming damping of the gravitational-wave amplitude
     in the radiation era (asymptotic factor 0.8031, astro-ph/0306304) —
     pins the sign AND magnitude of the anisotropic-stress feedback;
  3. published spectrum anchors (CAMB r=0.1, n_t=0): tensor TT plateau
     ~50 muK^2 at l=10; BB recombination bump peaking at l ~= 85-90 at the
     ~6-8e-3 muK^2 level; EE_tensor/BB_tensor ~ 1.4 near the peak; BB
     linear in r. These pin the LOS window functions and normalization to
     the ~25% level — tightened against a CAMB run when one is available.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import spherical_jn

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.bbn import yhe_bbn
from cosmomc_tpu.models.perturbations import build_thermo_funcs
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.models.tensors import (evolve_tensors, tensor_k_grid,
                                        compute_tensor_cls)

MUK2 = (2.7255e6) ** 2


@pytest.fixture(scope="module")
def thermo():
    bg = BackgroundParams.make()
    yhe = yhe_bbn(bg.ombh2, 0.0)
    tf, tau0 = build_thermo_funcs(bg, yhe, 0.0544, kmax=1.0)
    return bg, tf, tau0


@pytest.fixture(scope="module")
def spectra(thermo):
    bg, tf, tau0 = thermo
    to = evolve_tensors(bg, tf, tau0, jnp.asarray(tensor_k_grid()))
    pp = PrimordialParams.make(r=0.1)
    spec = compute_tensor_cls(to, pp, lmax=700)
    return spec


def test_radiation_era_metric_exact(thermo):
    """h(tau) = j_0(k tau) deep in RD with no anisotropic stress."""
    bg, tf, tau0 = thermo
    to = evolve_tensors(bg, tf, tau0, jnp.asarray([1.0]),
                        anisotropic_feedback=False, substeps=4)
    taus = np.asarray(to.tau)
    ht = np.asarray(to.ht)[0]
    sel = (taus > 0.3) & (taus < 10)     # a/a_eq < 0.07: radiation era
    err = np.abs(ht[sel] - spherical_jn(0, taus[sel])).max()
    assert err < 5e-3, err


def test_weinberg_neutrino_damping(thermo):
    """Free-streaming anisotropic stress damps h by ~0.80 in RD
    (Weinberg 2004); catches sign or coefficient errors in the feedback."""
    bg, tf, tau0 = thermo
    to = evolve_tensors(bg, tf, tau0, jnp.asarray([1.0]),
                        anisotropic_feedback=True, substeps=4)
    taus = np.asarray(to.tau)
    ht = np.asarray(to.ht)[0]
    sel = (taus > 6) & (taus < 14)
    x = taus[sel]
    good = np.abs(spherical_jn(0, x)) > 0.25 / x
    ratio = np.median(ht[sel][good] / spherical_jn(0, x[good]))
    assert 0.72 < ratio < 0.86, ratio


def test_superhorizon_constant(thermo):
    """h stays at its primordial value while k*tau << 1."""
    bg, tf, tau0 = thermo
    to = evolve_tensors(bg, tf, tau0, jnp.asarray([1e-4]))
    taus = np.asarray(to.tau)
    ht = np.asarray(to.ht)[0]
    sel = taus < 300     # k*tau < 0.03
    np.testing.assert_allclose(ht[sel], 1.0, atol=1e-3)


class TestTensorSpectra:
    def test_bb_recombination_bump(self, spectra):
        ls = np.asarray(spectra.ls)
        bb = np.asarray(spectra.bb) * MUK2
        ipk = np.argmax(bb[: 300 - 2])
        assert 78 <= ls[ipk] <= 98, ls[ipk]
        assert 4e-3 < bb[ipk] < 1.1e-2, bb[ipk]

    def test_tt_plateau_amplitude(self, spectra):
        ls = np.asarray(spectra.ls)
        tt = np.asarray(spectra.tt) * MUK2
        v = tt[ls == 10][0]
        assert 35.0 < v < 65.0, v    # CAMB r=0.1: ~50 muK^2

    def test_ee_bb_ratio_near_peak(self, spectra):
        ls = np.asarray(spectra.ls)
        bb = np.asarray(spectra.bb)
        ee = np.asarray(spectra.ee)
        ipk = np.argmax(bb[: 300 - 2])
        ratio = ee[ipk] / bb[ipk]
        assert 1.0 < ratio < 2.0, ratio

    def test_reionization_bump_exists(self, spectra):
        """BB at l < 10 is nonzero (reionization rescattering)."""
        bb = np.asarray(spectra.bb) * MUK2
        assert bb[2] > 2e-4   # l=4

    def test_linear_in_r_and_zero_at_zero(self, thermo):
        bg, tf, tau0 = thermo
        to = evolve_tensors(bg, tf, tau0,
                            jnp.asarray(tensor_k_grid(nk=24)))
        s1 = compute_tensor_cls(to, PrimordialParams.make(r=0.05), lmax=200)
        s2 = compute_tensor_cls(to, PrimordialParams.make(r=0.10), lmax=200)
        s0 = compute_tensor_cls(to, PrimordialParams.make(r=0.0), lmax=200)
        np.testing.assert_allclose(np.asarray(s2.bb), 2 * np.asarray(s1.bb),
                                   rtol=1e-10)
        assert np.all(np.asarray(s0.bb) == 0.0)

    def test_damping_reduces_bb(self, thermo):
        """Anisotropic-stress feedback must lower BB power (neutrino
        damping), not raise it."""
        bg, tf, tau0 = thermo
        k = jnp.asarray(tensor_k_grid(nk=24))
        pp = PrimordialParams.make(r=0.1)
        on = compute_tensor_cls(evolve_tensors(bg, tf, tau0, k), pp, lmax=200)
        off = compute_tensor_cls(
            evolve_tensors(bg, tf, tau0, k, anisotropic_feedback=False),
            pp, lmax=200)
        ls = np.asarray(on.ls)
        sel = ls >= 60
        ratio = np.asarray(on.bb)[sel] / np.asarray(off.bb)[sel]
        # the BB bump multipoles map to k ~ 0.004-0.015/Mpc, entering the
        # horizon around/after matter-radiation equality, so only a few
        # percent of Weinberg's deep-RD 36% power suppression survives;
        # the band-median must drop, but not by much (the deep-RD
        # magnitude is pinned exactly by test_weinberg_neutrino_damping)
        assert 0.9 < np.median(ratio) < 0.999, np.median(ratio)
