"""Correlated CDM-isocurvature mode (reference alpha1 /
iso_cdm_correlated: CosmologyParameterizations.f90:332,
Calculator_CAMB.f90:109-111, camb/equations_ppf.f90 `initial` iso-CDM
row). Checks: exact adiabatic limit, linear-response structure of the
correlated admixture, and the known red shape of the pure-iso TT
spectrum."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.cmb import (compute_transfers, cls_from_transfers,
                                    source_k_grid)
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

F = jnp.float64
LMAX = 220


def _spec(iso_amp, lmax=LMAX):
    bg = BackgroundParams(
        ombh2=F(0.0224), omch2=F(0.12), H0=F(67.5), omk=F(0.0),
        omnuh2=F(mnu_to_omnuh2(0.06)), nnu=F(3.046), w=F(-1.0), wa=F(0.0),
        tcmb=F(2.7255), num_massive_nu=1)
    k = source_k_grid(kmax=0.12, nk_log=28, nk_lin=56)
    po, chi = compute_transfers(bg, F(0.055), F(0.2454), k, n_step=2048,
                                iso_cdm_amp=iso_amp)
    pp = PrimordialParams.make(logA=3.044, ns=0.965)
    return np.asarray(cls_from_transfers(po, chi, pp, lmax=lmax,
                                         coarse_k=k).tt)


def test_adiabatic_limit_and_linear_response():
    tt0 = _spec(0.0)
    # static fast path == beta=0 traced path
    ttz = _spec(jnp.asarray(0.0, F))
    np.testing.assert_allclose(ttz, tt0, rtol=1e-10)
    # correlated admixture: C_l(b) = C_ad + 2 b C_cross + b^2 C_iso —
    # exactly quadratic in b, so the symmetric/antisymmetric combinations
    # isolate the cross and iso terms
    b = 0.2
    tp = _spec(jnp.asarray(b, F))
    tm = _spec(jnp.asarray(-b, F))
    iso_b2 = 0.5 * (tp + tm) - tt0          # b^2 C_iso
    # pure-iso part must be a positive power spectrum
    assert (iso_b2 > -1e-8 * np.abs(tt0)).all()
    # quadratic-form consistency at a different amplitude: C(2b) - C(0)
    # = 2*(2b/ b)... check C(2b) = C0 + 2(2b)Ccross + (2b)^2 Ciso
    cross_b = 0.5 * (tp - tm)               # 2 b C_cross
    t2 = _spec(jnp.asarray(2 * b, F))
    pred = tt0 + 2.0 * cross_b + 4.0 * iso_b2
    np.testing.assert_allclose(t2, pred, rtol=5e-4, atol=1e-6)


def test_iso_spectrum_is_red():
    """The CDM-iso TT spectrum is steeply red: l(l+1)C_l falls by more
    than 3x from l~10 to l~150 (vs the flat adiabatic SW plateau)."""
    tt0 = _spec(0.0)
    b = 0.35
    tp = _spec(jnp.asarray(b, F))
    tm = _spec(jnp.asarray(-b, F))
    iso = 0.5 * (tp + tm) - tt0
    ls = np.arange(2, 2 + len(iso))
    m10 = (ls >= 8) & (ls <= 15)
    m150 = (ls >= 120) & (ls <= 180)
    assert iso[m10].mean() > 3.0 * iso[m150].mean(), \
        (iso[m10].mean(), iso[m150].mean())
    # and the adiabatic spectrum is NOT red like this (plateau to first
    # peak rise): guards against the test passing vacuously
    assert tt0[m150].mean() > tt0[m10].mean()
