"""Extended perturbation sectors: massive-neutrino momentum hierarchy and
dark-energy fluid perturbations (perturbations.make_rhs massive_nu/de_perts).

Reference physics being matched: camb/modules.f90 MassiveNu +
equations_ppf.f90 massive-nu sector (momentum-sampled Psi_l hierarchy,
MB95 eqs 55-58, 98) and the PPF dark-energy perturbations (equations_ppf
w0-wa; here a cs^2=1 fluid with regularized crossing — documented).

Cheap configs: reduced tau grid + coarse k so each evolution is seconds.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.perturbations import (build_thermo_funcs,
                                              evolve_perturbations,
                                              _nu_quadrature, NQ_NU,
                                              _NU_W, _NU_Q)
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

F = jnp.float64


def _bg(mnu=0.06, w=-1.0, wa=0.0):
    return BackgroundParams(
        ombh2=F(0.02238), omch2=F(0.1201), H0=F(67.32), omk=F(0.0),
        omnuh2=F(mnu_to_omnuh2(mnu)), nnu=F(3.046), w=F(w), wa=F(wa),
        tcmb=F(2.7255), num_massive_nu=1)


# Reduced tau grid (4096 of the default 8192): the cumulative-rescale grid
# construction inflates every dtau ~2x, so only modes with k*dtau inside
# the RK4 stability envelope are usable — cap k at 0.05 (the late-time
# dtau is ~10 Mpc here). The full-grid stack is exercised by test_cls.
K = np.array([0.003, 0.01, 0.03, 0.05])


def _sources(bg, massive_nu=False, de_perts=False):
    tf, tau0 = build_thermo_funcs(bg, F(0.2454), F(0.0543), n_step=4096)
    po = jax.jit(lambda: evolve_perturbations(
        bg, tf, tau0, jnp.asarray(K, F), massive_nu=massive_nu,
        de_perts=de_perts))()
    return po


def test_nu_quadrature():
    """Gauss nodes/weights integrate the q^3 f0 measure: sum of weights =
    7 pi^4/120 and low moments reproduced to ~1e-6."""
    n3 = 7.0 * np.pi ** 4 / 120.0
    assert abs(_NU_W.sum() / n3 - 1.0) < 1e-6
    # <q> under the measure: int q^4 f0 / int q^3 f0 = (4! eta(5))/(3! eta(4))
    q = np.linspace(1e-6, 45, 200001)
    w = q ** 3 / (np.exp(q) + 1)
    mq = np.trapezoid(w * q, q) / np.trapezoid(w, q)
    assert abs((_NU_W * _NU_Q).sum() / _NU_W.sum() - mq) < 1e-6


def test_massless_limit():
    """mnu -> 0: the momentum hierarchy must reproduce the massless-species
    evolution (the Psi_l integrals collapse onto the F_l hierarchy)."""
    a = _sources(_bg(mnu=1e-5), massive_nu=True)
    b = _sources(_bg(mnu=1e-5), massive_nu=False)
    for fld in ("s0", "slens", "delta_m"):
        x = np.asarray(getattr(a, fld))
        y = np.asarray(getattr(b, fld))
        sc = np.abs(y).max() + 1e-30
        assert np.abs(x - y).max() / sc < 2e-3, fld


def test_mnu_effect_small_but_nonzero():
    """mnu = 0.06 eV: hierarchy-vs-massless differences are sub-percent on
    the sources (the documented approximation scale) but measurably
    nonzero (the sector is actually wired in)."""
    a = _sources(_bg(0.06), massive_nu=True)
    b = _sources(_bg(0.06), massive_nu=False)
    x = np.asarray(a.delta_m)
    y = np.asarray(b.delta_m)
    rel = np.abs(x / y - 1.0)
    assert rel.max() < 0.02
    assert rel.max() > 1e-5


def test_de_w_minus1_identity():
    """w = -1: the DE fluid contributes identically zero (delta/V stay on
    their zero ICs), so enabling the sector must not change anything."""
    a = _sources(_bg(), de_perts=True)
    b = _sources(_bg(), de_perts=False)
    np.testing.assert_allclose(np.asarray(a.s0), np.asarray(b.s0),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a.delta_m), np.asarray(b.delta_m),
                               rtol=1e-12)


def test_de_fluid_engages_for_w_not_minus1():
    """w = -0.8: DE perturbations produce a small late-time effect on the
    matter transfer (smooth DE: sub-percent at these k) and stay finite."""
    a = _sources(_bg(w=-0.8), de_perts=True)
    b = _sources(_bg(w=-0.8), de_perts=False)
    x = np.asarray(a.delta_m)
    y = np.asarray(b.delta_m)
    assert np.all(np.isfinite(x))
    rel = np.abs(x / y - 1.0)
    assert 1e-7 < rel.max() < 0.03


def test_w0wa_crossing_finite():
    """CPL crossing w(a) through -1 (w0=-0.9, wa=-0.4): the regularized
    fluid stays finite through the crossing."""
    a = _sources(_bg(w=-0.9, wa=-0.4), de_perts=True, massive_nu=True)
    assert np.all(np.isfinite(np.asarray(a.s0)))
    assert np.all(np.isfinite(np.asarray(a.delta_m)))


def test_remat_gradient_full_boltzmann():
    """Checkpointed Boltzmann scan (remat_chunks): the full-path gradient
    runs in bounded memory and matches the forward value of the
    un-checkpointed scan. Tiny CMB config so the reverse pass is seconds."""
    from cosmomc_tpu.likelihoods.base import Likelihood, LikelihoodList
    from cosmomc_tpu.params.space import Param, Speed
    from cosmomc_tpu.params.parameterizations import ThetaParameterization
    from cosmomc_tpu.pipeline import CMBPosterior

    LMAX = 96

    class Tiny(Likelihood):
        kind = "CMB"

        def __init__(self):
            super().__init__("tiny")
            self.nuisance = [Param("cal_t", 1.0, 0.9, 1.1, 0.002, 0.002,
                                   speed=Speed.FAST)]

        def required_lmax(self):
            return LMAX

        def log_like(self, theory, nuisance):
            tt = theory.cls[0, 0, 2:LMAX + 1] / (nuisance[0] ** 2)
            return 0.5 * jnp.sum((tt / 1000.0 - 1.0) ** 2)

    def build(remat):
        par = ThetaParameterization(F)
        space = par.default_space()
        likes = LikelihoodList()
        likes.add(Tiny())
        return CMBPosterior(par, space, likes, lmax=LMAX, kmax=0.1,
                            n_step_boltzmann=1024, source_nk=(24, 48),
                            remat_chunks=remat, dtype=F)

    p_rm = build(32)
    p_plain = build(0)
    P = jnp.asarray([p.center for p in p_rm.space.varying], F)
    v_rm, _ = jax.jit(lambda p: p_rm.logpost()(p))(P)
    v_pl, _ = jax.jit(lambda p: p_plain.logpost()(p))(P)
    np.testing.assert_allclose(float(v_rm), float(v_pl), rtol=1e-9)
    # the reverse pass must RUN in bounded memory (the un-checkpointed
    # full-size scan OOMs); grad values FINITE (the r5 grad-hygiene fixes:
    # Newton-polished bisections for theta->H0 and tau->zre, double-where
    # guards in the recfast Saha quadratics, grid-aware TCA release) and
    # equal to the plain-path values.
    g_rm = np.asarray(jax.jit(jax.grad(lambda p: p_rm.logpost()(p)[0]))(P))
    g_pl = np.asarray(jax.jit(jax.grad(
        lambda p: p_plain.logpost()(p)[0]))(P))
    assert np.isfinite(g_rm).all(), g_rm
    assert np.isfinite(g_pl).all(), g_pl
    np.testing.assert_allclose(g_rm, g_pl, rtol=1e-6)
