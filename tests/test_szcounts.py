"""SZ cluster-counts likelihood vs an independent numpy oracle.

The oracle re-implements the reference's algorithm (szcounts.f90
deltaN_yz/grid_C_2d/get_grid/SZCC_Cash) with Fortran-style loops and
direct integrals (no splines, nearest-point theta search), on the real
Planck SZ data files in /root/reference/data.  The JAX implementation is
a matmul-structured re-design; both must produce the same counts.
"""

import math
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.special import erf as sperf

from cosmomc_tpu.likelihoods.szcounts import (
    SZCountsLikelihood, Q_THRESHOLD, DZ, DLOGY, DLNM, DELTA_SO,
    FULL_SKY_SR, RHOCRIT0, THETA_STAR, YSTAR_NORM,
    _TINKER_LOGD, _TINKER_Y, _TINKER_Y2)
from cosmomc_tpu.models import background as bgm
from cosmomc_tpu.models import constants as const
from cosmomc_tpu.models.matterpower import MatterPower
from cosmomc_tpu.models.theory import CMBTheoryProducts

DATA = "/root/reference/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference data not present")

NUIS = np.array([1.789, -0.186, 0.80, 0.075, 2.0 / 3.0])


def _fake_theory():
    """Analytic BBKS-shaped P(k) theory bundle (no Boltzmann solve)."""
    bg = bgm.BackgroundParams.make(ombh2=0.0222, omch2=0.1197, H0=67.5,
                                   dtype=jnp.float64)
    bf = bgm.background_functions(bg)
    h = 67.5 / 100.0
    omm = (0.0222 + 0.1197 + 0.000644) / h ** 2
    k = np.exp(np.linspace(np.log(1e-4), np.log(20.0), 600))   # 1/Mpc
    q = k / (omm * h ** 2 * np.exp(-0.0222 / h ** 2 * (1 + np.sqrt(2 * h)
                                                       / omm)))
    T = (np.log(1 + 2.34 * q) / (2.34 * q)
         * (1 + 3.89 * q + (16.1 * q) ** 2 + (5.46 * q) ** 3
            + (6.71 * q) ** 4) ** -0.25)
    P_shape = (k / 0.05) ** (0.96 - 1.0) * k * T ** 2   # BBKS-shaped P(k)

    def sig8(row):
        x = k * (8.0 / h)
        w = np.where(x < 1e-3, 1 - x ** 2 / 10,
                     3 * (np.sin(x) - x * np.cos(x)) / np.maximum(x, 1e-9) ** 3)
        d2 = k ** 3 / (2 * np.pi ** 2) * np.exp(row)
        return np.sqrt(np.trapezoid(d2 * w ** 2, np.log(k)))

    # normalize to sigma8(0) = 0.81
    lnP0 = np.log(P_shape) + 2 * np.log(0.81 / sig8(np.log(P_shape)))
    z = np.array([0.0, 0.3, 0.7, 1.2, 2.0])
    D = 1.0 / (1.0 + z) * (1 + 0.2 * z)     # made-up smooth growth
    lnP = lnP0[None, :] + 2 * np.log(D)[:, None]
    s8 = np.array([sig8(r) for r in lnP])
    mp = MatterPower(k=jnp.asarray(k), z=jnp.asarray(z),
                     lnP=jnp.asarray(lnP), lnP_nl=jnp.asarray(lnP),
                     lnP_weyl=jnp.asarray(lnP), sigma8_z=jnp.asarray(s8),
                     fsigma8_z=jnp.asarray(s8), h=jnp.asarray(h))
    th = CMBTheoryProducts(bg=bg, bf=bf, rs_drag=jnp.asarray(147.0),
                           cls=None, z_pk=mp.z, sigma8_z=mp.sigma8_z,
                           fsigma8_z=mp.fsigma8_z, mp=mp)
    return th, k, lnP, z, s8, omm


def _oracle_counts(like, th, k, lnP, ztab, s8tab, omm):
    """Reference-style loop evaluation of DN[zbin, qbin]."""
    alpha, log10ystar, bias, sigmaM, beta = NUIS
    bg = th.bg
    H0 = float(bg.H0)
    h = H0 / 100.0

    zf = like.steps_z
    a = 1.0 / (1.0 + zf)
    Ez = np.asarray(bgm.hubble_mpc(bg, a) / bgm.hubble_mpc(bg, 1.0))
    da_h = np.asarray(bgm.angular_diameter_distance(th.bf, zf)) * h
    r_h = da_h * (1.0 + zf)
    g = np.interp(zf, ztab, s8tab) / s8tab[0]
    omm_z = omm * (1.0 + zf) ** 3 / Ez ** 2
    rhom0 = omm * RHOCRIT0

    # direct sigma(R) + derivative at z=0 (no spline)
    lnk = np.log(k)
    d2 = k ** 3 / (2 * np.pi ** 2) * np.exp(lnP[0])

    def sigma(R_h):
        x = k * (np.atleast_1d(R_h)[:, None] / h)
        w = np.where(x < 1e-3, 1 - x ** 2 / 10,
                     3 * (np.sin(x) - x * np.cos(x)) / np.maximum(x, 1e-9) ** 3)
        return np.sqrt(np.trapezoid(d2[None] * w ** 2, lnk, axis=-1))

    def splint(ya, y2a, x):
        i = np.searchsorted(_TINKER_LOGD, x) - 1
        i = min(max(i, 0), len(_TINKER_LOGD) - 2)
        hh = _TINKER_LOGD[i + 1] - _TINKER_LOGD[i]
        A = (_TINKER_LOGD[i + 1] - x) / hh
        B = (x - _TINKER_LOGD[i]) / hh
        return (A * ya[i] + B * ya[i + 1]
                + ((A ** 3 - A) * y2a[i] + (B ** 3 - B) * y2a[i + 1])
                * hh ** 2 / 6.0)

    m = np.exp(like.steps_m)                      # (nm,) h^-1 Msun
    R = (0.75 * m / np.pi / rhom0) ** (1. / 3.)   # (nm,) h^-1 Mpc
    sR = sigma(R)
    eps = 1e-4
    dlnsig = (np.log(sigma(R * (1 + eps))) - np.log(sigma(R * (1 - eps)))) \
        / (2 * eps)

    # independent erf tables
    y0 = np.exp(like.lny)
    qlo = 10.0 ** (like.logy_centers - 0.5 * DLOGY)
    qhi = 10.0 ** (like.logy_centers + 0.5 * DLOGY)
    nq = like.ny + 1
    nt = len(like.thetas)
    E = np.zeros((len(y0), nt, nq))
    for j in range(nt):
        sn = like.ylims[:, j]                     # (npatch,)
        det = 0.5 * (sperf((y0[:, None] - Q_THRESHOLD * sn) / (np.sqrt(2.) * sn)) + 1)
        for kk in range(nq):
            lo = 0.5 * (sperf((y0[:, None] - qlo[kk] * sn) / (np.sqrt(2.) * sn)) + 1)
            hi = 0.5 * (sperf((y0[:, None] - qhi[kk] * sn) / (np.sqrt(2.) * sn)) + 1)
            if kk == 0:
                c2 = det * (1 - hi)
            elif kk == nq - 1:
                c2 = det * lo
            else:
                c2 = det * lo * (1 - hi)
            E[:, j, kk] = c2 @ like.skyfracs

    fac = 1.0 / np.sqrt(2 * np.pi * sigmaM ** 2)
    dy = np.diff(y0)
    nm, nzf = len(m), len(zf)
    compl = np.zeros((nm, nzf, nq))
    thetas = like.thetas
    for jz in range(nzf):
        m2 = m * bias
        mscale = m2 / 3.0e14 * (100.0 / H0)
        dterm = 100.0 * da_h[jz] / (500.0 * H0)
        th500 = (THETA_STAR * (H0 / 70.) ** (-2. / 3.) * mscale ** (1. / 3.)
                 * Ez[jz] ** (-2. / 3.) / dterm)
        ystar2 = 10.0 ** log10ystar / 2.0 ** alpha * YSTAR_NORM \
            * (H0 / 70.0) ** (alpha - 2.0)
        y500 = ystar2 * mscale ** alpha * Ez[jz] ** beta / dterm ** 2
        mu = np.log(y500)
        for im in range(nm):
            thp = th500[im]
            # Fortran nearest + side neighbor (szcounts.f90:1005-1023)
            if thp > thetas[-1]:
                l1, l2 = nt - 1, nt - 2
            elif thp < thetas[0]:
                l1, l2 = 0, 1
            else:
                l1 = int(np.abs(thetas - thp).argmin())
                l2 = l1 + 1 if thetas[l1] <= thp else l1 - 1
            t1, t2 = thetas[l1], thetas[l2]
            w2 = (thp - t1) / (t2 - t1)
            win = E[:, l1, :] * (1 - w2) + E[:, l2, :] * w2   # (nlny, nq)
            arg = (like.lny - mu[im]) / (np.sqrt(2.) * sigmaM)
            gk = fac / y0 * np.exp(-arg ** 2)                 # (nlny,)
            py = 0.5 * (win[:-1] * gk[:-1, None] + win[1:] * gk[1:, None]) \
                * dy[:, None]
            compl[im, jz] = np.clip(py.sum(0), 0.0, like.fsky)

    # abundance grid + z-bin trapezoid (get_grid + integrate_m_zq)
    c_100 = const.c / 1e5
    vol = c_100 * r_h ** 2 / Ez
    dsoz = DELTA_SO / omm_z
    grid = np.zeros((nm, nzf))
    for jz in range(nzf):
        ld = math.log10(dsoz[jz])
        A0 = splint(_TINKER_Y[0], _TINKER_Y2[0], ld) * (1 + zf[jz]) ** -0.14
        a0 = splint(_TINKER_Y[1], _TINKER_Y2[1], ld) * (1 + zf[jz]) ** -0.06
        alpha_t = 10 ** (-((0.75 / math.log10(dsoz[jz] / 75.)) ** 1.2))
        b0 = splint(_TINKER_Y[2], _TINKER_Y2[2], ld) * (1 + zf[jz]) ** -alpha_t
        c0 = splint(_TINKER_Y[3], _TINKER_Y2[3], ld)
        sg = sR * g[jz]
        f = A0 * ((sg / b0) ** -a0 + 1.0) * np.exp(-c0 / sg ** 2)
        grid[:, jz] = -(rhom0 / 3.0) * f * dlnsig / m * FULL_SKY_SR * vol[jz]

    edges_lo = like.z_centers - 0.5 * DZ
    edges_hi = like.z_centers + 0.5 * DZ
    DN = np.zeros((like.nz, nq))
    for b in range(like.nz):
        j1 = int(np.abs(zf - edges_lo[b]).argmin())
        j2 = int(np.abs(zf - edges_hi[b]).argmin())
        for j in range(j1, j2):
            hstep = zf[j + 1] - zf[j]
            f1 = (grid[:, j, None] * compl[:, j]).sum(0) * DLNM
            f2 = (grid[:, j + 1, None] * compl[:, j + 1]).sum(0) * DLNM
            DN[b] += 0.5 * (f1 + f2) * hstep
    return DN


@pytest.fixture(scope="module")
def sz_like():
    return SZCountsLikelihood(DATA, switch=2, dtype=jnp.float64)


@pytest.fixture(scope="module")
def fake_theory():
    return _fake_theory()


def test_data_loading(sz_like):
    like = sz_like
    assert len(like.skyfracs) == 417
    assert len(like.thetas) == 80
    assert like.ylims.shape == (417, 80)
    # Planck 2015 MMF3 cosmology sample: 439 clusters with q>=6 in the
    # union catalogue file (438 rows, all above threshold here)
    assert like.ncat > 400
    assert like.nz == 11 and like.ny == 4
    # catalogue counts total the catalogue size (missing-z rescaled)
    assert like.dncat_zq.sum() == pytest.approx(like.ncat, rel=1e-6)


def test_counts_match_oracle(sz_like, fake_theory):
    th, k, lnP, ztab, s8tab, omm = fake_theory
    DN = np.asarray(sz_like.theory_counts(th, jnp.asarray(NUIS)))
    DN_ref = _oracle_counts(sz_like, th, k, lnP, ztab, s8tab, omm)
    assert DN.shape == (11, 5)
    assert np.all(np.isfinite(DN))
    # totals in the same ballpark as the catalogue (sanity, not a fit)
    assert 20.0 < DN.sum() < 20000.0
    # pin against the loop oracle
    big = DN_ref.max()
    np.testing.assert_allclose(DN, DN_ref, rtol=2e-3, atol=2e-3 * big)


def test_cash_statistic_and_grad(sz_like, fake_theory):
    th = fake_theory[0]
    ll = jax.jit(sz_like.log_like)(th, jnp.asarray(NUIS))
    assert np.isfinite(float(ll))
    gfn = jax.grad(lambda n: sz_like.log_like(th, n))
    gv = np.asarray(gfn(jnp.asarray(NUIS)))
    assert np.all(np.isfinite(gv)) and np.any(gv != 0)


def test_1d_switch(fake_theory):
    like1 = SZCountsLikelihood(DATA, switch=1, dtype=jnp.float64)
    th = fake_theory[0]
    DN = np.asarray(like1.theory_counts(th, jnp.asarray(NUIS)))
    assert DN.shape == (11,)
    ll = float(like1.log_like(th, jnp.asarray(NUIS)))
    assert np.isfinite(ll)


def test_prior_switches():
    like = SZCountsLikelihood(DATA, priors={"prior_cccp": True,
                                            "prior_ystar_SZ": True},
                              dtype=jnp.float64)
    by_name = {p.name: p for p in like.nuisance}
    assert by_name["bias_SZ"].prior_mean == pytest.approx(0.780)
    assert by_name["bias_SZ"].prior_std == pytest.approx(0.092)
    assert by_name["ystar_SZ"].prior_mean == pytest.approx(-0.186)
