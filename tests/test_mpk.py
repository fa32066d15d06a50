"""MPK / WiggleZ windowed-P(k) likelihoods on the real in-tree data.

Oracle strategy: the chi^2 math (windows, D_V scaling, bias/Q
marginalization) is re-implemented independently in numpy here, following
source/mpk.f90:247-410 and source/wigglez.f90:473-649 line by line; the
JAX likelihood must match it on the real WiggleZ nov11 / SDSS LRG DR4
files with a synthetic smooth theory P(k). This pins the vectorized JAX
path against the reference algebra and the real file parsing.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.mpk import MPKLikelihood, WiggleZLikelihood
from cosmomc_tpu.models.matterpower import MatterPower

REF = os.environ.get("COSMOMC_DATA", "/root/reference/data")
WZ_A = os.path.join(REF, "wigglez_nov11a.dataset")
LRG = os.path.join(REF, "sdss_lrgDR4.dataset")

needs_data = pytest.mark.skipif(not os.path.isfile(WZ_A),
                                reason="reference data not present")


class FakeBG:
    H0 = jnp.asarray(70.0)


class FakeTheory:
    """Smooth synthetic P(k): h-unit power-law with a gentle BAO-less bump,
    packed into MatterPower tables the likelihood consumes."""

    def __init__(self, z, h=0.7, a_scl_dv=1.0):
        self.bg = FakeBG()
        k = np.logspace(-4, 1.2, 400)           # 1/Mpc
        kh = k / h
        # eyeball-LCDM-shaped: P peaks around k/h ~ 0.015
        P_h = 2.4e4 * (kh / 0.015) / (1.0 + (kh / 0.015) ** 2.8)  # (Mpc/h)^3
        P = P_h / h ** 3
        zs = np.asarray([0.0, float(z) + 0.2])
        lnP = np.log(np.tile(P, (2, 1)))
        self.mp = MatterPower(jnp.asarray(k), jnp.asarray(zs),
                              jnp.asarray(lnP), jnp.asarray(lnP),
                              jnp.asarray(lnP), jnp.asarray([0.8, 0.78]),
                              jnp.asarray([0.45, 0.44]), jnp.asarray(h))
        self._P_of_kh = lambda khq: np.interp(khq, kh, P_h)
        self.bf = None          # D_V comes from bao_d_v(bf, z); patched below


def _dv_patch(monkeypatch, dv_value):
    from cosmomc_tpu.likelihoods import mpk as mpkmod
    monkeypatch.setattr(mpkmod.bgm, "bao_d_v",
                        lambda bf, z: jnp.asarray(dv_value))


@needs_data
def test_wigglez_chisq_vs_numpy_oracle(monkeypatch):
    like = WiggleZLikelihood(WZ_A, use_gigglez=True, dtype=jnp.float64)
    th = FakeTheory(like.redshift)
    dv = 61461.2751075690 / 70.0 / 1.03     # a_scl = 1.03
    _dv_patch(monkeypatch, dv)

    got = float(like.log_like(th, jnp.zeros((0,))))

    # ---- independent numpy implementation of the chi^2 algebra ----
    # (theory values taken from the likelihood's own lookup so this pins
    # the windows/marginalization math, not the P(k) interpolation scheme)
    a_scl = like.DV_fid / (70.0 * dv)
    P_j, kh_j = like._theory_pk_h(th, like.kh, jnp.asarray(a_scl))
    kh = np.asarray(kh_j, np.float64)
    P_lin = np.asarray(P_j, np.float64)
    assert np.allclose(P_lin, th._P_of_kh(kh) / a_scl ** 3, rtol=2e-3)
    # gigglez correction
    fid = 10.0 ** np.polyval(like._gig_poly, kh)
    tab = np.exp(np.interp(np.log(kh), like._gig_logk, like._gig_logP))
    P_lin = P_lin * fid / tab
    covdat = np.einsum("rij,rj->ri", like.invcov, like.P_data)
    WPth = np.einsum("rik,k->ri", like.W, P_lin)
    covth = np.einsum("rij,rj->ri", like.invcov, WPth)
    normV = np.sum(WPth * covth)
    chisq = np.sum(like.P_data * covdat) - np.sum(WPth * covdat) ** 2 / normV
    expect = chisq / 2.0
    assert got == pytest.approx(expect, rel=1e-8), (got, expect)
    # and it's a plausible chi2 for 18 points x 7 regions with a crude theory
    assert 0 < got < 1e5


@needs_data
def test_wigglez_all_bins_load():
    for tag in "abcd":
        like = WiggleZLikelihood(os.path.join(REF, f"wigglez_nov11{tag}.dataset"),
                                 dtype=jnp.float64)
        assert like.P_data.shape == (7, 18)
        assert like.W.shape == (7, 18, 100)
        assert like.required_zmax in (0.22, 0.41, 0.6, 0.78)


@needs_data
def test_lrg_qflat_vs_numpy_oracle(monkeypatch):
    like = MPKLikelihood(LRG, dtype=jnp.float64)
    assert like.Q_marge and like.Q_flat
    th = FakeTheory(like.redshift)
    dv = like.DV_fid / 70.0 / 0.98
    _dv_patch(monkeypatch, dv)
    got = float(like.log_like(th, jnp.zeros((0,))))

    a_scl = like.DV_fid / (70.0 * dv)
    P_j, kh_j = like._theory_pk_h(th, like.kh, jnp.asarray(a_scl))
    kh = np.asarray(kh_j, np.float64)
    P_lin = np.asarray(P_j, np.float64)
    Pth = P_lin / (1.0 + like.Ag * kh)
    Pk2 = Pth * kh ** 2
    WPth = like.W @ Pth
    WPk2 = like.W @ Pk2
    covdat = like.invcov @ like.P_data
    covth = like.invcov @ WPth
    covk2 = like.invcov @ WPk2
    Mat = np.array([[covth @ WPth, covth @ WPk2],
                    [covth @ WPk2, covk2 @ WPk2]])
    vec = np.array([covdat @ WPth, covdat @ WPk2])
    lnlike = (like.P_data @ covdat - vec @ np.linalg.inv(Mat) @ vec
              + np.log(np.linalg.det(Mat))) / 2.0
    assert got == pytest.approx(float(lnlike), rel=1e-8)


@needs_data
def test_mpk_jit_and_grad(monkeypatch):
    """The likelihood is jit-able and differentiable w.r.t. the theory."""
    like = WiggleZLikelihood(WZ_A, dtype=jnp.float64)
    _dv_patch(monkeypatch, 61461.2751075690 / 70.0)

    def f(amp):
        th = FakeTheory(like.redshift)
        mp = th.mp._replace(lnP=th.mp.lnP + jnp.log(amp),
                            lnP_nl=th.mp.lnP_nl + jnp.log(amp))
        th.mp = mp
        return like.log_like(th, jnp.zeros((0,)))

    g = jax.grad(f)(jnp.asarray(1.0, jnp.float64))
    assert np.isfinite(float(g))
