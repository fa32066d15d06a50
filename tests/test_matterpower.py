"""Matter power spectrum parity vs pinned reference (CAMB) values.

Oracle: /root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum — the
Planck 2018 best fit computed by the reference's CAMB, which lists derived
sigma8(z) and f sigma8(z) at z = 0, 0.15, 0.38, 0.51, 0.61, 2.33.
Current solver accuracy is ~1.5% (massless-nu perturbation approximation +
delta_cb vs delta_tot convention); the tolerance pins that level so
regressions are caught and improvements can tighten it.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.models.matterpower import (compute_matter_power, power_at,
                                            sigma_r, matter_k_grid)

ZS = (0.0, 0.15, 0.38, 0.51, 0.61, 2.33)
REF_S8 = {0.0: 0.8119545, 0.15: 0.7498653, 0.38: 0.6642308,
          0.51: 0.6214160, 0.61: 0.5911708, 2.33: 0.3069371}
REF_FS8 = {0.15: 0.4605277, 0.38: 0.4779339, 0.51: 0.4760216,
           0.61: 0.4706936, 2.33: 0.2979012}


@pytest.fixture(scope="module")
def mp():
    bg = BackgroundParams.make(ombh2=0.0223774, omch2=0.1201035,
                               H0=67.32178, omk=0.0, omnuh2=0.06 / 93.14,
                               nnu=3.046)
    pp = PrimordialParams.make(logA=3.0447, ns=0.96589)
    out = jax.jit(lambda: compute_matter_power(bg, pp, 0.0543014, 0.2454,
                                               ZS))()
    jax.block_until_ready(out)
    return out


def test_sigma8_vs_reference(mp):
    for i, z in enumerate(ZS):
        s8 = float(mp.sigma8_z[i])
        assert abs(s8 / REF_S8[z] - 1) < 0.025, (z, s8, REF_S8[z])


def test_fsigma8_vs_reference(mp):
    for i, z in enumerate(ZS):
        if z in REF_FS8:
            fs8 = float(mp.fsigma8_z[i])
            assert abs(fs8 / REF_FS8[z] - 1) < 0.025, (z, fs8, REF_FS8[z])


def test_halofit_regression(mp):
    # pinned values from this implementation at the Planck best fit;
    # effective-index diagnostics agree with published LCDM numbers
    # (ksig ~ 0.35 h/Mpc, neff ~ -1.73, C ~ 0.35)
    ratios = {0.1: 1.084, 0.5: 4.013, 1.0: 9.316}
    for kq, want in ratios.items():
        r = float(power_at(mp, kq, 0.0, nonlinear=True)
                  / power_at(mp, kq, 0.0))
        assert abs(r / want - 1) < 0.05, (kq, r, want)
    # halofit must leave large scales alone
    r = float(power_at(mp, 0.01, 0.0, nonlinear=True)
              / power_at(mp, 0.01, 0.0))
    assert abs(r - 1) < 0.02


def test_power_at_interp_and_extrapolation(mp):
    # table reproduction at nodes
    iz, ik = 2, 100
    got = float(power_at(mp, mp.k[ik], mp.z[iz]))
    want = float(jnp.exp(mp.lnP[iz, ik]))
    assert abs(got / want - 1) < 1e-6
    # log-linear extrapolation beyond kmax is monotone decreasing
    kmax = float(mp.k[-1])
    p1 = float(power_at(mp, kmax * 2, 0.0))
    p2 = float(power_at(mp, kmax * 8, 0.0))
    assert 0 < p2 < p1 < float(power_at(mp, kmax, 0.0))
    # z interpolation between nodes stays between node values
    pz = float(power_at(mp, 0.1, 0.2))
    pa = float(power_at(mp, 0.1, 0.15))
    pb = float(power_at(mp, 0.1, 0.38))
    assert pb < pz < pa


def test_sigma_r_tophat(mp):
    # sigma_R at R=8/h must equal the sigma8 table entry
    s = float(sigma_r(mp, 8.0 / float(mp.h), z_index=0))
    assert abs(s / float(mp.sigma8_z[0]) - 1) < 1e-10


def test_cl_run_unaffected_by_rsa():
    """The C_l source run (kmax=0.45) must be essentially unchanged by the
    RSA switch: only k > 240/tau0 ~ 0.017 lanes ever trigger it, and only
    at late times where the sources are ISW-dominated."""
    from cosmomc_tpu.models.cmb import compute_transfers, source_k_grid
    bg = BackgroundParams.make(ombh2=0.0223774, omch2=0.1201035,
                               H0=67.32178)
    k = source_k_grid()[:40]  # low-k subset (cheap); most RSA-affected
    po, chi_star = compute_transfers(bg, 0.0543, 0.2454, k)
    assert bool(jnp.all(jnp.isfinite(po.s0)))
    assert bool(jnp.all(jnp.isfinite(po.delta_m)))
