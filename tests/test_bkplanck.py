"""BK15-style B-mode likelihood (likelihoods/bkplanck.py) vs the reference
foreground model (CMB_BK_Planck.f90).

The in-tree BK15 dataset ships bandpowers/noise/fiducial/windows/bandpasses
but NOT its covariance (BK15_covmat_dust.dat is absent from the read-only
data mirror), so the end-to-end chi^2 uses a synthetic diagonal covariance;
the foreground model itself — the part CMB_BK_Planck.f90 adds on top of the
already-oracle-pinned CMBlikes engine — is pinned against independent
numpy evaluations of the reference's formulas (DustScaling :116-165,
SyncScaling :167-196, Decorrelation :197-243, AddForegrounds :245-344).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cosmomc_tpu.likelihoods.bkplanck import (BKPlanckLikelihood, Bandpass,
                                              GHZ_KELVIN, T_CMB, L_PIVOT)

DATA = "/root/reference/data/BK15"
BANDS = ["BK15_95_B", "BK15_150_B", "BK15_220_B"]


def synth_overrides(tmp_path, maps=BANDS):
    pairs = []
    for i in range(len(maps)):
        for j in range(i + 1):
            pairs.append(f"{maps[i]}x{maps[j]}")
    n = 9 * len(pairs)
    cov = np.eye(n) * 1e-4
    path = os.path.join(tmp_path, "cov_synth.dat")
    np.savetxt(path, cov)
    return {"maps_use": " ".join(maps), "covmat_fiducial": path,
            "covmat_cl": " ".join(pairs)}


@pytest.fixture(scope="module")
def like(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("bk"))
    return BKPlanckLikelihood(f"{DATA}/BK15_dust.dataset",
                              dataset_overrides=synth_overrides(tmp))


def ref_dust_scaling(beta, Tdust, bp: Bandpass, nu0, bce=1.0):
    """Independent numpy transcription of DustScaling for the test."""
    gb_int = np.sum(bp.dnu * bp.resp * bp.nu ** (3 + beta)
                    / np.expm1(GHZ_KELVIN * bp.nu / Tdust))
    gb0 = nu0 ** (3 + beta) / np.expm1(GHZ_KELVIN * nu0 / Tdust)
    if bce != 1.0:
        nb = bp.nu_bar
        th_err = (bce ** 4 * np.exp(GHZ_KELVIN * nb * (bce - 1) / T_CMB)
                  * np.expm1(GHZ_KELVIN * nb / T_CMB) ** 2
                  / np.expm1(GHZ_KELVIN * nb * bce / T_CMB) ** 2)
        gb_err = (bce ** (3 + beta) * np.expm1(GHZ_KELVIN * nb / Tdust)
                  / np.expm1(GHZ_KELVIN * nb * bce / Tdust))
    else:
        th_err = gb_err = 1.0
    return (gb_int / gb0) / bp.th_dust * (gb_err / th_err)


def test_dust_scaling_matches_reference_formula(like):
    got = np.asarray(like._dust_scaling(jnp.float64(1.59), jnp.float64(19.6),
                                        jnp.ones(3)))
    for i, bp in enumerate(like.bandpasses):
        want = ref_dust_scaling(1.59, 19.6, bp, 353.0)
        assert got[i] == pytest.approx(want, rel=1e-10)
    # dust grows with frequency toward the 353 pivot
    assert got[0] < got[1] < got[2] < 1.0


def test_dust_scaling_with_bandcenter_error(like):
    bce = np.array([1.02, 1.0, 0.98])
    got = np.asarray(like._dust_scaling(jnp.float64(1.59), jnp.float64(19.6),
                                        jnp.asarray(bce)))
    for i, bp in enumerate(like.bandpasses):
        want = ref_dust_scaling(1.59, 19.6, bp, 353.0, bce[i])
        assert got[i] == pytest.approx(want, rel=1e-9)


def test_sync_scaling_direction(like):
    got = np.asarray(like._sync_scaling(jnp.float64(-3.1), jnp.ones(3)))
    # synchrotron falls steeply from the 23 GHz pivot
    assert got[0] > got[1] > got[2]
    assert got[0] < 0.1
    # independent power-law check at 95 GHz
    bp = like.bandpasses[0]
    pl_int = np.sum(bp.dnu * bp.resp * bp.nu ** (2 - 3.1))
    want = (pl_int / 23.0 ** (2 - 3.1)) / bp.th_sync
    assert got[0] == pytest.approx(want, rel=1e-10)


def test_decorrelation_remap(like):
    """Deltap = exp(ln Delta * scl_nu * scl_ell), lin ell form (App. F)."""
    ells = jnp.asarray([20.0, 80.0, 320.0])
    D = jnp.float64(0.97)
    nu_i = jnp.asarray([217.0])
    nu_j = jnp.asarray([353.0])
    got = np.asarray(like._decorrelation(D, nu_i, nu_j, (217.0, 353.0),
                                         "lin", ells))[0]
    scl_ell = np.array([20, 80, 320]) / L_PIVOT
    want = np.exp(np.log(0.97) * 1.0 * scl_ell)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # at the pivot pair and l=80, decorrelation equals Delta itself
    assert got[1] == pytest.approx(0.97, rel=1e-12)


def test_foreground_power_at_pivot(like):
    """A pure-dust model must produce fdust_i*fdust_j*Adust*(l/80)^alpha
    in every BB spectrum (AddForegrounds :300-330)."""
    n_req = like.nmaps_required
    nL = like.pcl_lmax - like.pcl_lmin + 1
    zero = jnp.zeros((len(like.req_pairs), nL))
    # all params at baseline except sync off
    vals = dict(zip(like._fg_names, like._fg_centers))
    vals.update(BBdust=5.0, BBsync=0.0, BBdustsynccorr=0.0)
    nu = jnp.asarray([vals[n] for i, n in enumerate(like._fg_names)
                      if like._fg_slice_pos[i] >= 0])
    out = np.asarray(like.add_foregrounds(zero, nu))
    fd = np.asarray(like._dust_scaling(jnp.float64(vals["BBbetadust"]),
                                       jnp.float64(vals["BBTdust"]),
                                       jnp.ones(n_req)))
    ells = np.arange(like.pcl_lmin, like.pcl_lmax + 1)
    for row, (i, j) in enumerate(like.req_pairs):
        want = fd[i] * fd[j] * 5.0 * (ells / 80.0) ** vals["BBalphadust"]
        np.testing.assert_allclose(out[row], want, rtol=1e-9)


def test_full_likelihood_finite_and_responsive(like):
    """chi^2 with the real BK15 bandpowers + synthetic covariance: finite,
    and increasing dust amplitude moves it."""
    lmax = like.pcl_lmax
    cls = jnp.zeros((4, 4, lmax + 1))
    nu0 = jnp.asarray([p.center for p in like.nuisance if p.varying])
    v0 = float(like.log_like_cls(cls, nu0))
    assert np.isfinite(v0)
    i_adust = int(like._fg_slice_pos[like._fg_names.index("BBdust")])
    nu1 = nu0.at[i_adust].set(12.0)
    v1 = float(like.log_like_cls(cls, nu1))
    assert np.isfinite(v1) and v1 != pytest.approx(v0)


def test_driver_detects_bk_datasets(tmp_path):
    """cmb_dataset[] with bandpass keys builds a BKPlanckLikelihood."""
    from cosmomc_tpu.driver import build_likelihoods
    from cosmomc_tpu.utils.ini import IniFile
    ov = synth_overrides(str(tmp_path))
    ini = IniFile(keys={
        "cmb_dataset[BK15]": f"{DATA}/BK15_dust.dataset",
        "cmb_dataset[BK15,maps_use]": ov["maps_use"],
        "cmb_dataset[BK15,covmat_fiducial]": ov["covmat_fiducial"],
        "cmb_dataset[BK15,covmat_cl]": ov["covmat_cl"],
    })
    likes, needs_cls = build_likelihoods(ini, jnp.float64)
    assert needs_cls
    assert type(likes.likes[0]).__name__ == "BKPlanckLikelihood"
