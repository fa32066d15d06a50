"""DES 1YR weak-lensing 2pt likelihood (likelihoods/wl.py) vs wl.f90.

Oracles:
  * structural: the shipped DES_1YR_final dataset + selection cuts must
    yield exactly 457 used data points (the published DES 1yr 2pt count);
  * physics: at the Planck-2018 fiducial cosmology the predicted
    xip/xim/gammat/wtheta must match the REAL DES measurements at the
    tens-of-percent level (they constrain the same sky);
  * component scalings implied by the model equations (wl.f90 calc_theory):
    xip ~ (1+m1)(1+m2), wtheta ~ b^2, source photo-z shifts move gammat.

The dataset's covariance file is not shipped in the read-only mirror, so a
synthetic identity covariance stands in (the chi^2 wiring is exercised, the
pinned numbers are theory-vector level).
"""

import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmomc_tpu.likelihoods.wl import WLLikelihood
from cosmomc_tpu.models.background import (BackgroundParams,
                                           background_functions)
from cosmomc_tpu.models.bbn import yhe_bbn
from cosmomc_tpu.models.matterpower import compute_matter_power
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.models.theory import CMBTheoryProducts

DES = "/root/reference/data/DES/DES_1YR_final.dataset"
N_DES_ROWS = 900


@pytest.fixture(scope="module")
def like(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wl")
    cov = str(tmp / "cov.dat")
    np.savetxt(cov, np.eye(N_DES_ROWS))
    return WLLikelihood(DES, dataset_overrides={"cov_file": cov})


@pytest.fixture(scope="module")
def theory():
    bg = BackgroundParams.make(ombh2=0.02237, omch2=0.1200, H0=67.36)
    pp = PrimordialParams.make(logA=3.044, ns=0.9649)
    yhe = yhe_bbn(bg.ombh2, 0.0)
    zg = tuple(sorted(set(
        [0.0, 0.2, 0.38, 0.51, 0.61, 1.0, 2.0]
        + list(np.expm1(np.linspace(np.log1p(2.0), np.log1p(3.6), 24))[1:]))))
    mp = compute_matter_power(bg, pp, 0.0544, yhe, z_outputs=zg)
    return CMBTheoryProducts(bg=bg, bf=background_functions(bg),
                             rs_drag=jnp.float64(147.09), mp=mp)


@pytest.fixture(scope="module")
def tvec_fn(like, theory):
    return jax.jit(lambda nu: like.theory_vector(theory, nu))


def centers(like):
    return jnp.asarray([p.center for p in like.nuisance if p.varying])


def type_mask(like, tp):
    return np.array([like.data_types[ti] == tp
                     for (ti, b1, b2, tb) in like.used_items])


def test_selection_cuts_match_des_published_count(like):
    assert like.num_used == 457
    assert like.num_z_bins == 4 and like.num_gal_bins == 5


def test_fiducial_theory_matches_des_data(like, tvec_fn):
    """Real-data agreement at the Planck fiducial, per 2pt type."""
    tv = np.asarray(tvec_fn(centers(like)))
    dv = like.data_vector
    for tp, lo, hi in [(0, 0.8, 1.5), (1, 0.8, 1.5),
                       (2, 0.45, 1.1), (3, 0.45, 1.1)]:
        sel = type_mask(like, tp)
        ratio = np.median(tv[sel] / dv[sel])
        assert lo < ratio < hi, (tp, ratio)


def test_shear_calibration_scaling(like, tvec_fn):
    """xip scales exactly by (1+m1)(1+m2) (cl2corr :636-641)."""
    nu0 = centers(like)
    names = [p.name for p in like.nuisance if p.varying]
    nu1 = nu0
    for i, nm in enumerate(names):
        if nm.startswith("DES_m"):
            nu1 = nu1.at[i].set(0.1)
    t0 = np.asarray(tvec_fn(nu0))
    t1 = np.asarray(tvec_fn(nu1))
    sel = type_mask(like, 0)   # xip
    np.testing.assert_allclose(t1[sel] / t0[sel],
                               (1.1 / 1.012) ** 2, rtol=1e-10)
    # wtheta is unaffected by shear calibration
    selw = type_mask(like, 3)
    np.testing.assert_allclose(t1[selw], t0[selw], rtol=1e-12)


def test_bias_scaling(like, tvec_fn):
    """wtheta ~ b^2, gammat ~ b (q_gal carries one bias power)."""
    nu0 = centers(like)
    names = [p.name for p in like.nuisance if p.varying]
    nu1 = nu0
    for i, nm in enumerate(names):
        if nm.startswith("DES_b"):
            nu1 = nu1.at[i].set(nu0[i] * 2.0)
    t0 = np.asarray(tvec_fn(nu0))
    t1 = np.asarray(tvec_fn(nu1))
    np.testing.assert_allclose(t1[type_mask(like, 3)]
                               / t0[type_mask(like, 3)], 4.0, rtol=1e-10)
    np.testing.assert_allclose(t1[type_mask(like, 2)]
                               / t0[type_mask(like, 2)], 2.0, rtol=1e-10)
    # cosmic shear has no bias dependence
    np.testing.assert_allclose(t1[type_mask(like, 0)],
                               t0[type_mask(like, 0)], rtol=1e-12)


def test_photoz_shift_moves_gammat(like, tvec_fn):
    nu0 = centers(like)
    names = [p.name for p in like.nuisance if p.varying]
    i = names.index("DES_DzS2")
    t0 = np.asarray(tvec_fn(nu0))
    t1 = np.asarray(tvec_fn(nu0.at[i].set(0.05)))
    sel = type_mask(like, 2)
    assert np.max(np.abs(t1[sel] / t0[sel] - 1.0)) > 0.01


def test_ia_amplitude_changes_xip(like, tvec_fn):
    nu0 = centers(like)
    names = [p.name for p in like.nuisance if p.varying]
    i = names.index("DES_AIA")
    t0 = np.asarray(tvec_fn(nu0))
    t1 = np.asarray(tvec_fn(nu0.at[i].set(3.0)))
    sel = type_mask(like, 0)
    assert np.max(np.abs(t1[sel] / t0[sel] - 1.0)) > 0.005


def test_loglike_finite_and_grad(like, theory):
    nu = centers(like)
    v = float(like.log_like(theory, nu))
    assert np.isfinite(v)
    g = jax.grad(lambda n: like.log_like(theory, n))(nu)
    assert np.all(np.isfinite(np.asarray(g)))
