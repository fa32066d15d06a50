"""Likelihood-layer tests against the reference's actual dataset files."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.bao import BAOLikelihood
from cosmomc_tpu.likelihoods.sn import SNLikelihood
from cosmomc_tpu.likelihoods.hst import HSTLikelihood
from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.theory import compute_background_theory

REF = "/root/reference/data"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")

PLANCK18 = dict(ombh2=0.022383, omch2=0.12011, H0=67.32, omnuh2=0.06 / 94.07)


@pytest.fixture(scope="module")
def theory():
    bg = BackgroundParams.make(**PLANCK18)
    return compute_background_theory(bg)


@needs_ref
class TestBAO:
    def test_dr12_loads_and_reasonable(self, theory):
        like = BAOLikelihood(f"{REF}/DR12/sdss_DR12Consensus_bao.dataset")
        assert like.z.shape == (6,)
        assert like.types[0] == "DM_over_rs"
        chi2 = 2 * float(like.log_like(theory, jnp.zeros(0)))
        # Planck18 params fit DR12 BAO well: chi2 ~ O(few) for 6 points
        assert 0.1 < chi2 < 20.0

    def test_theory_vector_scales(self, theory):
        like = BAOLikelihood(f"{REF}/DR12/sdss_DR12Consensus_bao.dataset")
        v = np.asarray(like.theory_vector(theory))
        obs = like.obs
        # each prediction within 10% of its measurement at Planck params
        assert np.all(np.abs(v / obs - 1.0) < 0.1)

    def test_6df_single_point(self, theory):
        like = BAOLikelihood(f"{REF}/sdss_6DF_bao.dataset")
        assert like.z[0] == pytest.approx(0.106)
        chi2 = 2 * float(like.log_like(theory, jnp.zeros(0)))
        assert chi2 < 10.0

    def test_mgs_dataset(self, theory):
        p = f"{REF}/sdss_MGS_bao.dataset"
        if not os.path.isfile(p):
            pytest.skip("no MGS dataset")
        try:
            like = BAOLikelihood(p)
        except ValueError:
            pytest.skip("MGS uses prob-dist format (not yet supported)")


@needs_ref
class TestSN:
    def test_pantheon(self, theory):
        like = SNLikelihood(f"{REF}/Pantheon/full_long.dataset")
        assert like.nsn == 1048
        assert not like.varying_alpha_beta  # Pantheon: pre-standardized
        chi2 = 2 * float(like.log_like(theory, jnp.zeros(0)))
        # stat-only Pantheon chi2/dof ~ 1
        assert 0.5 < chi2 / like.nsn < 2.0

    def test_jla(self, theory):
        like = SNLikelihood(f"{REF}/jla.dataset")
        assert like.nsn == 740
        assert like.varying_alpha_beta
        assert [p.name for p in like.nuisance] == ["alpha_JLA", "beta_JLA"]
        chi2 = 2 * float(like.log_like(theory, jnp.asarray([0.14, 3.1])))
        assert 0.3 < chi2 / like.nsn < 3.0

    def test_pantheon_h0_degeneracy(self, theory):
        # SN alone cannot fix H0 (M marginalized): shifting H0 leaves chi2
        # almost unchanged
        like = SNLikelihood(f"{REF}/Pantheon/full_long.dataset")
        c1 = float(like.log_like(theory, jnp.zeros(0)))
        bg2 = BackgroundParams.make(**{**PLANCK18, "H0": 72.0})
        th2 = compute_background_theory(bg2)
        c2 = float(like.log_like(th2, jnp.zeros(0)))
        # pure H0 rescale only changes distances log-uniformly -> tiny change
        assert abs(c2 - c1) < 3.0


class TestHST:
    def test_h0_direct(self, theory):
        like = HSTLikelihood(H0=73.24, H0_err=1.74, zeff=0.0)
        chi2 = 2 * float(like.log_like(theory, jnp.zeros(0)))
        expect = ((67.32 - 73.24) / 1.74) ** 2
        assert abs(chi2 - expect) < 1e-6

    def test_inverse_distance(self, theory):
        like = HSTLikelihood(H0=73.48, H0_err=1.66, zeff=0.04,
                             angconversion=11425.8)
        chi2 = 2 * float(like.log_like(theory, jnp.zeros(0)))
        # theoryval ~ H0-ish: angconversion/DA(0.04) ~ 67-ish for Planck
        assert 5.0 < chi2 < 25.0
