"""Pipeline extras: astro parameterization (LSS-only theory path), the
high-L lensed template splice, and requirements aggregation fixes.

Reference: CosmologyParameterizations.f90:416-527 (astro),
Calculator_CAMB.f90:398-401 + LoadFiducialHighLTemplate (splice),
CosmologyTypes.f90:248-411 (requirement unions).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import LikelihoodList
from cosmomc_tpu.params.parameterizations import (AstroParameterization,
                                                  ThetaParameterization)
from cosmomc_tpu.pipeline import CMBPosterior

REF = "/root/reference/data"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="no ref data")
TEMPLATE = os.path.join(REF, "HighL_lensedCls.dat")


def test_astro_parameterization_lss_only():
    """use_cmb=False path: background + thermal + P(k), no C_l stack."""
    par = AstroParameterization(jnp.float64)
    space = par.default_space()
    post = CMBPosterior(par, space, LikelihoodList(), use_cmb=False,
                        matter_power=True, z_pk=(0.0, 0.5, 1.0),
                        dtype=jnp.float64)
    P = np.array([p.center for p in post.space.varying])
    theory, extras = jax.jit(post.compute_theory)(
        jnp.asarray(post.embed_full(jnp.asarray(P))))
    assert theory.cls is None
    s8 = float(theory.sigma8_z[0])
    assert 0.5 < s8 < 1.1
    # derived vector evaluates and includes the sigma8 combos
    fn = jax.jit(post.logpost())
    mll, der = fn(jnp.asarray(P))
    assert np.isfinite(float(mll))
    dn = [n for n, _ in post.derived_names]
    for name in ("sigma8", "S8", "s8omegamp5", "age", "zstar", "thetastar"):
        assert name in dn, name
    der = np.asarray(der)
    assert np.all(np.isfinite(der))
    omm = P[0]
    assert abs(der[dn.index("S8")] - s8 * np.sqrt(omm / 0.3)) < 1e-6


@needs_ref
def test_highl_template_splice():
    """C_l above lmax_computed filled from the fiducial template,
    normalized off TT at the boundary."""
    par = ThetaParameterization(jnp.float64)
    space = par.default_space()
    lm = 500
    post = CMBPosterior(par, space, LikelihoodList(), lmax=700,
                        lmax_computed=lm, highl_template=TEMPLATE,
                        dtype=jnp.float64)
    P = jnp.asarray(np.array([p.center for p in post.space.params]))
    theory, _ = jax.jit(post.compute_theory)(P)
    cls = np.asarray(theory.cls)
    tmpl = np.loadtxt(TEMPLATE)
    trow = {int(r[0]): r[1:5] for r in tmpl}
    norm = cls[0, 0, lm] / trow[lm][0]
    # template fill above the boundary, all four spectra
    assert cls[0, 0, lm + 1] == pytest.approx(norm * trow[lm + 1][0])
    assert cls[1, 1, 650] == pytest.approx(norm * trow[650][1])
    assert cls[2, 2, 650] == pytest.approx(norm * trow[650][2])
    assert cls[1, 0, 650] == pytest.approx(norm * trow[650][3])
    # boundary is continuous at the few-percent level (the spectra are
    # close to fiducial at the default cosmology)
    assert abs(cls[0, 0, lm + 1] / cls[0, 0, lm] - 1.0) < 0.10
    assert np.all(cls[0, 0, 2:701] > 0)


def test_highl_template_required():
    par = ThetaParameterization(jnp.float64)
    with pytest.raises(ValueError, match="highl_template"):
        CMBPosterior(par, par.default_space(), LikelihoodList(),
                     lmax=700, lmax_computed=500, dtype=jnp.float64)


def test_required_lmax_raises_lmax():
    """A likelihood needing lmax > configured raises the computed lmax
    instead of erroring (CosmologyTypes.f90 union semantics)."""
    class FakeLike:
        name = "fake"
        kind = "CMB"
        nuisance = []
        def required_lmax(self):
            return 3000
        def log_like(self, theory, nuisance):
            return jnp.zeros(())
    par = ThetaParameterization(jnp.float64)
    likes = LikelihoodList()
    likes.add(FakeLike())
    post = CMBPosterior(par, par.default_space(), likes, lmax=2508,
                        dtype=jnp.float64)
    assert post.lmax == 3000


def test_required_kmax_raises_kmax():
    class FakeLike:
        name = "fake"
        kind = "WL"
        nuisance = []
        required_kmax = 4.0
        needs_matter_power = True
        def log_like(self, theory, nuisance):
            return jnp.zeros(())
    par = ThetaParameterization(jnp.float64)
    likes = LikelihoodList()
    likes.add(FakeLike())
    post = CMBPosterior(par, par.default_space(), likes, kmax=0.5,
                        dtype=jnp.float64)
    assert post.kmax == 4.0
    assert post.matter_power          # auto-enabled ...
    dn = [n for n, _ in post.derived_names]
    assert "sigma8" in dn             # ... and sigma8 stays in derived
