"""Importance sampling (action=1) and minimizer (action=2/3) tests.

Statistical gates mirroring the reference semantics:
  - reweighting a Gaussian chain to a shifted/narrowed Gaussian must
    reproduce the direct moments (ImportanceSampling.f90 exp(old-new));
  - the minimizer must find the analytic optimum of the background
    posterior and the inverse-Hessian covariance must match the analytic
    Gaussian covariance (minimize.f90 / EstCovmat.f90 contracts).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.params.space import Param, ParameterSpace, Speed
from cosmomc_tpu.sampling.importance import (importance_sample_arrays,
                                             importance_sample_chains)
from cosmomc_tpu.sampling.minimize import (find_best_fit,
                                           estimate_covariance,
                                           write_minimum_file)


def _gauss_logpost(mean, cov):
    icov = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray(mean)

    def fn(P):
        d = P - mu
        return 0.5 * d @ icov @ d, jnp.zeros((0,), P.dtype)
    return fn


def test_importance_reweight_matches_direct():
    rng = np.random.default_rng(0)
    n = 200_000
    # chain sampled from N(0, 1) in 2D
    samples = rng.normal(0, 1.0, (n, 2))
    old_mll = 0.5 * (samples ** 2).sum(axis=1)
    weights = np.ones(n)
    # new posterior: N([0.3, -0.2], 0.8^2)
    mean = np.array([0.3, -0.2])
    cov = np.diag([0.64, 0.64])
    res = importance_sample_arrays(samples, weights, old_mll,
                                   _gauss_logpost(mean, cov))
    wmu = (res.weights[:, None] * res.samples).sum(0) / res.weights.sum()
    xc = res.samples - wmu
    wcov = (res.weights[:, None] * xc).T @ xc / res.weights.sum()
    np.testing.assert_allclose(wmu, mean, atol=0.02)
    np.testing.assert_allclose(np.diag(wcov), np.diag(cov), rtol=0.05)
    assert res.eff_frac > 0.3   # mild reweighting keeps most ESS


def test_importance_add_mode():
    """mode='add': new total = old + delta, w *= exp(-delta)."""
    rng = np.random.default_rng(1)
    n = 100_000
    samples = rng.normal(0, 1.0, (n, 1))
    old_mll = 0.5 * (samples ** 2).sum(axis=1)
    # add an extra Gaussian factor N(0, 1) -> posterior N(0, 1/2)
    res = importance_sample_arrays(
        samples, np.ones(n), old_mll,
        lambda P: (0.5 * P @ P, jnp.zeros((0,), P.dtype)), mode="add")
    wvar = np.average(res.samples[:, 0] ** 2, weights=res.weights)
    assert abs(wvar - 0.5) < 0.02
    np.testing.assert_allclose(res.mloglike, 2 * old_mll, rtol=1e-10)


def test_importance_chain_files(tmp_path):
    rng = np.random.default_rng(2)
    root = str(tmp_path / "run")
    n = 20_000
    for c in (1, 2):
        s = rng.normal(0, 1.0, (n, 2))
        mll = 0.5 * (s ** 2).sum(axis=1)
        np.savetxt(f"{root}_{c}.txt",
                   np.column_stack([np.ones(n), mll, s]), fmt="%.7E")
    with open(root + ".paramnames", "w") as f:
        f.write("a\ta\nb\tb\n")
    post_root = str(tmp_path / "post" / "run_GW")
    mean = np.array([0.5, 0.0])
    res = importance_sample_chains(root, _gauss_logpost(mean, np.eye(2)),
                                   post_root)
    assert os.path.isfile(post_root + "_1.txt")
    assert os.path.isfile(post_root + ".paramnames")
    wmu = (res.weights[:, None] * res.samples).sum(0) / res.weights.sum()
    np.testing.assert_allclose(wmu, mean, atol=0.03)


@pytest.fixture(scope="module")
def quad_space():
    sp = ParameterSpace()
    sp.add(Param("x", 0.5, -10, 10, 0.5, 0.5, "x", Speed.SLOW))
    sp.add(Param("y", -0.5, -10, 10, 0.5, 0.5, "y", Speed.FAST))
    return sp


def test_minimizer_finds_optimum(quad_space, tmp_path):
    mean = np.array([1.234, -2.345])
    cov = np.array([[0.04, 0.015], [0.015, 0.09]])
    logpost = _gauss_logpost(mean, cov)
    best = find_best_fit(logpost, quad_space, refine_temperature=0.02,
                         refine_steps=128, refine_chains=16)
    np.testing.assert_allclose(best.P, mean, atol=1e-4)
    assert best.mloglike < 1e-6
    C = estimate_covariance(logpost, best.P)
    np.testing.assert_allclose(C, cov, rtol=1e-5, atol=1e-8)
    path = str(tmp_path / "test.minimum")
    write_minimum_file(path, quad_space, best)
    txt = open(path).read()
    assert "-log(Like)" in txt and "x" in txt


def test_minimizer_background_posterior():
    """Find the best fit of the real BAO+HST background posterior."""
    from cosmomc_tpu.likelihoods.base import LikelihoodList
    from cosmomc_tpu.likelihoods.bao import BAOLikelihood
    from cosmomc_tpu.likelihoods.hst import HSTLikelihood
    from cosmomc_tpu.params.parameterizations import BackgroundParameterization
    from cosmomc_tpu.pipeline import BackgroundPosterior

    REF = os.environ.get("COSMOMC_DATA", "/root/reference/data")
    par = BackgroundParameterization(jnp.float64)
    space = par.default_space()
    likes = LikelihoodList()
    bao = f"{REF}/DR12/sdss_DR12Consensus_bao.dataset"
    if not os.path.isfile(bao):
        pytest.skip("reference BAO data not present")
    likes.add(BAOLikelihood(bao, dtype=jnp.float64))
    likes.add(HSTLikelihood(H0=73.48, H0_err=1.66, zeff=0.04))
    post = BackgroundPosterior(par, space, likes, dtype=jnp.float64)
    best = find_best_fit(post.logpost(), post.space,
                         refine_temperature=None)
    assert best.mloglike < 10.0          # a sane joint fit exists
    assert 60 < best.P[1] < 80           # H0
    assert 0.2 < best.P[0] < 0.45        # omegam
    # gradient at optimum ~ 0
    g = jax.grad(lambda p: post.logpost()(p)[0])(jnp.asarray(best.P))
    assert np.abs(np.asarray(g)).max() < 0.5
