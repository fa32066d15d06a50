"""End-to-end background-LCDM inference slice (BASELINE config 1):
BAO(DR12+6DF) + Pantheon + HST with the background parameterization.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import LikelihoodList
from cosmomc_tpu.likelihoods.bao import BAOLikelihood
from cosmomc_tpu.likelihoods.sn import SNLikelihood
from cosmomc_tpu.likelihoods.hst import HSTLikelihood
from cosmomc_tpu.params.parameterizations import (BackgroundParameterization,
                                                  ThetaParameterization)
from cosmomc_tpu.pipeline import BackgroundPosterior
from cosmomc_tpu.sampling.metropolis import MetropolisSampler
from cosmomc_tpu.sampling.runner import SamplingRun, RunConfig

REF = "/root/reference/data"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")


def build_posterior(dtype=jnp.float64):
    par = BackgroundParameterization(dtype)
    space = par.default_space()
    likes = LikelihoodList()
    likes.add(BAOLikelihood(f"{REF}/DR12/sdss_DR12Consensus_bao.dataset", dtype=dtype))
    likes.add(BAOLikelihood(f"{REF}/sdss_6DF_bao.dataset", dtype=dtype))
    likes.add(SNLikelihood(f"{REF}/Pantheon/full_long.dataset", dtype=dtype))
    likes.add(HSTLikelihood(H0=73.48, H0_err=1.66, zeff=0.04))
    return BackgroundPosterior(par, space, likes, dtype=dtype)


@needs_ref
class TestEndToEnd:
    def test_posterior_evaluates(self):
        post = build_posterior()
        fn = post.logpost()
        names = [p.name for p in post.space.varying]
        assert names[:3] == ["omegam", "H0", "ombh2"]
        P = jnp.asarray([0.31, 68.0, 0.0224])
        m, der = jax.jit(fn)(P)
        m = float(m)
        assert np.isfinite(m) and 400 < m < 800  # ~1055 points total
        assert np.all(np.isfinite(np.asarray(der)))
        # derived excludes sampled H0/omegam -> [omegal, rdrag]
        assert [n for n, _ in post.derived_names] == ["omegal", "rdrag"]
        assert abs(float(der[0]) - 0.69) < 1e-6
        assert 140 < float(der[1]) < 155

    def test_posterior_gradient(self):
        post = build_posterior()
        fn = post.logpost()
        g = jax.grad(lambda P: fn(P)[0])(jnp.asarray([0.31, 68.0, 0.0224]))
        g = np.asarray(g)
        assert np.all(np.isfinite(g)) and np.any(g != 0)

    def test_short_chain_run(self, tmp_path):
        post = build_posterior()
        prop = post.make_proposal()
        # rough diag covariance guess from propose widths
        w = np.array([p.propose_width for p in post.space.varying])
        prop.set_covariance(np.diag(w ** 2))
        sampler = MetropolisSampler(prop, post.logpost(),
                                    num_derived=post.num_derived)
        cfg = RunConfig(nchains=16, segment_steps=48, max_steps=96, r_stop=1e-9,
                        seed=4)
        rng = np.random.default_rng(0)
        run = SamplingRun(sampler, cfg, post.start_positions(rng, cfg.nchains),
                          chain_root=str(tmp_path / "bg" / "run"), feedback=0)
        res = run.run()
        assert res.steps == 96
        mll = np.asarray(run.state.mloglike)
        assert np.all(np.isfinite(mll)) and np.all(mll < 1e29)
        ar = float(np.asarray(run.state.num_accept).mean()) / res.steps
        assert ar > 0.05  # moving

    def test_theta_parameterization_path(self):
        par = ThetaParameterization()
        space = par.default_space()
        likes = LikelihoodList()
        likes.add(BAOLikelihood(f"{REF}/DR12/sdss_DR12Consensus_bao.dataset"))
        post = BackgroundPosterior(par, space, likes)
        fn = post.logpost()
        names = [p.name for p in post.space.varying]
        assert "theta" in names and "H0" not in names
        P = jnp.asarray([0.02238, 0.1201, 1.04092, 0.0544])
        m, der = jax.jit(fn)(P)
        assert np.isfinite(float(m))
        # derived H0 should land near 67.3 when theta is the Planck value
        assert abs(float(der[0]) - 67.3) < 0.5
