"""HMC sampler: correlated-Gaussian recovery + e2e on the differentiable
background posterior (the gradient-based sampler the reference cannot
offer — SURVEY.md §7 stage 6, BASELINE config 5)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.sampling.hmc import HMCSampler, HMCRun
from cosmomc_tpu.sampling.metropolis import make_bounded_posterior
from cosmomc_tpu.params.space import Param, ParameterSpace, Speed

REF = "/root/reference/data"


def _gauss_target(ndim=4, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(ndim, ndim))
    cov = A @ A.T + ndim * np.eye(ndim)
    cov = cov / np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
    scales = np.linspace(0.5, 2.0, ndim)
    cov *= np.outer(scales, scales)
    icov = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.asarray(np.linspace(-1, 1, ndim))

    def raw(P):
        d = P - mean
        return 0.5 * d @ icov @ d, jnp.zeros((0,), P.dtype)

    return raw, np.asarray(mean), cov, scales


class TestGaussianRecovery:
    def test_moments(self):
        ndim = 4
        raw, mean, cov, scales = _gauss_target(ndim)
        sampler = HMCSampler(raw, num_leapfrog=12, num_derived=0)
        rng = np.random.default_rng(1)
        nchains = 64
        start = rng.normal(mean, 0.2, (nchains, ndim))
        run = HMCRun(sampler, nchains, start, seed=2, warmup_segments=6,
                     segment_steps=24, max_steps=1536, r_stop=0.01)
        res = run.run()
        assert res.accept_rate > 0.5            # HMC should accept most
        merr = np.abs(res.means - mean) / scales
        assert merr.max() < 0.06, merr
        cerr = np.abs(res.cov - cov).max() / cov.max()
        assert cerr < 0.15, cerr

    def test_step_size_adapted(self):
        raw, mean, cov, scales = _gauss_target(3, seed=3)
        sampler = HMCSampler(raw, num_leapfrog=8)
        rng = np.random.default_rng(4)
        run = HMCRun(sampler, 32, rng.normal(mean[:3] if len(mean) > 3 else mean,
                                             0.2, (32, 3)),
                     seed=5, warmup_segments=6, segment_steps=16,
                     max_steps=64, r_stop=1e-9, step_size0=1e-3)
        res = run.run()
        # dual averaging must move the (deliberately tiny) initial step size
        assert res.step_size > 5e-3

    def test_bounds_respected(self):
        """Hard prior box: HMC must not leave it (LOG_ZERO rejection)."""
        sp = ParameterSpace()
        sp.add(Param("x", 0.5, 0.0, 1.0, 0.1, 0.1, speed=Speed.FAST))
        sp.add(Param("y", 0.0, -2.0, 2.0, 0.3, 0.3, speed=Speed.FAST))
        arr = sp.device_arrays(jnp.float64)

        def raw(P):
            return 0.5 * jnp.sum(P ** 2) / 0.09, jnp.zeros((0,), P.dtype)

        lp = make_bounded_posterior(raw, arr["lo"], arr["hi"],
                                    prior_arrays=arr, num_derived=0)
        sampler = HMCSampler(lp, num_leapfrog=8)
        rng = np.random.default_rng(6)
        start = np.column_stack([rng.uniform(0.3, 0.7, 32),
                                 rng.normal(0, 0.2, 32)])
        run = HMCRun(sampler, 32, start, seed=7, warmup_segments=4,
                     segment_steps=16, max_steps=256, r_stop=1e-9)
        res = run.run()
        flat = np.concatenate(run._stats).reshape(-1, 2)
        assert flat[:, 0].min() >= 0.0 and flat[:, 0].max() <= 1.0
        assert res.accept_rate > 0.3


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")
def test_hmc_background_posterior(tmp_path):
    """e2e: HMC through the real BAO+SN+H0 differentiable posterior
    recovers a posterior consistent with the Metropolis e2e run."""
    from tests.test_e2e_background import build_posterior
    post = build_posterior()
    fn = post.logpost()
    sampler = HMCSampler(fn, num_leapfrog=10, num_derived=post.num_derived)
    rng = np.random.default_rng(0)
    nchains = 16
    start = post.start_positions(rng, nchains)
    run = HMCRun(sampler, nchains, start, seed=1, warmup_segments=5,
                 segment_steps=16, max_steps=320, r_stop=1e-9,
                 step_size0=0.01, chain_root=str(tmp_path / "hmc" / "run"),
                 paramnames=post.paramnames(), space=post.space)
    res = run.run()
    assert res.accept_rate > 0.4
    # posterior concentrates near the known joint fit
    assert abs(res.means[0] - 0.31) < 0.03     # omegam
    assert abs(res.means[1] - 69.0) < 2.0      # H0 (BAO+SN+HST pull)
    # chains written and loadable
    from cosmomc_tpu.analysis.mcsamples import MCSamples
    s = MCSamples.load(str(tmp_path / "hmc" / "run"), ignore_frac=0.0)
    assert s.samples.shape[0] > 100


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference data")
def test_hmc_cmb_posterior():
    """HMC runs on a (tiny) full-Boltzmann CMB posterior: finite gradients
    end-to-end through recfast/thermo/Boltzmann/LOS/lensing and leapfrog
    acceptance in a sane band — BASELINE config 5, the capability the
    reference cannot offer (SURVEY.md §7 stage 6)."""
    from cosmomc_tpu.likelihoods.base import Likelihood, LikelihoodList
    from cosmomc_tpu.params.parameterizations import ThetaParameterization
    from cosmomc_tpu.pipeline import CMBPosterior

    F = jnp.float64
    LMAX = 96

    class Tiny(Likelihood):
        kind = "CMB"
        data_tt = None

        def __init__(self):
            super().__init__("tiny")
            self.nuisance = []

        def required_lmax(self):
            return LMAX

        def log_like(self, theory, nuisance):
            tt = theory.cls[0, 0, 2:LMAX + 1]
            if Tiny.data_tt is None:           # first (data-free) pass
                return 0.0 * jnp.sum(tt)
            d = jnp.asarray(Tiny.data_tt, tt.dtype)
            return 0.5 * jnp.sum(((tt - d) / (0.05 * jnp.abs(d) + 1.0)) ** 2)

    par = ThetaParameterization(F)
    space = par.default_space()
    likes = LikelihoodList()
    likes.add(Tiny())
    post = CMBPosterior(par, space, likes, lmax=LMAX, kmax=0.1,
                        n_step_boltzmann=1024, source_nk=(24, 48),
                        remat_chunks=32, dtype=F)
    # self-consistent forecast data: the theory at the center point, so
    # the posterior peaks there with O(1) curvature per parameter scale
    Pc = jnp.asarray([q.center for q in post.space.varying], F)
    slow = post.stage_slow(post.embed_full(Pc))
    semi = post.stage_semi(post.embed_full(Pc), slow)
    Tiny.data_tt = np.asarray(semi["cls"][0, 0, 2:LMAX + 1])
    fn = post.logpost()
    sampler = HMCSampler(fn, num_leapfrog=3, num_derived=post.num_derived)
    rng = np.random.default_rng(0)
    nchains = 2
    widths = np.array([q.propose_width for q in post.space.varying])
    centers = np.array([q.center for q in post.space.varying])
    # start AT the (noiseless) posterior peak: the smoke run checks the
    # leapfrog machinery, not burn-in
    start = centers + 0.1 * widths * rng.standard_normal((nchains,
                                                          len(widths)))
    run = HMCRun(sampler, nchains, start, seed=1, warmup_segments=1,
                 segment_steps=2, max_steps=8, r_stop=1e-9,
                 step_size0=0.02, inv_mass0=widths ** 2)
    res = run.run()
    # gradients finite end-to-end => leapfrog trajectories finite =>
    # a nonzero share of proposals accepted
    assert np.isfinite(res.means).all()
    assert res.accept_rate > 0.05, res.accept_rate
