"""Sampler correctness: recover known Gaussian targets.

This generalizes the reference's only statistically-grounded test pattern
(python/getdist_tests: sample a known distribution, verify recovered
moments) and its `test_likelihood` Gaussian mode (calclike.f90:180-199).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.sampling.proposal import BlockedProposal, random_rotation
from cosmomc_tpu.sampling.metropolis import (MetropolisSampler,
                                             make_bounded_posterior, LOG_ZERO)
from cosmomc_tpu.sampling.convergence import gelman_rubin_r, chain_moments
from cosmomc_tpu.sampling.runner import SamplingRun, RunConfig


def make_gaussian_target(cov):
    cov = jnp.asarray(cov, jnp.float32)
    prec = jnp.linalg.inv(cov)

    def logpost(P):
        return 0.5 * P @ prec @ P, jnp.zeros((0,), P.dtype)

    return logpost


class TestProposal:
    def test_random_rotation_orthogonal(self):
        R = np.asarray(random_rotation(jax.random.PRNGKey(0), 8, 5))
        for i in range(8):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(5), atol=1e-5)

    def test_schedule_covers_all_directions(self):
        bp = BlockedProposal([np.arange(3), np.arange(3, 8)], slow_block_max=1,
                             oversample_fast=2)
        rng = np.random.default_rng(0)
        sched = bp.make_schedule(400, rng)
        # both blocks visited; fast oversampled roughly 2x its share
        assert set(sched.block.tolist()) == {0, 1}
        # directions within range
        for b, d in zip(sched.block, sched.direction):
            assert d < bp.block_sizes[b]
        # with oversampling, fast block gets more visits than its 5/8 share
        frac_fast = (sched.block == 1).mean()
        assert frac_fast > 0.65

    def test_mapping_slow_moves_fast_not_vice_versa(self):
        bp = BlockedProposal([np.arange(2), np.arange(2, 4)], slow_block_max=1)
        cov = np.array([[1.0, 0.3, 0.2, 0.0],
                        [0.3, 2.0, 0.1, 0.1],
                        [0.2, 0.1, 1.5, 0.4],
                        [0.0, 0.1, 0.4, 1.0]])
        bp.set_covariance(cov)
        M = np.asarray(bp.mapping)
        # fast-block columns (2,3) must have zero slow-row (0,1) entries
        assert np.allclose(M[:2, 2:], 0.0)
        # slow columns generally move fast rows
        assert np.abs(M[2:, :2]).max() > 0


class TestMetropolisGaussian:
    def test_recover_correlated_gaussian(self):
        n = 4
        rng = np.random.default_rng(3)
        A = rng.standard_normal((n, n))
        cov = A @ A.T + n * np.eye(n)
        target = make_gaussian_target(cov)

        bp = BlockedProposal([np.arange(n)], slow_block_max=1, propose_scale=2.4)
        bp.set_covariance(cov)  # ideal proposal
        lo = jnp.full((n,), -100.0)
        hi = jnp.full((n,), 100.0)
        post = make_bounded_posterior(target, lo, hi)
        sampler = MetropolisSampler(bp, post)

        nchains, steps = 64, 200
        P0 = jnp.asarray(rng.standard_normal((nchains, n)), jnp.float32)
        state = sampler.init_state(jax.random.PRNGKey(0), P0)
        rngs = np.random.default_rng(1)
        outs = []
        for _ in range(8):
            sched = bp.make_schedule(steps, rngs)
            state, out = sampler.run_segment(state, sched)
            outs.append(np.asarray(out.P))
        x = np.concatenate(outs)[400:]     # (S, C, n), drop burn
        flat = x.reshape(-1, n)
        emp = np.cov(flat.T)
        # loose MC tolerance: correlated samples
        assert np.abs(flat.mean(axis=0)).max() < 0.35
        np.testing.assert_allclose(emp, cov, rtol=0.25, atol=0.6)
        # acceptance in the healthy range for ideal-proposal Metropolis
        ar = float(np.asarray(state.num_accept).mean()) / (8 * steps)
        assert 0.15 < ar < 0.65

    def test_out_of_bounds_rejected(self):
        target = make_gaussian_target(np.eye(2))
        post = make_bounded_posterior(target, jnp.asarray([-1.0, -1.0]),
                                      jnp.asarray([1.0, 1.0]))
        m, _ = post(jnp.asarray([2.0, 0.0]))
        assert float(m) >= LOG_ZERO * 0.99
        m2, _ = post(jnp.asarray([0.5, 0.5]))
        assert float(m2) < 1.0

    def test_gaussian_priors_add(self):
        target = make_gaussian_target(np.eye(2))
        pa = dict(has_prior=jnp.asarray([True, False]),
                  prior_mean=jnp.asarray([1.0, 0.0]),
                  prior_std=jnp.asarray([0.5, 1.0]))
        post = make_bounded_posterior(target, jnp.asarray([-5., -5.]),
                                      jnp.asarray([5., 5.]), prior_arrays=pa)
        m, _ = post(jnp.asarray([0.0, 0.0]))
        # 0.5*(0-1)^2/0.5^2 = 2 added
        assert abs(float(m) - 2.0) < 1e-5


class TestConvergence:
    def test_gelman_rubin_identical_chains(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((8, 5000, 3))
        means, covs = chain_moments(x)
        r = gelman_rubin_r(means, covs)
        assert r < 0.02   # iid chains: between-chain variance ~ 1/nsamp

    def test_gelman_rubin_detects_disagreement(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((8, 500, 3))
        x[:, :, 0] += np.arange(8)[:, None] * 2.0   # chains at different means
        means, covs = chain_moments(x)
        r = gelman_rubin_r(means, covs)
        assert r > 5.0


class TestRunner:
    def test_full_run_converges(self, tmp_path):
        n = 3
        cov = np.diag([1.0, 4.0, 0.25])
        target = make_gaussian_target(cov)
        bp = BlockedProposal([np.arange(n)], slow_block_max=1)
        bp.set_covariance(np.eye(n) * 0.5)  # deliberately wrong start
        post = make_bounded_posterior(
            target, jnp.full((n,), -50.0), jnp.full((n,), 50.0))
        sampler = MetropolisSampler(bp, post)
        cfg = RunConfig(nchains=32, segment_steps=128, max_steps=40_000,
                        r_stop=0.05, burn_accepts_per_block=30, seed=2)
        P0 = np.random.default_rng(0).standard_normal((cfg.nchains, n)) * 0.1
        run = SamplingRun(sampler, cfg, P0, chain_root=str(tmp_path / "chains" / "t"),
                          feedback=0)
        res = run.run()
        assert res.stopped_on == "converged"
        assert res.r_minus_1 < 0.05
        # adapted proposal should have learned the target scale
        learned = np.diag(bp.covariance)
        np.testing.assert_allclose(learned, np.diag(cov), rtol=0.5)
        # chain files exist and parse in GetDist format
        from cosmomc_tpu.io.chains import load_chains
        d = load_chains(str(tmp_path / "chains" / "t"))
        assert d["samples"].shape[1] == n
        assert (d["weights"] >= 1).all()
        # weighted moments close to target
        w = d["weights"]
        mu = (w[:, None] * d["samples"]).sum(0) / w.sum()
        assert np.abs(mu).max() < 0.5

    def test_checkpoint_resume(self, tmp_path):
        n = 2
        target = make_gaussian_target(np.eye(n))
        bp = BlockedProposal([np.arange(n)], slow_block_max=1)
        bp.set_covariance(np.eye(n))
        post = make_bounded_posterior(target, jnp.full((n,), -50.0),
                                      jnp.full((n,), 50.0))
        sampler = MetropolisSampler(bp, post)
        cfg = RunConfig(nchains=8, segment_steps=64, max_steps=256, r_stop=1e-9,
                        checkpoint_freq_segments=1, seed=5)
        P0 = np.zeros((cfg.nchains, n))
        root = str(tmp_path / "c" / "t")
        run = SamplingRun(sampler, cfg, P0, chain_root=root, feedback=0)
        run.run()
        run2 = SamplingRun(sampler, cfg, P0, chain_root=root, feedback=0)
        assert run2.resume()
        assert run2.steps_done == 256

    def test_runtime_control_exit(self, tmp_path):
        """A `<root>.read` file with exit=T stops the run between segments
        (reference CheckParamChange, settings.f90:290-313)."""
        import os
        n = 2
        target = make_gaussian_target(np.eye(n))
        bp = BlockedProposal([np.arange(n)], slow_block_max=1)
        bp.set_covariance(np.eye(n))
        post = make_bounded_posterior(target, jnp.full((n,), -50.0),
                                      jnp.full((n,), 50.0))
        sampler = MetropolisSampler(bp, post)
        root = str(tmp_path / "c" / "t")
        os.makedirs(os.path.dirname(root), exist_ok=True)
        with open(root + ".read", "w") as f:
            f.write("feedback = 0\nexit = T\n")
        cfg = RunConfig(nchains=8, segment_steps=32, max_steps=100_000,
                        r_stop=1e-12, seed=5)
        run = SamplingRun(sampler, cfg, np.zeros((cfg.nchains, n)),
                          chain_root=root, feedback=0)
        res = run.run()
        assert res.stopped_on == "exit_requested"
        assert res.steps == 32   # stopped after the first segment


def test_limits_convergence_gate():
    """Confidence-limit convergence (SampleCollector.f90:477-544
    CheckLimitsConverge): with limits_tol set, convergence additionally
    requires the cross-chain quantile-endpoint spread to settle; a
    well-mixed Gaussian run passes it, and the spread is recorded."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cosmomc_tpu.params.space import Param, ParameterSpace, Speed
    from cosmomc_tpu.sampling.metropolis import (MetropolisSampler,
                                                 make_bounded_posterior)
    from cosmomc_tpu.sampling.proposal import BlockedProposal
    from cosmomc_tpu.sampling.runner import SamplingRun, RunConfig

    space = ParameterSpace()
    for i in range(2):
        space.add(Param(f"p{i}", 0.0, -30, 30, 1.0, 1.0, speed=Speed.SLOW))
    arr = space.device_arrays(jnp.float32)

    def raw(P):
        return 0.5 * jnp.sum(P * P), jnp.zeros((0,), P.dtype)

    logpost = make_bounded_posterior(raw, arr["lo"], arr["hi"], num_derived=0)
    prop = BlockedProposal(space.speed_blocks(), slow_block_max=1)
    prop.set_covariance(np.eye(2))
    sampler = MetropolisSampler(prop, logpost, num_derived=0)
    cfg = RunConfig(nchains=64, segment_steps=64, max_steps=6000,
                    r_stop=0.05, burn_accepts_per_block=20, stats_thin=1,
                    seed=5, limits_tol=0.5, limit_frac=0.025)
    start = np.random.default_rng(0).normal(0, 1, (64, 2))
    run = SamplingRun(sampler, cfg, start, chain_root=None, feedback=0)
    res = run.run()
    assert res.stopped_on == "converged"
    assert run.limits_spread is not None and run.limits_spread < 0.5


def test_error_point_policy(tmp_path):
    """In-bounds proposals with non-finite theory are counted as ERROR
    POINTS (distinct from out-of-bounds rejections) and abort the run
    under stop_on_error — reference settings.f90:93 +
    Calculator_CAMB.f90:205-215 error counting."""
    import jax
    import jax.numpy as jnp
    import pytest
    from cosmomc_tpu.params.space import Param, ParameterSpace, Speed
    from cosmomc_tpu.sampling.metropolis import (MetropolisSampler,
                                                 make_bounded_posterior)
    from cosmomc_tpu.sampling.proposal import BlockedProposal
    from cosmomc_tpu.sampling.runner import SamplingRun, RunConfig

    space = ParameterSpace()
    for i in range(2):
        space.add(Param(f"p{i}", 0.0, -5, 5, 0.5, 0.5, speed=Speed.SLOW))
    arr = space.device_arrays(jnp.float64)

    def raw(P):
        m = 0.5 * jnp.sum(P * P)
        # theory 'fails' in an in-bounds subregion
        m = jnp.where(P[0] > 0.5, jnp.nan, m)
        return m, jnp.zeros((0,), P.dtype)

    logpost = make_bounded_posterior(raw, arr["lo"], arr["hi"], num_derived=0)
    prop = BlockedProposal(space.speed_blocks(), slow_block_max=1)
    prop.set_covariance(np.eye(2))
    sampler = MetropolisSampler(prop, logpost, num_derived=0)
    start = np.random.default_rng(0).normal(0, 0.3, (32, 2))

    cfg = RunConfig(nchains=32, segment_steps=32, max_steps=128,
                    r_stop=1e-9, burn_accepts_per_block=1, seed=2)
    run = SamplingRun(sampler, cfg, start,
                      chain_root=str(tmp_path / "err"), feedback=0)
    run.run()
    assert run.num_error_points > 0
    log = (tmp_path / "err.log").read_text()
    assert "ERROR POINTS" in log

    cfg2 = RunConfig(nchains=32, segment_steps=32, max_steps=128,
                     r_stop=1e-9, burn_accepts_per_block=1, seed=2,
                     stop_on_error=True)
    run2 = SamplingRun(sampler, cfg2, start, chain_root=None, feedback=0)
    with pytest.raises(RuntimeError, match="stop_on_error"):
        run2.run()
