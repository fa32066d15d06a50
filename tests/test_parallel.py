"""Multi-device chain statistics on the 8-CPU-device virtual mesh.

Validates the shard_map/psum pooling (cosmomc_tpu/parallel/mesh.py) against
single-device math: the reference's MPI_ALLGATHER covariance pooling
(SampleCollector.f90:248-251) must give identical statistics regardless of
how chains are distributed.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmomc_tpu.parallel.mesh import (chain_mesh, shard_chains,
                                       chain_stats_local, sharded_chain_stats,
                                       sharded_gelman_rubin_r)
from cosmomc_tpu.sampling.convergence import gelman_rubin_r


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return chain_mesh(8)


def _samples(nchains=16, S=64, n=3, seed=0):
    rng = np.random.default_rng(seed)
    # chains with slightly different means so R-1 is nontrivial
    mu = rng.normal(0, 0.05, (nchains, 1, n))
    return jnp.asarray(rng.normal(0, 1.0, (nchains, S, n)) + mu)


def test_sharded_stats_match_local(mesh):
    x = _samples()
    xs = shard_chains(x, mesh, x.shape[0])
    loc = chain_stats_local(x)
    sh = jax.jit(lambda a: sharded_chain_stats(a, mesh))(xs)
    np.testing.assert_allclose(np.asarray(sh.means), np.asarray(loc.means),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sh.covs), np.asarray(loc.covs),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sh.pooled_mean),
                               np.asarray(loc.pooled_mean), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sh.pooled_cov),
                               np.asarray(loc.pooled_cov), rtol=1e-9,
                               atol=1e-12)


def test_sharded_r_matches_host_r(mesh):
    x = _samples(seed=3)
    xs = shard_chains(x, mesh, x.shape[0])
    r_dev = float(jax.jit(lambda a: sharded_gelman_rubin_r(a, mesh))(xs))
    loc = chain_stats_local(x)
    r_host = gelman_rubin_r(np.asarray(loc.means), np.asarray(loc.covs))
    assert abs(r_dev - r_host) < 1e-8


def test_sharded_sampling_segment_matches_single_device(mesh):
    """Run a real Metropolis segment on the BAO+HST posterior with chains
    sharded over the mesh; identical seeds => identical trajectory to the
    unsharded run (chains are independent lanes)."""
    import os
    from cosmomc_tpu.likelihoods.base import LikelihoodList
    from cosmomc_tpu.likelihoods.bao import BAOLikelihood
    from cosmomc_tpu.likelihoods.hst import HSTLikelihood
    from cosmomc_tpu.params.parameterizations import BackgroundParameterization
    from cosmomc_tpu.pipeline import BackgroundPosterior
    from cosmomc_tpu.sampling.metropolis import MetropolisSampler

    REF = os.environ.get("COSMOMC_DATA", "/root/reference/data")
    par = BackgroundParameterization(jnp.float64)
    space = par.default_space()
    likes = LikelihoodList()
    bao = f"{REF}/DR12/sdss_DR12Consensus_bao.dataset"
    if os.path.isfile(bao):
        likes.add(BAOLikelihood(bao, dtype=jnp.float64))
    likes.add(HSTLikelihood(H0=73.48, H0_err=1.66, zeff=0.04))
    post = BackgroundPosterior(par, space, likes, dtype=jnp.float64)
    prop = post.make_proposal()
    w = np.array([p.propose_width for p in post.space.varying])
    prop.set_covariance(np.diag(w ** 2))
    sampler = MetropolisSampler(prop, post.logpost(),
                                num_derived=post.num_derived)
    nchains = 16
    start = post.start_positions(np.random.default_rng(0), nchains)
    st = sampler.init_state(jax.random.PRNGKey(0), jnp.asarray(start))
    sched = prop.make_schedule(8, np.random.default_rng(1))

    st_single, out_single = sampler.run_segment(st, sched)

    st_sh = shard_chains(st, mesh, nchains)
    st_shard, out_shard = sampler.run_segment(st_sh, sched)

    # sharding changes XLA partitioning -> reduction order, so points agree
    # only to ~1e-7 (observed); accept decisions must match exactly here
    np.testing.assert_array_equal(np.asarray(out_shard.accept),
                                  np.asarray(out_single.accept))
    np.testing.assert_allclose(np.asarray(out_shard.P),
                               np.asarray(out_single.P), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st_shard.mloglike),
                               np.asarray(st_single.mloglike), rtol=1e-4)


def test_staged_sharded_matches_single_device(mesh):
    """The STAGED CMB sampler — whose per-chain slow/semi theory-cache
    pytrees are the part that could actually break under partitioning —
    produces identical accept decisions and matching trajectories when the
    chain state (incl. caches) is sharded over the mesh
    (SampleCollector.f90:248-251 one-rank-per-chain analog)."""
    import __graft_entry__ as ge
    from cosmomc_tpu.sampling.staged import StagedMetropolisSampler

    nchains = 16
    post, prop = ge._build_cmb_staged(jnp.float32, nchains)
    sampler = StagedMetropolisSampler(prop, post)
    rng = np.random.default_rng(0)
    P0 = post.start_positions(rng, nchains).astype(np.float32)
    st = sampler.init_state(jax.random.PRNGKey(0), jnp.asarray(P0))
    sched = prop.make_schedule(6, np.random.default_rng(1))

    st_single, out_single = sampler.run_segment(st, sched)

    st_sh = shard_chains(st, mesh, nchains)
    st_shard, out_shard = sampler.run_segment(st_sh, sched)

    np.testing.assert_array_equal(np.asarray(out_shard.accept),
                                  np.asarray(out_single.accept))
    np.testing.assert_allclose(np.asarray(out_shard.P),
                               np.asarray(out_single.P),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_shard.mloglike),
                               np.asarray(st_single.mloglike), rtol=2e-3)
    # the accepted slow caches must match too (same lanes overwritten)
    a = np.asarray(st_shard.slow["clt"].dT)
    b = np.asarray(st_single.slow["clt"].dT)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-6)
