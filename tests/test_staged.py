"""Fast/slow staged sampler: cache correctness and CMB-stage equivalence.

The staged sampler (sampling/staged.py) reuses per-chain theory caches
across fast/semi steps (the reference's CalcLike_Cosmology.f90:59-94
recompute split). If stale caches ever leaked into the posterior, the
sampled distribution would be wrong — so the main test here samples a
synthetic staged target whose -logL can ONLY be evaluated through the
caches, and checks moment recovery. CMB-stage equivalence (staged ==
monolithic compute_theory) lives in test_cmb_posterior (slow module).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.params.space import Param, ParameterSpace, Speed
from cosmomc_tpu.sampling.proposal import BlockedProposal
from cosmomc_tpu.sampling.staged import StagedMetropolisSampler, CLS_SLOW


class FakeStagedPosterior:
    """Synthetic 3-block target: independent Gaussians, but the slow/semi
    coordinates only reach the likelihood THROUGH the stage caches."""

    def __init__(self, sig=(0.7, 1.3, 0.5), dtype=jnp.float32):
        self.dtype = dtype
        self.sig = np.asarray(sig)
        sp = ParameterSpace()
        sp.add(Param("xs", 0.0, -20, 20, 0.3, 0.3, speed=Speed.SLOW))
        sp.add(Param("xm", 0.0, -20, 20, 0.3, 0.3, speed=Speed.SEMISLOW))
        sp.add(Param("xf", 0.0, -20, 20, 0.3, 0.3, speed=Speed.FAST))
        self.space = sp
        self.num_derived = 1

    def embed_full(self, P):
        return P

    def stage_slow(self, full):
        # pretend-expensive: the cache carries a transformed slow coordinate
        return {"a": 2.0 * full[0], "aux": jnp.sin(full[0])}

    def stage_semi(self, full, slow):
        return {"b": slow["a"] * 0.5 + full[1] * 3.0}

    def stage_fast(self, P, slow, semi):
        xs = slow["a"] * 0.5          # = full[0] iff cache is current
        xm = (semi["b"] - slow["a"] * 0.5) / 3.0
        xf = P[2]
        s = jnp.asarray(self.sig, P.dtype)
        mll = 0.5 * ((xs / s[0]) ** 2 + (xm / s[1]) ** 2 + (xf / s[2]) ** 2)
        return mll, jnp.stack([xs + xm])


@pytest.fixture(scope="module")
def sampled():
    post = FakeStagedPosterior()
    prop = post.make_proposal() if hasattr(post, "make_proposal") else None
    blocks = post.space.speed_blocks()
    prop = BlockedProposal(blocks, slow_block_max=1, oversample_fast=2)
    prop.set_covariance(np.diag(post.sig ** 2))
    sampler = StagedMetropolisSampler(prop, post)
    nchains, steps = 128, 192
    rng = np.random.default_rng(0)
    P0 = jnp.asarray(rng.normal(0, 0.3, (nchains, 3)), jnp.float32)
    state = sampler.init_state(jax.random.PRNGKey(0), P0)
    outs = []
    classes = []
    for _ in range(6):
        sched = prop.make_schedule(steps, rng)
        classes.append(sampler.block_class[np.asarray(sched.block)])
        state, out = sampler.run_segment(state, sched)
        outs.append(np.asarray(out.P, np.float64))
    P = np.concatenate(outs[2:], axis=0)      # post-burn
    return post, sampler, state, P, np.concatenate(classes)


def test_block_classes_cover_all_stages(sampled):
    post, sampler, state, P, classes = sampled
    assert set(np.unique(classes)) == {0, 1, 2}
    # oversample_fast=2 makes fast steps the most common class
    assert (classes == 2).sum() > (classes == 0).sum()


def test_moment_recovery_through_caches(sampled):
    post, sampler, state, P, _ = sampled
    flat = P.reshape(-1, 3)
    std = flat.std(axis=0)
    # ~5% on sigma with this many effective samples
    assert np.allclose(std, post.sig, rtol=0.12), (std, post.sig)
    assert np.abs(flat.mean(axis=0)).max() < 0.12


def test_cached_mloglike_consistent(sampled):
    """The carried mloglike must equal a fresh full recompute at the
    current points — the invariant stale caches would violate."""
    post, sampler, state, P, _ = sampled
    Pcur = state.P
    full = jax.vmap(post.embed_full)(Pcur)
    slow = jax.vmap(post.stage_slow)(full)
    semi = jax.vmap(post.stage_semi)(full, slow)
    mll, _ = jax.vmap(post.stage_fast)(Pcur, slow, semi)
    np.testing.assert_allclose(np.asarray(mll), np.asarray(state.mloglike),
                               rtol=2e-5, atol=2e-5)


def test_derived_tracks_accepted_point(sampled):
    post, sampler, state, P, _ = sampled
    der = np.asarray(state.derived)[:, 0]
    expect = 2.0 * np.asarray(state.P[:, 0]) * 0.5 + np.asarray(state.P[:, 1])
    # derived = xs + xm evaluated through the caches at the accepted point
    np.testing.assert_allclose(der, np.asarray(state.P[:, 0] + state.P[:, 1]),
                               rtol=2e-4, atol=2e-4)
