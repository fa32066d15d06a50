"""Vectorized Metropolis-Hastings with blocked proposals.

Reference behavior (source/MCMC.f90): `TMetropolisSampler_GetNewSample`
proposes in a block and accepts with probability exp(-(trial - cur)) in
-logL units (MetropolisAccept, MCMC.f90:119-131, with temperature scaling);
the main loop runs until the target sample count (SampleFrom :134-163).

TPU-native re-design: one chain per *vector lane*, not per MPI rank.
A segment of S steps is a single `lax.scan` compiled once; outputs
(accept flags, point, -logL, derived) stream back as (S, nchains, ...)
arrays that the host compresses into weighted GetDist rows. All chains share
the proposal schedule (see proposal.py) so the compute per step is uniform.

The posterior callable is the generic seam (reference:
calclike.f90 TLikeCalculator.GetLogLike): `logpost_fn(P) -> (mloglike,
derived)` for a single chain's parameter vector; it is vmapped here.
Bound checking (hard priors) and Gaussian/linear priors are applied here so
every likelihood gets in-bounds parameters (calclike.f90:97-151).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.sampling.proposal import BlockedProposal, ProposalSchedule

LOG_ZERO = 1e30   # rejection sentinel (reference settings.f90:114)


class ChainState(NamedTuple):
    P: jnp.ndarray            # (nchains, n) current points
    mloglike: jnp.ndarray     # (nchains,) current -logL (incl priors)
    derived: jnp.ndarray      # (nchains, nd)
    key: jax.Array            # single PRNG key (split per step)
    num_accept: jnp.ndarray   # (nchains,) int32
    mapping: jnp.ndarray      # (n, n) proposal mapping (traced: adaptation
                              # updates must reach the compiled segment)


class SegmentOutput(NamedTuple):
    accept: jnp.ndarray       # (S, nchains) bool
    P: jnp.ndarray            # (S, nchains, n) current point AFTER each step
    mloglike: jnp.ndarray     # (S, nchains)
    derived: jnp.ndarray      # (S, nchains, nd)
    #: per-step per-chain flag: the PROPOSED point was in-bounds but the
    #: theory/likelihood evaluated non-finite (the reference's error
    #: points, Calculator_CAMB.f90:205-215; counted by the runner and
    #: fatal under stop_on_error, settings.f90:93)
    error: jnp.ndarray        # (S, nchains) bool


def make_bounded_posterior(logpost_fn: Callable, lo: jnp.ndarray, hi: jnp.ndarray,
                           prior_arrays: Optional[Dict[str, jnp.ndarray]] = None,
                           num_derived: int = 0) -> Callable:
    """Wrap a raw -logL function with hard bounds + Gaussian/linear priors.

    Mirrors GetLogLikeBounds + GetLogPriors (calclike.f90:97-151). Out-of-
    bounds points evaluate the theory at the CLIPPED point and mask the
    result to LOG_ZERO. The reference short-circuits without evaluating
    (early exit on a serial CPU); here the chains are vmapped lanes, so a
    `lax.cond` would run both branches on every lane anyway — and the cond
    (a) blew XLA-TPU compile time up by >30x and (b) broke `jax.grad`
    through the posterior (UnexpectedTracerError). clip+where costs nothing,
    compiles fast, and is differentiable.
    """
    pa = prior_arrays or {}

    def bounded(P):
        inb = jnp.all((P >= lo) & (P <= hi))
        Psafe = jnp.clip(P, lo, hi)   # theory always sees in-bounds params
        m, d = logpost_fn(Psafe)
        prior = jnp.zeros((), P.dtype)
        if "has_prior" in pa:
            t = (P - pa["prior_mean"].astype(P.dtype)) / pa["prior_std"].astype(P.dtype)
            prior = prior + 0.5 * jnp.sum(jnp.where(pa["has_prior"], t * t, 0.0))
        if "lin_w" in pa and pa["lin_w"].shape[0] > 0:
            s = ((pa["lin_w"].astype(P.dtype) @ P - pa["lin_mean"].astype(P.dtype))
                 / pa["lin_std"].astype(P.dtype))
            prior = prior + 0.5 * jnp.sum(s * s)
        bad = jnp.logical_or(jnp.isnan(m), m >= LOG_ZERO * 0.1)
        ok = jnp.logical_and(inb, jnp.logical_not(bad))
        # distinct sentinels: LOG_ZERO for out-of-bounds (normal sampling),
        # 2*LOG_ZERO for an in-bounds point whose theory evaluated
        # non-finite (an ERROR POINT — silently mapping it to a rejection
        # makes a broken configuration look like a low-acceptance chain;
        # samplers flag mll >= 1.5*LOG_ZERO so the runner can count/stop)
        err = jnp.logical_and(inb, bad)
        mout = jnp.where(ok, m + prior,
                         jnp.where(err, 2.0 * LOG_ZERO, LOG_ZERO))
        return (mout.astype(P.dtype),
                jnp.where(ok, d.astype(P.dtype), 0.0))

    return bounded


@dataclass
class MetropolisSampler:
    """Runs segments of vmapped Metropolis steps under jit."""
    proposal: BlockedProposal
    logpost_fn: Callable                      # P (n,) -> (mloglike, derived (nd,))
    num_derived: int = 0
    temperature: float = 1.0

    def __post_init__(self):
        # jit the vmapped posterior: init_state calls it OUTSIDE the compiled
        # segment, and an un-jitted vmap executes op-by-op — thousands of
        # tiny dispatches that take minutes over the TPU tunnel
        self._vlogpost = jax.jit(jax.vmap(self.logpost_fn))
        self._run_segment = None

    # ---------- initialization ----------

    def init_state(self, key: jax.Array, P0: jnp.ndarray) -> ChainState:
        nchains = P0.shape[0]
        mll, der = self._vlogpost(P0)
        return ChainState(P0, mll, der, key,
                          jnp.zeros((nchains,), jnp.int32),
                          self.proposal.mapping)

    # ---------- one step ----------

    def step(self, state: ChainState, sched_t) -> Tuple[ChainState, Tuple]:
        delta_dir, m2 = sched_t
        key, k_prop, k_acc = jax.random.split(state.key, 3)
        trial = self.proposal.propose_step(k_prop, state.P, delta_dir, m2)
        mll_t, der_t = self._vlogpost(trial)
        # Metropolis accept in -logL units with temperature
        # (MCMC.f90:119-131: accept if better, else with prob exp(-(dLogL)/T))
        dl = (mll_t - state.mloglike) / self.temperature
        u = jax.random.exponential(k_acc, dl.shape, dl.dtype)
        acc = jnp.logical_and(mll_t < LOG_ZERO * 0.1, (mll_t < state.mloglike) | (u > dl))
        P = jnp.where(acc[:, None], trial, state.P)
        mll = jnp.where(acc, mll_t, state.mloglike)
        der = jnp.where(acc[:, None], der_t, state.derived)
        new = ChainState(P, mll, der, key,
                         state.num_accept + acc.astype(jnp.int32), state.mapping)
        err = mll_t >= LOG_ZERO * 1.5
        return new, (acc, P, mll, der, err)

    # ---------- a compiled segment ----------

    def run_segment(self, state: ChainState, schedule: ProposalSchedule
                    ) -> Tuple[ChainState, SegmentOutput]:
        # the schedule reaches the compiled function as arrays of identical
        # shape across segments (plus the static num_rots tuple, which is a
        # function of segment length only), so one compile serves the whole
        # run even though every segment has a fresh random schedule.
        sched = ProposalSchedule(jnp.asarray(schedule.block),
                                 jnp.asarray(schedule.direction),
                                 jnp.asarray(schedule.rot_index),
                                 tuple(schedule.num_rots))
        m2 = jnp.asarray(self.proposal.schedule_radius_dims(schedule))
        if self._run_segment is None:
            def seg(state, sched, m2, num_rots):
                nchains = state.P.shape[0]
                key, k_rot = jax.random.split(state.key)
                state = state._replace(key=key)
                # precompute every step's proposal direction before the scan
                # (see proposal.segment_deltas)
                deltas = self.proposal.segment_deltas(
                    k_rot, nchains, sched._replace(num_rots=num_rots),
                    state.mapping, state.P.dtype)
                final, outs = jax.lax.scan(self.step, state, (deltas, m2))
                return final, SegmentOutput(*outs)
            self._run_segment = jax.jit(seg, static_argnums=3)
        return self._run_segment(state, sched._replace(num_rots=()), m2,
                                 tuple(schedule.num_rots))
