"""Fast/slow staged Metropolis: reuse cached theory across step classes.

The reference's central performance design (CalcLike_Cosmology.f90
Cosmo_CalculateRequiredTheoryChanges :59-94 + Calculator_CAMB.f90 two-stage
compute :179-275): a proposal that moves only

  SLOW params      -> full Boltzmann solve (new transfers)        [seconds]
  SEMISLOW params  -> primordial re-application to cached
                      transfers (CAMB_TransfersToPowers)          [~0.1x]
  FAST nuisance    -> likelihood re-evaluation on the cached C_l  [ms]

TPU-native re-design: the proposal schedule is SHARED across all vmapped
chains (proposal.py), so at every scan step the whole batch is in the same
block — the step class is a *scalar*, and `lax.switch` dispatches the batch
to exactly one of the three recompute paths at runtime (all three are
compiled once). The per-chain caches (line-of-sight transfer functions
Delta_l(k), matter transfers, background tables, thermal derived scalars)
live inside the scan carry as pytrees with a leading chains axis; accepted
proposals overwrite a chain's cache lanes via `where`.

A CosmoMC chain spends most steps in the fast/semi classes (oversample_fast
deliberately inflates the fast share, propose.f90:261-272), so the expensive
Boltzmann branch runs only on the slow steps — identical economics to the
reference, but amortized over thousands of lanes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.params.space import Speed
from cosmomc_tpu.sampling.metropolis import LOG_ZERO, SegmentOutput
from cosmomc_tpu.sampling.proposal import BlockedProposal, ProposalSchedule


class StagedChainState(NamedTuple):
    P: jnp.ndarray            # (nchains, n)
    mloglike: jnp.ndarray     # (nchains,)
    derived: jnp.ndarray      # (nchains, nd)
    key: jax.Array
    num_accept: jnp.ndarray   # (nchains,) int32
    mapping: jnp.ndarray      # (n, n) proposal mapping (traced for adaptation)
    slow: Any                 # per-chain slow-stage cache pytree
    semi: Any                 # per-chain semi-stage cache pytree


def _select_tree(acc: jnp.ndarray, new, old):
    """Per-chain select over pytrees with a leading chains axis."""
    def sel(a, b):
        a = jnp.asarray(a)
        mask = acc.reshape(acc.shape + (1,) * (a.ndim - 1))
        return jnp.where(mask, a, b)
    return jax.tree_util.tree_map(sel, new, old)


# step classes (what to recompute)
CLS_SLOW, CLS_SEMI, CLS_FAST = 0, 1, 2


@dataclass
class StagedMetropolisSampler:
    """Metropolis over a staged posterior (pipeline.CMBPosterior)."""
    proposal: BlockedProposal
    post: Any                 # exposes embed_full/stage_slow/stage_semi/stage_fast
    temperature: float = 1.0

    def __post_init__(self):
        self.num_derived = self.post.num_derived
        arr = self.post.space.device_arrays(self.post.dtype)
        self._lo, self._hi = arr["lo"], arr["hi"]
        self._prior_arrays = arr
        # per-proposal-block recompute class from the parameter speeds
        space = self.post.space
        classes = []
        for idx in self.proposal.block_indices:
            s = space.varying[int(idx[0])].speed
            classes.append(CLS_SLOW if s == Speed.SLOW else
                           CLS_SEMI if s == Speed.SEMISLOW else CLS_FAST)
        self.block_class = np.asarray(classes, np.int32)
        self._run_segment = None
        self._vslow = jax.vmap(lambda f: self.post.stage_slow(f))
        self._vsemi = jax.vmap(lambda f, s: self.post.stage_semi(f, s))
        self._vfast = jax.vmap(lambda p, s, m: self.post.stage_fast(p, s, m))

    # ---------- bounds + priors (calclike.f90:97-151 semantics) ----------

    def _prior_and_mask(self, P):
        pa = self._prior_arrays
        inb = jnp.all((P >= self._lo) & (P <= self._hi), axis=-1)
        prior = jnp.zeros(P.shape[:-1], P.dtype)
        if "has_prior" in pa:
            t = (P - pa["prior_mean"].astype(P.dtype)) / pa["prior_std"].astype(P.dtype)
            prior = prior + 0.5 * jnp.sum(jnp.where(pa["has_prior"], t * t, 0.0),
                                          axis=-1)
        if "lin_w" in pa and pa["lin_w"].shape[0] > 0:
            s = ((P @ pa["lin_w"].astype(P.dtype).T - pa["lin_mean"].astype(P.dtype))
                 / pa["lin_std"].astype(P.dtype))
            prior = prior + 0.5 * jnp.sum(s * s, axis=-1)
        return prior, inb

    # ---------- initialization ----------

    def init_state(self, key: jax.Array, P0: jnp.ndarray) -> StagedChainState:
        P0 = jnp.asarray(P0)
        if self._init_fn_cache() is None:
            @jax.jit
            def init(P0, mapping):
                Psafe = jnp.clip(P0, self._lo, self._hi)
                full = jax.vmap(self.post.embed_full)(Psafe)
                slow = self._vslow(full)
                semi = self._vsemi(full, slow)
                mll, der = self._vfast(Psafe, slow, semi)
                prior, inb = self._prior_and_mask(P0)
                bad = jnp.logical_or(jnp.isnan(mll), mll >= LOG_ZERO * 0.1)
                ok = jnp.logical_and(inb, jnp.logical_not(bad))
                mll = jnp.where(ok, mll + prior, LOG_ZERO).astype(P0.dtype)
                der = jnp.where(ok[:, None], der.astype(P0.dtype), 0.0)
                return mll, der, slow, semi
            self._init_fn = init
        mll, der, slow, semi = self._init_fn(P0, self.proposal.mapping)
        return StagedChainState(P0, mll, der, key,
                                jnp.zeros((P0.shape[0],), jnp.int32),
                                self.proposal.mapping, slow, semi)

    def _init_fn_cache(self):
        return getattr(self, "_init_fn", None)

    def state_from_arrays(self, P, mloglike, derived, key, num_accept
                          ) -> StagedChainState:
        """Rebuild a full state (incl. caches) from checkpointed arrays."""
        st = self.init_state(key, jnp.asarray(P))
        return st._replace(mloglike=jnp.asarray(mloglike),
                           derived=jnp.asarray(derived),
                           num_accept=jnp.asarray(num_accept),
                           mapping=self.proposal.mapping)

    # ---------- one step ----------

    def step(self, state: StagedChainState, xs) -> Tuple[StagedChainState, Tuple]:
        delta_dir, m2, step_cls = xs
        key, k_prop, k_acc = jax.random.split(state.key, 3)
        trial = self.proposal.propose_step(k_prop, state.P, delta_dir, m2)
        Psafe = jnp.clip(trial, self._lo, self._hi)
        full = jax.vmap(self.post.embed_full)(Psafe)

        def do_slow(_):
            slow = self._vslow(full)
            return slow, self._vsemi(full, slow)

        def do_semi(_):
            return state.slow, self._vsemi(full, state.slow)

        def do_fast(_):
            return state.slow, state.semi

        slow, semi = jax.lax.switch(step_cls, (do_slow, do_semi, do_fast), 0)
        mll_t, der_t = self._vfast(Psafe, slow, semi)
        prior, inb = self._prior_and_mask(trial)
        bad = jnp.logical_or(jnp.isnan(mll_t), mll_t >= LOG_ZERO * 0.1)
        ok = jnp.logical_and(inb, jnp.logical_not(bad))
        err = jnp.logical_and(inb, bad)     # error points (see metropolis)
        mll_t = jnp.where(ok, mll_t + prior,
                          jnp.where(err, 2.0 * LOG_ZERO, LOG_ZERO)
                          ).astype(trial.dtype)
        der_t = jnp.where(ok[:, None], der_t.astype(trial.dtype), 0.0)

        dl = (mll_t - state.mloglike) / self.temperature
        u = jax.random.exponential(k_acc, dl.shape, dl.dtype)
        acc = jnp.logical_and(mll_t < LOG_ZERO * 0.1,
                              (mll_t < state.mloglike) | (u > dl))
        P = jnp.where(acc[:, None], trial, state.P)
        mll = jnp.where(acc, mll_t, state.mloglike)
        der = jnp.where(acc[:, None], der_t, state.derived)
        new_slow = _select_tree(acc, slow, state.slow)
        new_semi = _select_tree(acc, semi, state.semi)
        new = StagedChainState(P, mll, der, key,
                               state.num_accept + acc.astype(jnp.int32),
                               state.mapping, new_slow, new_semi)
        return new, (acc, P, mll, der, err)

    # ---------- a compiled segment ----------

    def run_segment(self, state: StagedChainState, schedule: ProposalSchedule
                    ) -> Tuple[StagedChainState, SegmentOutput]:
        sched = ProposalSchedule(jnp.asarray(schedule.block),
                                 jnp.asarray(schedule.direction),
                                 jnp.asarray(schedule.rot_index), ())
        m2 = jnp.asarray(self.proposal.schedule_radius_dims(schedule))
        step_cls = jnp.asarray(self.block_class[np.asarray(schedule.block)])
        if self._run_segment is None:
            def seg(state, sched, m2, step_cls, num_rots):
                nchains = state.P.shape[0]
                key, k_rot = jax.random.split(state.key)
                state = state._replace(key=key)
                deltas = self.proposal.segment_deltas(
                    k_rot, nchains, sched._replace(num_rots=num_rots),
                    state.mapping, state.P.dtype)
                final, outs = jax.lax.scan(self.step, state,
                                           (deltas, m2, step_cls))
                return final, SegmentOutput(*outs)
            self._run_segment = jax.jit(seg, static_argnums=4)
        return self._run_segment(state, sched, m2, step_cls,
                                 tuple(schedule.num_rots))
