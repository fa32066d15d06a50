"""Hamiltonian Monte Carlo on the differentiable posterior.

The reference cannot offer this (finite-difference Fortran likelihoods);
it is the payoff of the differentiable Boltzmann/likelihood stack
(SURVEY.md §7 stage 6, BASELINE config 5). Sampler class precedent:
source/MCMC.f90:15-68 TSamplingAlgorithm hierarchy — here HMC is a second
sampler with the same segment/runner shape as MetropolisSampler.

TPU-native design: chains are vector lanes; a segment of S HMC steps
(each = L fixed leapfrog steps) is ONE `lax.scan` over a (S, L)-unrolled
`lax.scan`, compiled once. No data-dependent control flow: L is static,
step size and the diagonal mass matrix are *traced inputs* so warmup
adaptation (dual averaging + variance-based mass) happens host-side
between segments without recompilation — the same pattern the Metropolis
runner uses for proposal-covariance learning.

Adaptation: Nesterov dual averaging on the shared log step size driven by
the segment-mean acceptance statistic (Hoffman & Gelman 2014 Alg. 5 with
the tree part replaced by fixed-L HMC), plus a diagonal mass matrix
estimated from post-warmup segment variances.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.sampling.convergence import gelman_rubin_r_device
from cosmomc_tpu.sampling.metropolis import LOG_ZERO
from cosmomc_tpu.io.chains import ChainWriter


class HMCState(NamedTuple):
    P: jnp.ndarray            # (nchains, n)
    mloglike: jnp.ndarray     # (nchains,)  -log posterior
    grad: jnp.ndarray         # (nchains, n) d(-logpost)/dP at P
    derived: jnp.ndarray      # (nchains, nd)
    key: jax.Array
    num_accept: jnp.ndarray   # (nchains,) int32
    step_size: jnp.ndarray    # () shared step size (traced)
    inv_mass: jnp.ndarray     # (n,) diagonal inverse mass (traced)


class HMCSegmentOutput(NamedTuple):
    accept: jnp.ndarray       # (S, nchains)
    P: jnp.ndarray            # (S, nchains, n)
    mloglike: jnp.ndarray     # (S, nchains)
    derived: jnp.ndarray      # (S, nchains, nd)
    alpha: jnp.ndarray        # (S,) segment-mean acceptance statistic


@dataclass
class HMCSampler:
    """Fixed-length leapfrog HMC, vmapped over chains, scanned segments."""
    logpost_fn: Callable      # P (n,) -> (mloglike, derived (nd,))
    num_leapfrog: int = 16
    num_derived: int = 0
    jitter: float = 0.2       # uniform step-size jitter fraction per step

    def __post_init__(self):
        def val_grad(P):
            (m, d), g = jax.value_and_grad(self.logpost_fn, has_aux=True)(P)
            return m, d, g
        self._vvg = jax.jit(jax.vmap(val_grad))
        self._run_segment = None

    def init_state(self, key: jax.Array, P0: jnp.ndarray,
                   step_size: float = 0.1,
                   inv_mass: Optional[np.ndarray] = None) -> HMCState:
        nchains, n = P0.shape
        mll, der, grad = self._vvg(P0)
        im = jnp.ones((n,), P0.dtype) if inv_mass is None \
            else jnp.asarray(inv_mass, P0.dtype)
        return HMCState(P0, mll, grad, der, key,
                        jnp.zeros((nchains,), jnp.int32),
                        jnp.asarray(step_size, P0.dtype), im)

    # ---------- one HMC transition (all chains) ----------

    def step(self, state: HMCState, _=None) -> Tuple[HMCState, Tuple]:
        key, k_mom, k_acc, k_jit = jax.random.split(state.key, 4)
        n = state.P.shape[-1]
        dtype = state.P.dtype
        # jittered step size decorrelates trajectory-length resonances
        eps = state.step_size * (1.0 + self.jitter *
                                 (2.0 * jax.random.uniform(k_jit, (), dtype) - 1.0))
        # momenta ~ N(0, M): p = z / sqrt(inv_mass)
        z = jax.random.normal(k_mom, state.P.shape, dtype)
        p0 = z / jnp.sqrt(state.inv_mass)
        H0 = state.mloglike + 0.5 * jnp.sum(z * z, axis=-1)

        def leapfrog(carry, _):
            q, p, g, _m, _d = carry
            p = p - 0.5 * eps * g
            q = q + eps * state.inv_mass * p
            m, d, g = self._vvg(q)
            p = p - 0.5 * eps * g
            return (q, p, g, m, d), None

        (q, p, g, m, d), _ = jax.lax.scan(
            leapfrog, (state.P, p0, state.grad, state.mloglike, state.derived),
            None, length=self.num_leapfrog)
        H1 = m + 0.5 * jnp.sum(state.inv_mass * p * p, axis=-1)
        dH = H1 - H0
        # acceptance statistic for dual averaging: min(1, exp(-dH))
        alpha = jnp.mean(jnp.minimum(1.0, jnp.exp(-jnp.minimum(dH, 50.0))))
        u = jax.random.exponential(k_acc, dH.shape, dtype)
        ok = jnp.logical_and(m < LOG_ZERO * 0.1, jnp.isfinite(dH))
        acc = jnp.logical_and(ok, (dH < 0) | (u > dH))
        P = jnp.where(acc[:, None], q, state.P)
        mll = jnp.where(acc, m, state.mloglike)
        grad = jnp.where(acc[:, None], g, state.grad)
        der = jnp.where(acc[:, None], d, state.derived)
        new = HMCState(P, mll, grad, der, key,
                       state.num_accept + acc.astype(jnp.int32),
                       state.step_size, state.inv_mass)
        return new, (acc, P, mll, der, alpha)

    def run_segment(self, state: HMCState, num_steps: int
                    ) -> Tuple[HMCState, HMCSegmentOutput]:
        if self._run_segment is None:
            def seg(state, num_steps):
                final, outs = jax.lax.scan(self.step, state, None,
                                           length=num_steps)
                return final, HMCSegmentOutput(*outs)
            self._run_segment = jax.jit(seg, static_argnums=1)
        return self._run_segment(state, num_steps)


@dataclass
class DualAveraging:
    """Nesterov dual averaging for log step size (NUTS paper Alg. 5)."""
    target: float = 0.8
    gamma: float = 0.05
    t0: float = 10.0
    kappa: float = 0.75

    def init(self, eps0: float):
        self.mu = float(np.log(10.0 * eps0))
        self.log_eps_bar = 0.0
        self.h_bar = 0.0
        self.t = 0

    def update(self, alpha: float) -> float:
        self.t += 1
        frac = 1.0 / (self.t + self.t0)
        self.h_bar = (1 - frac) * self.h_bar + frac * (self.target - alpha)
        log_eps = self.mu - np.sqrt(self.t) / self.gamma * self.h_bar
        w = self.t ** (-self.kappa)
        self.log_eps_bar = w * log_eps + (1 - w) * self.log_eps_bar
        return float(np.exp(log_eps))

    def final(self) -> float:
        return float(np.exp(self.log_eps_bar))


@dataclass
class HMCRunResult:
    steps: int
    r_minus_1: float
    accept_rate: float
    step_size: float
    means: np.ndarray
    cov: np.ndarray
    stopped_on: str


class HMCRun:
    """Warmup (step-size dual averaging + diagonal mass estimation) then
    sampling segments with R-1 stopping — the HMC analog of SamplingRun."""

    def __init__(self, sampler: HMCSampler, nchains: int,
                 start_P: np.ndarray, seed: int = 0,
                 warmup_segments: int = 8, segment_steps: int = 32,
                 max_steps: int = 100_000, r_stop: float = 0.01,
                 step_size0: float = 0.05, target_accept: float = 0.8,
                 chain_root: Optional[str] = None, feedback: int = 0,
                 paramnames=None, space=None,
                 inv_mass0: Optional[np.ndarray] = None):
        self.sampler = sampler
        self.nchains = nchains
        self.segment_steps = segment_steps
        self.warmup_segments = warmup_segments
        self.max_steps = max_steps
        self.r_stop = r_stop
        self.feedback = feedback
        key = jax.random.PRNGKey(seed)
        # initial diagonal mass: squared per-parameter scales (e.g. the
        # proposal widths) — without it the first warmup segment leapfrogs
        # with identity mass across parameters whose scales span orders of
        # magnitude and rejects everything before adaptation can engage
        self.state = sampler.init_state(key, jnp.asarray(start_P),
                                        step_size=step_size0,
                                        inv_mass=inv_mass0)
        self.da = DualAveraging(target=target_accept)
        self.da.init(step_size0)
        self.writer = ChainWriter(chain_root, nchains) if chain_root else None
        if chain_root is not None:
            if paramnames is not None:
                paramnames.write(chain_root + ".paramnames")
            if space is not None:
                space.write_ranges(chain_root + ".ranges")
        self._stats = []
        self.steps_done = 0

    def run(self) -> HMCRunResult:
        # ---- warmup: adapt step size each segment, mass matrix halfway ----
        warm_P = []
        for w in range(self.warmup_segments):
            self.state, out = self.sampler.run_segment(self.state,
                                                       self.segment_steps)
            alpha = float(np.mean(np.asarray(out.alpha)))
            eps = self.da.update(alpha)
            P = np.asarray(out.P, np.float64)
            warm_P.append(P)
            upd = dict(step_size=jnp.asarray(eps, self.state.P.dtype))
            if w == self.warmup_segments // 2 or w == self.warmup_segments - 1:
                # diagonal mass = marginal posterior variances so far
                flat = np.concatenate(warm_P[-(w // 2 + 1):]).reshape(
                    -1, P.shape[-1])
                var = np.maximum(flat.var(axis=0), 1e-12)
                upd["inv_mass"] = jnp.asarray(var, self.state.P.dtype)
            self.state = self.state._replace(**upd)
            if self.feedback:
                print(f"[warmup {w}] alpha={alpha:.3f} eps={eps:.2e}",
                      flush=True)
        self.state = self.state._replace(
            step_size=jnp.asarray(self.da.final(), self.state.P.dtype),
            num_accept=jnp.zeros((self.nchains,), jnp.int32))

        # ---- sampling ----
        stopped_on = "max_steps"
        r = np.inf
        while self.steps_done < self.max_steps:
            self.state, out = self.sampler.run_segment(self.state,
                                                       self.segment_steps)
            self.steps_done += self.segment_steps
            P = np.asarray(out.P, np.float64)
            self._stats.append(P)
            if self.writer is not None:
                self.writer.add_segment(np.asarray(out.accept), np.asarray(out.P),
                                        np.asarray(out.mloglike),
                                        np.asarray(out.derived))
            chains = np.concatenate(self._stats, axis=0)   # (S, C, n)
            half = chains[chains.shape[0] // 2:]           # second half only
            r = float(gelman_rubin_r_device(
                jnp.asarray(half.swapaxes(0, 1))))
            if self.feedback:
                ar = float(np.asarray(self.state.num_accept).mean()) / self.steps_done
                print(f"[{self.steps_done} steps] R-1={r:.4f} acc={ar:.3f}",
                      flush=True)
            if r < self.r_stop:
                stopped_on = "converged"
                break
        if self.writer is not None:
            self.writer.close()
        flat = np.concatenate(self._stats, axis=0).reshape(-1, self.state.P.shape[-1])
        ar = float(np.asarray(self.state.num_accept).mean()) / max(self.steps_done, 1)
        return HMCRunResult(self.steps_done, r, ar,
                            float(self.state.step_size),
                            flat.mean(axis=0), np.cov(flat.T), stopped_on)
