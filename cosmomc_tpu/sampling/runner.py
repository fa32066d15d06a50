"""Sampling run orchestrator: segments, burn-in, adaptation, convergence.

Plays the role of the reference's TSetup%DoSampling + TMpiChainCollector
(GeneralSetup.f90:115-144, SampleCollector.f90): run the compiled sampler in
segments; between segments (host-side, cheap, float64):

  - detect burn-in (reference: every used param changed >50 times,
    SampleCollector.f90:353-407 — here: per-chain accepted-step count
    exceeding 50 per proposal block, the lockstep equivalent);
  - pool post-burn chain moments and compute Gelman-Rubin R-1
    (UpdateCovAndCheckConverge :212-322);
  - learn the proposal covariance from pooled samples while
    R-1 < max_r_propose_update (:311-318);
  - checkpoint (atomic tmp+rename, SampleCollector.f90:174-187);
  - stop when R-1 < r_stop (MPI_R_Stop) or max samples reached.

The MPI_ALLGATHER of per-rank statistics is replaced by array reductions
over the chain axis (single host) or `psum` over a mesh axis (multi-host).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.sampling.metropolis import MetropolisSampler, ChainState
from cosmomc_tpu.sampling.proposal import BlockedProposal
from cosmomc_tpu.sampling.convergence import gelman_rubin_r
from cosmomc_tpu.io.chains import ChainWriter


@dataclass
class RunConfig:
    nchains: int = 128
    segment_steps: int = 256
    max_steps: int = 4_000_000          # reference `samples` budget
    r_stop: float = 0.01                # MPI_R_Stop
    max_r_propose_update: float = 2.0   # MPI_Max_R_ProposeUpdate
    burn_accepts_per_block: int = 50
    min_burn_segments: int = 1
    stats_thin: int = 4                 # keep every k-th step for statistics
    learn_propose: bool = True
    checkpoint_freq_segments: int = 10
    seed: int = 0
    #: shard chains over the first `num_devices` devices (0/1 = single
    #: device). The chain axis is the data-parallel mesh axis; the compiled
    #: segment runs SPMD with jit-propagated shardings (the reference's
    #: one-rank-per-chain MPI layout, SampleCollector.f90:248-251).
    num_devices: int = 0
    #: confidence-limit convergence check (SampleCollector.f90:477-544
    #: CheckLimitsConverge): additionally require the cross-chain spread of
    #: each parameter's `limit_frac` quantile endpoints to be below
    #: `limits_tol` in units of the pooled sigma. 0 = off (R-1 only).
    limits_tol: float = 0.0
    limit_frac: float = 0.025
    #: error-point policy (settings.f90:93 stop_on_error + the
    #: Calculator_CAMB.f90:205-215 error counting): in-bounds proposals
    #: whose theory evaluates non-finite are counted per segment; with
    #: stop_on_error the run aborts instead of silently rejecting forever
    stop_on_error: bool = False


@dataclass
class RunResult:
    steps: int
    r_minus_1: float
    burned_in_at: int
    accept_rate: float
    means: np.ndarray
    cov: np.ndarray
    wall_s: float
    stopped_on: str


class SamplingRun:
    def __init__(self, sampler: MetropolisSampler, cfg: RunConfig,
                 start_P: np.ndarray, chain_root: Optional[str] = None,
                 feedback: int = 1, paramnames=None, space=None,
                 dtype=jnp.float32):
        self.sampler = sampler
        self.cfg = cfg
        self.feedback = feedback
        self.rng = np.random.default_rng(cfg.seed + 1)
        key = jax.random.PRNGKey(cfg.seed)
        self.mesh = None
        if cfg.num_devices and cfg.num_devices > 1:
            from cosmomc_tpu.parallel.mesh import chain_mesh
            if cfg.nchains % cfg.num_devices:
                raise ValueError(f"nchains={cfg.nchains} not divisible by "
                                 f"num_devices={cfg.num_devices}")
            self.mesh = chain_mesh(cfg.num_devices)
        self.state = sampler.init_state(key, jnp.asarray(start_P, dtype))
        if self.mesh is not None:
            from cosmomc_tpu.parallel.mesh import shard_chains
            self.state = shard_chains(self.state, self.mesh, cfg.nchains)
        self.writer = ChainWriter(chain_root, cfg.nchains) if chain_root else None
        self.chain_root = chain_root
        # GetDist sidecars (reference driver.F90:209-216 writes .paramnames/
        # .ranges on rank 0 before sampling; getdist.loadMCSamples needs them)
        if chain_root is not None:
            if paramnames is not None:
                paramnames.write(chain_root + ".paramnames")
            if space is not None:
                space.write_ranges(chain_root + ".ranges")
        self.nblocks = len(sampler.proposal.block_sizes)
        self._stats: List[np.ndarray] = []   # post-burn thinned samples (S', C, n)
        self.steps_done = 0
        self.burned_in_at = -1
        self.r_current = np.inf
        self._read_mtime = 0.0               # runtime-control file freshness
        # slow/semi/fast step counters (the reference's perf stats,
        # CalcLike_Cosmology.f90:96-102 slow_changes/semislow_changes)
        self.class_steps = np.zeros(3, np.int64)
        self.num_error_points = 0
        self._log = (open(chain_root + ".log", "a", buffering=1)
                     if chain_root else None)

    # ---------- main loop ----------

    def run(self) -> RunResult:
        cfg = self.cfg
        t0 = time.time()
        stopped_on = "max_steps"
        seg_i = 0
        while self.steps_done < cfg.max_steps:
            sched = self.sampler.proposal.make_schedule(cfg.segment_steps, self.rng)
            if hasattr(self.sampler, "block_class"):
                cls = self.sampler.block_class[np.asarray(sched.block)]
                np.add.at(self.class_steps, cls, 1)
            else:
                self.class_steps[0] += cfg.segment_steps
            self.state, out = self.sampler.run_segment(self.state, sched)
            acc = np.asarray(out.accept)
            P = np.asarray(out.P)
            mll = np.asarray(out.mloglike)
            der = np.asarray(out.derived)
            n_err = int(np.asarray(out.error).sum()) \
                if hasattr(out, "error") else 0
            if n_err:
                self.num_error_points += n_err
                msg = (f"ERROR POINTS: {n_err} in-bounds proposals with "
                       f"non-finite theory this segment "
                       f"({self.num_error_points} total)")
                if self._log is not None:
                    self._log.write(msg + "\n")
                if self.feedback > 0:
                    print(msg, flush=True)
                if cfg.stop_on_error:
                    raise RuntimeError(
                        msg + " — aborting (stop_on_error=T, reference "
                        "settings.f90:93)")
            self.steps_done += cfg.segment_steps
            seg_i += 1

            burned = self._check_burn_in(seg_i)
            if burned:
                self._stats.append(P[::cfg.stats_thin].astype(np.float64))
                if self.writer is not None:
                    self.writer.add_segment(acc, P, mll, der)
                r = self._update_convergence_and_proposal()
                self._write_converge_stat(done=False)
                if seg_i % 4 == 0:
                    ar = float(np.asarray(self.state.num_accept).mean()) / self.steps_done
                    cs = self.class_steps
                    line = (f"[{self.steps_done:>8d} steps] R-1 = {r:.4f}  "
                            f"acc = {ar:.3f}  "
                            f"slow/semi/fast = {cs[0]}/{cs[1]}/{cs[2]}"
                            + (f"  error_points = {self.num_error_points}"
                               if self.num_error_points else ""))
                    if self.feedback > 0:
                        print(line, flush=True)
                    if self._log is not None:
                        # the reference's per-chain .log (MCMC.f90:299-304);
                        # lockstep vmapped chains share one log
                        self._log.write(line + "\n")
                if r < cfg.r_stop:
                    stopped_on = "converged"
                    break
            if self.writer is not None and seg_i % cfg.checkpoint_freq_segments == 0:
                self.checkpoint()
            if self._check_runtime_control():
                stopped_on = "exit_requested"
                break

        if self.writer is not None:
            self.writer.close()
            self.checkpoint()
        if self._log is not None:
            self._log.close()
            self._log = None
        self._write_converge_stat(done=stopped_on == "converged")
        means, cov = self._pooled_moments()
        ar = float(np.asarray(self.state.num_accept).mean()) / max(self.steps_done, 1)
        return RunResult(self.steps_done, self.r_current, self.burned_in_at, ar,
                         means, cov, time.time() - t0, stopped_on)

    # ---------- runtime control ----------

    def _check_runtime_control(self) -> bool:
        """Poll `<root>.read` between segments (reference CheckParamChange,
        settings.f90:290-313: a small ini dropped next to the chains can
        change feedback or request a clean exit mid-run). Returns True if
        an exit was requested."""
        if self.chain_root is None:
            return False
        path = self.chain_root + ".read"
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            return False
        if mtime <= self._read_mtime:
            return False
        self._read_mtime = mtime
        from cosmomc_tpu.utils.ini import IniFile
        try:
            ini = IniFile(path)
        except Exception:
            return False
        fb = ini.int("feedback")
        if fb is not None:
            self.feedback = fb
            print(f"runtime control: feedback -> {fb}", flush=True)
        if ini.bool("exit", False):
            print("runtime control: exit requested", flush=True)
            return True
        return False

    # ---------- burn-in ----------

    def _check_burn_in(self, seg_i: int) -> bool:
        if self.burned_in_at >= 0:
            return True
        if seg_i < self.cfg.min_burn_segments:
            return False
        need = self.cfg.burn_accepts_per_block * self.nblocks
        accepts = np.asarray(self.state.num_accept)
        if np.min(accepts) >= need:
            self.burned_in_at = self.steps_done
            if self.feedback > 0:
                print(f"burn-in done at step {self.steps_done}", flush=True)
            return True
        return False

    # ---------- convergence + adaptation ----------

    def _pooled_moments(self):
        if not self._stats:
            P = np.asarray(self.state.P, np.float64)
            return P.mean(axis=0), np.cov(P.T) if P.shape[1] > 1 else np.var(P.T)[None, None]
        x = np.concatenate(self._stats, axis=0)          # (S', C, n)
        half = x[x.shape[0] // 2:]                       # second half of post-burn
        flat = half.reshape(-1, half.shape[-1])
        mu = flat.mean(axis=0)
        xc = flat - mu
        cov = xc.T @ xc / flat.shape[0]
        return mu, cov

    def _update_convergence_and_proposal(self) -> float:
        x = np.concatenate(self._stats, axis=0)          # (S', C, n)
        half = x[x.shape[0] // 2:]
        # per-chain moments over the retained window
        means = half.mean(axis=0)                        # (C, n)
        xc = half - means[None, :, :]
        covs = np.einsum("sci,scj->cij", xc, xc) / half.shape[0]
        try:
            r = gelman_rubin_r(means, covs)
        except np.linalg.LinAlgError:
            r = np.inf
        self.r_current = r
        # confidence-limit convergence (CheckLimitsConverge): worst
        # cross-chain rms of the lower/upper limit_frac quantile endpoints
        # in pooled-sigma units
        self.limits_spread = None
        if self.cfg.limits_tol > 0:
            fr = self.cfg.limit_frac
            q = np.quantile(half, [fr, 1.0 - fr], axis=0)   # (2, C, n)
            sig = half.reshape(-1, half.shape[-1]).std(axis=0) + 1e-30
            spread = q.std(axis=1) / sig                    # (2, n)
            self.limits_spread = float(spread.max())
            if self.limits_spread > self.cfg.limits_tol:
                # hold convergence until the limits settle too
                self.r_current = max(self.r_current,
                                     self.cfg.r_stop + self.limits_spread)
                r = self.r_current
        if (self.cfg.learn_propose and r < self.cfg.max_r_propose_update
                and half.shape[0] * half.shape[1] > 10 * means.shape[1]):
            flat = half.reshape(-1, half.shape[-1])
            mu = flat.mean(axis=0)
            cov = (flat - mu).T @ (flat - mu) / flat.shape[0]
            try:
                self.sampler.proposal.set_covariance(cov)
                # push the new mapping into the device state so the next
                # compiled segment actually uses it
                self.state = self.state._replace(
                    mapping=self.sampler.proposal.mapping)
            except np.linalg.LinAlgError:
                pass
        # cap memory: thin stored stats if very large (reference thins >500k)
        if x.shape[0] * x.shape[1] > 2_000_000:
            self._stats = [x[::2]]
        return r

    def _write_converge_stat(self, done: bool) -> None:
        """`<root>.converge_stat`: current R-1 (+ "Done" when converged) —
        the file the reference's grid layer polls (SampleCollector.f90:461-475)."""
        if self.chain_root is None:
            return
        with open(self.chain_root + ".converge_stat", "w") as f:
            f.write(f"{self.r_current:17.5f}\n")
            if done:
                f.write("Done\n")
            if getattr(self, "limits_spread", None) is not None:
                f.write(f"limits spread/sigma: {self.limits_spread:.5f}\n")

    # ---------- checkpoint / resume ----------

    def checkpoint(self) -> None:
        if self.chain_root is None:
            return
        path = self.chain_root + ".chk.npz"
        tmp = path + ".tmp.npz"
        st = self.state
        np.savez(
            tmp,
            P=np.asarray(st.P), mloglike=np.asarray(st.mloglike),
            derived=np.asarray(st.derived), key=np.asarray(st.key),
            num_accept=np.asarray(st.num_accept),
            steps_done=self.steps_done, burned_in_at=self.burned_in_at,
            propose_cov=self.sampler.proposal.covariance,
        )
        os.replace(tmp, path)

    def resume(self) -> bool:
        path = (self.chain_root or "") + ".chk.npz"
        if not self.chain_root or not os.path.isfile(path):
            return False
        z = np.load(path)
        self.sampler.proposal.set_covariance(z["propose_cov"])
        if hasattr(self.sampler, "state_from_arrays"):
            # staged sampler: rebuilds the per-chain theory caches too
            self.state = self.sampler.state_from_arrays(
                z["P"], z["mloglike"], z["derived"], jnp.asarray(z["key"]),
                z["num_accept"])
        else:
            self.state = ChainState(
                jnp.asarray(z["P"]), jnp.asarray(z["mloglike"]),
                jnp.asarray(z["derived"]), jnp.asarray(z["key"]),
                jnp.asarray(z["num_accept"]), self.sampler.proposal.mapping)
        self.steps_done = int(z["steps_done"])
        self.burned_in_at = int(z["burned_in_at"])
        if self.mesh is not None:
            from cosmomc_tpu.parallel.mesh import shard_chains
            self.state = shard_chains(self.state, self.mesh, self.cfg.nchains)
        return True
