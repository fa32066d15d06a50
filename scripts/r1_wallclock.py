"""BASELINE second metric: wall-clock to R-1 < target on the flagship
config (plik_lite fiducial forecast + tau prior + BAO, staged sampler,
TPU). Runs segments until R-1 (second-half, cross-chain eigenvalue
statistic, computed every 4 segments) drops below R1_TARGET or the time
budget runs out; logs the (wall_s, steps, R-1) trajectory to stderr and
appends the result to BASELINE_R1.md.

Env: R1_CHAINS (32), R1_SEG_STEPS (16), R1_TARGET (0.01),
R1_BUDGET_S (5400), PARITY_START_SCALE inherited semantics (default 1.0
mildly overdispersed — a real convergence run, not a bias measurement).
"""
import os, sys, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import LikelihoodList
from cosmomc_tpu.likelihoods.bao import BAOLikelihood
from cosmomc_tpu.likelihoods.forecast import write_plik_lite_fiducial
from cosmomc_tpu.likelihoods.pliklite import PlikLiteLikelihood
from cosmomc_tpu.params.parameterizations import ThetaParameterization
from cosmomc_tpu.pipeline import CMBPosterior
from cosmomc_tpu.sampling.staged import StagedMetropolisSampler
from cosmomc_tpu.sampling.convergence import gelman_rubin_r

REF = os.environ.get("COSMOMC_DATA", "/root/reference/data")
THEORY_CL = f"{REF}/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl"
COVMAT = "/root/reference/planck_covmats/base_TTTEEE_lowTEB_plik.covmat"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    dtype = jnp.float32
    nchains = int(os.environ.get("R1_CHAINS", 32))
    seg_steps = int(os.environ.get("R1_SEG_STEPS", 16))
    target = float(os.environ.get("R1_TARGET", 0.01))
    budget = float(os.environ.get("R1_BUDGET_S", 5400))

    d = tempfile.mkdtemp(prefix="plikfid_")
    ds = write_plik_lite_fiducial(d, THEORY_CL)
    par = ThetaParameterization(dtype)
    space = par.default_space()
    space.get("tau").prior_mean = 0.0544
    space.get("tau").prior_std = 0.0073
    likes = LikelihoodList()
    likes.add(PlikLiteLikelihood(ds, name="plik_lite_fid", dtype=dtype))
    likes.add(BAOLikelihood(f"{REF}/DR12/sdss_DR12Consensus_bao.dataset",
                            dtype=dtype))
    post = CMBPosterior(par, space, likes, dtype=dtype)
    log(f"device={jax.devices()[0]} nchains={nchains} "
        f"seg={seg_steps} target={target} budget={budget:.0f}s")

    prop = post.make_proposal(oversample_fast=4)
    cov, loaded = post.space.load_covmat(COVMAT)
    prop.set_covariance(cov)
    sampler = StagedMetropolisSampler(prop, post)
    expensive = [b for b, c in enumerate(sampler.block_class) if c == 0]

    rng = np.random.default_rng(3)
    names = [p.name for p in post.space.varying]
    from_bf = dict(ombh2=0.02237737, omch2=0.1201035, theta=1.0409020,
                   tau=0.05430138, logA=3.0447260, ns=0.9658923)
    P0 = np.tile([p.center for p in post.space.varying], (nchains, 1))
    for k, v in from_bf.items():
        P0[:, names.index(k)] = v
    sig = np.sqrt(np.diag(prop.covariance))
    scale = float(os.environ.get("PARITY_START_SCALE", 1.0))
    P0 = P0 + scale * sig * rng.standard_normal(P0.shape)
    lo = np.array([p.min for p in post.space.varying])
    hi = np.array([p.max for p in post.space.varying])
    P0 = np.clip(P0, lo, hi).astype(np.float32)

    t_all = time.time()
    state = sampler.init_state(jax.random.PRNGKey(4), jnp.asarray(P0))
    jax.block_until_ready(state.mloglike)
    log(f"init {time.time()-t_all:.1f}s")

    kept = []
    t0 = time.time()
    traj = []
    seg = 0
    r = np.inf
    adapted = False
    while time.time() - t0 < budget:
        sched = prop.make_schedule(seg_steps, rng, slow_every=seg_steps,
                                   expensive_blocks=expensive)
        state, out = sampler.run_segment(state, sched)
        kept.append(np.asarray(out.P, np.float64))
        seg += 1
        if not adapted and seg >= 12:
            flat = np.concatenate(kept[-8:], 0).reshape(-1, P0.shape[-1])
            try:
                prop.set_covariance(np.cov(flat.T)
                                    + 1e-12 * np.eye(flat.shape[1]))
                state = state._replace(mapping=prop.mapping)
                adapted = True
                log("proposal adapted")
            except np.linalg.LinAlgError:
                pass
        if seg % 4 == 0:
            allP = np.stack(kept, 0).reshape(-1, nchains, P0.shape[-1])
            half = allP[allP.shape[0] // 2:]
            means_c = half.mean(axis=0)
            xc = half - means_c[None]
            covs_c = np.einsum("sci,scj->cij", xc, xc) / half.shape[0]
            try:
                r = float(gelman_rubin_r(means_c, covs_c))
            except Exception:
                r = float("nan")
            w = time.time() - t0
            traj.append((w, seg * seg_steps, r))
            log(f"seg {seg} wall={w:.0f}s steps={seg*seg_steps} R-1={r:.4f}")
            if r < target:
                break
    wall = time.time() - t0

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hit = r < target
    lines = [
        "# BASELINE second metric — wall-clock to R-1 < %.3g (flagship config)" % target,
        "",
        f"Staged sampler, {nchains} chains x {seg_steps}-step segments "
        f"(1 slow Boltzmann step each), {jax.devices()[0]}, "
        f"reference proposal covmat + one adaptation, start scale {scale}.",
        "",
        "| wall_s | chain steps | R-1 |",
        "|---|---|---|",
    ]
    for w, s, rr in traj:
        lines.append(f"| {w:.0f} | {s} | {rr:.4f} |")
    lines += ["",
              (f"Reached R-1 = {r:.4f} < {target} at wall {wall:.0f}s."
               if hit else
               f"Budget {budget:.0f}s exhausted at R-1 = {r:.4f} "
               f"({seg * seg_steps} steps)."),
              ""]
    with open(os.path.join(root, "BASELINE_R1.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
