"""Sampled posterior-parity harness: the BASELINE.md north star, measured.

Samples the flagship CMB posterior (plik_lite-format fiducial forecast built
from the reference's stored CAMB best-fit spectra + lowE-style tau prior +
BAO DR12) with the staged fast/slow sampler, then compares the recovered
marginal means/sigmas against:

  - the generating parameters: /root/reference/data/
    base_plikHM_TTTEEE_lowl_lowE.minimum (the reference's own best fit),
  - the reference's chain widths: planck_covmats/base_TTTEEE_lowTEB_plik
    .covmat diagonal.

Writes PARITY.md at the repo root with the sigma-distance table. A mean
shifted by <0.1 sigma per parameter = the north-star posterior-parity
target; shifts measure THIS code's Boltzmann/likelihood error, not sampler
noise (the forecast data are noiseless).

Segments are scheduled with exactly ONE full-Boltzmann slow step each
(slow_every), keeping every device execution under the axon backend's ~60s
watchdog; chains are few because the slow stage is VPU-saturated per chain.

Env: PARITY_CHAINS (8), PARITY_SEGMENTS (40), PARITY_SEG_STEPS (16),
PARITY_CPU=1 (force CPU), PARITY_DTYPE (float32).
"""
import os, sys, time, tempfile, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("PARITY_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
if os.environ.get("PARITY_DTYPE") == "float64":
    jax.config.update("jax_enable_x64", True)

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
MINIMUM = f"{REF}/base_plikHM_TTTEEE_lowl_lowE.minimum"
COVMAT = "/root/reference/planck_covmats/base_TTTEEE_lowTEB_plik.covmat"

# map our names -> reference .minimum names
NAME_MAP = {"ombh2": "omegabh2", "omch2": "omegach2", "theta": "theta",
            "tau": "tau", "logA": "logA", "ns": "ns"}


def log(m):
    print(m, file=sys.stderr, flush=True)


def read_minimum(path):
    vals = {}
    for line in open(path):
        parts = line.split()
        if len(parts) >= 3 and parts[0].isdigit():
            try:
                vals[parts[2]] = float(parts[1])
            except ValueError:
                pass
    return vals


def read_covmat_sigmas(path):
    with open(path) as f:
        header = f.readline().strip().lstrip("#").split()
    cov = np.loadtxt(path)
    return {n: float(np.sqrt(cov[i, i])) for i, n in enumerate(header)}


def main():
    dtype = jnp.float64 if os.environ.get("PARITY_DTYPE") == "float64" \
        else jnp.float32
    nchains = int(os.environ.get("PARITY_CHAINS", 8))
    n_seg = int(os.environ.get("PARITY_SEGMENTS", 40))
    seg_steps = int(os.environ.get("PARITY_SEG_STEPS", 16))

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
    log(f"device={jax.devices()[0]} dtype={np.dtype(dtype).name} "
        f"nchains={nchains} segs={n_seg}x{seg_steps}")

    prop = post.make_proposal(oversample_fast=4)
    # start from the reference proposal covariance for fast burn-in
    try:
        cov, loaded = post.space.load_covmat(COVMAT)
        prop.set_covariance(cov)
        log(f"proposal covmat from reference ({len(loaded)} matched)")
    except Exception as e:
        w = np.array([p.propose_width for p in post.space.varying])
        prop.set_covariance(np.diag(w ** 2))
        log(f"diagonal proposal ({e})")
    sampler = StagedMetropolisSampler(prop, post)
    expensive = [b for b, c in enumerate(sampler.block_class) if c == 0]

    rng = np.random.default_rng(2)
    npdt = np.float64 if dtype == jnp.float64 else np.float32
    # overdispersed start around the best fit (so recovery is a real test
    # of the posterior, while burn-in stays affordable)
    names = [p.name for p in post.space.varying]
    from_bf = dict(ombh2=0.02237737, omch2=0.1201035, theta=1.0409020,
                   tau=0.05430138, logA=3.0447260, ns=0.9658923)
    P0 = np.tile([p.center for p in post.space.varying], (nchains, 1))
    for k, v in from_bf.items():
        P0[:, names.index(k)] = v
    try:
        sig = np.sqrt(np.diag(prop.covariance))
    except Exception:
        sig = np.array([p.propose_width for p in post.space.varying])
    # PARITY_START_SCALE: 2.0 = overdispersed recovery run (R-1 needs a
    # long run to settle); ~0.3 = near-equilibrium start for a low-MC-noise
    # measurement of the pure theory bias
    start_scale = float(os.environ.get("PARITY_START_SCALE", 2.0))
    P0 = P0 + start_scale * sig * rng.standard_normal(P0.shape)
    lo = np.array([p.min for p in post.space.varying])
    hi = np.array([p.max for p in post.space.varying])
    P0 = np.clip(P0, lo, hi).astype(npdt)
    t0 = time.time()
    state = sampler.init_state(jax.random.PRNGKey(2), jnp.asarray(P0))
    jax.block_until_ready(state.mloglike)
    log(f"init {time.time()-t0:.1f}s mll mean={float(np.mean(np.asarray(state.mloglike))):.1f}")

    kept = []
    t0 = time.time()
    for seg in range(n_seg):
        sched = prop.make_schedule(seg_steps, rng, slow_every=seg_steps,
                                   expensive_blocks=expensive)
        state, out = sampler.run_segment(state, sched)
        P = np.asarray(out.P, np.float64)
        kept.append(P)
        if seg == max(1, n_seg // 4) - 1:
            # one proposal-covariance adaptation from early samples
            flat = np.concatenate(kept, 0)[-seg_steps * 2:].reshape(-1, P.shape[-1])
            try:
                prop.set_covariance(np.cov(flat.T) + 1e-12 * np.eye(flat.shape[1]))
                state = state._replace(mapping=prop.mapping)
                log("proposal adapted")
            except np.linalg.LinAlgError:
                pass
        if seg % 4 == 3:
            log(f"seg {seg+1}/{n_seg} {time.time()-t0:.0f}s "
                f"acc={float(np.asarray(state.num_accept).mean())/(seg_steps*(seg+1)):.3f}")
    wall = time.time() - t0

    allP = np.stack(kept, 0).reshape(-1, nchains, P.shape[-1])  # (S, C, n)
    S = allP.shape[0]
    half = allP[S // 2:]
    means_c = half.mean(axis=0)
    xc = half - means_c[None]
    covs_c = np.einsum("sci,scj->cij", xc, xc) / half.shape[0]
    try:
        r = float(gelman_rubin_r(means_c, covs_c))
    except Exception:
        r = float("nan")
    flat = half.reshape(-1, half.shape[-1])
    mu = flat.mean(0)
    sig = flat.std(0)

    ref_vals = read_minimum(MINIMUM)
    ref_sig = read_covmat_sigmas(COVMAT)
    names = [p.name for p in post.space.varying]

    rows = []
    for ours, theirs in NAME_MAP.items():
        i = names.index(ours)
        rv = ref_vals.get(theirs)
        rs = ref_sig.get(theirs)
        if rv is None or rs is None:
            continue
        shift = (mu[i] - rv) / rs
        rows.append((ours, rv, mu[i], sig[i], rs, shift))

    lines = [
        "# PARITY — sampled posterior vs reference best fit",
        "",
        f"Flagship config: plik_lite fiducial forecast (noiseless, built from the",
        f"reference's stored CAMB spectra) + tau prior 0.0544±0.0073 + BAO DR12;",
        f"staged fast/slow sampler, {nchains} chains × {S} kept steps "
        f"(second half used), R-1 = {r:.4f}, wall {wall:.0f}s on "
        f"{jax.devices()[0]}.",
        "",
        "Mean shifts are in units of the REFERENCE chain sigma",
        "(planck_covmats/base_TTTEEE_lowTEB_plik.covmat); the north star is",
        "|shift| < 0.1. Because the forecast data are noiseless at the",
        "generating parameters, shifts measure this code's theory error.",
        "",
        "| param | ref best fit | our mean | our sigma | ref sigma | shift/sigma |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    for n, rv, m, s, rs, sh in rows:
        lines.append(f"| {n} | {rv:.6g} | {m:.6g} | {s:.3g} | {rs:.3g} "
                     f"| {sh:+.2f} |")
        worst = max(worst, abs(sh))
    lines += ["", f"Worst shift: {worst:.2f} sigma."]
    out_md = "\n".join(lines) + "\n"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PARITY.md"), "w") as f:
        f.write(out_md)
    print(out_md)
    print(json.dumps({"worst_shift_sigma": round(worst, 3), "r_minus_1": r,
                      "wall_s": round(wall, 1)}))


if __name__ == "__main__":
    main()
