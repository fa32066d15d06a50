#!/usr/bin/env python3
"""Benchmark: effective samples/sec/chip on the NORTH-STAR config
(BASELINE.json metric: LCDM, plik_lite+BAO through the full Boltzmann
theory path, staged fast/slow sampler), plus the background-LCDM config
(BASELINE config 1) as a secondary line.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers for this metric (BASELINE.md:
"published": {}); vs_baseline compares against the most recent prior round
that recorded the SAME metric, or 1.0 on the first round. Progress goes to
stderr; stdout carries only the JSON line.

Platform notes (axon TPU backend, empirically characterized r3-r4):
  - kernel-faults on device executions longer than ~60s (a watchdog), so
    segments are scheduled with EXACTLY ONE full-Boltzmann slow step each
    (proposal.make_schedule(slow_every=...)); the r5 LOS tau-striding +
    series rework cut the slow stage to ~0.8 s/chain, so
    BENCH_CMB_CHAINS=32 fits a segment in ~30 s;
  - gathers run ~100x below memory speed, so the CMB path uses the
    recurrence LOS integrator (models/cls.py), not the Bessel-table one;
  - sampler segments with segment_steps * nchains > 65536 fault
    (background config cap, unchanged from r3).

Env knobs: BENCH_CHAINS (background, default 1024), BENCH_CMB_CHAINS (8),
BENCH_SMOKE=1 (short everything), BENCH_SKIP_CMB=1, COSMOMC_DATA.
"""

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

MAX_SEG_ELEMENTS = 65536   # axon platform limit (background config)
REF = os.environ.get("COSMOMC_DATA", "/root/reference/data")
COVMAT = "/root/reference/planck_covmats/base_TTTEEE_lowTEB_plik.covmat"
BESTFIT = dict(ombh2=0.02237737, omch2=0.1201035, theta=1.0409020,
               tau=0.05430138, logA=3.0447260, ns=0.9658923)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def effective_samples(x: np.ndarray, max_lag: int = 200) -> float:
    """ESS via integrated autocorrelation time, summed over chains.
    x: (nsteps, nchains) for one parameter."""
    n, c = x.shape
    max_lag = min(max_lag, n - 2)
    xc = x - x.mean(axis=0)
    ess_total = 0.0
    f = np.fft.rfft(xc, n=2 * n, axis=0)
    acf = np.fft.irfft(f * np.conj(f), axis=0)[:max_lag].real
    acf /= acf[0] + 1e-30
    for ci in range(c):
        a = acf[:, ci]
        tau = 1.0
        for lag in range(1, max_lag - 1, 2):
            pair = a[lag] + a[lag + 1]
            if pair < 0:
                break
            tau += 2.0 * pair
        ess_total += n / tau
    return ess_total


def prior_round_value(metric_key: str):
    """Most recent recorded bench value whose metric contains metric_key."""
    best = None
    for path in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        if parsed and rec.get("rc", 1) == 0 and \
                metric_key in parsed.get("metric", ""):
            if parsed.get("value"):
                best = float(parsed["value"])
    return best


# ---------------------------------------------------------------------------
# Primary: north-star CMB config (LCDM plik_lite + BAO, staged sampler)
# ---------------------------------------------------------------------------

def bench_cmb(smoke: bool) -> dict:
    from cosmomc_tpu.likelihoods.base import LikelihoodList
    from cosmomc_tpu.likelihoods.bao import BAOLikelihood
    from cosmomc_tpu.likelihoods.forecast import write_plik_lite_fiducial
    from cosmomc_tpu.likelihoods.pliklite import PlikLiteLikelihood
    from cosmomc_tpu.params.parameterizations import ThetaParameterization
    from cosmomc_tpu.pipeline import CMBPosterior
    from cosmomc_tpu.sampling.staged import StagedMetropolisSampler

    dtype = jnp.float32
    nchains = int(os.environ.get("BENCH_CMB_CHAINS", 32))
    seg_steps = 16
    n_burn = 1 if smoke else 2
    n_timed = 2 if smoke else 6

    d = tempfile.mkdtemp(prefix="bench_plikfid_")
    ds = write_plik_lite_fiducial(
        d, f"{REF}/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl")
    par = ThetaParameterization(dtype)
    space = par.default_space()
    space.get("tau").prior_mean = 0.0544
    space.get("tau").prior_std = 0.0073
    likes = LikelihoodList()
    likes.add(PlikLiteLikelihood(ds, name="plik_lite", dtype=dtype))
    likes.add(BAOLikelihood(f"{REF}/DR12/sdss_DR12Consensus_bao.dataset",
                            dtype=dtype))
    post = CMBPosterior(par, space, likes, dtype=dtype)
    log(f"cmb bench: nchains={nchains} seg={seg_steps} "
        f"device={jax.devices()[0]}")

    prop = post.make_proposal(oversample_fast=4)
    try:
        cov, _ = post.space.load_covmat(COVMAT)
        prop.set_covariance(cov)
    except Exception as e:
        log(f"covmat load failed ({e}); diagonal proposal")
        w = np.array([p.propose_width for p in post.space.varying])
        prop.set_covariance(np.diag(w ** 2))
    sampler = StagedMetropolisSampler(prop, post)
    expensive = [b for b, c in enumerate(sampler.block_class) if c == 0]

    # start near the best fit (bench measures equilibrium throughput)
    rng = np.random.default_rng(0)
    names = [p.name for p in post.space.varying]
    P0 = np.tile([p.center for p in post.space.varying], (nchains, 1))
    for k, v in BESTFIT.items():
        P0[:, names.index(k)] = v
    sig = np.sqrt(np.diag(prop.covariance))
    P0 += 0.3 * sig * rng.standard_normal(P0.shape)
    lo = np.array([p.min for p in post.space.varying])
    hi = np.array([p.max for p in post.space.varying])
    P0 = np.clip(P0, lo, hi).astype(np.float32)

    t0 = time.time()
    state = sampler.init_state(jax.random.PRNGKey(0), jnp.asarray(P0))
    jax.block_until_ready(state.mloglike)
    init_s = time.time() - t0
    log(f"cmb init (compile+run) {init_s:.1f}s "
        f"mll={float(np.mean(np.asarray(state.mloglike))):.1f}")

    def run_seg():
        sched = prop.make_schedule(seg_steps, rng, slow_every=seg_steps,
                                   expensive_blocks=expensive)
        st, out = sampler.run_segment(state, sched)
        return st, out

    t0 = time.time()
    compile_extra = 0.0
    for i in range(n_burn):
        sched = prop.make_schedule(seg_steps, rng, slow_every=seg_steps,
                                   expensive_blocks=expensive)
        state, out = sampler.run_segment(state, sched)
        jax.block_until_ready(state.P)
        if i == 0:
            compile_extra = time.time() - t0
            log(f"cmb first segment (compile+run) {compile_extra:.1f}s")
    log(f"cmb burn {n_burn} segments {time.time()-t0:.1f}s")

    outs = []
    t0 = time.time()
    done = 0
    for _ in range(n_timed):
        sched = prop.make_schedule(seg_steps, rng, slow_every=seg_steps,
                                   expensive_blocks=expensive)
        state, out = sampler.run_segment(state, sched)
        outs.append(np.asarray(out.P, np.float64))
        done += 1
        if time.time() - t0 > 200:
            break
    jax.block_until_ready(state.P)
    device_s = time.time() - t0
    acc = float(np.asarray(state.num_accept).mean()) / (
        (n_burn + done) * seg_steps)
    log(f"cmb timed {done} segments {device_s:.1f}s acc={acc:.3f}")

    P = np.concatenate(outs, axis=0)           # (steps, chains, n)
    ess = min(effective_samples(P[:, :, j]) for j in range(P.shape[-1]))
    eff = ess / device_s
    return {
        "metric": "effective samples/sec/chip (LCDM plik_lite+BAO, "
                  "staged Boltzmann)",
        "value": round(float(eff), 4),
        "unit": "eff_samples/s",
        "detail": {
            "nchains": nchains, "segment_steps": seg_steps,
            "slow_steps_per_segment": 1,
            "chain_steps_per_sec": round(done * seg_steps * nchains
                                         / device_s, 2),
            "ess_min_param": round(float(ess), 2),
            "accept": round(acc, 3),
            "init_compile_s": round(init_s, 1),
            "segment_compile_s": round(compile_extra, 1),
            "device": str(jax.devices()[0]),
        },
    }


# ---------------------------------------------------------------------------
# Secondary: background LCDM (BAO+SN+H0) — unchanged from r3
# ---------------------------------------------------------------------------

def bench_background(smoke: bool) -> dict:
    from cosmomc_tpu.likelihoods.base import LikelihoodList
    from cosmomc_tpu.likelihoods.bao import BAOLikelihood
    from cosmomc_tpu.likelihoods.sn import SNLikelihood
    from cosmomc_tpu.likelihoods.hst import HSTLikelihood
    from cosmomc_tpu.params.parameterizations import BackgroundParameterization
    from cosmomc_tpu.pipeline import BackgroundPosterior
    from cosmomc_tpu.sampling.metropolis import MetropolisSampler
    from cosmomc_tpu.sampling.runner import SamplingRun, RunConfig

    dtype = jnp.float32
    par = BackgroundParameterization(dtype)
    space = par.default_space()
    likes = LikelihoodList()
    likes.add(BAOLikelihood(f"{REF}/DR12/sdss_DR12Consensus_bao.dataset",
                            dtype=dtype))
    likes.add(BAOLikelihood(f"{REF}/sdss_6DF_bao.dataset", dtype=dtype))
    likes.add(SNLikelihood(f"{REF}/Pantheon/full_long.dataset", dtype=dtype))
    likes.add(HSTLikelihood(H0=73.48, H0_err=1.66, zeff=0.04))
    post = BackgroundPosterior(par, space, likes, dtype=dtype)

    nchains = int(os.environ.get("BENCH_CHAINS", 1024))
    seg = max(8, min(256, MAX_SEG_ELEMENTS // nchains))
    log(f"background bench: nchains={nchains} seg={seg}")

    prop = post.make_proposal()
    w = np.array([p.propose_width for p in post.space.varying])
    prop.set_covariance(np.diag(w ** 2))
    sampler = MetropolisSampler(prop, post.logpost(),
                                num_derived=post.num_derived)
    cfg = RunConfig(nchains=nchains, segment_steps=seg, max_steps=200 * seg,
                    r_stop=0.0, burn_accepts_per_block=30, stats_thin=1,
                    seed=1)
    rng = np.random.default_rng(0)
    run = SamplingRun(sampler, cfg,
                      post.start_positions(rng, nchains).astype(np.float32),
                      chain_root=None, feedback=0)

    t0 = time.time()
    sched = prop.make_schedule(seg, run.rng)
    run.state, _ = sampler.run_segment(run.state, sched)
    jax.block_until_ready(run.state.P)
    compile_s = time.time() - t0
    log(f"background segment compile+run {compile_s:.1f}s")

    n_burn = 1 if smoke else max(1, 2048 // seg)
    t0 = time.time()
    out = None
    for _ in range(n_burn):
        sched = prop.make_schedule(seg, run.rng)
        run.state, out = sampler.run_segment(run.state, sched)
        if time.time() - t0 > 60:
            break
    jax.block_until_ready(run.state.P)
    log(f"background burn {time.time()-t0:.1f}s")

    P = np.asarray(out.P, np.float64)
    flat = P[P.shape[0] // 2:].reshape(-1, P.shape[-1])
    try:
        prop.set_covariance(np.cov(flat.T))
        run.state = run.state._replace(mapping=prop.mapping)
    except np.linalg.LinAlgError:
        log("cov learn failed; keeping diagonal proposal")

    n_timed = 2 if smoke else max(4, 4096 // seg)
    outs = []
    t0 = time.time()
    done = 0
    for _ in range(n_timed):
        sched = prop.make_schedule(seg, run.rng)
        run.state, out = sampler.run_segment(run.state, sched)
        outs.append(out.P)
        done += 1
        if time.time() - t0 > 100:
            break
    jax.block_until_ready(outs[-1])
    device_s = time.time() - t0
    log(f"background timed {done} segments {device_s:.1f}s")

    P = np.concatenate([np.asarray(o, np.float64) for o in outs], axis=0)
    ess = min(effective_samples(P[:, :, j]) for j in range(P.shape[-1]))
    return {
        "metric": "effective samples/sec/chip (background LCDM, BAO+SN+H0)",
        "value": round(float(ess / device_s), 2),
        "unit": "eff_samples/s",
        "detail": {"nchains": nchains, "segment_steps": seg,
                   "chain_steps_per_sec": round(done * seg * nchains
                                                / device_s, 1),
                   "compile_s": round(compile_s, 1)},
    }


def main():
    smoke = os.environ.get("BENCH_SMOKE", "0") == "1"
    budget = float(os.environ.get("BENCH_BUDGET_S", 540))
    t_start = time.time()

    # device warmup: first contact with a cold tunnel + first D2H transfer
    t0 = time.time()
    _ = np.asarray(jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    log(f"device warmup {time.time()-t0:.1f}s")

    primary = None
    if os.environ.get("BENCH_SKIP_CMB", "0") != "1":
        try:
            primary = bench_cmb(smoke)
        except Exception as e:
            log(f"CMB bench FAILED: {type(e).__name__}: {e}")
    secondary = None
    if time.time() - t_start < budget:
        try:
            secondary = bench_background(smoke)
        except Exception as e:
            log(f"background bench FAILED: {type(e).__name__}: {e}")
    else:
        log("budget exhausted after primary; skipping background secondary")

    result = primary or secondary
    if result is None:
        raise SystemExit(1)
    if primary is not None and secondary is not None:
        result["detail"]["secondary"] = {
            "metric": secondary["metric"], "value": secondary["value"],
            "detail": secondary["detail"]}
    key = "plik_lite+BAO" if result is primary else "background"
    prior = prior_round_value(key if result is primary else "background LCDM")
    result["vs_baseline"] = (round(result["value"] / prior, 3)
                             if prior else 1.0)
    result["detail"]["vs_baseline_ref"] = (
        "prior round same-metric BENCH value" if prior
        else "first round with this metric")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
