#!/usr/bin/env python3
"""Benchmark: effective samples/sec/chip on the background-LCDM inference
config (BASELINE config 1: BAO DR12+6DF + Pantheon + HST), run on whatever
jax.devices() provides (the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers for this metric (BASELINE.md:
"published": {}), so vs_baseline compares against the most recent prior
round's recorded value (BENCH_r*.json in the repo root), or 1.0 for the
first round with a valid number. Progress goes to stderr; stdout carries
only the JSON line.

Platform note: the axon TPU backend kernel-faults on sampler segments with
segment_steps * nchains > 65536 (empirically bisected: 1024x64 and 256x256
run, 1024x128 and 1024x256 fault, independent of which likelihoods are in
the posterior). Segments are capped accordingly; throughput is unaffected
because the scan amortizes per-segment overhead well before that size.

Env knobs: BENCH_CHAINS (default 1024), BENCH_SMOKE=1 (single short timed
segment, <60s warm), COSMOMC_DATA (dataset dir).
"""

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

MAX_SEG_ELEMENTS = 65536   # axon platform limit, see module docstring


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def effective_samples(x: np.ndarray, max_lag: int = 200) -> float:
    """ESS via integrated autocorrelation time, summed over chains.
    x: (nsteps, nchains) for one parameter."""
    n, c = x.shape
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


def prior_round_value() -> float | None:
    """Most recent valid recorded bench value (for vs_baseline)."""
    best = None
    for path in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        val = None
        if isinstance(rec, dict):
            if rec.get("rc", 1) == 0 and "parsed" in rec and rec["parsed"]:
                val = rec["parsed"].get("value")
            elif "value" in rec:
                val = rec.get("value")
        if val:
            best = float(val)
    return best


def main():
    from cosmomc_tpu.likelihoods.base import LikelihoodList
    from cosmomc_tpu.likelihoods.bao import BAOLikelihood
    from cosmomc_tpu.likelihoods.sn import SNLikelihood
    from cosmomc_tpu.likelihoods.hst import HSTLikelihood
    from cosmomc_tpu.params.parameterizations import BackgroundParameterization
    from cosmomc_tpu.pipeline import BackgroundPosterior
    from cosmomc_tpu.sampling.metropolis import MetropolisSampler
    from cosmomc_tpu.sampling.runner import SamplingRun, RunConfig

    REF = os.environ.get("COSMOMC_DATA", "/root/reference/data")
    dtype = jnp.float32   # hot path precision on TPU

    par = BackgroundParameterization(dtype)
    space = par.default_space()
    likes = LikelihoodList()
    likes.add(BAOLikelihood(f"{REF}/DR12/sdss_DR12Consensus_bao.dataset", dtype=dtype))
    likes.add(BAOLikelihood(f"{REF}/sdss_6DF_bao.dataset", dtype=dtype))
    likes.add(SNLikelihood(f"{REF}/Pantheon/full_long.dataset", dtype=dtype))
    likes.add(HSTLikelihood(H0=73.48, H0_err=1.66, zeff=0.04))
    post = BackgroundPosterior(par, space, likes, dtype=dtype)

    nchains = int(os.environ.get("BENCH_CHAINS", 1024))
    smoke = os.environ.get("BENCH_SMOKE", "0") == "1"
    seg = max(8, min(256, MAX_SEG_ELEMENTS // nchains))
    log(f"bench: nchains={nchains} seg={seg} device={jax.devices()[0]}")

    prop = post.make_proposal()
    w = np.array([p.propose_width for p in post.space.varying])
    prop.set_covariance(np.diag(w ** 2))
    sampler = MetropolisSampler(prop, post.logpost(), num_derived=post.num_derived)
    cfg = RunConfig(nchains=nchains, segment_steps=seg, max_steps=200 * seg,
                    r_stop=0.0, burn_accepts_per_block=30, stats_thin=1, seed=1)
    rng = np.random.default_rng(0)
    run = SamplingRun(sampler, cfg, post.start_positions(rng, nchains).astype(np.float32),
                      chain_root=None, feedback=0)

    # device warmup (first contact with a cold tunnel can take minutes) —
    # including the FIRST device->host transfer, which opens the tunnel's
    # D2H channel (~2 min one-time; pay it here, not inside a timed phase)
    t0 = time.time()
    _ = np.asarray(jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    log(f"device warmup {time.time()-t0:.1f}s")

    # compile + burn-in segments
    t0 = time.time()
    sched = prop.make_schedule(seg, run.rng)
    run.state, _ = sampler.run_segment(run.state, sched)
    jax.block_until_ready(run.state.P)
    compile_s = time.time() - t0
    log(f"segment compile+run {compile_s:.1f}s")

    n_burn = 1 if smoke else max(1, 2048 // seg)
    t0 = time.time()
    for _ in range(n_burn):
        sched = prop.make_schedule(seg, run.rng)
        run.state, out = sampler.run_segment(run.state, sched)
        if time.time() - t0 > 90:   # wall-clock guard: a slow/cold tunnel
            break                   # must never time the driver out
    jax.block_until_ready(run.state.P)
    log(f"burn-in {n_burn} segments {time.time()-t0:.1f}s")

    # learn the proposal from the burn-in tail, then measure
    P = np.asarray(out.P, np.float64)
    flat = P[P.shape[0] // 2:].reshape(-1, P.shape[-1])
    try:
        prop.set_covariance(np.cov(flat.T))
        run.state = run.state._replace(mapping=prop.mapping)
    except np.linalg.LinAlgError:
        log("cov learn failed; keeping diagonal proposal")

    n_timed = 2 if smoke else max(4, 6144 // seg)
    outs = []
    t0 = time.time()
    done = 0
    for _ in range(n_timed):
        sched = prop.make_schedule(seg, run.rng)
        run.state, out = sampler.run_segment(run.state, sched)
        outs.append(out.P)
        done += 1
        if time.time() - t0 > 150:   # wall-clock guard (see burn-in loop)
            break
    n_timed = done
    jax.block_until_ready(outs[-1])
    device_s = time.time() - t0
    log(f"timed {n_timed} segments {device_s:.1f}s")

    P = np.concatenate([np.asarray(o, np.float64) for o in outs], axis=0)
    ess = min(effective_samples(P[:, :, j]) for j in range(P.shape[-1]))
    eff_per_sec = ess / device_s

    prior = prior_round_value()
    result = {
        "metric": "effective samples/sec/chip (background LCDM, BAO+SN+H0)",
        "value": round(float(eff_per_sec), 2),
        "unit": "eff_samples/s",
        "vs_baseline": round(float(eff_per_sec) / prior, 3) if prior else 1.0,
        "detail": {
            "nchains": int(nchains),
            "segment_steps": int(seg),
            "steps_per_sec": round(float(n_timed * seg / device_s), 1),
            "chain_steps_per_sec": round(float(n_timed * seg * nchains / device_s), 1),
            "ess": round(float(ess), 1),
            "compile_s": round(float(compile_s), 1),
            "vs_baseline_ref": "prior round BENCH value" if prior else "first valid round",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
