"""Ini-driven composition root + action dispatch: the `cosmomc params.ini`
equivalent (reference: source/driver.F90 program CosmoMC + GeneralSetup.f90
TSetup).

Usage:  python -m cosmomc_tpu params.ini
Actions (driver.F90:269-284 / GeneralSetup.f90:13):
  action = 0  MCMC sampling run (chains + sidecars + converge_stat)
  action = 1  importance re-weighting of existing chains (redo_*)
  action = 2  best-fit minimization -> .minimum (+ .covmat via Hessian)
  action = 4  likelihood test at fixed point, compare test_check_compare
              within 0.05 (GeneralSetup.f90:146-185 — THE regression gate)

Ini surface (the reference's key names wherever the concept carries over):
  file_root, action, samples, num_chains, feedback, checkpoint,
  MPI_R_Stop, MPI_Max_R_ProposeUpdate, propose_matrix, seed,
  parameterization = theta | background,
  param[name] = center [min max start_width propose_width],
  prior[name] = mean std, linear_combination* blocks,
  cmb_dataset[tag] = <CMBlikes .dataset>, pliklite_dataset = <.dataset>,
  bao_dataset[tag] = <.dataset>, sn_dataset[tag] = <.dataset>,
  use_HST + Hubble_* keys, temperature, test_check_compare,
  post_root / redo_* (action=1 subset).

Every accessed key is dumped to `<file_root>.inputparams` (provenance,
driver.F90:188-202).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict, List, Optional

import numpy as np

from cosmomc_tpu.utils.ini import IniFile
from cosmomc_tpu.params.space import ParameterSpace, Speed


def build_likelihoods(ini: IniFile, dtype):
    """Assemble the likelihood list from ini keys (the registry role of
    DataLikelihoods.f90 SetDataLikelihoods)."""
    from cosmomc_tpu.likelihoods.abundances import AbundanceLikelihood
    from cosmomc_tpu.likelihoods.base import LikelihoodList
    from cosmomc_tpu.likelihoods.bao import BAOLikelihood
    from cosmomc_tpu.likelihoods.cmblikes import CMBLikes
    from cosmomc_tpu.likelihoods.hst import HSTLikelihood
    from cosmomc_tpu.likelihoods.pliklite import PlikLiteLikelihood
    from cosmomc_tpu.likelihoods.sn import SNLikelihood

    likes = LikelihoodList()
    needs_cls = False
    for tag in ini.tags("abundance_dataset"):
        likes.add(AbundanceLikelihood(
            ini.tagged("abundance_dataset", tag), name=tag,
            bbn_consistency=ini.bool("bbn_consistency", True)))
    for tag in ini.tags("cmb_dataset"):
        path = ini.tagged("cmb_dataset", tag)
        overrides = ini.tag_overrides("cmb_dataset", tag)
        # BK-style datasets declare per-map bandpasses -> foreground model
        # (the reference registers TBK_planck for these, CMB.f90:54-123)
        from cosmomc_tpu.likelihoods.base import read_dataset_ini
        dsi = read_dataset_ini(path)
        if any(k.startswith("bandpass[") for k in dsi.params):
            from cosmomc_tpu.likelihoods.bkplanck import BKPlanckLikelihood
            likes.add(BKPlanckLikelihood(path, name=tag,
                                         dataset_overrides=overrides,
                                         dtype=dtype))
        else:
            likes.add(CMBLikes(path, name=tag, dataset_overrides=overrides,
                               dtype=dtype))
        needs_cls = True
    pl = ini.string("pliklite_dataset")
    if pl:
        likes.add(PlikLiteLikelihood(pl, dtype=dtype))
        needs_cls = True
    sp = ini.string("sptpol_TEEE_dataset")
    if sp:
        from cosmomc_tpu.likelihoods.sptpol import SPTpolTEEELikelihood
        likes.add(SPTpolTEEELikelihood(sp, dtype=dtype))
        needs_cls = True
    sp = ini.string("sptpol_BB_dataset")
    if sp:
        from cosmomc_tpu.likelihoods.sptpol import SPTpolBBLikelihood
        likes.add(SPTpolBBLikelihood(sp, dtype=dtype))
        needs_cls = True
    for tag in ini.tags("bao_dataset"):
        likes.add(BAOLikelihood(ini.tagged("bao_dataset", tag), name=tag,
                                dtype=dtype))
    for tag in ini.tags("sn_dataset"):
        likes.add(SNLikelihood(ini.tagged("sn_dataset", tag), name=tag,
                               dtype=dtype))
    if ini.bool("use_WL", False):
        from cosmomc_tpu.likelihoods.wl import WLLikelihood
        for tag in ini.tags("wl_dataset"):
            likes.add(WLLikelihood(
                ini.tagged("wl_dataset", tag), name=tag,
                dataset_overrides=ini.tag_overrides("wl_dataset", tag),
                use_non_linear=ini.bool("wl_use_non_linear", True)))
            needs_cls = True   # WL needs the full theory stage (P(k,z))
    if ini.bool("use_mpk", False):
        # reference: mpk.f90 MPKLikelihood_Add (mpk_numdatasets/mpk_dataset%d
        # keys) + the WiggleZ four-bin route (wigglez.f90)
        from cosmomc_tpu.likelihoods.mpk import MPKLikelihood, WiggleZLikelihood
        for i in range(1, ini.int("mpk_numdatasets", 0) + 1):
            path = ini.string(f"mpk_dataset{i}", required=True)
            nonlin = ini.bool(f"mpk_dataset_nonlinear{i}", False)
            if "wigglez" in os.path.basename(path).lower():
                likes.add(WiggleZLikelihood(
                    path, nonlinear=nonlin,
                    use_gigglez=ini.bool("Use_gigglez", nonlin), dtype=dtype))
            else:
                likes.add(MPKLikelihood(path, nonlinear=nonlin, dtype=dtype))
            needs_cls = True   # MPK needs the P(k,z) theory stage
    if ini.bool("use_SZ", False):
        # reference: szcounts.f90 SZLikelihood_Add (use_SZ + 1D/2D +
        # prior_* switches); data files live under the dataset dir
        from cosmomc_tpu.likelihoods.szcounts import (SZCountsLikelihood,
                                                      PRIOR_SWITCHES)
        sz_dir = ini.string("sz_data_dir", required=True)
        priors = {sw: ini.bool(sw, False) for sw in PRIOR_SWITCHES}
        switch = 1 if ini.bool("1D", False) else 2
        likes.add(SZCountsLikelihood(
            sz_dir, switch=switch, priors=priors,
            mass_function="watson" if ini.bool("use_watson", False)
            else "tinker", dtype=dtype))
        needs_cls = True   # SZ needs P(k) -> sigma(R) + sigma8(z)
    if ini.bool("use_HST", False):
        likes.add(HSTLikelihood.from_ini(ini))
    return likes, needs_cls


def build_posterior(ini: IniFile, dtype=None):
    """Composition root: parameterization + space + likelihoods -> posterior
    (TCosmologyConfig + TSetup wiring)."""
    import jax.numpy as jnp
    from cosmomc_tpu.params.parameterizations import (
        AstroParameterization, BackgroundParameterization,
        ThetaParameterization)
    from cosmomc_tpu.pipeline import BackgroundPosterior, CMBPosterior

    if dtype is None:
        dtype = jnp.float64 if ini.bool("use_float64", True) else jnp.float32
    likes, needs_cls = build_likelihoods(ini, dtype)
    kind = ini.string("parameterization", "theta" if needs_cls else "background")
    if kind == "theta":
        par = ThetaParameterization(dtype)
    elif kind == "background":
        par = BackgroundParameterization(dtype)
    elif kind == "astro":
        # LSS-only runs (CosmologyParameterizations.f90:416-527): P(k)
        # computed, no C_l stack, no CMB likelihoods
        par = AstroParameterization(dtype)
    else:
        raise ValueError(f"unknown parameterization {kind}")
    space = par.default_space(ini)
    # priors on base params
    for p in space.params:
        pr = ini.string(f"prior[{p.name}]")
        if pr:
            m, s = (float(x) for x in pr.split())
            p.prior_mean, p.prior_std = m, s
    if needs_cls:
        if kind == "background":
            raise ValueError("CMB/LSS likelihoods need parameterization="
                             "theta (or astro for LSS-only)")
        if kind == "astro":
            cmb_likes = [l for l in likes.likes
                         if getattr(l, "required_lmax", lambda: 0)() > 0
                         or l.kind == "CMB"]
            if cmb_likes:
                raise ValueError(
                    f"parameterization=astro has no tau/C_l: remove CMB "
                    f"likelihoods {[l.name for l in cmb_likes]}")
            post = CMBPosterior(par, space, likes, use_cmb=False,
                                matter_power=True, dtype=dtype)
            return post
        compute_tensors = ini.bool("compute_tensors", False)
        if compute_tensors and "r" not in space:
            rspec = ini.string("param[r]")
            if rspec:
                parts = [float(x) for x in rspec.split()]
                if len(parts) == 1:
                    space.add(Param("r", parts[0], parts[0], parts[0],
                                    0, 0, "r", Speed.SEMISLOW))
                else:
                    space.add(Param("r", *parts[:5], label="r",
                                    speed=Speed.SEMISLOW))
        # reference key semantics (CosmologyTypes.f90:41-42,197,302):
        # `lmax` is the full output range (here: the default raised by the
        # likelihood requirements union); `lmax_computed_cl` caps the actual
        # Boltzmann compute, and (lmax_computed_cl, lmax] is filled from the
        # fiducial lensed template `highL_theory_cl_template`
        # (Calculator_CAMB.f90:387-401,890)
        lmax_computed = ini.int("lmax_computed_cl", 0)   # 0 = compute all
        tmpl = ini.string("highL_theory_cl_template", "")
        if lmax_computed and not tmpl:
            data_dir = os.environ.get("COSMOMC_DATA", "/root/reference/data")
            cand = os.path.join(data_dir, "HighL_lensedCls.dat")
            tmpl = cand if os.path.isfile(cand) else ""
        # HMC (or any full-path gradient use) needs the Boltzmann scan
        # checkpointed or the reverse pass materializes GBs of residuals
        method = ini.string("sampling_method", "1").strip().lower()
        remat_default = 64 if method in ("8", "hmc") else 0
        post = CMBPosterior(par, space, likes,
                            lmax=ini.int("lmax", 2508),
                            lmax_computed=lmax_computed,
                            highl_template=tmpl,
                            matter_power=ini.bool("use_matter_power", False),
                            compute_tensors=compute_tensors,
                            remat_chunks=ini.int("boltzmann_remat_chunks",
                                                 remat_default),
                            dtype=dtype)
    else:
        post = BackgroundPosterior(par, space, likes, dtype=dtype)
    return post


def run_ini(path: str, overrides: Optional[Dict[str, str]] = None) -> int:
    import jax
    import jax.numpy as jnp
    t_start = time.time()
    ini = IniFile(path)
    if overrides:
        ini.params.update(overrides)
    action = ini.int("action", 0)
    file_root = ini.string("file_root", required=action != 4)
    if file_root:
        os.makedirs(os.path.dirname(os.path.abspath(file_root)), exist_ok=True)
    feedback = ini.int("feedback", 1)
    post = build_posterior(ini)

    if action == 4:
        # likelihood test gate (GeneralSetup.f90:146-185)
        P = np.array([p.center for p in post.space.varying])
        fn = jax.jit(post.logpost())
        t0 = time.time()
        mll, derived = fn(jnp.asarray(P))
        mll = float(mll)
        dt = time.time() - t0
        # per-likelihood chi2 table (GeneralSetup.f90:165-172 prints each
        # likelihood's chisq = 2*loglike and its tag)
        for lname, val in post.per_likelihood(P).items():
            print(f"  {lname:<28s} chi2 = {2*val:12.4f}")
        print(f"Test -log(Like) = {mll:15.6f}   ({dt:.1f}s incl. compile)")
        want = ini.float("test_check_compare")
        if want is not None:
            ok = abs(mll - want) < 0.05
            print(f"test_check_compare = {want:15.6f}  -> "
                  f"{'OK' if ok else 'MISMATCH'}")
            if file_root:
                ini.write_read_values(file_root + ".inputparams")
            return 0 if ok else 1
        if file_root:
            ini.write_read_values(file_root + ".inputparams")
        return 0

    if action == 2:
        from cosmomc_tpu.sampling.minimize import (find_best_fit,
                                                   estimate_covariance,
                                                   write_minimum_file)
        best = find_best_fit(post.logpost(), post.space,
                             use_grad=ini.bool("minimize_use_grad", True))
        best.cov = estimate_covariance(post.logpost(), best.P)
        write_minimum_file(file_root + ".minimum", post.space, best)
        post.space.write_covmat(file_root + ".hessian.covmat", best.cov)
        print(f"best fit -logL = {best.mloglike:.6f} "
              f"({best.n_evals} evals, {time.time()-t_start:.1f}s)")
        ini.write_read_values(file_root + ".inputparams")
        return 0

    if action == 1:
        from cosmomc_tpu.sampling.importance import importance_sample_chains
        redo_root = ini.string("redo_root", required=True)
        post_tag = ini.string("post_suffix", "post")
        res = importance_sample_chains(
            redo_root, post.logpost(), f"{file_root}_{post_tag}",
            mode="add" if ini.bool("redo_add", False) else "replace")
        print(f"importance sampling done: eff frac = {res.eff_frac:.3f}")
        return 0

    # ---- action = 0: sampling ----
    from cosmomc_tpu.sampling.metropolis import MetropolisSampler
    from cosmomc_tpu.sampling.runner import SamplingRun, RunConfig
    nchains = ini.int("num_chains", 128)
    # sampling_method (settings.f90:75-79): 1 = metropolis (default; the
    # staged fast/slow variant when the posterior supports it), 8 = HMC —
    # the gradient-based sampler the reference lacks ('hmc' also accepted)
    method = ini.string("sampling_method", "1").strip().lower()
    if method in ("8", "hmc"):
        from cosmomc_tpu.sampling.hmc import HMCSampler, HMCRun
        if hasattr(post, "stage_slow") and post.use_cmb and \
                not post.remat_chunks and \
                not ini.bool("hmc_allow_full_boltzmann", False):
            # reverse-mode through the un-checkpointed Boltzmann scan
            # materializes O(n_step x nk x nvar) residuals per chain (GBs)
            # — refuse rather than OOM mid-run (remat is on by default for
            # hmc; this triggers only if explicitly disabled)
            raise ValueError(
                "sampling_method=hmc on a full-CMB posterior needs the "
                "checkpointed Boltzmann scan: set boltzmann_remat_chunks "
                "(default 64 for hmc) or hmc_allow_full_boltzmann = T.")
        sampler = HMCSampler(post.logpost(),
                             num_leapfrog=ini.int("hmc_leapfrog_steps", 16),
                             num_derived=post.num_derived)
        rng = np.random.default_rng(ini.int("seed", 0))
        run = HMCRun(sampler, nchains, post.start_positions(rng, nchains),
                     seed=ini.int("seed", 0),
                     warmup_segments=ini.int("hmc_warmup_segments", 8),
                     segment_steps=ini.int("segment_steps", 32),
                     max_steps=ini.int("samples", 100_000),
                     r_stop=ini.float("MPI_R_Stop", 0.05),
                     step_size0=ini.float("hmc_step_size", 0.05),
                     chain_root=file_root, feedback=feedback,
                     paramnames=post.paramnames(), space=post.space)
        ini.write_read_values(file_root + ".inputparams")
        res = run.run()
        print(f"done: {res.steps} steps, R-1 = {res.r_minus_1:.4f}, "
              f"accept = {res.accept_rate:.3f}, stopped on {res.stopped_on}")
        if ini.bool("write_stats", True):
            from cosmomc_tpu.analysis.mcsamples import MCSamples
            try:
                s = MCSamples.load(file_root, ignore_frac=0.3)
                s.write_all(file_root)
            except FileNotFoundError:
                pass
        return 0
    staged = hasattr(post, "stage_slow") and ini.bool("use_fast_slow", True)
    # staged runs default to oversample_fast=4: fast nuisance proposals are
    # nearly free against the cached theory, so inflate their share
    # (reference batch3 practice, propose.f90:261-272)
    prop = post.make_proposal(
        oversample_fast=ini.int("oversample_fast", 4 if staged else 1),
        propose_scale=ini.float("propose_scale", 2.4))
    pm = ini.string("propose_matrix")
    if pm:
        cov, _ = post.space.load_covmat(pm)
        prop.set_covariance(cov)
    else:
        w = np.array([p.propose_width for p in post.space.varying])
        prop.set_covariance(np.diag(w ** 2))
    if staged:
        # CMB posterior: staged sampler exploits the fast/slow recompute
        # split (CalcLike_Cosmology.f90:59-94) — nuisance/primordial moves
        # reuse cached transfers instead of re-running the Boltzmann solve
        from cosmomc_tpu.sampling.staged import StagedMetropolisSampler
        sampler = StagedMetropolisSampler(
            prop, post, temperature=ini.float("temperature", 1.0))
    else:
        sampler = MetropolisSampler(prop, post.logpost(),
                                    num_derived=post.num_derived,
                                    temperature=ini.float("temperature", 1.0))
    cfg = RunConfig(
        nchains=nchains,
        segment_steps=ini.int("segment_steps", 128),
        max_steps=ini.int("samples", 4_000_000),
        r_stop=ini.float("MPI_R_Stop", 0.05),
        max_r_propose_update=ini.float("MPI_Max_R_ProposeUpdate", 2.0),
        seed=ini.int("seed", 0),
        num_devices=ini.int("num_devices", 0),
        # confidence-limit convergence (SampleCollector.f90:477-544;
        # reference keys MPI_Check_Limit_Converge / MPI_Limit_Converge /
        # MPI_Limit_Converge_Err)
        limits_tol=(ini.float("MPI_Limit_Converge_Err", 0.2)
                    if ini.bool("MPI_Check_Limit_Converge", False) else 0.0),
        limit_frac=ini.float("MPI_Limit_Converge", 0.025),
        # error-point policy (reference settings.f90:93; counters logged
        # per segment either way)
        stop_on_error=ini.bool("stop_on_error", False),
    )
    rng = np.random.default_rng(cfg.seed)
    run = SamplingRun(sampler, cfg,
                      post.start_positions(rng, nchains),
                      chain_root=file_root, feedback=feedback,
                      paramnames=post.paramnames(), space=post.space,
                      dtype=post.dtype)
    if ini.bool("checkpoint", True):
        run.resume()
    ini.write_read_values(file_root + ".inputparams")
    res = run.run()
    print(f"done: {res.steps} steps, R-1 = {res.r_minus_1:.4f}, "
          f"accept = {res.accept_rate:.3f}, stopped on {res.stopped_on}")
    # analysis outputs (GetDist layer)
    if ini.bool("write_stats", True):
        from cosmomc_tpu.analysis.mcsamples import MCSamples
        try:
            s = MCSamples.load(file_root, ignore_frac=0.3)
            s.write_all(file_root)
        except FileNotFoundError:
            pass
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    over = {}
    for kv in argv[1:]:
        if "=" in kv:
            k, v = kv.split("=", 1)
            over[k.strip()] = v.strip()
    return run_ini(argv[0], over)


if __name__ == "__main__":
    raise SystemExit(main())
