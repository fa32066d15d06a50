#!/usr/bin/env python3
"""Localize the NaN components in the full-path reverse-mode gradient.

Stage-by-stage bisection on a tiny CMB posterior (CPU f64): gradients of
scalar reductions of intermediate products, reported per sampled
parameter. jacfwd is used as the finite reference where cheap.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import LikelihoodList, Likelihood
from cosmomc_tpu.params.parameterizations import ThetaParameterization
from cosmomc_tpu.pipeline import CMBPosterior

F = jnp.float64
LMAX = 96


class Tiny(Likelihood):
    name = "tiny"
    needs_cmb = True

    def log_like(self, theory, nuisance):
        tt = theory.cls[0, 0, 2:LMAX + 1]
        return 0.5 * jnp.sum((tt / 1000.0 - 1.0) ** 2)

    @property
    def nuisance_params(self):
        return []


par = ThetaParameterization(F)
space = par.default_space()
likes = LikelihoodList()
likes.add(Tiny())
post = CMBPosterior(par, space, likes, lmax=LMAX, kmax=0.1,
                    n_step_boltzmann=1024, source_nk=(24, 48),
                    remat_chunks=0, dtype=F)
P = jnp.asarray([p.center for p in post.space.varying], F)
names = [p.name for p in post.space.varying]
print("params:", names)


def report(tag, g):
    g = np.asarray(g)
    bad = [names[i] for i in range(len(g)) if not np.isfinite(g[i])]
    print(f"{tag}: finite={np.isfinite(g).all()}  bad={bad}  g={np.round(g, 3)}")


def grad_of(fn):
    return jax.jit(jax.grad(fn))(P)


# full posterior
report("logpost", grad_of(lambda p: post.logpost()(p)[0]))

# slow-stage reductions
full = lambda p: post.embed_full(p)

def slow_scalar(reduce_fn):
    def f(p):
        slow = post.stage_slow(full(p))
        return reduce_fn(slow)
    return f

report("sum clt.dT", grad_of(slow_scalar(
    lambda s: jnp.sum(s["clt"].dT))))
report("sum clt.dE", grad_of(slow_scalar(
    lambda s: jnp.sum(s["clt"].dE))))
report("sum clt.dP", grad_of(slow_scalar(
    lambda s: jnp.sum(s["clt"].dP))))
report("rs_drag", grad_of(slow_scalar(lambda s: s["rs_drag"])))
report("zre", grad_of(slow_scalar(lambda s: s["zre"])))

# below the transfer cache: raw sources
from cosmomc_tpu.models.cmb import compute_transfers, source_k_grid
from cosmomc_tpu.models.bbn import yhe_bbn


def src_scalar(field):
    def f(p):
        fp = full(p)
        bg = post.parameterization.to_background(fp)
        tau_re = fp[post._i_tau]
        yhe = yhe_bbn(bg.ombh2, bg.nnu - 3.046, post.bbn_table)
        k = source_k_grid(kmax=0.1, nk_log=24, nk_lin=48)
        po, chi_star = compute_transfers(bg, tau_re, yhe, k, n_step=1024)
        return jnp.sum(getattr(po, field))
    return f

for field in ("s0", "s1", "s2", "slens", "delta_m", "r_init"):
    report(f"sum po.{field}", grad_of(src_scalar(field)))


# --- descend into the thermo stage (NaN wrt ombh2/omch2 appears there) ---
from cosmomc_tpu.models.recfast import compute_thermo
from cosmomc_tpu.models.perturbations import build_thermo_funcs
from cosmomc_tpu.models.thermo import compute_thermo_tables, thermo_derived


def bg_of(p):
    fp = full(p)
    bg = post.parameterization.to_background(fp)
    yhe = yhe_bbn(bg.ombh2, bg.nnu - 3.046, post.bbn_table)
    return bg, yhe, fp[post._i_tau]


def th_scalar(which):
    def f(p):
        bg, yhe, tau_re = bg_of(p)
        if which == "xe":
            th = compute_thermo(bg, yhe)
            return jnp.sum(th.xe)
        if which == "tm":
            th = compute_thermo(bg, yhe)
            return jnp.sum(th.tm)
        if which in ("opac", "vis", "csqb", "tau0", "expmk", "taugrid"):
            tf, tau0 = build_thermo_funcs(bg, yhe, tau_re, n_step=1024)
            if which == "tau0":
                return tau0
            if which == "taugrid":
                return jnp.sum(tf.tau)
            return jnp.sum(getattr(tf, which))
        if which in ("r_drag", "z_star"):
            th = compute_thermo(bg, yhe)
            tabs = compute_thermo_tables(bg, th, yhe)
            der = thermo_derived(bg, tabs)
            return getattr(der, which)
        if which == "H0":
            return bg.H0
        if which == "yhe":
            return yhe
    return f

for which in ("H0", "yhe", "xe", "tm", "tau0", "taugrid", "opac", "expmk",
              "vis", "csqb", "r_drag", "z_star"):
    report(f"thermo:{which}", grad_of(th_scalar(which)))

# --- semi stage with FIXED slow cache (logA/ns NaN isolation) ---
slow_const = jax.jit(lambda p: post.stage_slow(full(p)))(P)


def semi_scalar(reduce_fn):
    def f(p):
        semi = post.stage_semi(full(p), slow_const)
        return reduce_fn(semi)
    return f

report("semi: sum cls", grad_of(semi_scalar(
    lambda s: jnp.sum(s["cls"]))))
report("semi: sum cls[0,0]", grad_of(semi_scalar(
    lambda s: jnp.sum(s["cls"][0, 0]))))
report("semi: sum cls[2,2] (BB)", grad_of(semi_scalar(
    lambda s: jnp.sum(s["cls"][2, 2]))))
report("semi: sum cls[3,3] (PP)", grad_of(semi_scalar(
    lambda s: jnp.sum(s["cls"][3, 3]))))
