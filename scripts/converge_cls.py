#!/usr/bin/env python3
"""Convergence study for the Boltzmann/C_l stack: vary one accuracy knob at
a time, report banded unlensed-TT/EE errors vs the reference theory_cl.
Knobs via env: COSMOMC_LMAXG/..., and argv flags parsed here.
"""
import os, sys, time, json
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

import cosmomc_tpu.models.perturbations as pert
from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.cls import compute_cls
from cosmomc_tpu.models.cmb import compute_transfers, source_k_grid
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

import argparse
ap = argparse.ArgumentParser()
ap.add_argument("--n_step", type=int, default=pert.N_STEP)
ap.add_argument("--tc_lam", type=float, default=pert.TC_LAM_MAX)
ap.add_argument("--tc_ktauc", type=float, default=pert.TC_KTAUC)
ap.add_argument("--rsa", type=float, default=pert.RSA_KTAU)
ap.add_argument("--ppo", type=float, default=4.0, help="points per Bessel osc in k")
ap.add_argument("--nk_lin", type=int, default=200)
ap.add_argument("--nk_log", type=int, default=48)
ap.add_argument("--label", default="run")
args = ap.parse_args()

pert.TC_LAM_MAX = args.tc_lam
pert.TC_KTAUC = args.tc_ktauc

ombh2, omch2, H0 = 0.02237737, 0.1201035, 67.32178
tau, logA, ns = 0.05430138, 3.0447260, 0.9658923
yhe = 0.2453985
bg = BackgroundParams(
    ombh2=jnp.float64(ombh2), omch2=jnp.float64(omch2), H0=jnp.float64(H0),
    omk=jnp.float64(0.0), omnuh2=jnp.float64(mnu_to_omnuh2(0.06)),
    nnu=jnp.float64(3.046), w=jnp.float64(-1.0), wa=jnp.float64(0.0),
    tcmb=jnp.float64(2.7255), num_massive_nu=1)
pp = PrimordialParams.make(logA=logA, ns=ns)

t0 = time.time()
k = source_k_grid(nk_log=args.nk_log, nk_lin=args.nk_lin)
tf, tau0 = pert.build_thermo_funcs(bg, jnp.float64(yhe), jnp.float64(tau),
                                   n_step=args.n_step)
po = pert.evolve_perturbations(bg, tf, tau0, jnp.asarray(k), (0.0,))
ipk = jnp.argmax(tf.vis)
chi_star = tau0 - tf.tau[ipk]
raw = compute_cls(po, pp, chi_star, lmax=2500, points_per_osc=args.ppo)
muk2 = (2.7255e6) ** 2
tt = np.asarray(raw.tt) * muk2
ee = np.asarray(raw.ee) * muk2
ppo_ = np.asarray(raw.pp)
jax.block_until_ready(raw.tt)
dt = time.time() - t0

# unlensed reference is not stored; compare against the LENSED ref minus our
# own lensing delta is circular — instead report the dilation fit + banded
# envelope vs lensed ref (consistent across runs => comparable), plus raw
# numbers at fixed l for cross-run convergence diffs.
ref = np.loadtxt("/root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl")
L = ref[:, 0].astype(int); refc = ref[:, 1]
ls = np.arange(2, 2 + len(tt))
best = (0.0, 1e9)
for s in np.linspace(-0.03, 0.03, 301):
    refs = np.interp(ls * (1 + s), L, refc)
    m = (ls >= 300) & (ls <= 1500)
    c = np.sqrt(np.mean(np.log(tt[m] / refs[m]) ** 2))
    if c < best[1]:
        best = (s, c)
out = {"label": args.label, "time_s": round(dt, 1), "dilation": round(best[0], 5),
       "resid_rms": round(best[1], 5)}
for l in (220, 500, 1000, 1500, 2000, 2400):
    out[f"tt_{l}"] = float(tt[l - 2])
    out[f"ee_{l}"] = float(ee[l - 2])
out["pp_100"] = float(ppo_[98]); out["pp_1000"] = float(ppo_[998])
print(json.dumps(out), flush=True)
