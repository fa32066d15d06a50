#!/usr/bin/env python3
"""Signed band-mean residual profile vs the reference theory_cl (CPU f64).

Env knobs: COSMOMC_LMAXG/LMAXGP/LMAXNR (hierarchy truncations, read by
perturbations at import), LMAX (spectrum lmax), UNLENSED=1 (skip lensing).
Prints signed mean of (ours/ref - 1) per band for TT/TE/EE/PP.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.cmb import compute_transfers, cls_from_transfers, source_k_grid
from cosmomc_tpu.models.lensing import lens_cls
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

ombh2, omch2, H0 = 0.02237737, 0.1201035, 67.32178
tau, logA, ns = 0.05430138, 3.0447260, 0.9658923
yhe = 0.2453985

bg = BackgroundParams(
    ombh2=jnp.float64(ombh2), omch2=jnp.float64(omch2), H0=jnp.float64(H0),
    omk=jnp.float64(0.0), omnuh2=jnp.float64(mnu_to_omnuh2(0.06)),
    nnu=jnp.float64(3.046), w=jnp.float64(-1.0), wa=jnp.float64(0.0),
    tcmb=jnp.float64(2.7255), num_massive_nu=1)
pp = PrimordialParams.make(logA=logA, ns=ns)

lmax = int(os.environ.get("LMAX", 2500))
t0 = time.time()
nklin = int(os.environ.get("NKLIN", 200))
nklog = int(os.environ.get("NKLOG", 48))
k = source_k_grid(nk_log=nklog, nk_lin=nklin)
nstep = int(os.environ.get("NSTEP", 0))
po, chi_star = compute_transfers(bg, jnp.float64(tau), jnp.float64(yhe), k,
                                 n_step=nstep,
                                 massive_nu=bool(os.environ.get("MNU")))
ppo = float(os.environ.get("PPO", 4.0))
spec = cls_from_transfers(po, chi_star, pp, lmax=lmax, points_per_osc=ppo,
                          coarse_k=k,
                          tau_stride=int(os.environ.get("TSTRIDE", 1)))
if os.environ.get("UNLENSED"):
    out = spec
else:
    out = lens_cls(spec.ls, spec.tt, spec.te, spec.ee, spec.pp)
jax.block_until_ready(out.tt)
print(f"compute time: {time.time()-t0:.1f}s   "
      f"LMAXG={os.environ.get('COSMOMC_LMAXG','12')} "
      f"LMAXGP={os.environ.get('COSMOMC_LMAXGP','8')} "
      f"LMAXNR={os.environ.get('COSMOMC_LMAXNR','10')} "
      f"NSTEP={nstep} PPO={ppo} "
      f"unlensed={bool(os.environ.get('UNLENSED'))}")

ref = np.loadtxt("/root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl")
L = ref[:, 0].astype(int)
bands = [(2, 10), (10, 30), (30, 80), (80, 150), (150, 300), (300, 500),
         (500, 800), (800, 1200), (1200, 1700), (1700, 2200), (2200, 2500)]
hdr = "         " + "".join(f"{lo}-{hi:>5} " for lo, hi in bands)
print(hdr)
for name, ours, refc in [("TT", np.asarray(out.tt), ref[:, 1]),
                         ("TE", np.asarray(out.te), ref[:, 2]),
                         ("EE", np.asarray(out.ee), ref[:, 3]),
                         ("PP", np.asarray(spec.pp), ref[:, 5])]:
    n = min(len(ours), len(refc))
    lv = L[:n]
    if name == "TE":
        den = np.sqrt(ref[:n, 1] * ref[:n, 3])
        r = (ours[:n] - refc[:n]) / den
    else:
        r = ours[:n] / refc[:n] - 1.0
    row = f"{name}  "
    for lo, hi in bands:
        m = (lv >= lo) & (lv < hi)
        row += f"{r[m].mean()*100:+7.2f} " if m.sum() else "      - "
    print(row)

if os.environ.get("KNOTS"):
    # residuals restricted to the sampled-l knots (spline passes through
    # them exactly for the UNLENSED spectra; lensing mixes l's slightly)
    from cosmomc_tpu.models.bessel import default_l_samples
    knots = default_l_samples(lmax)
    print("knots-only bands:")
    for name, ours, refc in [("TT", np.asarray(out.tt), ref[:, 1]),
                             ("EE", np.asarray(out.ee), ref[:, 3])]:
        n = min(len(ours), len(refc))
        lv = L[:n]
        r = ours[:n] / refc[:n] - 1.0
        km = np.isin(lv, knots)
        row = f"{name}k "
        for lo, hi in bands:
            m = (lv >= lo) & (lv < hi) & km
            row += f"{r[m].mean()*100:+7.2f} " if m.sum() else "      - "
        print(row)
