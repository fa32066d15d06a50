#!/usr/bin/env python3
"""Accuracy diagnostic: lensed TT/TE/EE at the Planck-2018 best fit vs the
reference's stored .minimum.theory_cl (CAMB output). Prints a band-wise
relative-error table. Run on CPU (f64).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
# sitecustomize imports jax before this script runs, so env vars are too
# late; config.update is the only reliable way off the TPU tunnel
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

# Planck 2018 best fit (base_plikHM_TTTEEE_lowl_lowE.minimum)
ombh2, omch2, H0 = 0.02237737, 0.1201035, 67.32178
tau, logA, ns = 0.05430138, 3.0447260, 0.9658923
yhe = 0.2453985
mnu = 0.06

bg = BackgroundParams(
    ombh2=jnp.float64(ombh2), omch2=jnp.float64(omch2), H0=jnp.float64(H0),
    omk=jnp.float64(0.0), omnuh2=jnp.float64(mnu_to_omnuh2(mnu)),
    nnu=jnp.float64(3.046), w=jnp.float64(-1.0), wa=jnp.float64(0.0),
    tcmb=jnp.float64(2.7255), num_massive_nu=1)
pp = PrimordialParams.make(logA=logA, ns=ns)

lmax = int(os.environ.get("LMAX", 2500))
t0 = time.time()
k = source_k_grid()
po, chi_star = compute_transfers(bg, jnp.float64(tau), jnp.float64(yhe), k)
spec = cls_from_transfers(po, chi_star, pp, lmax=lmax)
lensed = lens_cls(spec.ls, spec.tt, spec.te, spec.ee, spec.pp)
jax.block_until_ready(lensed.tt)
print(f"compute time: {time.time()-t0:.1f}s")

ref = np.loadtxt("/root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl")
L = ref[:, 0].astype(int)
ls = np.asarray(lensed.ls)
n = min(len(ls), (L <= ls[-1]).sum())
sel = slice(0, n)

for name, ours, refc in [("TT", np.asarray(lensed.tt), ref[:, 1]),
                          ("TE", np.asarray(lensed.te), ref[:, 2]),
                          ("EE", np.asarray(lensed.ee), ref[:, 3]),
                          ("PP", np.asarray(spec.pp), ref[:, 5])]:
    r = refc[:len(ours)]
    o = ours[:len(r)]
    lv = L[:len(r)]
    if name == "TE":
        # normalize by sqrt(TT*EE) to avoid zero crossings
        den = np.sqrt(ref[:len(r), 1] * ref[:len(r), 3])
        err = np.abs(o - r) / den
    else:
        err = np.abs(o / r - 1.0)
    for lo, hi in [(2, 30), (30, 300), (300, 800), (800, 1500), (1500, 2000), (2000, min(2500, lv[-1]))]:
        m = (lv >= lo) & (lv < hi)
        if m.sum():
            print(f"{name} l=[{lo},{hi}): max {err[m].max()*100:6.2f}%  rms {np.sqrt((err[m]**2).mean())*100:6.2f}%")
    print()
