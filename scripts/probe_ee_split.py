#!/usr/bin/env python3
"""Split low-l EE into recombination (tau<2000) and reionization (tau>2000)
source contributions to localize the l=12-44 trough deficit."""
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

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.cmb import compute_transfers, cls_from_transfers, source_k_grid
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

bg = BackgroundParams(
    ombh2=jnp.float64(0.02237737), omch2=jnp.float64(0.1201035),
    H0=jnp.float64(67.32178), omk=jnp.float64(0.0),
    omnuh2=jnp.float64(mnu_to_omnuh2(0.06)), nnu=jnp.float64(3.046),
    w=jnp.float64(-1.0), wa=jnp.float64(0.0), tcmb=jnp.float64(2.7255),
    num_massive_nu=1)
tau_re, yhe = 0.05430138, 0.2453985
k = source_k_grid()
po, chi_star = compute_transfers(bg, jnp.float64(tau_re), jnp.float64(yhe), k)
pp = PrimordialParams.make(logA=3.0447260, ns=0.9658923)

tsplit = 2000.0
mask_late = (po.tau >= tsplit).astype(po.s2.dtype)[None, :]
specs = {}
for name, m in [("total", None), ("recomb", 1.0 - mask_late),
                ("reion", mask_late)]:
    po2 = po if m is None else po._replace(s2=po.s2 * m, spol=po.spol * m)
    s = cls_from_transfers(po2, chi_star, pp, lmax=300, coarse_k=k)
    specs[name] = np.asarray(s.ee)

ref = np.loadtxt("/root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl")
print(" l   EE_tot/ref  EE_recomb  EE_reion   cross(=tot-rec-rei)  [all /ref]")
for l in [2, 3, 4, 5, 6, 8, 10, 12, 15, 18, 22, 26, 30, 36, 44, 54, 66, 80, 100]:
    i = l - 2
    r = ref[i, 3]
    cross = specs["total"][i] - specs["recomb"][i] - specs["reion"][i]
    print(f"{l:4d}   {specs['total'][i]/r:7.3f}  {specs['recomb'][i]/r:9.3f} "
          f"{specs['reion'][i]/r:9.3f}   {cross/r:9.3f}")
