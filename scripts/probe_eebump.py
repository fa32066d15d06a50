#!/usr/bin/env python3
"""Per-l low-l EE/TE residual profile + zre check (CPU f64)."""
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
from cosmomc_tpu.models.lensing import lens_cls
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.models.reionization import zre_from_tau, reion_optical_depth
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

bg = BackgroundParams(
    ombh2=jnp.float64(0.02237737), omch2=jnp.float64(0.1201035),
    H0=jnp.float64(67.32178), omk=jnp.float64(0.0),
    omnuh2=jnp.float64(mnu_to_omnuh2(0.06)), nnu=jnp.float64(3.046),
    w=jnp.float64(-1.0), wa=jnp.float64(0.0), tcmb=jnp.float64(2.7255),
    num_massive_nu=1)
tau_re, yhe = 0.05430138, 0.2453985

zre = float(zre_from_tau(bg, jnp.float64(tau_re), jnp.float64(yhe)))
print(f"zre_from_tau({tau_re}) = {zre:.4f}  (Planck BF reports zre~7.68)")
print(f"tau(zre) round-trip = {float(reion_optical_depth(bg, zre, yhe)):.6f}")

k = source_k_grid()
po, chi_star = compute_transfers(bg, jnp.float64(tau_re), jnp.float64(yhe), k)
pp = PrimordialParams.make(logA=3.0447260, ns=0.9658923)
spec = cls_from_transfers(po, chi_star, pp, lmax=500, coarse_k=k)
lensed = lens_cls(spec.ls, spec.tt, spec.te, spec.ee, spec.pp)

ref = np.loadtxt("/root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl")
L = ref[:, 0].astype(int)
ee = np.asarray(lensed.ee); te = np.asarray(lensed.te); tt = np.asarray(lensed.tt)
print(" l     EE_ours     EE_ref   ratio      TE_ours     TE_ref     TT ratio")
for l in [2, 3, 4, 5, 6, 8, 10, 12, 15, 18, 22, 26, 30, 36, 44, 54, 66, 80, 100, 130, 160, 200]:
    i = l - 2
    print(f"{l:4d} {ee[i]:10.3e} {ref[i,3]:10.3e} {ee[i]/ref[i,3]:7.3f}  "
          f"{te[i]:10.3e} {ref[i,2]:10.3e}  {tt[i]/ref[i,1]:7.3f}")
