#!/usr/bin/env python3
"""Measure the residual acoustic dilation alpha: ours(l) ~ ref(l/alpha).

Fits alpha over l in [600, 2200] by least squares with free amplitude
(band-mean errors don't see dilation; the plik likelihood does — 0.03%
dilation = 1 sigma on theta). Env: TSTRIDE, F32=1, LOS=recurrence|table.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
if not os.environ.get("TPU"):
    jax.config.update("jax_platforms", "cpu")
if not os.environ.get("F32"):
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.cmb import compute_transfers, source_k_grid
from cosmomc_tpu.models.cls import (compute_cl_transfers,
                                    compute_cl_transfers_recurrence,
                                    cls_from_cl_transfers)
from cosmomc_tpu.models.lensing import lens_cls
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

F = jnp.float32 if os.environ.get("F32") else jnp.float64
stride = int(os.environ.get("TSTRIDE", 1))
los = os.environ.get("LOS", "table")

bg = BackgroundParams(
    ombh2=F(0.02237737), omch2=F(0.1201035), H0=F(67.32178), omk=F(0.0),
    omnuh2=F(mnu_to_omnuh2(0.06)), nnu=F(3.046), w=F(-1.0), wa=F(0.0),
    tcmb=F(2.7255), num_massive_nu=1)
pp = PrimordialParams.make(logA=3.0447260, ns=0.9658923, dtype=F)
k = source_k_grid()


def spectrum():
    po, chi_star = compute_transfers(bg, F(0.05430138), F(0.2453985), k)
    if los == "recurrence":
        clt = compute_cl_transfers_recurrence(po, chi_star, lmax=2500,
                                              coarse_k=k, tau_stride=stride)
    else:
        clt = compute_cl_transfers(po, chi_star, lmax=2500, coarse_k=k,
                                   tau_stride=stride)
    raw = cls_from_cl_transfers(clt, pp, lmax=2500)
    lensed = lens_cls(raw.ls, raw.tt, raw.te, raw.ee, raw.pp)
    return lensed.tt, lensed.te


tt, te = jax.jit(spectrum)()
tt = np.asarray(tt, np.float64); te = np.asarray(te, np.float64)
ls = np.arange(2, 2 + len(tt))
ref = np.loadtxt("/root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl")
L, rtt = ref[:, 0], ref[:, 1]

m = (ls >= 600) & (ls <= 2200)
lm = ls[m].astype(np.float64)
best = None
for alpha in np.linspace(0.996, 1.004, 1601):
    r = np.interp(lm / alpha, L, rtt)
    o = tt[m]
    amp = (o * r).sum() / (r * r).sum()
    chi2 = ((o - amp * r) ** 2 / r ** 2).mean()
    if best is None or chi2 < best[1]:
        best = (alpha, chi2, amp)
alpha, chi2, amp = best
print(f"config: dtype={'f32' if os.environ.get('F32') else 'f64'} "
      f"los={los} stride={stride} device={jax.devices()[0].platform}")
print(f"dilation alpha = {alpha:.5f}  (alpha-1 = {(alpha-1)*100:+.3f}%)  "
      f"amp = {amp:.4f}  rms resid at best = {np.sqrt(chi2)*100:.2f}%")
# theta sensitivity: 0.03% dilation ~ 1 sigma_ref
print(f"implied theta bias ~ {(alpha-1)/0.000303*1.0:+.1f} sigma_ref-ish")
