#!/usr/bin/env python3
"""Probe: accuracy of the kappa/visibility tables vs a dense computation.

Compares build_thermo_funcs at N_STEP=8192 against 65536: kappa at the
visibility peak, int g dtau, and the interpolated g values on the coarse
grid (the LOS integral consumes exactly these).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.perturbations import build_thermo_funcs
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

bg = BackgroundParams(
    ombh2=jnp.float64(0.02237737), omch2=jnp.float64(0.1201035),
    H0=jnp.float64(67.32178), omk=jnp.float64(0.0),
    omnuh2=jnp.float64(mnu_to_omnuh2(0.06)), nnu=jnp.float64(3.046),
    w=jnp.float64(-1.0), wa=jnp.float64(0.0), tcmb=jnp.float64(2.7255),
    num_massive_nu=1)
tau_re, yhe = 0.05430138, 0.2453985

for n in (4096, 8192, 16384, 65536):
    tf, tau0 = build_thermo_funcs(bg, jnp.float64(yhe), jnp.float64(tau_re),
                                  n_step=n)
    t = np.asarray(tf.tau); g = np.asarray(tf.vis); ek = np.asarray(tf.expmk)
    op = np.asarray(tf.opac)
    intg = np.trapezoid(g, t)
    ipk = g.argmax()
    # kappa at the recomb vis peak (from expmk)
    kap_pk = -np.log(ek[ipk])
    print(f"n={n:6d} tau0={float(tau0):.3f} int g dtau={intg:.6f} "
          f"1-emk0={1-ek[0]:.6f} vis_pk={g[ipk]:.6e} tau_pk={t[ipk]:.2f} "
          f"kappa_pk={kap_pk:.6f}")
    if n == 65536:
        tref, gref, ekref = t, g, ek
# compare coarse-grid g and expmk against dense interpolation
for n in (4096, 8192, 16384):
    tf, _ = build_thermo_funcs(bg, jnp.float64(yhe), jnp.float64(tau_re),
                               n_step=n)
    t = np.asarray(tf.tau); g = np.asarray(tf.vis); ek = np.asarray(tf.expmk)
    gi = np.interp(t, tref, gref)
    eki = np.interp(t, tref, ekref)
    m = gi > gi.max() * 1e-3
    print(f"n={n:6d}: max|g/g_dense-1| (vis>1e-3 pk) = "
          f"{np.abs(g[m]/gi[m]-1).max():.4%}  "
          f"max|emk-emk_dense| = {np.abs(ek-eki).max():.5f}  "
          f"int g (this grid) = {np.trapezoid(g, t):.6f} "
          f"int g_dense (same nodes) = {np.trapezoid(gi, t):.6f}")
