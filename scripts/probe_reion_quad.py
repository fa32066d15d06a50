#!/usr/bin/env python3
"""Diagnose the low-l EE reionization bump: compare the EVOLVED photon
quadrupole/polarization source Pi(k, tau) at reionization times against
the exact free-streaming integral solution built from our own sources:

  F2_fs(k,tau) = 4 * int_0^tau dtau' [ s0 j2(k d) + s1 j2'(k d)
                                       + s2 j2''(k d) ],  d = tau - tau'

(The LOS representation of the Boltzmann solution evaluated at tau, l=2;
ignores the small re-scattering correction at reionization, O(tau_re).)
The evolved Pi is recovered from the stored source s2 = 0.75 vis Pi.
If evolved Pi << F2_fs/4 the late-time low-k evolution is buggy.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.cmb import compute_transfers
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

bg = BackgroundParams(
    ombh2=jnp.float64(0.02237737), omch2=jnp.float64(0.1201035),
    H0=jnp.float64(67.32178), omk=jnp.float64(0.0),
    omnuh2=jnp.float64(mnu_to_omnuh2(0.06)), nnu=jnp.float64(3.046),
    w=jnp.float64(-1.0), wa=jnp.float64(0.0), tcmb=jnp.float64(2.7255),
    num_massive_nu=1)
tau_re, yhe = 0.05430138, 0.2453985

ks = np.array([5e-4, 1e-3, 2e-3, 4e-3, 8e-3])
po, chi_star, tf = compute_transfers(bg, jnp.float64(tau_re),
                                     jnp.float64(yhe), ks,
                                     return_thermo=True)
t = np.asarray(po.tau)
s0 = np.asarray(po.s0); s1 = np.asarray(po.s1); s2 = np.asarray(po.s2)
vis = np.asarray(tf.vis)
dt = np.gradient(t)


def j2(x):
    x = np.maximum(x, 1e-8)
    return np.where(x < 1e-3, x**2 / 15.0,
                    (3.0 / x**3 - 1.0 / x) * np.sin(x)
                    - 3.0 / x**2 * np.cos(x))


def j2p(x):
    x = np.maximum(x, 1e-8)
    j1 = np.where(x < 1e-3, x / 3.0,
                  np.sin(x) / x**2 - np.cos(x) / x)
    return j1 - 3.0 / x * j2(x)


for ik, k in enumerate(ks):
    print(f"k = {k:.1e}")
    for tau_eval in (4000.0, 6000.0, 9000.0, 12000.0):
        i_eval = np.searchsorted(t, tau_eval)
        d = tau_eval - t[:i_eval]
        x = k * d
        jl = j2(x); jp = j2p(x)
        xs = np.maximum(x, 1e-8)
        jpp = -2.0 * jp / xs + (6.0 / xs**2 - 1.0) * jl
        w = dt[:i_eval]
        F2fs = 4.0 * np.sum((s0[ik, :i_eval] * jl + s1[ik, :i_eval] * jp
                             + s2[ik, :i_eval] * jpp) * w)
        # evolved Pi from stored source (s2 = 0.75 vis Pi, sources
        # normalized by r_init already, same units as s0 integrand)
        v = vis[i_eval]
        Pi_ev = s2[ik, i_eval] / (0.75 * v) if v > 0 else np.nan
        print(f"  tau={tau_eval:7.0f}: Pi_evolved={Pi_ev:+.5e}  "
              f"F2_fs/4={F2fs/4:+.5e}   ratio={Pi_ev/(F2fs/4+1e-300):+.3f}")
