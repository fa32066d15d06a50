#!/usr/bin/env python3
"""Differential test: our fixed-grid RK4+TCA+frozen-hierarchy scheme vs an
exact stiff integration (scipy BDF) of the same MB95 synchronous-gauge
equations with the same thermo tables, compared at recombination.

If the two agree, the remaining C_l bias vs CAMB is in the equation set /
ICs / sources; if they disagree, the evolution scheme is at fault.
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
from scipy.integrate import solve_ivp
from scipy.interpolate import interp1d

import cosmomc_tpu.models.perturbations as pert
from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

bg = BackgroundParams(
    ombh2=jnp.float64(0.02237737), omch2=jnp.float64(0.1201035),
    H0=jnp.float64(67.32178), omk=jnp.float64(0.0),
    omnuh2=jnp.float64(mnu_to_omnuh2(0.06)), nnu=jnp.float64(3.046),
    w=jnp.float64(-1.0), wa=jnp.float64(0.0), tcmb=jnp.float64(2.7255),
    num_massive_nu=1)
yhe, tau_re = 0.2453985, 0.05430138

tf, tau0 = pert.build_thermo_funcs(bg, jnp.float64(yhe), jnp.float64(tau_re))
taus = np.asarray(tf.tau)
ipk = int(np.argmax(np.asarray(tf.vis)))
tau_star = taus[ipk]
print(f"tau* = {tau_star:.2f}")

ks = np.array([0.02, 0.05, 0.08, 0.12, 0.17, 0.23, 0.30])

# ---- our scheme ----
po = pert.evolve_perturbations(bg, tf, tau0, jnp.asarray(ks), (0.0,))
# reconstruct Theta0 + psi at tau* is embedded in s0/vis; instead compare
# delta_g and theta_g directly: rerun the scan but capture state? The
# sources s0/s1 at the visibility peak carry (Theta0_N + psi + Pi/4) and
# v_b_N times g — divide by g to get the gauge-invariant combos.
g_star = float(np.asarray(tf.vis)[ipk])
ours_mono = np.asarray(po.s0)[:, ipk] / g_star      # ~ Theta0_N + psi (+Pi/4 + ISW/g)
ours_dopp = np.asarray(po.s1)[:, ipk] / g_star      # v_b_N

# ---- exact scipy integration of the same equations ----
rhs_jax = pert.make_rhs(bg, tf, rsa_ktau=1e9)   # disable RSA for the exact run

a_t = np.asarray(tf.a); opac_t = np.asarray(tf.opac); csqb_t = np.asarray(tf.csqb)
a_f = interp1d(taus, a_t, kind="cubic")
opac_f = interp1d(taus, np.log(opac_t), kind="cubic")
csqb_f = interp1d(taus, csqb_t, kind="cubic")

d = pert._densities(bg)
C3 = 3.0 * pert.H100_MPC ** 2
LMAXG, LMAXGP, LMAXNR = pert.LMAXG, pert.LMAXGP, pert.LMAXNR
I = dict(eta=0, dc=1, db=2, tb=3, dg=4, tg=5, fg2=6,
         gp0=6 + (LMAXG - 1), dn=6 + (LMAXG - 1) + (LMAXGP + 1))
I["tn"] = I["dn"] + 1; I["fn2"] = I["tn"] + 1
NVAR = pert.NVAR

def rhs_np(tau, y, k):
    a = float(a_f(tau)); opac = float(np.exp(opac_f(tau))); csqb = float(csqb_f(tau))
    grho_g = C3 * float(d["ogh2"]) / a ** 2
    grho_n = C3 * float(d["onu1"] * (d["massless_deg"] + d["massive_deg"])) / a ** 2
    grho_c = C3 * float(bg.omch2) / a
    grho_b = C3 * float(bg.ombh2) / a
    grho_de = C3 * float(d["omdeh2"]) * a ** 2
    grho = grho_g + grho_n + grho_c + grho_b + grho_de
    adotoa = np.sqrt(grho / 3.0)
    eta, dc, db, tb, dg, tg = y[0], y[1], y[2], y[3], y[4], y[5]
    fg = y[I["fg2"]:I["fg2"] + (LMAXG - 1)]
    gp = y[I["gp0"]:I["gp0"] + (LMAXGP + 1)]
    dn, tn = y[I["dn"]], y[I["tn"]]
    fn = y[I["fn2"]:I["fn2"] + (LMAXNR - 1)]
    k2 = k * k
    dgrho = grho_c * dc + grho_b * db + grho_g * dg + grho_n * dn
    hdot = (2.0 * k2 * eta + dgrho) / adotoa
    dgq = (4.0 / 3.0) * (grho_g * tg + grho_n * tn) + grho_b * tb
    etadot = 0.5 * dgq / k2
    sigma_g = fg[0] / 2.0
    sigma_n = fn[0] / 2.0
    pol = fg[0] + gp[0] + gp[2]
    tbdot = -adotoa * tb + csqb * k2 * db + (4.0/3.0) * grho_g / grho_b * opac * (tg - tb)
    tgdot = k2 * (dg / 4.0 - sigma_g) + opac * (tb - tg)
    dgdot = -(4.0 / 3.0) * tg - (2.0 / 3.0) * hdot
    dbdot = -tb - 0.5 * hdot
    dcdot = -0.5 * hdot
    dndot = -(4.0 / 3.0) * tn - (2.0 / 3.0) * hdot
    tndot = k2 * (dn / 4.0 - sigma_n)
    dy = np.zeros(NVAR)
    dy[0], dy[1], dy[2], dy[3], dy[4], dy[5] = etadot, dcdot, dbdot, tbdot, dgdot, tgdot
    f1 = 4.0 * tg / (3.0 * k)
    fgp = np.concatenate([[f1], fg[:-1]])
    fgn = np.concatenate([fg[1:], [0.0]])
    lsg = np.arange(2, LMAXG + 1, dtype=float)
    fgd = (k / (2 * lsg + 1)) * (lsg * fgp - (lsg + 1) * fgn) - opac * fg
    fgd[0] = (8.0/15.0)*tg - (3.0/5.0)*k*fg[1] + (4.0/15.0)*hdot + (8.0/5.0)*etadot \
        - opac * (0.9 * fg[0] - 0.1 * (gp[0] + gp[2]))
    fgd[-1] = k * fg[-2] - (LMAXG + 1) / tau * fg[-1] - opac * fg[-1]
    dy[I["fg2"]:I["fg2"] + (LMAXG - 1)] = fgd
    gpp = np.concatenate([[0.0], gp[:-1]])
    gpn = np.concatenate([gp[1:], [0.0]])
    lsp = np.arange(0, LMAXGP + 1, dtype=float)
    gpd = (k / (2 * lsp + 1)) * (lsp * gpp - (lsp + 1) * gpn) - opac * gp
    gpd[0] += opac * 0.5 * pol
    gpd[2] += opac * 0.1 * pol
    gpd[-1] = k * gp[-2] - (LMAXGP + 1) / tau * gp[-1] - opac * gp[-1]
    dy[I["gp0"]:I["gp0"] + (LMAXGP + 1)] = gpd
    f1n = 4.0 * tn / (3.0 * k)
    fnp = np.concatenate([[f1n], fn[:-1]])
    fnn = np.concatenate([fn[1:], [0.0]])
    lsn = np.arange(2, LMAXNR + 1, dtype=float)
    fnd = (k / (2 * lsn + 1)) * (lsn * fnp - (lsn + 1) * fnn)
    fnd[0] = (8.0/15.0)*tn - (3.0/5.0)*k*fn[1] + (4.0/15.0)*hdot + (8.0/5.0)*etadot
    fnd[-1] = k * fn[-2] - (LMAXNR + 1) / tau * fn[-1]
    dy[I["fn2"]:I["fn2"] + (LMAXNR - 1)] = fnd
    return dy

print("k      ours(mono)   exact(mono)   ours(dopp)   exact(dopp)")
for i, k in enumerate(ks):
    t0 = max(1e-3, min(0.05 / k, 3.0))
    y0 = np.asarray(pert.adiabatic_ics(bg, tf, jnp.float64(k), jnp.float64(t0)))
    r_init = float(pert.measure_curvature(bg, tf, jnp.asarray(y0), jnp.float64(k), jnp.float64(t0)))
    sol = solve_ivp(rhs_np, (t0, tau_star), y0, args=(float(k),), method="BDF",
                    rtol=1e-8, atol=1e-12, dense_output=False, t_eval=[tau_star])
    y = sol.y[:, -1]
    # Newtonian-gauge monopole + psi at tau*
    a = float(a_f(tau_star)); opac = float(np.exp(opac_f(tau_star)))
    grho_g = C3 * float(d["ogh2"]) / a ** 2
    grho_n = C3 * float(d["onu1"] * (d["massless_deg"] + d["massive_deg"])) / a ** 2
    grho_c = C3 * float(bg.omch2) / a
    grho_b = C3 * float(bg.ombh2) / a
    grho_de = C3 * float(d["omdeh2"]) * a ** 2
    grho = grho_g + grho_n + grho_c + grho_b + grho_de
    adotoa = np.sqrt(grho / 3.0)
    k2 = k * k
    dgrho = grho_c * y[1] + grho_b * y[2] + grho_g * y[4] + grho_n * y[I["dn"]]
    hdot = (2.0 * k2 * y[0] + dgrho) / adotoa
    dgq = (4.0/3.0) * (grho_g * y[5] + grho_n * y[I["tn"]]) + grho_b * y[3]
    etadot = 0.5 * dgq / k2
    alpha = (hdot + 6.0 * etadot) / (2.0 * k2)
    dgpi = (4.0/3.0) * (grho_g * y[I["fg2"]]/2.0 + grho_n * y[I["fn2"]]/2.0)
    X = 1.5 * dgpi / k2
    phi = y[0] - adotoa * alpha
    psi = phi - X
    pol = y[I["fg2"]] + y[I["gp0"]] + y[I["gp0"] + 2]
    theta0N = y[4] / 4.0 - adotoa * alpha
    vbN = (y[3] + k2 * alpha) / k
    exact_mono = (theta0N + psi + pol / 4.0) / r_init
    exact_dopp = vbN / r_init
    print(f"{k:5.2f}  {ours_mono[i]:12.5e} {exact_mono:12.5e}  {ours_dopp[i]:12.5e} {exact_dopp:12.5e}  nfev={sol.nfev}")
