"""Decompose the TT line-of-sight source into components, integrate each
through the LOS once, and scan sign/weight combinations to locate the
origin of the TT-only acoustic dilation (EE is known-good, alpha=0.999).

Components (all (nk, nstep)):
  j_l   slot: mono = g*dg/4 ; gauge = g*aH*alpha ; psi = g*psi ;
              pi4 = g*Pi/4 ; isw = e^-k (phi'+psi')
  j_l'  slot: dop_raw = g*tb/k ; dop_gauge = g*k*alpha
  j_l'' slot: quad = 0.75 g Pi
Current production combo: mono - gauge + psi + pi4 + isw + (dop_raw+dop_gauge) + quad
MB95 transform says monopole gauge term should be +gauge.
"""
import os, sys, json, itertools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.cmb import source_k_grid
from cosmomc_tpu.models.perturbations import (
    build_thermo_funcs, make_rhs, adiabatic_ics, measure_curvature,
    _grho_terms, _I_ETA, _I_DG, _I_TB, IC_RELEASE_KTAU)
from cosmomc_tpu.models.bessel import build_bessel_table, default_l_samples
from cosmomc_tpu.models.cls import fine_k_grid
from cosmomc_tpu.models.primordial import PrimordialParams, scalar_power
from cosmomc_tpu.models.lensing import lens_cls
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

bg = BackgroundParams(
    ombh2=jnp.float64(0.02237737), omch2=jnp.float64(0.1201035),
    H0=jnp.float64(67.32178), omk=jnp.float64(0.0),
    omnuh2=jnp.float64(mnu_to_omnuh2(0.06)), nnu=jnp.float64(3.046),
    w=jnp.float64(-1.0), wa=jnp.float64(0.0), tcmb=jnp.float64(2.7255),
    num_massive_nu=1)
pp = PrimordialParams.make(logA=3.0447260, ns=0.9658923)
yhe, tau_re = jnp.float64(0.2453985), jnp.float64(0.05430138)

k = jnp.asarray(source_k_grid())
tf, tau0 = build_thermo_funcs(bg, yhe, tau_re)
dtype = tf.tau.dtype
rhs = make_rhs(bg, tf)
vrhs = jax.vmap(rhs, in_axes=(None, 0, 0))
taus = tf.tau
y0 = jax.vmap(lambda kk: adiabatic_ics(bg, tf, kk, taus[0]))(k)
r_init = jax.vmap(lambda yy, kk: measure_curvature(bg, tf, yy, kk, taus[0]))(y0, k)


def components_at(tau, y, aux, kk):
    k2 = kk * kk
    vis = jnp.interp(tau, tf.tau, tf.vis)
    expmk = jnp.interp(tau, tf.tau, tf.expmk)
    alpha = (aux["hdot"] + 6.0 * aux["etadot"]) / (2.0 * k2)
    X = 1.5 * aux["dgpi"] / k2
    phi = y[_I_ETA] - aux["adotoa"] * alpha
    psi = phi - X
    dadotoa = -(aux["grho"] + 3.0 * aux["gpres"]) / 6.0
    alphadot = y[_I_ETA] - X - 2.0 * aux["adotoa"] * alpha
    phidot = aux["etadot"] - dadotoa * alpha - aux["adotoa"] * alphadot
    dgpidot = (4.0 / 3.0) * (
        -2.0 * aux["adotoa"] * (aux["grho_g"] * aux["sigma_g"]
                                + aux["grho_n"] * aux["sigma_n"])
        + aux["grho_g"] * aux["sigg_dot"] + aux["grho_n"] * aux["sign_dot"])
    psidot = phidot - 1.5 * dgpidot / k2
    Pi = aux["pol_term"]
    mono = vis * (y[_I_DG] / 4.0)
    gauge = vis * (aux["adotoa"] * alpha)
    psi_c = vis * psi
    pi4 = vis * (Pi / 4.0)
    isw = expmk * (phidot + psidot)
    dop_raw = vis * (y[_I_TB] / kk)
    dop_gauge = vis * (k2 * alpha / kk)
    quad = 0.75 * vis * Pi
    slens = expmk * (phi + psi)
    return jnp.stack([mono, gauge, psi_c, pi4, isw, dop_raw, dop_gauge,
                      quad, slens])


def rk4_step(y, tau_a, tau_b, kk):
    dt = tau_b - tau_a
    k1, _ = vrhs(tau_a, y, kk)
    k2_, _ = vrhs(tau_a + 0.5 * dt, y + 0.5 * dt * k1, kk)
    k3_, _ = vrhs(tau_a + 0.5 * dt, y + 0.5 * dt * k2_, kk)
    k4_, _ = vrhs(tau_b, y + dt * k3_, kk)
    return y + (dt / 6.0) * (k1 + 2 * k2_ + 2 * k3_ + k4_)


def step(carry, xs):
    y = carry
    tau_a, tau_b = xs
    y_new = rk4_step(y, tau_a, tau_b, k)
    ics = jax.vmap(lambda kk: adiabatic_ics(bg, tf, kk, tau_b))(k)
    released = jnp.logical_or(k * tau_b >= IC_RELEASE_KTAU, tau_b >= 3.0)[:, None]
    y_new = jnp.where(released, y_new, ics)
    dy, aux = vrhs(tau_b, y_new, k)
    comps = jax.vmap(components_at, in_axes=(None, 0, 0, 0))(tau_b, y_new, aux, k)
    return y_new, comps


@jax.jit
def run():
    xs = (taus[:-1], taus[1:])
    _, comps = jax.lax.scan(step, y0, xs)    # (nstep-1, nk, 9)
    return comps

comps = np.asarray(run())                     # (nstep-1, nk, 9)
NC = 9
comps = np.concatenate([np.zeros((1,) + comps.shape[1:]), comps], axis=0)
comps = np.transpose(comps, (2, 1, 0))        # (9, nk, nstep)
comps /= np.asarray(r_init)[None, :, None]
print("evolved components", comps.shape, flush=True)

# --- shared LOS integration ---
lmax = 2500
ls = default_l_samples(lmax)
kf = np.asarray(fine_k_grid(float(tau0), 0.6))
tab = build_bessel_table(tuple(int(l) for l in ls), 0.6 * float(tau0) * 1.02 + 10)
lnk_c = np.log(np.asarray(k)); lnkf = np.log(kf)

ipk = int(np.argmax(np.asarray(tf.vis)))
chi_star = float(tau0) - float(taus[ipk])

Sf = np.empty((NC, kf.size, comps.shape[2]))
for c in range(NC):
    for j in range(comps.shape[2]):
        Sf[c, :, j] = np.interp(lnkf, lnk_c, comps[c, :, j])
print("k-interp done", flush=True)

tausn = np.asarray(taus); dt = np.diff(tausn)
wt = np.concatenate([dt[:1] / 2, (dt[1:] + dt[:-1]) / 2, dt[-1:] / 2])
chi = np.maximum(float(tau0) - tausn, 1e-6)
x = kf[:, None] * (float(tau0) - tausn)[None, :]
lens_w = np.where(chi < chi_star, (chi_star - chi) / (chi_star * chi), 0.0)
dlnk = np.diff(np.log(kf))
wk = np.concatenate([dlnk[:1] / 2, (dlnk[1:] + dlnk[:-1]) / 2, dlnk[-1:] / 2])

Sw = Sf * wt[None, None, :]
Sw_j = jnp.asarray(Sw)
jl_tab = jnp.asarray(tab.jl, jnp.float64)
jlp_tab = jnp.asarray(tab.jlp, jnp.float64)
x_j = jnp.asarray(x)
inv_dx = 1.0 / tab.dx
lens_w_j = jnp.asarray(lens_w * wt)

def one_l(il):
    l = jnp.asarray(tab.ls)[il].astype(jnp.float64)
    t = x_j * inv_dx
    i = jnp.clip(t.astype(jnp.int32), 0, jl_tab.shape[1] - 2)
    f = t - i.astype(jnp.float64)
    jl = jl_tab[il, i] * (1 - f) + jl_tab[il, i + 1] * f
    jp = jlp_tab[il, i] * (1 - f) + jlp_tab[il, i + 1] * f
    xs_ = jnp.maximum(x_j, 1e-8)
    jpp = -2.0 * jp / xs_ + (l * (l + 1) / (xs_ * xs_) - 1.0) * jl
    # j_l slot for comps 0..4, j_l' for 5,6, j_l'' for 7; comp 8 = lensing
    d0 = jnp.einsum('ckt,kt->ck', Sw_j[:5], jl)
    d1 = jnp.einsum('ckt,kt->ck', Sw_j[5:7], jp)
    d2 = jnp.sum(Sw_j[7] * jpp, axis=1)[None, :]
    efac = jnp.sqrt(jnp.maximum((l + 2) * (l + 1) * l * (l - 1), 0.0))
    dE = 0.25 * efac * jnp.sum(Sw_j[7] * jl / (xs_ * xs_), axis=1)
    dP = jnp.sum(Sf[8] * lens_w_j * jl, axis=1)
    return jnp.concatenate([d0, d1, d2], axis=0), dE, dP

dT_c, dE, dP = jax.lax.map(jax.jit(one_l), jnp.arange(len(ls)))
dT_c = np.asarray(dT_c)   # (nl, 8, nkf)
dE = np.asarray(dE); dP = np.asarray(dP)
print("LOS done", flush=True)

wP = wk * np.asarray(scalar_power(pp, jnp.asarray(kf)))
muk2 = (2.7255e6) ** 2

from cosmomc_tpu.utils.interp import spline_fit, spline_eval
ls_f = ls.astype(float)
fac = ls_f * (ls_f + 1) / (2 * np.pi)
fac_pp = (ls_f * (ls_f + 1)) ** 2 / (2 * np.pi)
all_l = np.arange(2, lmax + 1, dtype=float)

def fill(vals):
    return np.asarray(spline_eval(spline_fit(jnp.asarray(ls_f), jnp.asarray(vals)), jnp.asarray(all_l)))

ees = 4 * np.pi * np.sum(wP * dE * dE, axis=1)
pps = 4 * np.pi * np.sum(wP * dP * dP, axis=1)
ee_fill = fill(fac * ees) * muk2
pp_fill = fill(fac_pp * pps)

np.savez("/tmp/diag_components.npz", dT_c=dT_c, dE=dE, dP=dP, wP=wP,
         ls=ls, all_l=all_l, ee=ee_fill, ppf=pp_fill)

REF = np.loadtxt("/root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl")
L, rtt = REF[:, 0], REF[:, 1]

def tt_for(w):
    dT = np.tensordot(w, dT_c, axes=(0, 1))   # (nl, nkf)
    tts = 4 * np.pi * np.sum(wP * dT * dT, axis=1)
    tes = 4 * np.pi * np.sum(wP * dT * dE, axis=1)
    tt_u = fill(fac * tts) * muk2
    te_u = fill(fac * tes) * muk2
    lensed = lens_cls(jnp.asarray(all_l, jnp.int32), jnp.asarray(tt_u),
                      jnp.asarray(te_u), jnp.asarray(ee_fill), jnp.asarray(pp_fill))
    return np.asarray(lensed.ls, float), np.asarray(lensed.tt)

def metrics(lls, tt):
    out = {}
    all_l = lls
    for lo, hi in [(2, 30), (30, 300), (300, 800), (800, 1500), (1500, 2200)]:
        m = (all_l >= lo) & (all_l < hi)
        r = np.interp(all_l[m], L, rtt)
        out[f"{lo}-{hi}"] = round(float(np.sqrt(np.mean((tt[m] / r - 1) ** 2))), 5)
    # dilation fit
    m = (all_l >= 400) & (all_l <= 2000)
    best = (1e9, 1.0, 1.0)
    for alpha in np.linspace(0.97, 1.03, 601):
        r = np.interp(all_l[m] / alpha, L, rtt)
        amp = np.sum(tt[m] * r) / np.sum(r * r)
        e = np.sqrt(np.mean((tt[m] / (amp * r) - 1.0) ** 2))
        if e < best[0]:
            best = (e, alpha, amp)
    out["alpha"] = round(best[1], 5)
    out["resid"] = round(best[0], 5)
    out["amp"] = round(best[2], 5)
    return out

# weights order: mono, gauge, psi, pi4, isw, dop_raw, dop_gauge, quad
names = ["mono", "gauge", "psi", "pi4", "isw", "dop_raw", "dop_gauge", "quad"]
combos = {
    "current (g=-1)": [1, -1, 1, 1, 1, 1, 1, 1],
    "mb95 (g=+1)":    [1, +1, 1, 1, 1, 1, 1, 1],
    "no gauge":       [1, 0, 1, 1, 1, 1, 1, 1],
    "dop flip":       [1, -1, 1, 1, 1, -1, -1, 1],
    "mb95+dopflip":   [1, +1, 1, 1, 1, -1, -1, 1],
    "no quad":        [1, -1, 1, 1, 1, 1, 1, 0],
    "no pi4":         [1, -1, 1, 0, 1, 1, 1, 1],
    "no isw":         [1, -1, 1, 1, 0, 1, 1, 1],
    "no dop_gauge":   [1, -1, 1, 1, 1, 1, 0, 1],
    "mb95 nodopg":    [1, +1, 1, 1, 1, 1, 0, 1],
}
res = {}
for name, w in combos.items():
    res[name] = metrics(*tt_for(np.asarray(w, float)))
    print(name, json.dumps(res[name]), flush=True)
