"""Linear Einstein-Boltzmann evolution: synchronous gauge, batched over k.

Replaces the reference's camb/equations_ppf.f90 GaugeInterface + cmbmain
DoSourcek OMP loop (cmbmain.f90:198,657) with a TPU-native design:

  - equations: Ma & Bertschinger (1995) synchronous-gauge system — CDM,
    baryons, photon temperature + polarization hierarchies, massless
    neutrino hierarchy, metric (eta; h' from the 00-constraint);
  - tight coupling: first-order quasi-static slip (MB95 eq 67 family),
    switched per-k with `jnp.where` on k*tau_c — all lanes run the same
    code, the compiler sees NO control flow;
  - time stepping: classical RK4 on a FIXED shared conformal-time grid
    whose density follows the opacity (d tau ~ 1/kappa') so the post-tight-
    coupling scattering terms are stable for an explicit method; one
    `lax.scan` over the grid, vmapped over k. No adaptive control flow, no
    per-k loops: the whole Boltzmann solve is one XLA program of static
    shape (nk, nstep);
  - sources: computed algebraically at every grid node (Newtonian-gauge
    potentials from the constraint equations; ISW from phi'+psi' with
    sigma' taken from the hierarchy RHS — no numerical time derivatives);
  - normalization: initial comoving curvature R measured numerically from
    the start state, transfers divided by it (removes IC-normalization
    convention risk).

Massive neutrinos: with `massive_nu=True` (enabled automatically by the
pipeline when mnu is sampled) the momentum-sampled Psi_l(q) hierarchy
evolves on NQ_NU Gauss nodes with exact massive stress-energy; the
default small-mnu path treats the 0.06 eV eigenstate as massless
radiation CONSISTENTLY in the rhs (see the measured comparison in
make_rhs — partial exact-background fixes do worse than the consistent
massless limit; the residual is a few-% effect confined to l <~ 10).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.models import constants as const
from cosmomc_tpu.models.background import (BackgroundParams, _densities,
                                           hubble_mpc, H100_MPC)
from cosmomc_tpu.models.recfast import compute_thermo
from cosmomc_tpu.utils.interp import parallel_cumsum
from cosmomc_tpu.models.reionization import xe_reion, zre_from_tau

# hierarchy truncations (CAMB defaults are comparable: lmaxg~12, lmaxnr~...)
# env overrides exist for convergence studies (scripts/check_cls.py) only —
# the state layout below is fixed at import time.
import os as _os
LMAXG = int(_os.environ.get("COSMOMC_LMAXG", 12))    # photon temperature 0..LMAXG
LMAXGP = int(_os.environ.get("COSMOMC_LMAXGP", 8))   # photon polarization 0..LMAXGP
LMAXNR = int(_os.environ.get("COSMOMC_LMAXNR", 10))  # massless neutrinos 0..LMAXNR

# ---------------------------------------------------------------------------
# Extended-physics state blocks (appended AFTER the base layout, so the base
# offsets below are unchanged whether or not a block is enabled):
#
#   massive-neutrino momentum hierarchy  Psi_l(q_i), l = 0..LMAXNU for each
#   of NQ_NU Gauss nodes q_i of the relativistic density measure q^3 f0(q)
#   (the reference's MassiveNu evolution, camb/modules.f90 +
#   equations_ppf.f90 massive-nu sector); and
#
#   dark-energy fluid perturbations [delta_de, V_de=(1+w) theta_de] with
#   c_s^2 = 1 (quintessence-like smooth DE). The reference uses the PPF
#   module (equations_ppf.f90 w0-wa globals) which also handles the
#   w = -1 crossing exactly; here the 1/(1+w) factors are Tikhonov-
#   regularized near the crossing (|1+w| <~ 0.01) — a documented
#   approximation, sub-0.1% on C_l for CPL parameters in Planck ranges.
# ---------------------------------------------------------------------------
NQ_NU = 4          # momentum nodes
LMAXNU = 6         # Psi_l truncation
NVAR_NU = NQ_NU * (LMAXNU + 1)
NVAR_DE = 2


def _nu_quadrature(nq: int = NQ_NU):
    """Gauss nodes/weights for int_0^inf dq q^3 f0(q) g(q), f0 = 1/(e^q+1),
    via discrete Stieltjes orthogonalization (host, float64). Weights sum
    to N3 = int q^3 f0 = 7 pi^4/120."""
    q = np.linspace(1e-6, 45.0, 30001)
    w = q ** 3 / (np.exp(q) + 1.0)
    a = np.zeros(nq)
    b = np.zeros(nq)
    p_prev = np.zeros_like(q)
    p = np.ones_like(q)
    norm_prev = 1.0
    for j in range(nq):
        norm = np.trapezoid(w * p * p, q)
        a[j] = np.trapezoid(w * q * p * p, q) / norm
        if j > 0:
            b[j] = norm / norm_prev
        p_next = (q - a[j]) * p - (b[j] if j > 0 else 0.0) * p_prev
        p_prev, p, norm_prev = p, p_next, norm
    J = np.diag(a) + np.diag(np.sqrt(b[1:]), 1) + np.diag(np.sqrt(b[1:]), -1)
    nodes, vecs = np.linalg.eigh(J)
    mu0 = np.trapezoid(w, q)
    return nodes, mu0 * vecs[0] ** 2


_NU_Q, _NU_W = _nu_quadrature()
_NU_WNORM = _NU_W / _NU_W.sum()                  # weights of the <.> average
#: d ln f0 / d ln q at the nodes (f0 Fermi-Dirac), rescaled so the
#: quadrature reproduces the analytic moment <dlnf0/dlnq> = -4 EXACTLY —
#: this makes the am -> 0 limit of the hierarchy coincide with the
#: massless F_l equations to machine precision (the small-node-count
#: quadrature error moves to the O(am^2) mass corrections instead)
_NU_DLNF = -_NU_Q / (1.0 + np.exp(-_NU_Q))
_NU_DLNF = _NU_DLNF * (4.0 / abs(float((_NU_WNORM * _NU_DLNF).sum())))


def extra_state(massive_nu: bool, de_perts: bool) -> int:
    return (NVAR_NU if massive_nu else 0) + (NVAR_DE if de_perts else 0)


# state layout offsets
_I_ETA = 0
_I_DC = 1
_I_DB = 2
_I_TB = 3
_I_DG = 4        # delta_gamma
_I_TG = 5        # theta_gamma
_I_FG2 = 6       # F_gamma_l for l=2..LMAXG  (FG2 = 2 sigma_gamma)
_I_GP0 = _I_FG2 + (LMAXG - 1)        # G_l for l=0..LMAXGP
_I_DN = _I_GP0 + (LMAXGP + 1)        # delta_nu
_I_TN = _I_DN + 1
_I_FN2 = _I_TN + 1                   # F_nu_l for l=2..LMAXNR
NVAR = _I_FN2 + (LMAXNR - 1)

N_STEP = 8192     # shared tau grid length (static)

# Radiation streaming approximation (RSA): past k*tau > RSA_KTAU the photon
# and massless-neutrino perturbations are slaved to the metric (the
# reference's DoLateRadTruncation / no_phot_multpoles switches,
# equations_ppf.f90:1428-1452) — this is what makes high-k matter-transfer
# lanes non-stiff, so the shared grid only has to resolve oscillations of
# frequency ~min(k, RSA_KTAU/tau).
RSA_KTAU = 240.0

# tight-coupling release thresholds (see make_rhs and build_thermo_funcs):
# lanes leave TCA when (k*tauc >= TC_KTAUC or opac*tau <= TC_OPACTAU) AND
# opac*(1+R) <= TC_LAM_MAX; the shared grid resolves opacities only up to
# TC_LAM_MAX (1.2/lam rule). TC_OPACTAU is the reference's tight_tau
# criterion (modules.f90:2809, release everywhere once 1/(opac*tau) >
# 0.005): WITHOUT it, low-k lanes (k <~ 2e-3) stayed in first-order TCA
# through the first half of the visibility function, where the
# quasi-static F2/polarization slip is invalid (opacity varies on a
# free-path timescale) — measured as a -25..-30% deficit in the
# recombination EE tail at l=12-50 (the bump-trough region). opac*tau =
# 200 crosses at z ~ 1500 where opac*(1+R) ~ 3, so the existing grid
# density rule already resolves the released stiffness.
TC_KTAUC = 0.015
TC_OPACTAU = 200.0
TC_LAM_MAX = 150.0


class ThermoFuncs(NamedTuple):
    """Interpolation tables in tau for the evolution (all shape (N,))."""
    tau: jnp.ndarray
    a: jnp.ndarray
    opac: jnp.ndarray      # kappa' = a n_e sigma_T in 1/Mpc
    expmk: jnp.ndarray     # e^{-kappa(tau,tau0)}
    vis: jnp.ndarray       # g = kappa' e^{-kappa}
    csqb: jnp.ndarray      # baryon sound speed^2


class PerturbationOutput(NamedTuple):
    tau: jnp.ndarray         # (nstep,) source times
    k: jnp.ndarray           # (nk,)
    # temperature/polarization source functions, shape (nk, nstep):
    s0: jnp.ndarray          # g(Theta0 + psi + Pi/4) + e^-k (phi'+psi')
    s1: jnp.ndarray          # g v_b_N (Doppler; pairs with j_l')
    s2: jnp.ndarray          # (3/4) g Pi (pairs with j_l'')
    spol: jnp.ndarray        # (3/4) g Pi (E polarization source)
    slens: jnp.ndarray       # e^-kappa (phi + psi) (lensing potential)
    # matter transfer at the final time (z=0 snapshot) and curvature norm:
    delta_m: jnp.ndarray     # (nk,) comoving matter density transfer at tau0
    r_init: jnp.ndarray      # (nk,) initial comoving curvature (normalizer)
    tau0: jnp.ndarray        # conformal age
    # extra snapshots of delta_m at requested redshifts: (nz, nk)
    delta_m_z: jnp.ndarray
    growth_tau: jnp.ndarray  # (nstep,) unused placeholder
    # d delta_m / d tau snapshots (for f sigma8) and Weyl potential
    # transfer (phi+psi)/2 snapshots, both (nz, nk); aH at z_outputs (nz,)
    ddelta_m_z: jnp.ndarray | None = None
    weyl_z: jnp.ndarray | None = None
    aH_z: jnp.ndarray | None = None


def _conformal_time_table(bg: BackgroundParams, n: int = 4096):
    """tau(a) on a fine log-a grid by cumulative trapezoid (parallel)."""
    dtype = jnp.asarray(bg.ombh2).dtype
    lna = jnp.linspace(jnp.log(1e-9), 0.0, n).astype(dtype)
    a = jnp.exp(lna)
    # dtau/dlna = 1/(a H)
    f = 1.0 / (a * hubble_mpc(bg, a))
    dl = lna[1] - lna[0]
    seg = 0.5 * (f[1:] + f[:-1]) * dl
    tau = jnp.concatenate([f[0] * a[0:1] * 0 + f[0] * 0, parallel_cumsum(seg)])
    # radiation-era analytic start: tau(a0) ~ a0/(a'..) = a0/(H100*sqrt(or))
    d = _densities(bg)
    tau0_rad = a[0] / (H100_MPC * jnp.sqrt(d["ogh2"] + d["onu1"] * (d["massless_deg"] + d["massive_deg"])))
    tau = tau + tau0_rad
    return lna, tau


def build_thermo_funcs(bg: BackgroundParams, yhe, tau_reion: float | jnp.ndarray,
                       n_step: int = N_STEP, kmax: float = 0.5,
                       rsa_ktau: float = RSA_KTAU
                       ) -> Tuple[ThermoFuncs, jnp.ndarray]:
    """Thermal/background tables on the shared evolution grid.

    Returns (ThermoFuncs on the tau grid, tau0). The tau grid density
    follows max(opacity, expansion, late-time cap) so explicit RK4 is
    stable and sources are resolved (see module docstring).
    """
    dtype = jnp.asarray(bg.ombh2).dtype
    lna_tab, tau_tab = _conformal_time_table(bg)
    tau0 = tau_tab[-1]
    # high-k runs (matter transfers) need lanes still superhorizon at start
    tau_start_val = min(0.03, IC_RELEASE_KTAU / kmax)

    # thermo: recfast + reionization on a z grid; then map to tau
    th = compute_thermo(bg, yhe)
    fHe = yhe / (const.mass_ratio_He_H * (1.0 - yhe))
    zre = zre_from_tau(bg, tau_reion, yhe)
    z_t = th.z[::-1]                     # ascending z
    xe_rec = th.xe[::-1]
    xe_tot = xe_rec + xe_reion(z_t, zre, fHe)
    tm_t = th.tm[::-1]

    h = bg.H0 / 100.0
    mu_H = 1.0 / (1.0 - yhe)
    Nnow = const.n_H_today(bg.ombh2, mu_H)   # f32-safe (no denormal chain)
    akthom = const.sigma_thomson * Nnow * const.Mpc

    # kappa' = d kappa/d tau = a n_e sigma_T in 1/Mpc (comoving):
    # n_e = xe Nnow (1+z)^3  ->  kappa' = akthom xe (1+z)^2
    def opac_of_z(z):
        xe = jnp.where(z > 9000.0, 1.0 + 2.0 * fHe, jnp.interp(z, z_t, xe_tot))
        return akthom * xe * (1.0 + z) ** 2

    # ---- build the tau grid (static length, dynamic values) ----
    # start deep in radiation era, early enough that the highest k is still
    # superhorizon (lanes are held on analytic ICs until k*tau ~ 0.08)
    tau_start = jnp.asarray(tau_start_val, dtype)
    # target step: dtau = min(cap_late, c_op/opac, c_exp * tau)
    # computed iteratively on a provisional uniform ln-tau grid then
    # renormalized to exactly n_step points via cumulative rescaling.
    n_prov = 4096
    lt = jnp.linspace(jnp.log(tau_start), jnp.log(tau0), n_prov)
    tprov = jnp.exp(lt)
    a_prov = jnp.interp(tprov, tau_tab, jnp.exp(lna_tab))
    z_prov = 1.0 / a_prov - 1.0
    opac_prov = opac_of_z(z_prov)
    # Stability rule for explicit RK4 after tight-coupling release:
    # the photon-baryon scattering eigenvalue is ~ opac*(1+R) with
    # R = 4 rho_g/(3 rho_b). Lanes release when k*tauc >= 0.01, so no lane
    # feels opacities above ~ kmax/0.01 — cap opac there (the deep-TC era
    # needs no opacity resolution). The late-time cap keeps k*dtau inside
    # the RK4 imaginary-axis stability region for the free-streaming terms.
    d = _densities(bg)
    R_prov = (4.0 / 3.0) * d["ogh2"] / bg.ombh2 / a_prov
    # active stiffness: opac*(1+R) wherever lanes may be off tight coupling
    # (the rhs keeps every lane TCA while opac*(1+R) > 150, so higher rates
    # never constrain the grid)
    lam = opac_prov * (1.0 + R_prov)
    lam_active = jnp.where(lam <= TC_LAM_MAX, lam, 0.0)
    # oscillator rule: lanes with k*tau > rsa_ktau are RSA-slaved (see
    # RSA_KTAU above), so the fastest live oscillation at time tau has
    # frequency min(kmax, rsa_ktau/tau). The step constant sets the RK4
    # phase error: for y'=i w y the per-step phase lag is (w h)^4/120
    # relative, and the acoustic frequency is w ~ k c_s ~ k/sqrt(3);
    # k h = 2.2 gave a ~2% acoustic-scale bias (peaks shifted high in l),
    # k h = 0.9 puts the phase error at ~6e-4 — the oscillator term is a
    # small share of the step budget, so this redistributes few steps.
    k_active = jnp.minimum(kmax, rsa_ktau / tprov)
    dt_target = jnp.minimum(
        jnp.minimum(jnp.minimum(5.0, 0.9 / k_active),
                    1.2 / jnp.maximum(lam_active, 1e-10)),
        0.1 * tprov)
    # density ~ 1/dt_target; cumulative "step count" N(tau)
    dens = 1.0 / dt_target
    cum = jnp.concatenate([jnp.zeros((1,), dtype),
                           parallel_cumsum(0.5 * (dens[1:] + dens[:-1]) * jnp.diff(tprov))])
    cum = cum / cum[-1] * (n_step - 1)
    # invert: tau_i such that N(tau_i) = i
    idx = jnp.arange(n_step, dtype=dtype)
    tau_grid = jnp.interp(idx, cum, tprov)

    a_g = jnp.interp(tau_grid, tau_tab, jnp.exp(lna_tab))
    z_g = 1.0 / a_g - 1.0
    opac_g = opac_of_z(z_g)
    # cumulative optical depth from tau0 backwards: kappa(tau) = int_tau^tau0.
    # Summed BACKWARDS (reversed cumsum) so the physically-relevant small
    # kappa values near recombination/today are sums of small terms — the
    # forward form kappa_total - kappa_from(tau) subtracts two ~1e7 numbers
    # (the deep-tight-coupling opacity integral) to produce kappa ~ 5 and
    # loses everything in float32 (measured: a systematic ~10% C_l
    # amplitude error on the f32 TPU path).
    dk = 0.5 * (opac_g[1:] + opac_g[:-1]) * jnp.diff(tau_grid)
    kappa = jnp.concatenate([parallel_cumsum(dk[::-1])[::-1],
                             jnp.zeros((1,), dtype)])
    expmk = jnp.exp(-kappa)
    vis = opac_g * expmk

    # baryon sound speed on the grid
    tm_g = jnp.where(z_g > 9000.0, bg.tcmb * (1.0 + z_g),
                     jnp.interp(z_g, z_t, tm_t))
    # dlnTm/dlna by finite differences on the grid
    lnT = jnp.log(jnp.maximum(tm_g, 1e-10))
    lnA = jnp.log(a_g)
    dlnT = jnp.gradient(lnT, lnA)
    xe_g = jnp.where(z_g > 9000.0, 1.0 + 2.0 * fHe, jnp.interp(z_g, z_t, xe_tot))
    mu_b = 1.0 / (1.0 - (1.0 - 1.0 / const.mass_ratio_He_H) * yhe
                  + xe_g * (1.0 - yhe))
    csqb = (const.k_B * tm_g / (mu_b * const.m_H * const.c ** 2)
            * (1.0 - dlnT / 3.0))

    return ThermoFuncs(tau_grid, a_g, opac_g, expmk, vis, csqb), tau0


def _grho_terms(bg: BackgroundParams, a):
    """8 pi G a^2 rho_i in Mpc^-2 for each species.

    Returns (grho_g, grho_n, grho_num, gpres_num, grho_c, grho_b, grho_de,
    grho_k): grho_n is the MASSLESS neutrino part only; grho_num/gpres_num
    are the EXACT massive-eigenstate density/pressure from the tabulated
    momentum integrals (neutrino.nu_rho/nu_pres, the camb/modules.f90
    Nu_rho analog). Using the exact massive background inside the
    perturbation constraints matters even when the perturbation SHAPE is
    approximated as massless: the radiation-scaled massive density is
    ~40x low at z=0, and the resulting H(a) inconsistency drove a
    measured +2% artificial late-ISW excess at l=2-10."""
    from cosmomc_tpu.models.neutrino import nu_rho, nu_pres
    d = _densities(bg)
    C = 3.0 * H100_MPC ** 2
    grho_g = C * d["ogh2"] / a ** 2
    grho_n = C * d["onu1"] * d["massless_deg"] / a ** 2
    gml = C * d["onu1"] * d["massive_deg"] / a ** 2  # massless-equivalent
    am = a * d["nu_mass"]
    grho_num = gml * nu_rho(am)
    gpres_num = gml * nu_pres(am)
    grho_c = C * bg.omch2 / a
    grho_b = C * bg.ombh2 / a
    grho_de = C * d["omdeh2"] * a ** (2.0 - 3.0 * (1.0 + bg.w + bg.wa)) \
        * jnp.exp(-3.0 * bg.wa * (1.0 - a))
    grho_k = C * d["omkh2"]      # curvature (a^0 in a^2 rho units... a^2*a^-2)
    return grho_g, grho_n, grho_num, gpres_num, grho_c, grho_b, grho_de, grho_k


def make_rhs(bg: BackgroundParams, tf: ThermoFuncs, rsa_ktau: float = RSA_KTAU,
             massive_nu: bool = False, de_perts: bool = False):
    """Returns rhs(tau, y, k) -> (dy/dtau, aux dict) for vmapped use.

    `massive_nu` enables the momentum-sampled massive-neutrino hierarchy
    (exact massive background + perturbed stress-energy in the Einstein
    constraints); `de_perts` enables the c_s^2=1 dark-energy fluid. Both
    are STATIC switches that extend the state layout (see extra_state)."""
    dtype = tf.tau.dtype
    i_nu = NVAR
    i_de = NVAR + (NVAR_NU if massive_nu else 0)
    nu_q = jnp.asarray(_NU_Q, dtype)
    nu_wn = jnp.asarray(_NU_WNORM, dtype)
    nu_dlnf = jnp.asarray(_NU_DLNF, dtype)

    def interp(tab, tau):
        return jnp.interp(tau, tf.tau, tab)

    # local grid spacing, for the resolution-aware TCA release below
    dtau_tab = jnp.concatenate([jnp.diff(tf.tau), jnp.diff(tf.tau)[-1:]])

    def rhs(tau, y, k):
        a = interp(tf.a, tau)
        opac = interp(tf.opac, tau)
        csqb = interp(tf.csqb, tau)
        grho_g, grho_n, grho_num, gpres_num, grho_c, grho_b, grho_de, \
            grho_k = _grho_terms(bg, a)
        d_bg = _densities(bg)
        if massive_nu:
            # massless part keeps the F hierarchy; the massive eigenstate
            # gets the quadrature background factors consistent with the
            # Psi_l(q) sums below (same 4-node measure)
            C3 = 3.0 * H100_MPC ** 2
            gml = C3 * d_bg["onu1"] * d_bg["massive_deg"] / a ** 2
            am = a * d_bg["nu_mass"]
            eps_q = jnp.sqrt(nu_q ** 2 + am ** 2)              # (NQ,)
            rho_fac = jnp.sum(nu_wn * eps_q / nu_q)            # = nu_rho(am)
            p_fac = jnp.sum(nu_wn * nu_q / eps_q)
            grho_m = gml * rho_fac
            gpres_m = gml * p_fac / 3.0
        else:
            # small-mnu default: treat the massive eigenstate as massless
            # radiation CONSISTENTLY (background H inside the rhs AND the
            # perturbed stress-energy). Measured on the l=2-10 late-ISW
            # bands at mnu=0.06 eV: this self-consistent system errs +4.4%
            # on TT 2-10, while 'improving' only the background to the
            # exact massive rho/p (keeping either perturbation weighting)
            # errs -8% or +5.4% — the partial fixes break the perturbed
            # conservation law and do worse than the consistent massless
            # limit. The full momentum hierarchy (massive_nu=True, +2.1%
            # residual dominated by other low-l terms) engages when mnu is
            # sampled; for fixed 0.06 eV the l<=10 error is far below
            # cosmic variance.
            C3 = 3.0 * H100_MPC ** 2
            gml_rad = C3 * d_bg["onu1"] * d_bg["massive_deg"] / a ** 2
            grho_m = gml_rad
            gpres_m = gml_rad / 3.0
        grho = grho_g + grho_n + grho_m + grho_c + grho_b + grho_de
        adotoa = jnp.sqrt((grho + grho_k) / 3.0)          # conformal H = a'/a
        w_de = bg.w + bg.wa * (1.0 - a)
        gpres = (grho_g + grho_n) / 3.0 + gpres_m + w_de * grho_de

        eta = y[_I_ETA]
        dc, db, tb = y[_I_DC], y[_I_DB], y[_I_TB]
        dg, tg = y[_I_DG], y[_I_TG]
        fg = y[_I_FG2:_I_FG2 + (LMAXG - 1)]     # F_2..F_LMAXG
        gp = y[_I_GP0:_I_GP0 + (LMAXGP + 1)]    # G_0..G_LMAXGP
        dn, tn = y[_I_DN], y[_I_TN]
        fn = y[_I_FN2:_I_FN2 + (LMAXNR - 1)]

        k2 = k * k
        tau_safe = jnp.maximum(tau, 1e-10)

        # ---- tight coupling switch (per k, per time) ----
        # stay tight-coupled until BOTH the TCA error parameter k*tauc has
        # grown past ~0.015 AND the coupled-system stiffness opac*(1+R) is
        # below what the shared grid resolves (see build_thermo_funcs);
        # forced-late release costs (k tauc)^2 ~ 1e-3 accuracy on the worst
        # lanes, far cheaper than the ~20k extra grid steps early release
        # would demand of an explicit integrator
        tauc = 1.0 / jnp.maximum(opac, 1e-30)
        R_bg = (4.0 / 3.0) * grho_g / grho_b
        # radiation streaming approximation: slave photons+neutrinos to the
        # metric once k*tau is large (reference equations_ppf.f90:1428-1452,
        # RSA of arXiv:1104.2933). Lanes still opaque at k*tau>rsa_ktau
        # (k >~ 1/Mpc, pre-recombination) are force-slaved — a documented
        # few-percent approximation on delta_b at k >~ 1/Mpc, irrelevant for
        # C_l (kmax=0.45) and small for P(k) (Silk-damped modes).
        rsa = k * tau >= rsa_ktau
        # release from TCA only where the LOCAL grid step resolves the
        # released photon-baryon stiffness: lam*dtau <= 1.3 (the grid
        # builder targets 1.2/lam wherever lam <= TC_LAM_MAX, so on the
        # full-size grid this matches the lam <= TC_LAM_MAX criterion; on
        # coarse smoke/test grids it automatically keeps lanes tight-
        # coupled where explicit RK4 would blow up — releasing on a
        # resolution the grid doesn't have produced NaN sources at
        # n_step=1024 after the opac*tau release was added)
        dt_loc = interp(dtau_tab, tau)
        lam = opac * (1.0 + R_bg)
        tc_off = jnp.logical_and(
            jnp.logical_or(k * tauc >= TC_KTAUC,
                           opac * tau <= TC_OPACTAU),
            lam * dt_loc <= 1.3)
        tc_on = jnp.logical_and(jnp.logical_not(tc_off),
                                jnp.logical_not(rsa))

        # ---- RSA slaved values (from matter-only metric sources) ----
        dgrho_m = grho_c * dc + grho_b * db
        z_rsa = (0.5 * dgrho_m / k + k * eta) / adotoa
        dz_rsa = -adotoa * z_rsa - 0.5 * dgrho_m / k
        dn_rsa = -4.0 * dz_rsa / k
        tn_rsa = -k * z_rsa
        dg_rsa = dn_rsa - (4.0 / k) * opac * (tb / k + z_rsa)
        tg_rsa = -k * z_rsa
        dg = jnp.where(rsa, dg_rsa, dg)
        tg = jnp.where(rsa, tg_rsa, tg)
        dn = jnp.where(rsa, dn_rsa, dn)
        tn = jnp.where(rsa, tn_rsa, tn)

        # ---- extended-sector perturbed stress-energy ----
        # The shared tau grid resolves oscillation frequencies only up to
        # min(k, rsa_ktau/tau) (lanes beyond are RSA-slaved). The massive
        # hierarchy while still RELATIVISTIC (am < ~2) streams at ~k like a
        # massless species, and the cs^2=1 DE fluid oscillates at ~k — both
        # must be slaved past the RSA boundary or the explicit stepper
        # blows up. Once non-relativistic (am >~ 2) the nu frequencies are
        # suppressed by q/eps and full evolution is stable.
        if massive_nu:
            psi_nu = y[i_nu:i_nu + NVAR_NU].reshape(NQ_NU, LMAXNU + 1)
            # freeze/slave the momentum hierarchy past the RSA boundary
            # while relativistic (am < 2, streaming at ~k like massless)
            # AND whenever the local grid step cannot resolve the
            # (q/eps) k streaming frequency even non-relativistically
            # (q/eps <= 1, so k*dtau <= 0.9 is the resolvable criterion;
            # without it the wide matter-power grid (kmax=8, late dtau=5)
            # blew up the unfrozen non-relativistic hierarchy to NaN)
            nu_rel_rsa = jnp.logical_and(
                rsa, jnp.logical_or(am < 2.0, k * dt_loc > 0.9))
            # MB95 eq 55 momentum integrals on the Gauss nodes; under
            # relativistic RSA the species tracks the massless one
            dgrho_m = jnp.where(
                nu_rel_rsa, gml * dn_rsa,
                gml * jnp.sum(nu_wn * (eps_q / nu_q) * psi_nu[:, 0]))
            dgq_m = jnp.where(
                nu_rel_rsa, (4.0 / 3.0) * gml * tn_rsa,
                gml * k * jnp.sum(nu_wn * psi_nu[:, 1]))
            dgpi_m = jnp.where(
                nu_rel_rsa, 0.0,
                (2.0 / 3.0) * gml * jnp.sum(
                    nu_wn * (nu_q / eps_q) * psi_nu[:, 2]))
        else:
            # radiation-equivalent perturbation weights on the massless
            # hierarchy shape (dn/tn already carry the RSA slaving above)
            wnu_m = (4.0 / 3.0) * gml_rad
            dgrho_m = gml_rad * dn
            dgq_m = wnu_m * tn
            dgpi_m = wnu_m * jnp.where(rsa, 0.0, fn[0] / 2.0)
        if de_perts:
            de_delta = y[i_de]
            de_V = y[i_de + 1]
            # smooth (cs^2=1) DE clusters only near/above the horizon; past
            # the RSA boundary its perturbations are negligible and frozen
            de_off = rsa
            dgrho_de = jnp.where(de_off, 0.0, grho_de * de_delta)
            dgq_de = jnp.where(de_off, 0.0, grho_de * de_V)
        else:
            dgrho_de = dgq_de = 0.0

        # ---- metric constraints (MB95 eq 21a,b) ----
        dgrho = (grho_c * dc + grho_b * db + grho_g * dg + grho_n * dn
                 + dgrho_m + dgrho_de)
        hdot = (2.0 * k2 * eta + dgrho) / adotoa
        dgq = ((4.0 / 3.0) * (grho_g * tg + grho_n * tn) + grho_b * tb
               + dgq_m + dgq_de)
        etadot = 0.5 * dgq / k2

        # ---- photon shear / polarization: evolved or TCA-slaved ----
        # TCA quasi-equilibrium (from F2/G0/G2 balance incl. metric sources):
        # F2 = (4/3) tauc [(8/15) tg + (4/15) hdot + (8/5) etadot]
        fg2_tca = (4.0 / 3.0) * tauc * ((8.0 / 15.0) * tg
                                        + (4.0 / 15.0) * hdot
                                        + (8.0 / 5.0) * etadot)
        fg2_eff = jnp.where(rsa, 0.0, jnp.where(tc_on, fg2_tca, fg[0]))
        sigma_g = fg2_eff / 2.0
        sigma_n = jnp.where(rsa, 0.0, fn[0] / 2.0)
        pol_term = jnp.where(rsa, 0.0,
                             jnp.where(tc_on, 2.5 * fg2_tca,
                                       fg[0] + gp[0] + gp[2]))

        # anisotropic stress sum: 8 pi G a^2 (rho+p) sigma
        dgpi = (4.0 / 3.0) * (grho_g * sigma_g + grho_n * sigma_n) + dgpi_m

        # ---- baryon/photon velocities ----
        R = (4.0 / 3.0) * grho_g / grho_b      # 4 rho_g / (3 rho_b)
        # full equations
        tbdot_full = -adotoa * tb + csqb * k2 * db + R * opac * (tg - tb)
        tgdot_full = k2 * (dg / 4.0 - sigma_g) + opac * (tb - tg)
        # TCA leading order: common acceleration of the coupled fluid
        tbdot_tca = (-adotoa * tb + csqb * k2 * db
                     + R * k2 * (dg / 4.0 - sigma_g)) / (1.0 + R)
        # under RSA drop the opacity (photon drag) term in the baryon
        # velocity (reference equations_ppf.f90:2212 comment)
        tbdot_rsa = -adotoa * tb + csqb * k2 * db
        tbdot = jnp.where(rsa, tbdot_rsa,
                          jnp.where(tc_on, tbdot_tca, tbdot_full))
        tgdot = jnp.where(rsa, 0.0, jnp.where(tc_on, tbdot_tca, tgdot_full))

        # ---- densities ----
        dgdot = jnp.where(rsa, 0.0, -(4.0 / 3.0) * tg - (2.0 / 3.0) * hdot)
        dbdot = -tb - 0.5 * hdot
        dcdot = -0.5 * hdot
        dndot = jnp.where(rsa, 0.0, -(4.0 / 3.0) * tn - (2.0 / 3.0) * hdot)
        tndot = jnp.where(rsa, 0.0, k2 * (dn / 4.0 - sigma_n))

        # ---- photon temperature hierarchy F_2..F_LMAXG (MB95 eq 63) ----
        f1 = 4.0 * tg / (3.0 * k)
        fg_prev = jnp.concatenate([jnp.array([f1], dtype), fg[:-1]])
        fg_next = jnp.concatenate([fg[1:], jnp.zeros((1,), dtype)])
        ls_g = jnp.arange(2, LMAXG + 1, dtype=dtype)
        fgdot = (k / (2 * ls_g + 1)) * (ls_g * fg_prev - (ls_g + 1) * fg_next) \
            - opac * fg
        fg2dot = (8.0 / 15.0) * tg - (3.0 / 5.0) * k * fg[1] \
            + (4.0 / 15.0) * hdot + (8.0 / 5.0) * etadot \
            - opac * (0.9 * fg[0] - 0.1 * (gp[0] + gp[2]))
        fgdot = fgdot.at[0].set(fg2dot)
        fgdot = fgdot.at[-1].set(
            k * fg[-2] - (LMAXG + 1) / tau_safe * fg[-1] - opac * fg[-1])

        # ---- photon polarization hierarchy G_0..G_LMAXGP (MB95 eq 64) ----
        gp_prev = jnp.concatenate([jnp.zeros((1,), dtype), gp[:-1]])
        gp_next = jnp.concatenate([gp[1:], jnp.zeros((1,), dtype)])
        ls_p = jnp.arange(0, LMAXGP + 1, dtype=dtype)
        gpdot = (k / (2 * ls_p + 1)) * (ls_p * gp_prev - (ls_p + 1) * gp_next) \
            - opac * gp
        gpdot = gpdot.at[0].add(opac * 0.5 * pol_term)
        gpdot = gpdot.at[2].add(opac * 0.1 * pol_term)
        gpdot = gpdot.at[-1].set(
            k * gp[-2] - (LMAXGP + 1) / tau_safe * gp[-1] - opac * gp[-1])

        # in deep TC (and under RSA), freeze the hierarchies: the -opac F_l
        # terms would be explicitly unstable in TC, and under RSA the k F_l
        # streaming terms exceed the grid resolution; slaved values are
        # supplied through fg2_eff/pol_term above
        frozen = jnp.logical_or(tc_on, rsa)
        fgdot = jnp.where(frozen, jnp.zeros_like(fgdot), fgdot)
        gpdot = jnp.where(frozen, jnp.zeros_like(gpdot), gpdot)

        # ---- massless neutrino hierarchy ----
        f1n = 4.0 * tn / (3.0 * k)
        fn_prev = jnp.concatenate([jnp.array([f1n], dtype), fn[:-1]])
        fn_next = jnp.concatenate([fn[1:], jnp.zeros((1,), dtype)])
        ls_n = jnp.arange(2, LMAXNR + 1, dtype=dtype)
        fndot = (k / (2 * ls_n + 1)) * (ls_n * fn_prev - (ls_n + 1) * fn_next)
        fn2dot = (8.0 / 15.0) * tn - (3.0 / 5.0) * k * fn[1] \
            + (4.0 / 15.0) * hdot + (8.0 / 5.0) * etadot
        fndot = fndot.at[0].set(fn2dot)
        fndot = fndot.at[-1].set(
            k * fn[-2] - (LMAXNR + 1) / tau_safe * fn[-1])
        fndot = jnp.where(rsa, jnp.zeros_like(fndot), fndot)

        parts = [jnp.stack([etadot, dcdot, dbdot, tbdot, dgdot, tgdot]),
                 fgdot, gpdot,
                 jnp.stack([dndot, tndot]), fndot]

        dgpidot_extra = jnp.zeros((), dtype)
        if massive_nu:
            # MB95 eq 57 per momentum node (vectorized over q and l)
            qke = (nu_q / eps_q) * k                     # (NQ,)
            psid = jnp.zeros_like(psi_nu)
            psid = psid.at[:, 0].set(
                -qke * psi_nu[:, 1] + (hdot / 6.0) * nu_dlnf)
            psid = psid.at[:, 1].set(
                (qke / 3.0) * (psi_nu[:, 0] - 2.0 * psi_nu[:, 2]))
            psid = psid.at[:, 2].set(
                (qke / 5.0) * (2.0 * psi_nu[:, 1] - 3.0 * psi_nu[:, 3])
                - (hdot / 15.0 + 2.0 * etadot / 5.0) * nu_dlnf)
            for ll in range(3, LMAXNU):
                psid = psid.at[:, ll].set(
                    (qke / (2.0 * ll + 1.0))
                    * (ll * psi_nu[:, ll - 1] - (ll + 1.0) * psi_nu[:, ll + 1]))
            # truncation (MB95 eq 58 closure)
            psid = psid.at[:, LMAXNU].set(
                qke * psi_nu[:, LMAXNU - 1]
                - (LMAXNU + 1.0) / tau_safe * psi_nu[:, LMAXNU])
            # freeze relativistic-RSA lanes (contributions slaved above)
            psid = jnp.where(nu_rel_rsa, jnp.zeros_like(psid), psid)
            parts.append(psid.reshape(-1))
            # d/dtau of the massive anisotropic-stress sum (for psidot/ISW):
            # d[gml (q/eps) Psi2] with gml' = -2 aH gml and
            # (q/eps)' = -q am^2 aH / eps^3
            dgpidot_extra = jnp.where(nu_rel_rsa, 0.0, (2.0 / 3.0) * gml
                                      * jnp.sum(
                nu_wn * ((nu_q / eps_q) * psid[:, 2]
                         - (nu_q * am ** 2 * adotoa / eps_q ** 3
                            + 2.0 * adotoa * nu_q / eps_q) * psi_nu[:, 2])))
        if de_perts:
            # c_s^2 = 1 fluid in synchronous gauge, V = (1+w) theta form;
            # 1/(1+w) Tikhonov-regularized near the w = -1 crossing
            wp = -bg.wa * a * adotoa                      # dw/dtau
            opw = 1.0 + w_de
            rinv = opw / (opw * opw + 1e-4)
            de_ddot = (-de_V - opw * 0.5 * hdot
                       - 3.0 * adotoa * (1.0 - w_de) * de_delta
                       - (9.0 * adotoa ** 2 * (1.0 - w_de)
                          + 3.0 * adotoa * wp * rinv) * de_V / k2)
            de_Vdot = 2.0 * adotoa * de_V + k2 * de_delta + wp * rinv * de_V
            # frozen past the RSA boundary (see de_off above)
            de_ddot = jnp.where(de_off, 0.0, de_ddot)
            de_Vdot = jnp.where(de_off, 0.0, de_Vdot)
            parts.append(jnp.stack([de_ddot, de_Vdot]))

        dy = jnp.concatenate(parts)

        # sigma' values for psi' (ISW): from the evolved/TCA derivative
        sigg_dot = jnp.where(frozen, jnp.zeros_like(fg2dot), fg2dot) / 2.0
        sign_dot = jnp.where(rsa, jnp.zeros_like(fn2dot), fn2dot) / 2.0
        # effective massless-pattern neutrino weight for the psidot (ISW)
        # derivative in sources_at: in massless-shape mode the massive
        # eigenstate's (rho+p) sigma_n rides the same (4/3) grho_n pattern
        # (its weight derivative uses the radiation rule — the O(am')
        # error sits on a term that is itself a tiny share of psidot)
        grho_n_isw = grho_n if massive_nu else grho_n + gml_rad
        aux = dict(a=a, adotoa=adotoa, hdot=hdot, etadot=etadot, dgpi=dgpi,
                   opac=opac, grho=grho, gpres=gpres,
                   sigma_g=sigma_g, sigma_n=sigma_n,
                   sigg_dot=sigg_dot, sign_dot=sign_dot,
                   grho_g=grho_g, grho_n=grho_n_isw, grho_b=grho_b,
                   grho_c=grho_c, tbdot=tbdot, pol_term=pol_term,
                   dgpidot_extra=dgpidot_extra)
        return dy, aux

    return rhs


def adiabatic_ics(bg: BackgroundParams, tf: ThermoFuncs, k, tau,
                  massive_nu: bool = False, de_perts: bool = False,
                  iso_cdm_amp=0.0):
    """MB95 eq (96) adiabatic initial conditions (C=1), synchronous gauge,
    plus an optional totally-correlated CDM-ISOCURVATURE admixture with
    amplitude `iso_cdm_amp` = sign(alpha)*sqrt(|alpha|/(1-|alpha|)) (the
    reference's alpha1 parameter mapping, Calculator_CAMB.f90:109-111;
    mode series from the published Bucher-Moodley-Turok forms as tabulated
    in camb/equations_ppf.f90 `initial`, converted to MB95 variables via
    the per-variable adiabatic correspondence). With massive_nu, the
    Psi_l(q) nodes follow MB95 eq (98) from the combined fluid moments;
    DE fluid perturbations start at zero."""
    dtype = jnp.asarray(k).dtype
    d = _densities(bg)
    grho_g = d["ogh2"]
    grho_n = d["onu1"] * (d["massless_deg"] + d["massive_deg"])
    Rnu = grho_n / (grho_g + grho_n)
    kt = k * tau
    C = jnp.asarray(1.0, dtype)
    y = jnp.zeros((NVAR + extra_state(massive_nu, de_perts),), dtype)
    dg = -(2.0 / 3.0) * C * kt ** 2
    theta = -(C / 18.0) * k * kt ** 3
    theta_n = theta * (23.0 + 4.0 * Rnu) / (15.0 + 4.0 * Rnu)
    fn2 = 2.0 * (2.0 * C * kt ** 2 / (3.0 * (15.0 + 4.0 * Rnu)))
    eta = 2.0 * C - C * (5.0 + 4.0 * Rnu) / (6.0 * (15.0 + 4.0 * Rnu)) \
        * kt ** 2
    dc = 0.75 * dg
    db = 0.75 * dg
    dn = dg
    tb = theta
    b = jnp.asarray(iso_cdm_amp, dtype)
    if not (isinstance(iso_cdm_amp, float) and iso_cdm_amp == 0.0):
        # CDM-iso mode in our units (leading series in omega*tau and
        # k*tau; omega = matter/radiation transition rate 1/Mpc)
        om = 3.0 * H100_MPC * (bg.ombh2 + bg.omch2) \
            / jnp.sqrt(3.0 * (grho_g + grho_n))
        Rc = bg.omch2 / (bg.ombh2 + bg.omch2)
        Rv = Rnu
        ot = om * tau
        dgi = Rc * ot * (4.0 / 3.0 - 0.5 * ot)
        dc = dc + b * (-2.0 + 0.75 * dgi)
        db = db + b * 0.75 * dgi
        dg = dg + b * dgi
        dn = dn + b * dgi
        ti = Rc * k * ot * kt / 6.0
        tb = tb + b * ti
        theta = theta + b * ti
        theta_n = theta_n + b * ti
        fn2 = fn2 + b * (Rc * ot * kt ** 2 / (3.0 * (2.0 * Rv + 15.0)))
        eta = eta + b * (Rc * ot * (1.0 / 3.0 - ot / 8.0))
    y = y.at[_I_DG].set(dg)
    y = y.at[_I_DC].set(dc)
    y = y.at[_I_DB].set(db)
    y = y.at[_I_DN].set(dn)
    y = y.at[_I_TG].set(theta)
    y = y.at[_I_TB].set(tb)
    y = y.at[_I_TN].set(theta_n)
    y = y.at[_I_FN2].set(fn2)
    y = y.at[_I_ETA].set(eta)
    if massive_nu:
        # MB95 eq 98: Psi_0 = -(1/4) delta_nu dlnf0/dlnq, Psi_1 =
        # -(eps/3qk) theta_nu dlnf, Psi_2 = -(1/2) sigma_nu dlnf; the
        # relativistic start has eps = q, delta/theta/sigma equal to the
        # massless-species values (F_0, theta, F_2/2)
        dlnf = jnp.asarray(_NU_DLNF, dtype)
        psi = jnp.zeros((NQ_NU, LMAXNU + 1), dtype)
        psi = psi.at[:, 0].set(-(0.25 * y[_I_DN]) * dlnf)
        psi = psi.at[:, 1].set(-(y[_I_TN] / (3.0 * k)) * dlnf)
        psi = psi.at[:, 2].set(-(0.25 * fn2) * dlnf)
        y = y.at[NVAR:NVAR + NVAR_NU].set(psi.reshape(-1))
    return y


def measure_curvature(bg: BackgroundParams, tf: ThermoFuncs, y, k, tau):
    """Comoving curvature R = eta - (a'/a) * sum (rho+p) theta / (k^2 sum(rho+p))."""
    a = jnp.interp(tau, tf.tau, tf.a)
    grho_g, grho_n, grho_num, gpres_num, grho_c, grho_b, grho_de, grho_k = \
        _grho_terms(bg, a)
    grho = grho_g + grho_n + grho_num + grho_c + grho_b + grho_de
    adotoa = jnp.sqrt((grho + grho_k) / 3.0)
    wnu = (4.0 / 3.0) * grho_n + grho_num + gpres_num
    num = (4.0 / 3.0) * grho_g * y[_I_TG] + wnu * y[_I_TN] \
        + grho_b * y[_I_TB]
    den = (4.0 / 3.0) * grho_g + wnu + grho_b + grho_c
    return y[_I_ETA] - adotoa * num / (k * k * den)


# ---------------------------------------------------------------------------
# Evolution driver
# ---------------------------------------------------------------------------

IC_RELEASE_KTAU = 0.08


def evolve_perturbations(bg: BackgroundParams, tf: ThermoFuncs,
                         tau0: jnp.ndarray, k: jnp.ndarray,
                         z_outputs: Tuple[float, ...] = (0.0,),
                         rsa_ktau: float = RSA_KTAU,
                         source_opts: dict | None = None,
                         massive_nu: bool = False,
                         de_perts: bool = False,
                         remat_chunks: int = 0,
                         iso_cdm_amp=0.0) -> PerturbationOutput:
    """Evolve all k modes over the shared grid; emit sources per step.

    One `lax.scan` over the tau grid; the state carries all k lanes
    (nk, NVAR [+ extensions]). Lanes are overwritten with analytic
    adiabatic ICs while k*tau < IC_RELEASE_KTAU (exact superhorizon
    evolution), giving per-k start times without control flow — the
    fixed-grid analog of the reference's per-k adaptive integration start
    (cmbmain DoSourcek). `massive_nu`/`de_perts` enable the extended
    sectors (see make_rhs).
    """
    dtype = tf.tau.dtype
    k = jnp.asarray(k, dtype)
    nk = k.shape[0]
    rhs = make_rhs(bg, tf, rsa_ktau, massive_nu=massive_nu,
                   de_perts=de_perts)
    vrhs = jax.vmap(rhs, in_axes=(None, 0, 0))

    taus = tf.tau
    y0 = jax.vmap(lambda kk: adiabatic_ics(bg, tf, kk, taus[0],
                                           massive_nu, de_perts,
                                           iso_cdm_amp))(k)
    # r_init: measured on the PURE-ADIABATIC state even when an
    # isocurvature admixture is evolved — the reference's initial_vector
    # convention scales the mixed transfer by the scalar curvature power
    # with the adiabatic component normalized to the usual amplitude
    # (Calculator_CAMB.f90:830-832), so the normalizer must not see the
    # iso contribution to the comoving curvature.
    y0_ad = y0 if (isinstance(iso_cdm_amp, float) and iso_cdm_amp == 0.0) \
        else jax.vmap(lambda kk: adiabatic_ics(bg, tf, kk, taus[0],
                                              massive_nu, de_perts))(k)
    r_init = jax.vmap(lambda yy, kk: measure_curvature(bg, tf, yy, kk, taus[0])
                      )(y0_ad, k)
    # r_init measured when each lane releases would be ideal; superhorizon
    # conservation makes the initial-time value equivalent at this order.

    def sources_at(tau, y, dy, aux, kk):
        """Newtonian-gauge source functions at a grid node (vectorized in k)."""
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
        # X' : dgpi' with grho_rad' = -2 aH grho_rad
        dgpidot = (4.0 / 3.0) * (
            -2.0 * aux["adotoa"] * (aux["grho_g"] * aux["sigma_g"]
                                    + aux["grho_n"] * aux["sigma_n"])
            + aux["grho_g"] * aux["sigg_dot"] + aux["grho_n"] * aux["sign_dot"]
        ) + aux["dgpidot_extra"]
        psidot = phidot - 1.5 * dgpidot / k2
        # gauge transform (MB95 eq 27): delta_con = delta_syn + alpha rho'/rho
        # with rho'/rho = -4 aH for photons -> Theta0_N = dg/4 - aH alpha
        # (sign validated empirically: the opposite choice destroys the
        # Sachs-Wolfe plateau, >100% low-l TT errors)
        so = source_opts or {}
        theta0_N = y[_I_DG] / 4.0 - so.get("mono_gauge", 1.0) * aux["adotoa"] * alpha
        vb_N = (y[_I_TB] + so.get("vb_gauge", 1.0) * k2 * alpha) / kk
        # pol_term = F_2 + G_0 + G_2 is in MB95 BRIGHTNESS units (F_0 =
        # delta_gamma = 4 Theta_0); the canonical source formulas take the
        # TEMPERATURE-unit polarization Pi = (F_2+G_0+G_2)/4 — same /4 as
        # the monopole dg/4 above. Validated against the reference CAMB
        # source assembly (equations_ppf.f90:1531): CAMB's EE/TT
        # polarization-source ratio is (15/8)/(5/8) = 3, which this
        # normalization reproduces (r4 fix: removed a 1.6% TT-only acoustic
        # dilation caused by the 4x-too-strong TT Pi terms).
        Pi = aux["pol_term"] / 4.0
        s0 = (vis * (theta0_N + so.get("psi_in_s0", 1.0) * psi + Pi / 4.0)
              + so.get("isw", 1.0) * expmk * (phidot + psidot))
        s1 = so.get("doppler", 1.0) * vis * vb_N
        s2 = 0.75 * vis * Pi
        slens = expmk * (phi + psi)
        weyl = 0.5 * (phi + psi)
        return s0, s1, s2, slens, weyl

    def rk4_step(y, tau_a, tau_b, kk):
        dt = tau_b - tau_a
        k1, aux1 = vrhs(tau_a, y, kk)
        k2_, _ = vrhs(tau_a + 0.5 * dt, y + 0.5 * dt * k1, kk)
        k3_, _ = vrhs(tau_a + 0.5 * dt, y + 0.5 * dt * k2_, kk)
        k4_, _ = vrhs(tau_b, y + dt * k3_, kk)
        return y + (dt / 6.0) * (k1 + 2 * k2_ + 2 * k3_ + k4_)

    def step(carry, xs):
        y = carry
        tau_a, tau_b = xs
        y_new = rk4_step(y, tau_a, tau_b, k)
        # hold un-released lanes on analytic ICs. The RD superhorizon ICs
        # are valid only while k*tau << 1 AND deep in radiation domination,
        # so every lane must release well before matter-radiation equality
        # (tau_eq ~ 110 Mpc) — low-k lanes frozen on ICs at recombination
        # would corrupt exactly the modes that source the lowest multipoles.
        ics = jax.vmap(lambda kk: adiabatic_ics(bg, tf, kk, tau_b,
                                                massive_nu, de_perts,
                                                iso_cdm_amp))(k)
        released = jnp.logical_or(k * tau_b >= IC_RELEASE_KTAU,
                                  tau_b >= 3.0)[:, None]
        y_new = jnp.where(released, y_new, ics)
        # emit sources at tau_b
        dy, aux = vrhs(tau_b, y_new, k)
        s0, s1, s2, slens, weyl = jax.vmap(
            sources_at, in_axes=(None, 0, 0, 0, 0))(tau_b, y_new, dy, aux, k)
        wsum = aux["grho_c"] + aux["grho_b"]
        dm = (aux["grho_c"] * y_new[:, _I_DC]
              + aux["grho_b"] * y_new[:, _I_DB]) / wsum
        # grho_c and grho_b both scale exactly as 1/a, so the weights are
        # time-independent and d(dm)/dtau is the weighted derivative
        dmdot = (aux["grho_c"] * dy[:, _I_DC]
                 + aux["grho_b"] * dy[:, _I_DB]) / wsum
        return y_new, (s0, s1, s2, slens, dm, dmdot, weyl)

    n_steps = taus.shape[0] - 1
    if remat_chunks > 0:
        # memory-bounded reverse mode (HMC / full-path gradients): only
        # chunk-boundary states are stored as residuals; each chunk's
        # interior is recomputed on the backward pass (sqrt-style
        # checkpointing; peak ~ (nstep/chunks + chunks) states instead of
        # nstep). Steps are padded with dt=0 no-ops to a chunk multiple.
        chunk = -(-n_steps // remat_chunks)
        npad = chunk * remat_chunks - n_steps
        ta = jnp.concatenate([taus[:-1], jnp.full((npad,), taus[-1], dtype)])
        tb = jnp.concatenate([taus[1:], jnp.full((npad,), taus[-1], dtype)])
        xs = (ta.reshape(remat_chunks, chunk), tb.reshape(remat_chunks, chunk))

        @jax.checkpoint
        def chunk_step(y, xs_chunk):
            return jax.lax.scan(step, y, xs_chunk)

        y_final, outs = jax.lax.scan(chunk_step, y0, xs)
        outs = jax.tree_util.tree_map(
            lambda o: o.reshape((remat_chunks * chunk,) + o.shape[2:])
            [:n_steps], outs)
    else:
        xs = (taus[:-1], taus[1:])
        y_final, outs = jax.lax.scan(step, y0, xs)
    s0, s1, s2, slens, dm_t, dmdot_t, weyl_t = outs   # (nstep-1, nk)

    # prepend the first node (sources ~ 0 deep in TC: vis ~ 0)
    zero = jnp.zeros((1, nk), dtype)
    s0 = jnp.concatenate([zero, s0]).T     # (nk, nstep)
    s1 = jnp.concatenate([zero, s1]).T
    s2 = jnp.concatenate([zero, s2]).T
    slens = jnp.concatenate([zero, slens]).T
    dm_t = jnp.concatenate([zero, dm_t]).T
    dmdot_t = jnp.concatenate([zero, dmdot_t]).T
    weyl_t = jnp.concatenate([zero, weyl_t]).T

    # matter transfer snapshots at z_outputs (interp in tau along the grid)
    lna_tab, tau_tab = _conformal_time_table(bg)
    a_out = jnp.asarray([1.0 / (1.0 + z) for z in z_outputs], dtype)
    tau_out = jnp.interp(jnp.log(a_out), lna_tab, tau_tab)
    def snap(rows):
        return jax.vmap(lambda row: jnp.interp(tau_out, taus, row))(rows)
    dm_z = snap(dm_t)          # (nk, nz)
    dmdot_z = snap(dmdot_t)
    weyl_z = snap(weyl_t)
    # conformal aH at the output times (for growth rates); drop the
    # massive-nu PRESSURE term (index 3) from the density sum
    grhos = _grho_terms(bg, a_out)
    aH_out = jnp.sqrt((grhos[0] + grhos[1] + grhos[2] + grhos[4] + grhos[5]
                       + grhos[6] + grhos[7]) / 3.0)

    norm = r_init
    return PerturbationOutput(
        tau=taus, k=k,
        s0=s0 / norm[:, None], s1=s1 / norm[:, None], s2=s2 / norm[:, None],
        spol=s2 / norm[:, None], slens=slens / norm[:, None],
        delta_m=dm_t[:, -1] / norm,
        r_init=norm, tau0=tau0,
        delta_m_z=(dm_z / norm[:, None]).T,
        growth_tau=taus,
        ddelta_m_z=(dmdot_z / norm[:, None]).T,
        weyl_z=(weyl_z / norm[:, None]).T,
        aH_z=aH_out)
