"""Tensor-mode evolution and C_l^{TT,EE,BB} (primordial gravitational waves).

Replaces the reference's tensor pipeline (camb/equations.f90 tensor
evolution + cmbmain.f90 tensor transfer integration + power_tilt.f90
TensorPower): evolve the tensor metric amplitude h and the photon/neutrino
tensor brightness hierarchies in Polnarev variables, then line-of-sight
integrate against the Zaldarriaga-Seljak (1997) tensor radial functions.

Physics (per comoving wavenumber k, one polarization; conventions of
Seljak & Zaldarriaga 1996/97):

  metric      h'' + 2(a'/a) h' + k^2 h = 16 pi G a^2 (p_g pi_g + p_nu pi_nu)
  photons     Dt' + i k mu Dt = -h' - kappa'(Dt - Psi)
              Dp' + i k mu Dp =       -kappa'(Dp + Psi)
  neutrinos   Dn' + i k mu Dn = -h'
  Psi = Dt0/10 + Dt2/7 + 3 Dt4/70 - 3 Dp0/5 + 6 Dp2/7 - 3 Dp4/70

The anisotropic-stress feedback (the Weinberg 2004 neutrino damping of the
gravitational-wave amplitude) uses the same quadrupole-weight combination;
its coefficient is validated in tests against the exact radiation-era
results h(tau) = 3 j_1(k tau)/(k tau) (no feedback) and the 0.8031
free-streaming damping factor (Weinberg 2004, astro-ph/0306304).

TPU design mirrors the scalar solver (perturbations.py): one fixed shared
tau grid (reusing ThermoFuncs), `where`-switched tensor tight coupling
(deep coupling slaves Psi to -h'/(3 kappa'), derived from the truncated
quasi-static hierarchy), classical RK4 under one `lax.scan`, vmapped over
k lanes — no data-dependent control flow anywhere.

Line of sight (Zaldarriaga & Seljak 1997, Phys.Rev.D 55:1830, tensor
window functions):

  DT_l(k) = sqrt((l+2)!/(l-2)!) int dtau [-h' e^-kappa + g Psi] j_l(x)/x^2
  DE_l(k) = int dtau g Psi [ -j_l + j_l'' + 2 j_l/x^2 + 4 j_l'/x ]
  DB_l(k) = int dtau g Psi [ 2 j_l' + 4 j_l/x ]
  C_l^X   = NORM_X * 4 pi int dlnk P_T(k) |DX_l|^2

with P_T(k) = r A_s (k/k0)^{n_t} the summed-polarization tensor power
(power_tilt.f90 TensorPower convention). NORM_X = 1/16 for every
spectrum, DERIVED from the reference's assembly constant (see the NORM
comment in tensor_cls_from_transfers); the evolution anchors
(radiation-era analytic h, Weinberg 0.8031 damping) pin the dynamics in
tests/test_tensors.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.perturbations import (ThermoFuncs, _grho_terms,
                                              TC_LAM_MAX)
from cosmomc_tpu.models.primordial import PrimordialParams, tensor_power

# hierarchy truncations (photon temperature / polarization / neutrinos)
LMAXT = 16
LMAXTP = 8
LMAXTN = 16

# state layout
_I_HT = 0        # tensor amplitude h
_I_HTP = 1       # h'
_I_DT0 = 2                       # photon intensity Dt_0..Dt_LMAXT
_I_DP0 = _I_DT0 + (LMAXT + 1)    # photon polarization Dp_0..Dp_LMAXTP
_I_DN0 = _I_DP0 + (LMAXTP + 1)   # neutrino Dn_0..Dn_LMAXTN
NVAR_T = _I_DN0 + (LMAXTN + 1)


class TensorOutput(NamedTuple):
    tau: jnp.ndarray      # (nstep,)
    k: jnp.ndarray        # (nk,)
    sT: jnp.ndarray       # (nk, nstep)  -h' e^-kappa + g Psi
    sP: jnp.ndarray       # (nk, nstep)  g Psi
    tau0: jnp.ndarray
    ht: jnp.ndarray = None       # (nk, nstep) metric amplitude (diagnostics)


def tensor_k_grid(kmax: float = 0.065, nk: int = 96,
                  kmin: float = 3e-5) -> np.ndarray:
    """Coarse k grid for tensor sources (BB support is l <~ 700)."""
    return np.exp(np.linspace(np.log(kmin), np.log(kmax), nk))


def _psi_combination(dt, dp):
    """Polnarev source Psi from the truncated hierarchies."""
    return (dt[0] / 10.0 + dt[2] / 7.0 + 3.0 * dt[4] / 70.0
            - 3.0 * dp[0] / 5.0 + 6.0 * dp[2] / 7.0 - 3.0 * dp[4] / 70.0)


def make_tensor_rhs(bg: BackgroundParams, tf: ThermoFuncs,
                    anisotropic_feedback: bool = True):
    """rhs(tau, y, k) -> dy/dtau for one k lane (vmapped by the caller)."""
    dtype = tf.tau.dtype

    def interp(tab, tau):
        return jnp.interp(tau, tf.tau, tab)

    def rhs(tau, y, k):
        a = interp(tf.a, tau)
        opac = interp(tf.opac, tau)
        grho_g, grho_n, grho_num, gpres_num, grho_c, grho_b, grho_de, \
            grho_k = _grho_terms(bg, a)
        grho = grho_g + grho_n + grho_num + grho_c + grho_b + grho_de
        adotoa = jnp.sqrt((grho + grho_k) / 3.0)

        ht, htp = y[_I_HT], y[_I_HTP]
        dt = y[_I_DT0:_I_DT0 + LMAXT + 1]
        dp = y[_I_DP0:_I_DP0 + LMAXTP + 1]
        dn = y[_I_DN0:_I_DN0 + LMAXTN + 1]
        tau_safe = jnp.maximum(tau, 1e-10)

        # tight coupling: while the scattering rate exceeds what the shared
        # grid resolves, slave the photon hierarchy to the quasi-static
        # solution Psi = -h'/(3 kappa') (see module docstring derivation).
        # The release criterion must MATCH the grid-density rule in
        # build_thermo_funcs (lam = opac*(1+R) <= TC_LAM_MAX): the grid only
        # resolves explicit scattering timescales past that point —
        # releasing on opac alone put live -opac*D terms on dt ~ 3 Mpc steps
        # and blew up within a few e-folds.
        R_bg = (4.0 / 3.0) * grho_g / grho_b
        tc_on = opac * (1.0 + R_bg) > TC_LAM_MAX
        psi_tca = -htp / (3.0 * jnp.maximum(opac, 1e-30))
        psi_full = _psi_combination(dt, dp)
        psi = jnp.where(tc_on, psi_tca, psi_full)

        # late-time freeze (the tensor analog of the scalar RSA): once
        # k*tau >> 1 after recombination the hierarchies only matter through
        # the (negligible) radiation stress and the reionization source,
        # which lives at k*tau < ~50 for the l < 20 modes it affects; past
        # k*tau = 240 the truncated hierarchy reflects off lmax on the
        # coarse late-time grid and must be retired.
        rsa = k * tau >= 240.0

        # --- metric: anisotropic-stress feedback from the quadrupole-weight
        # combination of the evolved hierarchies (neutrinos always; photons
        # only once scattering no longer isotropizes them).
        # Coefficient: the free-streaming solution gives the combination
        # D0/10 + D2/7 + 3 D4/70 = -(3/2) int dtau' h' j_2(k dtau)/(k dtau)^2
        # [identity j2(x)/x^2 = (7 j0 + 10 j2 + 3 j4)/105], and Weinberg's
        # damping term (astro-ph/0306304) is 16 pi G a^2 pi =
        # -8 grho int dtau' h' j2/x^2  =>  + (16/3) grho * combination.
        # Validated against the 0.8031 radiation-era damping factor in
        # tests/test_tensors.py.
        if anisotropic_feedback:
            pi_n = (dn[0] / 10.0 + dn[2] / 7.0 + 3.0 * dn[4] / 70.0)
            pi_g = (dt[0] / 10.0 + dt[2] / 7.0 + 3.0 * dt[4] / 70.0)
            pi_g = jnp.where(tc_on, 0.0, pi_g)
            stress = jnp.where(rsa, 0.0,
                               (16.0 / 3.0) * (grho_g * pi_g + grho_n * pi_n))
        else:
            stress = jnp.zeros((), dtype)
        htpp = -2.0 * adotoa * htp - k * k * ht + stress

        # --- photon intensity hierarchy, l = 0..LMAXT
        ls = jnp.arange(0, LMAXT + 1, dtype=dtype)
        dt_prev = jnp.concatenate([jnp.zeros((1,), dtype), dt[:-1]])
        dt_next = jnp.concatenate([dt[1:], jnp.zeros((1,), dtype)])
        dtdot = (k / (2 * ls + 1)) * (ls * dt_prev - (ls + 1) * dt_next) \
            - opac * dt
        dtdot = dtdot.at[0].add(-htp + opac * psi)
        dtdot = dtdot.at[-1].set(
            k * dt[-2] - (LMAXT + 1) / tau_safe * dt[-1] - opac * dt[-1])

        # --- photon polarization hierarchy, l = 0..LMAXTP
        lsp = jnp.arange(0, LMAXTP + 1, dtype=dtype)
        dp_prev = jnp.concatenate([jnp.zeros((1,), dtype), dp[:-1]])
        dp_next = jnp.concatenate([dp[1:], jnp.zeros((1,), dtype)])
        dpdot = (k / (2 * lsp + 1)) * (lsp * dp_prev - (lsp + 1) * dp_next) \
            - opac * dp
        dpdot = dpdot.at[0].add(-opac * psi)
        dpdot = dpdot.at[-1].set(
            k * dp[-2] - (LMAXTP + 1) / tau_safe * dp[-1] - opac * dp[-1])

        # deep TC and post-RSA: freeze the hierarchies (slaved/retired)
        frozen = jnp.logical_or(tc_on, rsa)
        dtdot = jnp.where(frozen, jnp.zeros_like(dtdot), dtdot)
        dpdot = jnp.where(frozen, jnp.zeros_like(dpdot), dpdot)

        # --- neutrinos: free streaming with -h' source
        lsn = jnp.arange(0, LMAXTN + 1, dtype=dtype)
        dn_prev = jnp.concatenate([jnp.zeros((1,), dtype), dn[:-1]])
        dn_next = jnp.concatenate([dn[1:], jnp.zeros((1,), dtype)])
        dndot = (k / (2 * lsn + 1)) * (lsn * dn_prev - (lsn + 1) * dn_next)
        dndot = dndot.at[0].add(-htp)
        dndot = dndot.at[-1].set(
            k * dn[-2] - (LMAXTN + 1) / tau_safe * dn[-1])
        dndot = jnp.where(rsa, jnp.zeros_like(dndot), dndot)

        dy = jnp.concatenate([jnp.stack([htp, htpp]), dtdot, dpdot, dndot])
        return dy, jnp.where(rsa, 0.0, psi)

    return rhs


def evolve_tensors(bg: BackgroundParams, tf: ThermoFuncs, tau0,
                   k: jnp.ndarray, anisotropic_feedback: bool = True,
                   substeps: int = 1) -> TensorOutput:
    """Evolve all tensor k lanes on the shared tau grid; emit LOS sources.

    ICs: h = 1, h' = 0 superhorizon (transfer normalized to the primordial
    amplitude), everything else zero; lanes are held on ICs until
    k*tau > 0.05 (h is exactly constant superhorizon).

    `substeps` sub-cycles each shared-grid step: the late-time grid density
    is tuned to RSA-slaved *scalar* lanes (whose oscillators are retired at
    k*tau > 240), but the tensor metric keeps ringing inside the horizon,
    so its RK4 stability needs k * dt/substeps <~ 2.8. With the production
    thermo grid (kmax 0.5) and tensor kmax 0.065, substeps=4 keeps the
    whole evolution inside the stability region; the tensor system is ~50
    variables x ~100 lanes, so the extra cost is negligible next to the
    scalar solve. With the production tensor grid (kmax 0.065) the shared
    grid's 5 Mpc late-time cap gives k*dt <= 0.33, so substeps=1 suffices;
    raise it only when evolving k lanes beyond ~0.25/Mpc."""
    dtype = tf.tau.dtype
    k = jnp.asarray(k, dtype)
    nk = k.shape[0]
    rhs = make_tensor_rhs(bg, tf, anisotropic_feedback)
    vrhs = jax.vmap(rhs, in_axes=(None, 0, 0))

    taus = tf.tau
    y0 = jnp.zeros((nk, NVAR_T), dtype).at[:, _I_HT].set(1.0)

    def rk4_step(y, tau_a, tau_b):
        dt = tau_b - tau_a
        k1, _ = vrhs(tau_a, y, k)
        k2, _ = vrhs(tau_a + 0.5 * dt, y + 0.5 * dt * k1, k)
        k3, _ = vrhs(tau_a + 0.5 * dt, y + 0.5 * dt * k2, k)
        k4, _ = vrhs(tau_b, y + dt * k3, k)
        return y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    def step(y, xs):
        tau_a, tau_b = xs
        y_new = y
        for s in range(substeps):
            f0 = s / substeps
            f1 = (s + 1) / substeps
            y_new = rk4_step(y_new, tau_a + f0 * (tau_b - tau_a),
                             tau_a + f1 * (tau_b - tau_a))
        # hold superhorizon lanes on ICs (h constant outside the horizon)
        released = (k * tau_b >= 0.05)[:, None]
        y_new = jnp.where(released, y_new, y0)
        _, psi = vrhs(tau_b, y_new, k)
        vis = jnp.interp(tau_b, tf.tau, tf.vis)
        expmk = jnp.interp(tau_b, tf.tau, tf.expmk)
        sT = -y_new[:, _I_HTP] * expmk + vis * psi
        sP = vis * psi
        return y_new, (sT, sP, y_new[:, _I_HT])

    xs = (taus[:-1], taus[1:])
    _yf, (sT, sP, ht) = jax.lax.scan(step, y0, xs)
    zero = jnp.zeros((1, nk), dtype)
    one = jnp.ones((1, nk), dtype)
    sT = jnp.concatenate([zero, sT]).T    # (nk, nstep)
    sP = jnp.concatenate([zero, sP]).T
    ht = jnp.concatenate([one, ht]).T
    return TensorOutput(tau=taus, k=k, sT=sT, sP=sP, tau0=tau0, ht=ht)


class TensorSpectra(NamedTuple):
    """l(l+1)C_l/2pi, dimensionless primordial units (x (T0*1e6)^2 for muK^2)."""
    ls: jnp.ndarray
    tt: jnp.ndarray
    te: jnp.ndarray
    ee: jnp.ndarray
    bb: jnp.ndarray


class TensorTransferCache(NamedTuple):
    """Tensor LOS transfers Delta^X_l(k) — primordial-independent cache
    (split mirrors cls.ClTransferCache; see compute_tensor_cls)."""
    ls: jnp.ndarray
    kf: jnp.ndarray
    wk: jnp.ndarray
    dT: jnp.ndarray
    dE: jnp.ndarray
    dB: jnp.ndarray


def compute_tensor_cls(to: TensorOutput, pp: PrimordialParams,
                       lmax: int = 700, tau0_hint: float = 14700.0,
                       kmax_hint: float = 0.065,
                       points_per_osc: float = 4.0) -> TensorSpectra:
    """LOS integration of the tensor sources (one-shot wrapper)."""
    cache = compute_tensor_transfers(to, lmax=lmax, tau0_hint=tau0_hint,
                                     kmax_hint=kmax_hint,
                                     points_per_osc=points_per_osc)
    return tensor_cls_from_transfers(cache, pp, lmax=lmax)


def compute_tensor_transfers(to: TensorOutput,
                             lmax: int = 700, tau0_hint: float = 14700.0,
                             kmax_hint: float = 0.065,
                             points_per_osc: float = 4.0) -> TensorTransferCache:
    """SLOW stage: tensor sources x Bessel (ZS97 window functions)."""
    from cosmomc_tpu.models.bessel import build_bessel_table, default_l_samples
    from cosmomc_tpu.models.cls import fine_k_grid

    dtype = to.sT.dtype
    ls = [l for l in default_l_samples(lmax)]
    kf = jnp.asarray(fine_k_grid(tau0_hint, kmax_hint, points_per_osc), dtype)
    tab = build_bessel_table(tuple(int(l) for l in ls),
                             kmax_hint * tau0_hint * 1.02 + 10)

    lnk = jnp.log(to.k)
    lnkf = jnp.log(kf)

    def k_interp(S):
        return jax.vmap(lambda col: jnp.interp(lnkf, lnk, col),
                        in_axes=1, out_axes=1)(S)

    ST = k_interp(to.sT)
    SP = k_interp(to.sP)

    taus = to.tau
    tau0 = to.tau0
    dt = jnp.diff(taus)
    wt = jnp.concatenate([dt[:1] / 2, (dt[1:] + dt[:-1]) / 2, dt[-1:] / 2])
    x = kf[:, None] * (tau0 - taus)[None, :]

    dlnk = jnp.diff(lnkf)
    wk = jnp.concatenate([dlnk[:1] / 2, (dlnk[1:] + dlnk[:-1]) / 2,
                          dlnk[-1:] / 2]).astype(dtype)

    STw = ST * wt
    SPw = SP * wt
    jl_tab = jnp.asarray(tab.jl, dtype)
    jlp_tab = jnp.asarray(tab.jlp, dtype)
    inv_dx = 1.0 / tab.dx

    def one_l(il):
        l = jnp.asarray(tab.ls)[il].astype(dtype)
        t = x * inv_dx
        i = jnp.clip(t.astype(jnp.int32), 0, jl_tab.shape[1] - 2)
        f = t - i.astype(dtype)
        jl = jl_tab[il, i] * (1 - f) + jl_tab[il, i + 1] * f
        jp = jlp_tab[il, i] * (1 - f) + jlp_tab[il, i + 1] * f
        xs = jnp.maximum(x, 1e-8)
        jpp = -2.0 * jp / xs + (l * (l + 1) / (xs * xs) - 1.0) * jl
        efac = jnp.sqrt(jnp.maximum((l + 2) * (l + 1) * l * (l - 1), 0.0))
        dT = efac * jnp.sum(STw * jl / (xs * xs), axis=1)
        # ZS97 tensor E/B radial functions
        wE = -jl + jpp + 2.0 * jl / (xs * xs) + 4.0 * jp / xs
        wB = 2.0 * jp + 4.0 * jl / xs
        dE = jnp.sum(SPw * wE, axis=1)
        dB = jnp.sum(SPw * wB, axis=1)
        return dT, dE, dB

    dT, dE, dB = jax.lax.map(one_l, jnp.arange(len(ls)))
    return TensorTransferCache(jnp.asarray(ls, dtype), kf, wk, dT, dE, dB)


def tensor_cls_from_transfers(cache: TensorTransferCache,
                              pp: PrimordialParams,
                              lmax: int = 700) -> TensorSpectra:
    """SEMI-SLOW stage: apply tensor primordial power to cached transfers."""
    from cosmomc_tpu.utils.interp import spline_fit, spline_eval
    dtype = cache.dT.dtype
    wP = (cache.wk * tensor_power(pp, cache.kf)).astype(dtype)
    tts = 4.0 * jnp.pi * jnp.sum(wP * cache.dT * cache.dT, axis=1)
    tes = 4.0 * jnp.pi * jnp.sum(wP * cache.dT * cache.dE, axis=1)
    ees = 4.0 * jnp.pi * jnp.sum(wP * cache.dE * cache.dE, axis=1)
    bbs = 4.0 * jnp.pi * jnp.sum(wP * cache.dB * cache.dB, axis=1)

    ls_f = cache.ls
    fac = ls_f * (ls_f + 1) / (2 * jnp.pi)
    all_l = jnp.arange(2, lmax + 1, dtype=dtype)

    def fill(vals):
        return spline_eval(spline_fit(ls_f, vals), all_l)

    # overall normalization, DERIVED (r5) from the reference's tensor
    # C_l assembly (cmbmain.f90 CalcTensCls: C_l = (pi/4) ctnorm
    # int dlnk P_T Delta^2, with ctnorm = (l+2)!/(l-2)! applied to TT and
    # already inside our dT as efac): our Delta equals CAMB's because
    # (a) Hchi obeys the same h'' + 2H h' + k^2 h = rhopi equation with
    # h(0)=1 ICs and shear = -h'/k (derivst aytprime(2,3)), and (b) the
    # scattering source (15/8) polter == our Polnarev Psi — proven in the
    # tight-coupling limit where both reduce to -h'/(3 kappa')
    # (outputt:47-55: pig = (32/45)(k/opac) shear -> (15/8) polter =
    # -h'/(3 kappa') = our slaved Psi). Hence C_l = (pi/4)/(4 pi) *
    # [4 pi int dlnk P_T dX^2] -> NORM = 1/16 for TT/TE/EE/BB alike
    # (CalcTensCls applies the same dbletmp to E/B without ctnorm, which
    # our dE/dB also omit). The previous 1/(4 pi) anchor was +25.7%.
    NORM = 1.0 / 16.0
    return TensorSpectra(all_l.astype(jnp.int32),
                         NORM * fill(fac * tts),
                         NORM * fill(fac * tes),
                         NORM * fill(fac * ees),
                         NORM * fill(fac * bbs))
