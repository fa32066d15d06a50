"""Matter power spectrum P(k,z), sigma8(z), f sigma8(z), sigma_R, and the
HALOFIT (Takahashi 2012) nonlinear correction.

TPU-native equivalent of the reference's matter-transfer pipeline:
  - camb/modules.f90 Transfer module (Transfer_GetUnsplinedPower,
    Transfer_Get_SigmaR, Transfer_GetSigmaVdelta8),
  - camb/halofit_ppf.f90 (halofit_default = halofit_takahashi,
    halofit_ppf.f90:56),
  - source/CosmoTheory.f90 TCosmoTheoryPK interpolators with log-linear
    extrapolation to extrap_kmax (CosmoTheory.f90:103-132).

Everything is a pure jit-able function: the Boltzmann transfers come from
`evolve_perturbations` on a wide k grid (RSA makes high-k lanes cheap, see
perturbations.RSA_KTAU); the nonlinear correction is a vectorized
fixed-iteration bisection + closed-form fit, no data-dependent control
flow.

Known approximations (documented, revisit in later rounds): massive
neutrinos enter the background exactly but stream like massless species in
the perturbations, and P(k) is the CDM+baryon power (the nu contribution
to delta_tot is O(f_nu) ~ 0.4% for mnu=0.06 eV).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams, _densities
from cosmomc_tpu.models.perturbations import (build_thermo_funcs,
                                              evolve_perturbations,
                                              _grho_terms)
from cosmomc_tpu.models.primordial import PrimordialParams, scalar_power

# reference CosmoTheory.f90:20 (extrap_kmax read per-likelihood, default
# used by MPK/WL setups); log-linear extrapolation above computed kmax
EXTRAP_KMAX = 700.0


def matter_k_grid(kmax: float = 8.0, kmin: float = 1e-4,
                  nk_log_lo: int = 40, nk_lin: int = 120,
                  nk_log_hi: int = 56, k_lin_lo: float = 0.012,
                  k_lin_hi: float = 0.35) -> np.ndarray:
    """k grid (1/Mpc) for matter transfers: log through horizon scales,
    linear through the BAO wiggles (~8 points per wiggle period), log to
    kmax (transfer is smooth there)."""
    lo = np.exp(np.linspace(np.log(kmin), np.log(k_lin_lo), nk_log_lo,
                            endpoint=False))
    mid = np.linspace(k_lin_lo, k_lin_hi, nk_lin, endpoint=False)
    hi = np.exp(np.linspace(np.log(k_lin_hi), np.log(kmax), nk_log_hi))
    return np.concatenate([lo, mid, hi])


class MatterPower(NamedTuple):
    """P(k,z) tables; z ascending, k ascending (1/Mpc), P in Mpc^3."""
    k: jnp.ndarray           # (nk,)
    z: jnp.ndarray           # (nz,)
    lnP: jnp.ndarray         # (nz, nk) linear ln P_m
    lnP_nl: jnp.ndarray      # (nz, nk) nonlinear (halofit) ln P_m
    lnP_weyl: jnp.ndarray    # (nz, nk) ln P of k^2 (phi+psi)/2  [Mpc^3 * Mpc^-4... stored as-is]
    sigma8_z: jnp.ndarray    # (nz,)
    fsigma8_z: jnp.ndarray   # (nz,)  sigma^2_vd / sigma_dd at R=8/h Mpc
    h: jnp.ndarray           # H0/100


def _power_from_transfer(pp: PrimordialParams, k, transfer):
    """P(k) = (2 pi^2 / k^3) P_R(k) T(k)^2, T normalized to unit comoving
    curvature (transfer rows are delta/R from PerturbationOutput)."""
    return (2.0 * jnp.pi ** 2) / k ** 3 * scalar_power(pp, k) * transfer ** 2


def _sigma_tophat(k, delta2, R):
    """sigma^2(R) = int dlnk Delta^2(k) W^2(kR), tophat window.
    delta2: (..., nk) dimensionless power; R scalar or (...)."""
    x = k * R
    # stable small-x form of 3 j1(x)/x
    w = jnp.where(x < 1e-3, 1.0 - x ** 2 / 10.0,
                  3.0 * (jnp.sin(x) - x * jnp.cos(x)) / jnp.maximum(x, 1e-30) ** 3)
    lnk = jnp.log(k)
    integ = delta2 * w ** 2
    return jnp.trapezoid(integ, lnk, axis=-1)


class MatterTransfers(NamedTuple):
    """Primordial-power-independent matter transfers — the slow-stage cache
    feeding `matter_power_from_transfers` (the reference's split between
    CAMB_GetTransfers' MTrans and Transfer_GetUnsplinedPower)."""
    k: jnp.ndarray          # (nk,)
    z: jnp.ndarray          # (nz,) ascending
    delta_m_z: jnp.ndarray  # (nz, nk) matter transfer per unit curvature
    weyl_z: jnp.ndarray     # (nz, nk)
    v_z: jnp.ndarray        # (nz, nk) velocity transfer d delta/d ln a
    h: jnp.ndarray


def compute_matter_transfers(bg: BackgroundParams, tau_reion, yhe,
                             z_outputs: Sequence[float] = (0.0,),
                             k: np.ndarray | None = None,
                             n_step: int = 6144,
                             massive_nu: bool = False,
                             de_perts: bool = False) -> MatterTransfers:
    """SLOW stage: Boltzmann evolution on the wide matter k grid."""
    zs = tuple(float(z) for z in z_outputs)
    assert list(zs) == sorted(zs), "z_outputs must be ascending"
    if k is None:
        k = matter_k_grid()
    kmax = float(np.max(k))
    tf, tau0 = build_thermo_funcs(bg, yhe, tau_reion, n_step=n_step,
                                  kmax=kmax)
    po = evolve_perturbations(bg, tf, tau0, jnp.asarray(k, tf.tau.dtype), zs,
                              massive_nu=massive_nu, de_perts=de_perts)
    v_z = po.ddelta_m_z / po.aH_z[:, None]
    return MatterTransfers(po.k, jnp.asarray(zs, po.k.dtype), po.delta_m_z,
                           po.weyl_z, v_z, bg.H0 / 100.0)


def compute_matter_power(bg: BackgroundParams, pp: PrimordialParams,
                         tau_reion, yhe,
                         z_outputs: Sequence[float] = (0.0,),
                         k: np.ndarray | None = None,
                         n_step: int = 6144,
                         nonlinear: bool = True,
                         massive_nu: bool = False,
                         de_perts: bool = False) -> MatterPower:
    """Full matter-power pipeline: Boltzmann transfers on a wide k grid ->
    linear P(k,z) -> sigma8 / f sigma8 -> halofit nonlinear P.

    z_outputs must be ascending and static (shapes are compile-time).
    massive_nu engages the momentum hierarchy (the ~2 f_nu sigma8
    free-streaming suppression is invisible to the massless default)."""
    mt = compute_matter_transfers(bg, tau_reion, yhe, z_outputs, k, n_step,
                                  massive_nu=massive_nu, de_perts=de_perts)
    return matter_power_from_transfers(bg, pp, mt, nonlinear=nonlinear)


def matter_power_from_transfers(bg: BackgroundParams, pp: PrimordialParams,
                                mt: MatterTransfers,
                                nonlinear: bool = True) -> MatterPower:
    """SEMI-SLOW stage: apply primordial power to cached transfers ->
    P(k,z), sigma8(z), f sigma8(z), halofit."""
    po = mt
    zs = mt.z
    kj = po.k
    h = bg.H0 / 100.0
    # (nz, nk) linear power
    P = jax.vmap(lambda t: _power_from_transfer(pp, kj, t))(po.delta_m_z)
    lnP = jnp.log(jnp.maximum(P, 1e-300))
    # Weyl: P of k^2 (phi+psi)/2 (the reference's MPK_WEYL convention,
    # Calculator_CAMB.f90:465-545 stores k^2-scaled Weyl transfer power)
    Pw = jax.vmap(lambda t: _power_from_transfer(pp, kj, kj ** 2 * t))(po.weyl_z)
    lnPw = jnp.log(jnp.maximum(Pw, 1e-300))

    # sigma8(z) and f sigma8(z) (CAMB Transfer_GetSigmaVdelta8: velocity-
    # density cross spectrum with v = -ddelta/dtau / (aH) ... fsigma8 =
    # sigma^2_vd / sigma_dd)
    R8 = 8.0 / h
    d2 = kj ** 3 / (2.0 * jnp.pi ** 2) * P
    sigma8 = jnp.sqrt(_sigma_tophat(kj, d2, R8))
    # velocity transfer per unit curvature: d delta/d ln a (precomputed in
    # the slow stage as ddelta/dtau / (aH))
    v_z = po.v_z
    Pvd = jax.vmap(lambda d, v: (2.0 * jnp.pi ** 2) / kj ** 3
                   * scalar_power(pp, kj) * d * v)(po.delta_m_z, v_z)
    d2vd = kj ** 3 / (2.0 * jnp.pi ** 2) * Pvd
    sig2_vd = _sigma_tophat(kj, d2vd, R8)
    fsigma8 = sig2_vd / sigma8

    if nonlinear:
        lnP_nl = halofit_takahashi(bg, kj, lnP, jnp.asarray(zs, lnP.dtype))
    else:
        lnP_nl = lnP
    return MatterPower(kj, jnp.asarray(zs, lnP.dtype), lnP, lnP_nl, lnPw,
                       sigma8, fsigma8, jnp.asarray(h))


# ---------------------------------------------------------------------------
# HALOFIT (Takahashi et al. 2012, arXiv:1208.2701) — reference default
# nonlinear model (halofit_ppf.f90:56 halofit_default = halofit_takahashi)
# ---------------------------------------------------------------------------

def _gauss_sigma2(lnk, d2, lnR):
    """sigma^2(R) with Gaussian window exp(-k^2 R^2), plus dln/dlnR
    derivatives via the same quadrature. d2: (nk,), lnR scalar."""
    k = jnp.exp(lnk)
    x2 = (k * jnp.exp(lnR)) ** 2
    w = jnp.exp(-x2)
    s2 = jnp.trapezoid(d2 * w, lnk)
    # dsigma^2/dlnR = int d2 * (-2 x^2) e^{-x^2}
    ds2 = jnp.trapezoid(d2 * (-2.0 * x2) * w, lnk)
    dds2 = jnp.trapezoid(d2 * (4.0 * x2 ** 2 - 4.0 * x2) * w, lnk)
    return s2, ds2, dds2


#: redshift nodes for the CMB-lensing nonlinear scaling (dense at low z
#: where the halofit boost grows; ratio -> 1 above z ~ 10)
LENS_NL_Z = (0.0, 0.25, 0.5, 0.8, 1.2, 1.7, 2.3, 3.0, 4.0, 5.5, 7.5, 10.0)


def lensing_nl_ratio(bg: BackgroundParams, pp_fid, k_coarse: jnp.ndarray,
                     dm_z: jnp.ndarray, z_nodes) -> jnp.ndarray:
    """sqrt(P_NL/P_lin)(k, z) on the SOURCE k grid at `z_nodes` — the
    multiplier CAMB applies to the lensing source before the LOS integral
    (cmbmain.f90 MakeNonlinearSources, NonLinear = NonLinear_Lens: the
    Planck-baseline configuration). `dm_z` are the (nz, nk) matter
    transfers per unit curvature from the CMB evolution; `pp_fid` is a
    FIXED fiducial primordial spectrum — using the sampled As/ns here
    would couple the slow transfer cache to the semi-slow power
    parameters and break the staged-sampler economics (the ratio's
    As-dependence is second order: d(boost)/dlnAs ~ boost-1 ~ few %).

    The sigma^2 integrals need P(k) beyond the source kmax (~0.45):
    the spectrum is extended to k = 8 with a log-linear (power-law) tail
    matched to the mean slope of the last decade — adequate for the
    k_sigma fixed point at the few-percent level of (boost-1)."""
    k_coarse = jnp.asarray(k_coarse)
    dtype = dm_z.dtype
    z = jnp.asarray(z_nodes, dtype)
    P = jax.vmap(lambda t: _power_from_transfer(pp_fid, k_coarse, t))(dm_z)
    lnP = jnp.log(P + 1e-120)    # additive floor: see halofit note
    # power-law tail: slope from the last decade of the coarse grid
    lnk = jnp.log(k_coarse)
    n_tail = 16
    slope = (lnP[:, -1] - lnP[:, -n_tail]) / (lnk[-1] - lnk[-n_tail])
    k_ext_np = np.exp(np.linspace(np.log(1.03), np.log(8.0), 24))
    k_ext = jnp.asarray(k_ext_np, dtype) * k_coarse[-1]
    lnP_ext = lnP[:, -1:] + slope[:, None] * (jnp.log(k_ext) - lnk[-1])[None, :]
    k_all = jnp.concatenate([k_coarse, k_ext])
    lnP_all = jnp.concatenate([lnP, lnP_ext], axis=1)
    lnP_nl = halofit_takahashi(bg, k_all, lnP_all, z)
    nk = k_coarse.shape[0]
    return jnp.exp(0.5 * (lnP_nl[:, :nk] - lnP_all[:, :nk]))


def halofit_takahashi(bg: BackgroundParams, k: jnp.ndarray,
                      lnP_lin: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Nonlinear ln P(k,z) from linear, Takahashi 2012 fit (with the
    Takahashi w0 dark-energy dependence). Vectorized over z; the
    sigma^2(R)=1 scale is found by fixed-count bisection in lnR (no
    data-dependent control flow — jit/TPU friendly)."""
    lnk = jnp.log(k)
    d2_lin = k[None, :] ** 3 / (2.0 * jnp.pi ** 2) * jnp.exp(lnP_lin)

    # background quantities at each z
    a = 1.0 / (1.0 + z)
    grho_g, grho_n, grho_num, gpres_num, grho_c, grho_b, grho_de, grho_k = \
        _grho_terms(bg, a)
    # treat massive nu as matter in Omega_m(z) for the halofit background
    # (CAMB halofit uses omm including nu)
    grho_m = grho_c + grho_b + grho_num
    grho_tot = grho_g + grho_n + grho_m + grho_de + grho_k
    om_m = grho_m / grho_tot
    om_de = grho_de / grho_tot
    w_z = bg.w + bg.wa * (1.0 - a)

    def per_z(d2, omm, omv, wde):
        # --- find k_sigma: sigma^2(1/k_sigma) = 1 (Gaussian filter) ---
        def s2_of(lnR):
            s2, _, _ = _gauss_sigma2(lnk, d2, lnR)
            return s2
        lo = jnp.log(1e-4)   # R in Mpc
        hi = jnp.log(1e3)
        def bis(carry, _):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            grow = s2_of(mid) > 1.0    # sigma^2 decreasing in R
            return (jnp.where(grow, mid, lo), jnp.where(grow, hi, mid)), None
        (lo, hi), _ = jax.lax.scan(bis, (lo, hi), None, length=48)
        lnR = 0.5 * (lo + hi)
        s2, ds2, dds2 = _gauss_sigma2(lnk, d2, lnR)
        # n_eff = -3 - dln sigma^2/dlnR ; C = -d^2 ln sigma^2 / dlnR^2
        dln = ds2 / s2
        # clamp to the fit's physical domain: when the sigma^2 = 1 scale
        # is not bracketed (tiny-kmax smoke configs, very high z) the
        # fixed-count bisection saturates and the raw n_eff/C are garbage
        # that overflows the 10**(...) amplitudes — inf forward values are
        # harmless here (d2h -> 0) but their reverse-mode cotangent chain
        # is 0 * inf = NaN, and f32 overflows outright. The clamps are
        # inactive in the physical regime (n_eff ~ -2.5..-1, C ~ 0.2-1).
        neff = jnp.clip(-3.0 - dln, -3.8, 1.5)
        C = jnp.clip(-(dds2 / s2 - dln ** 2), -3.0, 3.0)
        ksig = jnp.exp(-lnR)

        # --- Takahashi 2012 eqs (A6-A13) ---
        n2, n3, n4 = neff ** 2, neff ** 3, neff ** 4
        an = 10.0 ** (1.5222 + 2.8553 * neff + 2.3706 * n2 + 0.9903 * n3
                      + 0.2250 * n4 - 0.6038 * C + 0.1749 * omv * (1.0 + wde))
        bn = 10.0 ** (-0.5642 + 0.5864 * neff + 0.5716 * n2 - 1.5474 * C
                      + 0.2279 * omv * (1.0 + wde))
        cn = 10.0 ** (0.3698 + 2.0404 * neff + 0.8161 * n2 + 0.5869 * C)
        gam = 0.1971 - 0.0843 * neff + 0.8460 * C
        alpha = jnp.abs(6.0835 + 1.3373 * neff - 0.1959 * n2 - 5.5274 * C)
        beta = (2.0379 - 0.7354 * neff + 0.3157 * n2 + 1.2490 * n3
                + 0.3980 * n4 - 0.1682 * C)
        mu = 0.0
        nu = 10.0 ** (5.2105 + 3.6902 * neff)
        # flat vs open corrections (Takahashi A14; CAMB frac=omv/(1-omm))
        f1a, f2a, f3a = omm ** -0.0732, omm ** -0.1423, omm ** 0.0725
        f1b, f2b, f3b = omm ** -0.0307, omm ** -0.0585, omm ** 0.0743
        frac = omv / jnp.maximum(1.0 - omm, 1e-10)
        f1 = frac * f1b + (1.0 - frac) * f1a
        f2 = frac * f2b + (1.0 - frac) * f2a
        f3 = frac * f3b + (1.0 - frac) * f3a

        y = k / ksig
        fy = y / 4.0 + y ** 2 / 8.0
        d2q = d2 * ((1.0 + d2) ** beta / (1.0 + alpha * d2)) * jnp.exp(-fy)
        d2hp = an * y ** (3.0 * f1) / (1.0 + bn * y ** f2
                                       + (cn * f3 * y) ** (3.0 - gam))
        d2h = d2hp / (1.0 + mu / y + nu / y ** 2)
        d2nl = d2q + d2h
        # additive floor, not max(): the max() floor has derivative
        # 1/floor = 1e300 whenever d2nl underflows (tiny-k or far-tail
        # lattice points), which overflows reverse-mode cotangents to
        # +-inf and poisons the whole gradient; the additive form keeps
        # d log/d d2nl * d d2nl/d p bounded
        return jnp.log((d2nl + 1e-30) * (2.0 * jnp.pi ** 2) / k ** 3)

    return jax.vmap(per_z)(d2_lin, om_m, om_de, w_z)


# ---------------------------------------------------------------------------
# interpolation / evaluation (the reference's TCosmoTheoryPK.PowerAt,
# CosmoTheory.f90:56-77, with log-linear high-k extrapolation :103-132)
# ---------------------------------------------------------------------------

def power_at(mp: MatterPower, kq, zq, nonlinear: bool = False,
             weyl: bool = False):
    """P(kq, zq) by bilinear interpolation in (ln k, z), log-linear
    extrapolated in ln k up to EXTRAP_KMAX. kq in 1/Mpc, P in Mpc^3.
    kq, zq broadcastable arrays."""
    lnPtab = mp.lnP_weyl if weyl else (mp.lnP_nl if nonlinear else mp.lnP)
    lnk = jnp.log(mp.k)
    lnkq = jnp.log(jnp.asarray(kq))
    # clamp into table, remember the overshoot for linear extrapolation
    lnk_hi = lnk[-1]
    over = jnp.maximum(lnkq - lnk_hi, 0.0)
    lnkq_c = jnp.clip(lnkq, lnk[0], lnk_hi)

    # z interpolation weights
    zq = jnp.asarray(zq)
    iz = jnp.clip(jnp.searchsorted(mp.z, zq, side="right") - 1, 0,
                  max(mp.z.shape[0] - 2, 0))
    if mp.z.shape[0] == 1:
        tz = jnp.zeros_like(zq)
        iz = jnp.zeros_like(iz)
        dz_safe = 1.0
    else:
        dz = mp.z[iz + 1] - mp.z[iz]
        dz_safe = jnp.maximum(dz, 1e-10)
        tz = jnp.clip((zq - mp.z[iz]) / dz_safe, 0.0, 1.0)

    # gather the two z rows per query point
    rows = lnPtab  # (nz, nk)
    v0 = jax.vmap(lambda i, q: jnp.interp(q, lnk, rows[i]))(
        jnp.atleast_1d(iz).ravel(), jnp.atleast_1d(lnkq_c).ravel())
    if mp.z.shape[0] == 1:
        v = v0
    else:
        v1 = jax.vmap(lambda i, q: jnp.interp(q, lnk, rows[i + 1]))(
            jnp.atleast_1d(iz).ravel(), jnp.atleast_1d(lnkq_c).ravel())
        v = v0 * (1.0 - jnp.atleast_1d(tz).ravel()) \
            + v1 * jnp.atleast_1d(tz).ravel()
    # log-linear extrapolation: slope from last two k nodes
    slope = (rows[..., -1] - rows[..., -2]) / (lnk[-1] - lnk[-2])
    if mp.z.shape[0] == 1:
        sl = slope[0] * jnp.ones_like(v)
    else:
        sl0 = slope[jnp.atleast_1d(iz).ravel()]
        sl1 = slope[jnp.atleast_1d(iz).ravel() + 1]
        sl = sl0 * (1.0 - jnp.atleast_1d(tz).ravel()) \
            + sl1 * jnp.atleast_1d(tz).ravel()
    v = v + sl * jnp.atleast_1d(over).ravel()
    return jnp.exp(v.reshape(jnp.broadcast_shapes(jnp.shape(kq),
                                                  jnp.shape(zq))))


def sigma_r(mp: MatterPower, R, z_index: int = 0):
    """sigma(R) at table redshift index (tophat window), R in Mpc."""
    d2 = mp.k ** 3 / (2.0 * jnp.pi ** 2) * jnp.exp(mp.lnP[z_index])
    return jnp.sqrt(_sigma_tophat(mp.k, d2, jnp.asarray(R)))
