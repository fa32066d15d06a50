"""CMB angular power spectra from line-of-sight source integration.

Replaces camb/cmbmain.f90 SourceToTransfers + ClTransferToCl
(cmbmain.f90:259,478): for each sampled multipole l,

  Delta_Tl(k) = int dtau [ S0 j_l(x) + S1 j_l'(x) + S2 j_l''(x) ]
  Delta_El(k) = int dtau  S2 sqrt((l+2)!/(l-2)!) j_l(x)/x^2
  Delta_Pl(k) = int dtau  SL j_l(x) (chi*-chi)/(chi* chi)   [lensing pot.]
  x = k (tau0 - tau);  j_l'' = -2 j_l'/x + (l(l+1)/x^2 - 1) j_l

  C_l^XY = 4 pi int dlnk P_R(k) Delta_Xl Delta_Yl

The sources are smooth in k: evolved on a coarse k grid (a few hundred
points) and linearly interpolated onto a fine quadrature grid in k whose
spacing resolves the Bessel oscillations (dk ~ 2pi/(4 tau0), the same
two-level strategy as the reference's SetkValuesForInt). The tau
integration uses the trapezoid weights of the evolution grid. Sampled l's
are spline-interpolated to every integer l (lSamp strategy,
camb/modules.f90 lvalues).

TPU mapping: per-l work is a (nk_fine, ntau) gather + weighted contraction,
scanned over the ~100 sampled l's with `lax.map`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.models.bessel import build_bessel_table, default_l_samples
from cosmomc_tpu.models.perturbations import PerturbationOutput
from cosmomc_tpu.models.primordial import PrimordialParams, scalar_power


class CMBSpectra(NamedTuple):
    """l(l+1)C_l/2pi for TT/TE/EE (dimensionless primordial units; the
    (T_cmb*1e6)^2 muK^2 factor is applied by the theory assembly), and
    [l(l+1)]^2 C_l^pp / 2pi for the lensing potential."""
    ls: jnp.ndarray       # (lmax-1,) integer l = 2..lmax
    tt: jnp.ndarray
    te: jnp.ndarray
    ee: jnp.ndarray
    pp: jnp.ndarray


def fine_k_grid(tau0: float, kmax: float, points_per_osc: float = 4.0,
                kmin: float = 3e-5) -> np.ndarray:
    """Quadrature k grid resolving Bessel oscillations (static, host)."""
    dk = 2.0 * np.pi / (points_per_osc * tau0)
    n = int(np.ceil((kmax - kmin) / dk))
    return kmin + dk * np.arange(n + 1)


class ClTransferCache(NamedTuple):
    """Line-of-sight transfer functions Delta_l(k) on the fine k grid —
    the semi-slow cache of the reference's two-stage compute: CAMB stores
    exactly this in `CAMBTransferCache` so `CAMB_TransfersToPowers`
    (camb/camb.f90:87-102) can re-apply a new primordial power without
    re-evolving perturbations. `wk` are the dlnk quadrature weights."""
    ls: jnp.ndarray        # (nl,) sampled multipoles (f dtype)
    kf: jnp.ndarray        # (nkf,) fine quadrature k grid
    wk: jnp.ndarray        # (nkf,) dlnk trapezoid weights
    dT: jnp.ndarray        # (nl, nkf) temperature transfer
    dE: jnp.ndarray        # (nl, nkf) E-polarization transfer
    dP: jnp.ndarray        # (nl, nkf) lensing-potential transfer


def compute_cls(po: PerturbationOutput, pp: PrimordialParams,
                chi_star, lmax: int = 2500, tau0_hint: float = 14200.0,
                kmax_hint: float = 0.6,
                points_per_osc: float = 4.0) -> CMBSpectra:
    """Assemble TT/TE/EE/phiphi (one-shot: transfer stage + power stage)."""
    cache = compute_cl_transfers(po, chi_star, lmax=lmax, tau0_hint=tau0_hint,
                                 kmax_hint=kmax_hint,
                                 points_per_osc=points_per_osc)
    return cls_from_cl_transfers(cache, pp, lmax=lmax)


def compute_cl_transfers(po: PerturbationOutput, chi_star, lmax: int = 2500,
                         tau0_hint: float = 14200.0, kmax_hint: float = 0.6,
                         points_per_osc: float = 4.0) -> ClTransferCache:
    """SLOW stage: source x Bessel time integration -> Delta_l(k).
    `chi_star` is the comoving distance to recombination (for the lensing
    kernel). tau0_hint/kmax_hint bound the static table sizes (actual
    tau0/k are traced values)."""
    dtype = po.s0.dtype
    ls = default_l_samples(lmax)
    kf = jnp.asarray(fine_k_grid(tau0_hint, kmax_hint, points_per_osc), dtype)
    tab = build_bessel_table(tuple(int(l) for l in ls),
                             kmax_hint * tau0_hint * 1.02 + 10)

    # interpolate sources from coarse k to fine k (linear; sources smooth)
    lnk_coarse = jnp.log(po.k)
    lnkf = jnp.log(kf)

    def k_interp(S):       # (nk, ntau) -> (nkf, ntau)
        return jax.vmap(lambda col: jnp.interp(lnkf, lnk_coarse, col),
                        in_axes=1, out_axes=1)(S)

    S0 = k_interp(po.s0)
    S1 = k_interp(po.s1)
    S2 = k_interp(po.s2)
    SL = k_interp(po.slens)

    taus = po.tau
    tau0 = po.tau0
    dt = jnp.diff(taus)
    wt = jnp.concatenate([dt[:1] / 2, (dt[1:] + dt[:-1]) / 2, dt[-1:] / 2])
    chi = jnp.maximum(tau0 - taus, 1e-6)
    x = kf[:, None] * (tau0 - taus)[None, :]        # (nkf, ntau)

    # lensing kernel (flat): (chi* - chi)/(chi* chi), zero past chi*
    lens_w = jnp.where(chi < chi_star, (chi_star - chi) / (chi_star * chi), 0.0)

    dlnk = jnp.diff(jnp.log(kf))
    wk = jnp.concatenate([dlnk[:1] / 2, (dlnk[1:] + dlnk[:-1]) / 2,
                          dlnk[-1:] / 2]).astype(dtype)

    jl_tab = jnp.asarray(tab.jl, dtype)
    jlp_tab = jnp.asarray(tab.jlp, dtype)
    inv_dx = 1.0 / tab.dx

    S0w = S0 * wt
    S1w = S1 * wt
    S2w = S2 * wt
    SLw = SL * (wt * lens_w)

    def one_l(il):
        l = jnp.asarray(tab.ls)[il].astype(dtype)
        t = x * inv_dx
        i = jnp.clip(t.astype(jnp.int32), 0, jl_tab.shape[1] - 2)
        f = t - i.astype(dtype)
        jl = jl_tab[il, i] * (1 - f) + jl_tab[il, i + 1] * f
        jp = jlp_tab[il, i] * (1 - f) + jlp_tab[il, i + 1] * f
        xs = jnp.maximum(x, 1e-8)
        jpp = -2.0 * jp / xs + (l * (l + 1) / (xs * xs) - 1.0) * jl
        dT = jnp.sum(S0w * jl + S1w * jp + S2w * jpp, axis=1)   # (nkf,)
        efac = jnp.sqrt(jnp.maximum((l + 2) * (l + 1) * l * (l - 1), 0.0))
        # E transfer: sqrt((l+2)!/(l-2)!) int (3/4) g Pi j_l/x^2 — the
        # canonical ZS97 scalar E source, with Pi in temperature units
        # (S2 = (3/4) g Pi exactly; the former 0.25 fudge was absorbing the
        # brightness->temperature conversion now done in perturbations.py)
        dE = efac * jnp.sum(S2w * jl / (xs * xs), axis=1)
        # lensing potential: phi_l(k) = -2 int dtau W(chi) Psi_W j_l with
        # Psi_W = (phi+psi)/2; SL carries e^-kappa (phi+psi) = 2 Psi_W, so
        # the factor-2 is already inside SL (sign drops in the auto-power)
        dP = jnp.sum(SLw * jl, axis=1)
        return dT, dE, dP

    dT, dE, dP = jax.lax.map(one_l, jnp.arange(len(ls)))
    return ClTransferCache(jnp.asarray(ls, dtype), kf, wk, dT, dE, dP)


def cls_from_cl_transfers(cache: ClTransferCache, pp: PrimordialParams,
                          lmax: int = 2500) -> CMBSpectra:
    """SEMI-SLOW stage (CAMB_TransfersToPowers): apply the primordial power
    to cached Delta_l(k) and spline-fill to every integer l."""
    dtype = cache.dT.dtype
    wP = (cache.wk * scalar_power(pp, cache.kf)).astype(dtype)
    tts = 4.0 * jnp.pi * jnp.sum(wP * cache.dT * cache.dT, axis=1)
    tes = 4.0 * jnp.pi * jnp.sum(wP * cache.dT * cache.dE, axis=1)
    ees = 4.0 * jnp.pi * jnp.sum(wP * cache.dE * cache.dE, axis=1)
    pps = 4.0 * jnp.pi * jnp.sum(wP * cache.dP * cache.dP, axis=1)

    # cubic-spline fill to all integer l in the l(l+1)C_l/2pi representation
    # (camb/modules.f90 lvalues semantics: the sampled-l spectra are smooth
    # in this representation; linear fill loses ~1-2% across acoustic peaks)
    from cosmomc_tpu.utils.interp import spline_fit, spline_eval
    ls_f = cache.ls
    fac = ls_f * (ls_f + 1) / (2 * jnp.pi)
    fac_pp = (ls_f * (ls_f + 1)) ** 2 / (2 * jnp.pi)
    all_l = jnp.arange(2, lmax + 1, dtype=dtype)

    def fill(vals):
        return spline_eval(spline_fit(ls_f, vals), all_l)

    tt = fill(fac * tts)
    te = fill(fac * tes)
    ee = fill(fac * ees)
    ppp = fill(fac_pp * pps)
    return CMBSpectra(all_l.astype(jnp.int32), tt, te, ee, ppp)
