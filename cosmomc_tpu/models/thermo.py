"""Thermal history derived quantities from the recombination table.

Reference contract (camb/modules.f90 ThermoDerivedParams + cmbmain InitVars):
  - optical depth kappa(z) = int sigma_T n_e c dz / ((1+z) H(z));
    z* = redshift where kappa = 1 (exact, not the HS fit);
  - drag optical depth uses 1/R weighting (R = 3 rho_b/4 rho_gamma);
    z_drag: tau_drag = 1;
  - exact sound horizon r_s(z) = int c_s dtau with the exact R;
  - baryon temperature -> sound speed c_s^2 for perturbations;
  - visibility g = kappa' e^-kappa (line-of-sight sources).

All computed on the thermo z-grid with cumulative spline integrals; outputs
are splines over log(1+z), jit/vmap/grad-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.models import constants as const
from cosmomc_tpu.models.background import (BackgroundParams, hubble_mpc,
                                           _densities, dtauda)
from cosmomc_tpu.models.recfast import ThermoHistory
from cosmomc_tpu.utils.interp import spline_fit, spline_eval, spline_cumint, Spline


class ThermoDerived(NamedTuple):
    """Scalar derived parameters (reference ThermoDerivedParams set)."""
    z_star: jnp.ndarray
    r_star: jnp.ndarray      # comoving sound horizon at z* [Mpc]
    z_drag: jnp.ndarray
    r_drag: jnp.ndarray
    tau_reion_excluded: jnp.ndarray   # kappa(0) without reionization
    kd: jnp.ndarray          # photon diffusion damping scale k_D(z*) [1/Mpc]


class ThermoTables(NamedTuple):
    """Splines over x = log(1+z) on the thermo grid."""
    x: jnp.ndarray           # log(1+z), ascending
    xe: jnp.ndarray
    kappa: jnp.ndarray       # cumulative optical depth from z=0
    kappa_drag: jnp.ndarray
    rs: jnp.ndarray          # sound horizon r_s(z) [Mpc]
    tm: jnp.ndarray
    csq_b: jnp.ndarray       # baryon sound speed squared (units of c^2)
    damp: jnp.ndarray        # 6/k_D^2 integral from a~0 down to z (ascending x)


def compute_thermo_tables(bg: BackgroundParams, th: ThermoHistory,
                          yhe) -> ThermoTables:
    dtype = th.xe.dtype
    z = th.z              # descending from 1e4
    x = jnp.log1p(z)      # descending
    # ascending order for splines
    xa = x[::-1]
    zs = z[::-1]
    xe = th.xe[::-1]
    tm = th.tm[::-1]

    h = bg.H0 / 100.0
    mu_H = 1.0 / (1.0 - yhe)
    Nnow = const.n_H_today(bg.ombh2, mu_H)   # f32-safe (no denormal chain)
    akthom = const.sigma_thomson * Nnow * const.Mpc   # sigma_T n_H0 in 1/Mpc

    a = 1.0 / (1.0 + zs)
    Hm = hubble_mpc(bg, a)
    # kappa = int sigma_T n_e dl_proper with n_e = xe Nnow (1+z)^3 and
    # dl = dz / ((1+z) H_mpc)  ->  dkappa/dz = akthom xe (1+z)^2 / H_mpc;
    # in x = ln(1+z): dkappa/dx = dkappa/dz * (1+z)
    dkappa_dz = akthom * xe * (1.0 + zs) ** 2 / Hm
    dkappa_dx = dkappa_dz * (1.0 + zs)

    def cumtrapz(f):
        seg = 0.5 * (f[1:] + f[:-1]) * jnp.diff(xa)
        from cosmomc_tpu.utils.interp import parallel_cumsum
        return jnp.concatenate([jnp.zeros((1,), f.dtype), parallel_cumsum(seg)])

    # cumulative trapezoid (parallel cumsum; the grid is dense enough that
    # spline-exact integration is unnecessary, and sequential Thomas solves
    # would wreck XLA compile time inside jit-hot paths)
    kappa = cumtrapz(dkappa_dx)

    # drag depth: same integrand / R
    d = _densities(bg)
    R = 0.75 * bg.ombh2 * a / d["ogh2"]
    kappa_drag = cumtrapz(dkappa_dx / R)

    # exact sound horizon: r_s(z) = int_z^inf cs dz/H ; compute from grid top
    cs = 1.0 / jnp.sqrt(3.0 * (1.0 + R))
    drs_dx = cs * (1.0 + zs) / Hm      # d chi_s / d x
    cum = cumtrapz(drs_dx)
    rs_from_top = cum[-1] - cum        # integral from z to z_max
    # add the contribution above z_max (radiation domination, analytic-ish):
    # above 1e4 matter/nu known; integrate dtauda*cs in a with GL
    from cosmomc_tpu.utils.quad import gl_nodes
    a_top = 1.0 / (1.0 + zs[-1])
    xs_, ws_ = gl_nodes(jnp.sqrt(1e-9), jnp.sqrt(a_top), 96, dtype=dtype)
    aa = xs_ * xs_
    R_above = 0.75 * bg.ombh2 * aa / d["ogh2"]
    rs_above = jnp.sum(ws_ * 2.0 * xs_ * dtauda(bg, aa)
                       / jnp.sqrt(3.0 * (1.0 + R_above)))
    rs = rs_from_top + rs_above

    # baryon sound speed^2: kB Tm/(mu_b c^2) (1 - 1/3 dlnTm/dlna)
    mu_b = 1.0 / (1.0 - (1.0 - 1.0 / const.mass_ratio_He_H) * yhe + xe * (1.0 - yhe))
    # dlnTm/dx by central finite differences on the dense grid
    lnTm = jnp.log(jnp.maximum(tm, 1e-10))
    dlnTm_dx = jnp.gradient(lnTm, xa)
    # dlnTm/dlna = -dlnTm/dx; cs^2 = (kB T/mu)(1 - 1/3 dlnT/dlna) / c^2
    csq_b = (const.k_B * tm / (mu_b * const.m_H * const.c ** 2)
             * (1.0 + dlnTm_dx / 3.0))

    # photon diffusion damping: 6/kD^2(z) = int_0^a(z) da'
    #   (R^2 + 16(1+R)/15)/(1+R)^2 * dtau/da * a^2 / (xe * akthom)
    # (modules.f90:3086-3097 ddamping_da; kD at :2948)
    f_da = ((R ** 2 + 16.0 * (1.0 + R) / 15.0) / (1.0 + R) ** 2
            * dtauda(bg, a) * a ** 2 / (jnp.maximum(xe, 1e-8) * akthom))
    # da = -a dx: integral from a~0 (grid top) down to z(x)
    cumd = cumtrapz(f_da * a)
    # tail above the grid (z > zmax): R -> 0, xe -> xe[top]
    aa_t = xs_ * xs_
    damp_above = jnp.sum(ws_ * 2.0 * xs_ * (16.0 / 15.0)
                         * dtauda(bg, aa_t) * aa_t ** 2
                         / (xe[-1] * akthom))
    damp = (cumd[-1] - cumd) + damp_above

    return ThermoTables(xa, xe, kappa, kappa_drag, rs, tm, csq_b, damp)


def thermo_derived(bg: BackgroundParams, tab: ThermoTables) -> ThermoDerived:
    """z*, r*, z_drag, r_drag by inverse interpolation of the depth tables."""
    x = tab.x
    # kappa is monotonic increasing in x; find kappa = 1
    z_star = jnp.expm1(jnp.interp(1.0, tab.kappa, x))
    z_drag = jnp.expm1(jnp.interp(1.0, tab.kappa_drag, x))
    xstar = jnp.log1p(z_star)
    r_star = jnp.interp(xstar, x, tab.rs)
    r_drag = jnp.interp(jnp.log1p(z_drag), x, tab.rs)
    kd = jnp.sqrt(6.0 / jnp.interp(xstar, x, tab.damp))
    return ThermoDerived(z_star, r_star, z_drag, r_drag, tab.kappa[-1], kd)
