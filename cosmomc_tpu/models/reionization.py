"""Reionization model: tanh in (1+z)^1.5, zre <-> tau inversion.

Reference: camb/reionization.f90 — x_e contribution
  xe_re(z) = (f/2) [1 + tanh((y(zre) - y(z)) / dy)],  y = (1+z)^1.5,
  dy = 1.5 sqrt(1+zre) * delta_z (delta_z = 0.5 default), f = 1 + fHe
(He first reionization tied to H), plus a second tanh for HeII->HeIII at
z ~ 3.5. `Reionization_GetOptDepth` / `GetZreFromTau` invert tau(zre) —
here a fixed-iteration bisection on the vectorized optical-depth integral.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cosmomc_tpu.models import constants as const
from cosmomc_tpu.models.background import BackgroundParams, hubble_mpc

DELTA_Z = 0.5
HE3_Z = 3.5
HE3_DELTA = 0.5


def xe_reion(z, zre, fHe, include_he3: bool = True):
    """Reionization free-electron fraction (n_e/n_H) at redshift z."""
    y = (1.0 + z) ** 1.5
    yre = (1.0 + zre) ** 1.5
    dy = 1.5 * jnp.sqrt(1.0 + zre) * DELTA_Z
    xe = (1.0 + fHe) / 2.0 * (1.0 + jnp.tanh((yre - y) / dy))
    if include_he3:
        xe = xe + fHe / 2.0 * (1.0 + jnp.tanh((HE3_Z - z) / HE3_DELTA))
    return xe


def reion_optical_depth(bg: BackgroundParams, zre, yhe, n: int = 256):
    """tau from reionization alone: int sigma_T n_e(reion) c dz/((1+z)H)."""
    dtype = jnp.asarray(zre).dtype
    h = bg.H0 / 100.0
    mu_H = 1.0 / (1.0 - yhe)
    Nnow = const.n_H_today(bg.ombh2, mu_H)   # f32-safe (no denormal chain)
    akthom = const.sigma_thomson * Nnow * const.Mpc
    fHe = yhe / (const.mass_ratio_He_H * (1.0 - yhe))
    zmax = 50.0
    z = jnp.linspace(0.0, zmax, n).astype(dtype)
    Hm = hubble_mpc(bg, 1.0 / (1.0 + z))
    integrand = akthom * xe_reion(z, zre, fHe) * (1.0 + z) ** 2 / Hm
    return jnp.trapezoid(integrand, z)


def zre_from_tau(bg: BackgroundParams, tau, yhe, iters: int = 30):
    """Invert tau(zre) by bisection (reionization.f90 GetZreFromTau)."""
    tau = jnp.asarray(tau)
    lo = jnp.asarray(0.5, tau.dtype)
    hi = jnp.asarray(40.0, tau.dtype)

    def body(carry, _):
        lo_, hi_ = carry
        mid = 0.5 * (lo_ + hi_)
        t = reion_optical_depth(bg, mid, yhe)
        low = t < tau   # tau increases with zre
        return (jnp.where(low, mid, lo_), jnp.where(low, hi_, mid)), None

    (lo_f, hi_f), _ = jax.lax.scan(body, (lo, hi), None, length=iters)
    mid = jax.lax.stop_gradient(0.5 * (lo_f + hi_f))
    # Newton polish: bisection output has identically-zero derivatives
    # (branch-only dependence); one Newton step restores the implicit-
    # function gradient d zre/d tau = 1/tau'(zre) (and the ombh2/H0
    # dependence through the optical-depth integral) for HMC/minimizer
    # use, leaving the converged value unchanged.
    f_val, f_z = jax.value_and_grad(
        lambda z: reion_optical_depth(bg, z, yhe) - tau)(mid)
    return mid - f_val / f_z
