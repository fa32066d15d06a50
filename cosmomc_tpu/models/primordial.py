"""Primordial power spectra.

Reference: camb/power_tilt.f90 (ScalarPower/TensorPower): power-law with
running and running-of-running,

  P_R(k) = A_s (k/k_pivot)^(n_s - 1 + (1/2) n_run ln(k/kp)
                             + (1/6) n_runrun ln^2(k/kp))
  P_t(k) = r A_s (k/k_pivot_t)^(n_t + (1/2) n_t_run ln(k/kp))

Conventions: A_s is the curvature perturbation amplitude at k_pivot
(0.05/Mpc default scalar; CosmoMC samples ln(10^10 A_s)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PrimordialParams(NamedTuple):
    logA: jnp.ndarray       # ln(10^10 As)
    ns: jnp.ndarray
    nrun: jnp.ndarray
    nrunrun: jnp.ndarray
    r: jnp.ndarray          # tensor-to-scalar ratio at pivot
    nt: jnp.ndarray
    ntrun: jnp.ndarray
    pivot_scalar: float = 0.05   # 1/Mpc (static)
    pivot_tensor: float = 0.05

    @classmethod
    def make(cls, logA=3.044, ns=0.965, nrun=0.0, nrunrun=0.0, r=0.0,
             nt=0.0, ntrun=0.0, pivot_scalar=0.05, pivot_tensor=0.05,
             dtype=jnp.float64):
        f = lambda x: jnp.asarray(x, dtype)
        return cls(f(logA), f(ns), f(nrun), f(nrunrun), f(r), f(nt), f(ntrun),
                   pivot_scalar, pivot_tensor)

    @property
    def As(self):
        return jnp.exp(self.logA) * 1e-10


def scalar_power(pp: PrimordialParams, k):
    """P_R(k), dimensionless curvature power (power_tilt.f90 ScalarPower)."""
    lnk = jnp.log(jnp.asarray(k) / pp.pivot_scalar)
    return pp.As * jnp.exp((pp.ns - 1.0 + lnk * (pp.nrun / 2.0
                                                 + pp.nrunrun * lnk / 6.0)) * lnk)


def tensor_power(pp: PrimordialParams, k):
    """P_t(k) (power_tilt.f90 TensorPower); inflation consistency sets
    nt = -r/8 when requested by the parameterization."""
    lnk = jnp.log(jnp.asarray(k) / pp.pivot_tensor)
    return pp.r * pp.As * jnp.exp((pp.nt + pp.ntrun * lnk / 2.0) * lnk)
