"""Fixed-order quadrature rules for background integrals.

TPU-friendly: static node counts, no adaptive subdivision. Gauss-Legendre
nodes are computed host-side once (numpy, f64) and closed over as constants;
the integrand evaluation is batched (vmap over nodes) so XLA sees one fused
elementwise kernel + reduction.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def gauss_legendre(n: int):
    """(nodes, weights) on [-1, 1], float64 numpy."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x, w


def gl_integrate(f, a, b, n: int = 64, dtype=None):
    """∫_a^b f(x) dx with n-point Gauss-Legendre; a, b may be traced scalars."""
    x, w = gauss_legendre(n)
    x = jnp.asarray(x, dtype=dtype)
    w = jnp.asarray(w, dtype=dtype)
    half = (b - a) / 2.0
    mid = (a + b) / 2.0
    return half * jnp.sum(w * f(mid + half * x))


def gl_nodes(a, b, n: int = 64, dtype=None):
    """Scaled nodes and weights for ∫_a^b; returns (x, w) arrays."""
    x, w = gauss_legendre(n)
    x = jnp.asarray(x, dtype=dtype)
    w = jnp.asarray(w, dtype=dtype)
    half = (b - a) / 2.0
    return (a + b) / 2.0 + half * x, half * w


def trapz(y: jnp.ndarray, x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    d = jnp.diff(x, axis=axis)
    yl = jnp.take(y, np.arange(y.shape[axis] - 1), axis=axis)
    yr = jnp.take(y, np.arange(1, y.shape[axis]), axis=axis)
    return jnp.sum(d * (yl + yr) / 2.0, axis=axis)
