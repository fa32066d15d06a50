"""Precision policy.

The reference is float64 throughout (`mcp` kind, source/settings.f90:11-15).
TPUs natively compute in f32/bf16; f64 is software-emulated and slow. Policy:

  - *Host-side* precision-critical scalar work (background integrals used to
    build interpolation tables, theta-H0 bisection setup, covariance algebra
    for proposal learning) runs in float64 on CPU via numpy, or in f64 JAX
    when `jax_enable_x64` is on.
  - *Device-side* hot loops (chain steps, likelihood quadratic forms,
    Boltzmann ODE batches) run in float32, with compensated accumulation
    where a reduction is long enough to lose precision.

`real_dtype()` is the device dtype used by hot-path code; tests may flip it
to float64 on CPU to validate numerics against the reference contract.
"""

import jax.numpy as jnp

_REAL = jnp.float32


def set_real_dtype(dt) -> None:
    global _REAL
    _REAL = jnp.dtype(dt)


def real_dtype():
    return _REAL
