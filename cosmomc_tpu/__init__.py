"""cosmomc_tpu: a TPU-native cosmological inference framework.

A from-scratch JAX/XLA re-design of the capabilities of CosmoMC
(SouthPoleTelescope fork; see SURVEY.md): a differentiable Boltzmann theory
stack, a registry of jit-able likelihoods, and massively-vectorized MCMC
(blocked fast/slow Metropolis) with thousands of chains vmapped per chip and
sharded across TPU pod slices.

Design stance (vs the Fortran reference):
  - no global mutable state: theory evaluation is a pure function
    params -> predictions (reference keeps globals `CP`, `MT`; cmbmain.f90:7-8
    documents it as not thread-safe — we invert that).
  - chains are a vectorized axis, not MPI ranks (reference: driver.F90:51-65,
    one rank per chain). Cross-chain statistics are `psum`/`all_gather`
    collectives over a `jax.sharding.Mesh` axis.
  - likelihoods are jit-able log-prob closures registered by name
    (reference: DataLikelihoods.f90:9-41 ini-keyed registry).
"""

__version__ = "0.1.0"

from cosmomc_tpu import utils, params, models, likelihoods, sampling  # noqa: F401
