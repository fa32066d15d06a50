"""Theory-prediction pytrees consumed by likelihoods.

The reference's TCosmoTheoryPredictions (CosmoTheory.f90:23-51) is a mutable
bag of C_l arrays, P(k,z) interpolators and derived scalars filled by the
calculator. Here each pipeline stage returns an immutable typed pytree; the
background stage produces `BackgroundTheory`, the Boltzmann stage will
extend it with spectra (CMBTheory).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from cosmomc_tpu.models import background as bgm
from cosmomc_tpu.models.background import (BackgroundParams,
                                           BackgroundFunctions)


class BackgroundTheory(NamedTuple):
    """Products of a background-only theory evaluation."""
    bg: BackgroundParams
    bf: BackgroundFunctions
    rs_drag: jnp.ndarray

    def fsigma8_at(self, z):
        raise ValueError(
            "this run's theory stage computes no matter power: f_sigma8 "
            "measurement rows need CMBTheoryProducts (use a posterior with "
            "matter_power enabled, or drop the f_sigma8 dataset rows)")


class CMBTheoryProducts(NamedTuple):
    """Full theory-prediction pytree for CMB+LSS likelihoods — the analog
    of TCosmoTheoryPredictions (CosmoTheory.f90:23-51) as an immutable
    pytree: C_l stack, background functions, drag sound horizon, and
    (optional) matter-power summaries on a redshift table."""
    bg: BackgroundParams
    bf: BackgroundFunctions
    rs_drag: jnp.ndarray
    #: (4,4,lmax+1) TEBP stack, l(l+1)C_l/2pi muK^2; PP as [l(l+1)]^2 C/2pi
    cls: Optional[jnp.ndarray] = None
    #: matter-power summary tables over z_pk (ascending), or None
    z_pk: Optional[jnp.ndarray] = None
    sigma8_z: Optional[jnp.ndarray] = None
    fsigma8_z: Optional[jnp.ndarray] = None
    #: full P(k,z) tables (models/matterpower.MatterPower) for likelihoods
    #: that integrate over the power spectrum (WL, MPK); the analog of the
    #: reference's MPK/NL_MPK interpolators (CosmoTheory.f90:103-132)
    mp: Optional[object] = None

    def fsigma8_at(self, z):
        """f sigma8(z) from the table (bao.f90:264-306 f_sigma8 rows)."""
        if self.fsigma8_z is None:
            raise ValueError(
                "f_sigma8 requested but matter power was not computed; "
                "enable matter_power on the posterior")
        return jnp.interp(jnp.asarray(z), self.z_pk, self.fsigma8_z)

    def sigma8_at(self, z):
        if self.sigma8_z is None:
            raise ValueError("sigma8 requested but matter power not computed")
        return jnp.interp(jnp.asarray(z), self.z_pk, self.sigma8_z)


def compute_background_theory(bg: BackgroundParams,
                              fixed_rs: Optional[float] = None) -> BackgroundTheory:
    """Background pipeline stage: distance tables + drag sound horizon.

    `fixed_rs` reproduces the reference's BAO_fixed_rs escape hatch for
    runs without a thermal history (bao.f90:240-247)."""
    bf = bgm.background_functions(bg)
    rs = jnp.asarray(fixed_rs, bg.ombh2.dtype) if fixed_rs else bgm.r_drag_approx(bg)
    return BackgroundTheory(bg, bf, rs)


def background_derived(th: BackgroundTheory) -> jnp.ndarray:
    """Derived parameter vector for chain output: H0, omegam, omegal,
    rdrag, age not included (cheap set; extended by the CMB stage).
    Order matches `BACKGROUND_DERIVED_NAMES`."""
    bg = th.bg
    h2 = (bg.H0 / 100.0) ** 2
    omm = (bg.ombh2 + bg.omch2 + bg.omnuh2) / h2
    oml = 1.0 - bg.omk - omm
    return jnp.stack([bg.H0 * jnp.ones_like(bg.ombh2), omm, oml, th.rs_drag])


BACKGROUND_DERIVED_NAMES = [
    ("H0", "H_0"), ("omegam", r"\Omega_m"), ("omegal", r"\Omega_\Lambda"),
    ("rdrag", r"r_{\rm drag}"),
]
