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
        raise NotImplementedError(
            "f sigma8 requires the perturbation stage (growth_z spline)")


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
