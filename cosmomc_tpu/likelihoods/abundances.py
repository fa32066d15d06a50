"""Element-abundance likelihoods: Yp and D/H vs BBN predictions.

Reference: source/ElementAbundances.f90 — a Gaussian measurement of the
helium nucleon fraction Yp^BBN or the deuterium ratio D/H compared against
the BBN interpolation tables at (ombh2, nnu - 3.046), with an optional
theory bias offset and an effective theory error added in quadrature
(Abundance_LnLike, ElementAbundances.f90:99-120). Dataset keys
(`measurement`, `mean`, `error`, `theory_table`, `theory_bias_offset`,
`theory_effective_error`) follow the reference .dataset format so the
shipped `Yp_*.dataset` / `D_*.dataset` files load unmodified.

TPU-native design: the BBN grids are resampled to uniform fine grids at
load (models/bbn.py) so the traced evaluation is two bilinear gathers and
a scalar quadratic — trivially fused into the posterior jit.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import Likelihood, read_dataset_ini
from cosmomc_tpu.models import bbn
from cosmomc_tpu.params.space import Speed

STANDARD_NNU = 3.046

# mass-fraction -> nucleon-ratio conversion constants (bbn.f90:28-39)
_M_H = 1.673575e-27
_NOT4 = 3.9715
_M_HE = _M_H * _NOT4


def yp_bbn_from_mass_fraction(yhe):
    """Convert Yhe mass fraction (CMB codes) to nucleon-ratio Yp^BBN
    (bbn.f90 GetYPBBN)."""
    return 4 * _M_H * yhe / (_M_HE - yhe * (_M_HE - 4 * _M_H))


class AbundanceLikelihood(Likelihood):
    """One abundance measurement (reference AbundanceLikelihood)."""

    kind = "Abund"
    speed = Speed.FAST

    def __init__(self, dataset: str, name: str = "",
                 bbn_consistency: bool = True, dtype=jnp.float64):
        import os
        ini = read_dataset_ini(dataset)
        ddir = os.path.dirname(os.path.abspath(dataset))
        self.measurement = ini.string("measurement", required=True)
        super().__init__(name or f"abund_{self.measurement.replace('/', '')}")
        self.mean = ini.float("mean", required=True)
        self.error = ini.float("error", required=True)
        self.theory_bias_offset = ini.float("theory_bias_offset", 0.0)
        self.theory_effective_error = ini.float("theory_effective_error", 0.0)
        self.non_bbn_yhe = False
        self.dtype = dtype

        table_name = ini.string("theory_table")
        table_path = (os.path.join(ddir, os.path.basename(table_name))
                      if table_name else None)
        if self.measurement == "Yp":
            if bbn_consistency:
                self.table = bbn.load_bbn_table(table_path)
                self._value = bbn.ypbbn_bbn
            else:
                # measurement compared directly to the sampled/fixed Yhe
                # (ElementAbundances.f90:103-104)
                self.non_bbn_yhe = True
                self.table = None
        elif self.measurement == "D/H":
            if not bbn_consistency:
                raise ValueError(
                    "D/H abundance measurement requires BBN consistency")
            self.table = bbn.load_bbn_table(table_path)
            self._value = bbn.dh_bbn
        else:
            raise ValueError(
                f"Un-recognised measurement name: {self.measurement}")

    def log_like(self, theory, nuisance: jnp.ndarray) -> jnp.ndarray:
        bg = theory.bg
        if self.non_bbn_yhe:
            yhe = getattr(theory, "yhe", None)
            if yhe is None:
                raise ValueError(f"{self.name}: theory carries no yhe for "
                                 "non-BBN Yp comparison")
            t = yp_bbn_from_mass_fraction(yhe) - self.mean
            return 0.5 * t * t / self.error ** 2

        dn = bg.nnu - STANDARD_NNU
        val = self._value(bg.ombh2, dn, self.table)
        if self.theory_effective_error > 0:
            terr = jnp.asarray(self.theory_effective_error, val.dtype)
        else:
            sig_yp, sig_dh = bbn.bbn_errors(bg.ombh2, dn, self.table)
            terr = sig_dh if self.measurement == "D/H" else sig_yp
        t = val + self.theory_bias_offset - self.mean
        return 0.5 * t * t / (self.error ** 2 + terr ** 2)
