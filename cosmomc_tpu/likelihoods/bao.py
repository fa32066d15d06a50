"""BAO (and f sigma8) likelihoods.

Reference: source/bao.f90. Dataset-driven Gaussian likelihood on a vector of
measurements at redshifts z_j with types (bao.f90:29-34):

  Az, DV_over_rs, rs_over_DV, DA_over_rs, F_AP, f_sigma8, bao_Hz_rs,
  bao_Hz_rs_103, dilation, DM_over_rs

Theory vector (BAO_LnLike, bao.f90:264-306):
  DV/rs, H(z)[km/s/Mpc]*rs (optionally *1e-3), rs/DV, DM/rs = (1+z) DA/rs,
  DA/rs, F_AP = (1+z) DA(z) H(z)/c, f sigma8(z), and the Eisenstein A(z).
r_s is the drag-epoch sound horizon times `rs_rescale` (dataset key; DR12
stores values scaled by the fiducial r_d).

All measurement rows are evaluated as one vectorized computation + a single
covariance quadratic form — no per-row dispatch (types become static masks
at build time).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import Likelihood, read_dataset_ini
from cosmomc_tpu.models import background as bgm
from cosmomc_tpu.models import constants as const
from cosmomc_tpu.params.space import Speed

TYPES = ["Az", "DV_over_rs", "rs_over_DV", "DA_over_rs", "F_AP", "f_sigma8",
         "bao_Hz_rs", "bao_Hz_rs_103", "dilation", "DM_over_rs"]
C_KMS = const.c / 1e3


class BAOLikelihood(Likelihood):
    kind = "BAO"
    speed = Speed.FAST

    def __init__(self, dataset_path: str, name: Optional[str] = None,
                 dtype=jnp.float64):
        ini = read_dataset_ini(dataset_path)
        super().__init__(name or ini.string("name", os.path.basename(dataset_path)))
        ddir = os.path.dirname(os.path.abspath(dataset_path))

        errs: List[float] = []
        if ini.string("bao_measurement") is not None:
            # single-point inline form (e.g. sdss_6DF_bao.dataset):
            # zeff = ..., measurement_type = ..., bao_measurement = value err
            vals = [float(x) for x in ini.string("bao_measurement").split()]
            self.z = np.array([ini.float("zeff", required=True)])
            self.obs = np.array([vals[0]])
            if len(vals) > 1:
                errs = [vals[1]]
            types = [ini.string("measurement_type", required=True)]
            n = 1
        else:
            n = ini.int("num_bao", required=True)
            meas_file = os.path.join(
                ddir, os.path.basename(ini.string("bao_measurements_file",
                                                  required=True)))
            has_err = ini.bool("bao_measurements_file_has_error", False)
            rows = []
            types = []
            with open(meas_file) as f:
                for line in f:
                    line = line.split("#")[0].strip()
                    if not line:
                        continue
                    parts = line.split()
                    rows.append((float(parts[0]), float(parts[1])))
                    if has_err:
                        errs.append(float(parts[2]))
                    if len(parts) > 2 + (1 if has_err else 0):
                        types.append(parts[-1])
            if len(rows) != n:
                raise ValueError(f"{self.name}: expected {n} rows, got {len(rows)}")
            if not types:
                t = ini.string("measurement_type", required=True)
                types = [t] * n
            self.z = np.array([r[0] for r in rows])
            self.obs = np.array([r[1] for r in rows])
        self.types = types
        for t in types:
            if t not in TYPES:
                raise ValueError(f"{self.name}: unknown BAO type {t}")

        cov_file = ini.string("bao_cov_file")
        invcov_file = ini.string("bao_invcov_file")
        if cov_file:
            cov = np.loadtxt(os.path.join(ddir, os.path.basename(cov_file)))
            icov = np.linalg.inv(np.atleast_2d(cov))
        elif invcov_file:
            icov = np.atleast_2d(np.loadtxt(
                os.path.join(ddir, os.path.basename(invcov_file))))
        else:
            err = ini.float_list("bao_errors") or errs
            if not len(err):
                raise ValueError(f"{self.name}: no covariance given")
            icov = np.diag(1.0 / np.asarray(err, float) ** 2)
        self.rs_rescale = ini.float("rs_rescale", 1.0)

        self._z = jnp.asarray(self.z, dtype)
        self._obs = jnp.asarray(self.obs, dtype)
        self._icov = jnp.asarray(icov, dtype)

    def theory_vector(self, theory) -> jnp.ndarray:
        """Vector of predictions matching self.types (bao.f90:278-300)."""
        bf = theory.bf
        rs = theory.rs_drag * self.rs_rescale
        z = self._z
        da = bgm.angular_diameter_distance(bf, z)
        hz_mpc = bgm.hubble_mpc(bf.bg, 1.0 / (1.0 + z))  # H/c in 1/Mpc
        hz_kms = hz_mpc * C_KMS
        dv = ((1.0 + z) ** 2 * da ** 2 * z / hz_mpc) ** (1.0 / 3.0)
        preds = []
        for j, t in enumerate(self.types):
            if t == "DV_over_rs":
                v = dv[j] / rs
            elif t == "bao_Hz_rs":
                v = hz_kms[j] * rs
            elif t == "bao_Hz_rs_103":
                v = hz_kms[j] * rs * 1e-3
            elif t == "rs_over_DV":
                v = rs / dv[j]
            elif t == "DA_over_rs":
                v = da[j] / rs
            elif t == "DM_over_rs":
                v = (1.0 + z[j]) * da[j] / rs
            elif t == "F_AP":
                v = (1.0 + z[j]) * da[j] * hz_mpc[j]
            elif t == "f_sigma8":
                v = theory.fsigma8_at(z[j])
            elif t == "Az":
                # Eisenstein A(z) = 100 DV sqrt(om h^2) / (c z) (bao.f90:249-262)
                omh2 = (theory.bg.ombh2 + theory.bg.omch2 + theory.bg.omnuh2)
                v = 100.0 * dv[j] * jnp.sqrt(omh2) / (C_KMS * z[j])
            else:
                raise ValueError(t)
            preds.append(v)
        return jnp.stack(preds)

    def log_like(self, theory, nuisance: jnp.ndarray) -> jnp.ndarray:
        d = self.theory_vector(theory) - self._obs.astype(theory.bg.ombh2.dtype)
        return 0.5 * d @ self._icov.astype(d.dtype) @ d
