"""Type Ia supernova likelihoods: JLA / Pantheon (SALT2 standardization).

Reference: source/supernovae_JLA.f90 (handles both JLA and Pantheon via
`.dataset` files; supernovae.f90 is just a mutex wrapper). Contract:

  mu_model,i = 5 log10( (1+zhel_i)(1+zcmb_i) D_A(zcmb_i)/Mpc )   (:1198)
  diff_i = m_B,i + alpha x1_i - beta c_i - mu_model,i - M
  chi2(alpha,beta) with M analytically marginalized (flat prior):
      chi2 = A + ln(E/2pi) - B^2/E                               (:1143-1146)
      A = d^T C^-1 d,  B = 1^T C^-1 d,  E = 1^T C^-1 1
  C(alpha,beta) = C_mag + alpha^2 C_stretch + beta^2 C_colour
      + 2 alpha C_mag,stretch - 2 beta C_mag,colour - 2 alpha beta C_s,c
      + diag(pre_vars + alpha^2 s_var + beta^2 c_var + 2a cov_ms
             - 2b cov_mc - 2ab cov_sc)                            (:939-1000)
  pre_vars = mag_var + intrinsicdisp^2
      + (5/ln10)^2 pecz^2 ((1+z)/(z(1+z/2)))^2                    (:912-920)
  twoscriptmfit: two absolute magnitudes split at scriptmcut on the third
  variable (host-mass step), both marginalized (:1135-1142).

TPU design: all component matrices are baked device constants. For fixed
alpha/beta (Pantheon: columns are zero) C is constant -> its Cholesky factor
is precomputed once on the host and chi2 is two triangular solves. For
varying alpha/beta (JLA) C is assembled on device (a few AXPYs over
(n,n) matrices) and factored with jnp.linalg.cholesky per evaluation —
a single well-shaped MXU kernel, batched for free under vmap over chains.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import Likelihood, read_dataset_ini
from cosmomc_tpu.models import background as bgm
from cosmomc_tpu.params.space import Param, Speed

_ZFACSQ = (5.0 / np.log(10.0)) ** 2
_INV_TWOPI = 1.0 / (2.0 * np.pi)


def _read_cov(path: str, n: int) -> np.ndarray:
    """SN covariance files: first entry may be the dimension (JLA format)."""
    vals = np.loadtxt(path).ravel()
    if vals.size == n * n + 1:
        assert int(vals[0]) == n
        vals = vals[1:]
    return vals.reshape(n, n)


class SNLikelihood(Likelihood):
    kind = "SN"
    speed = Speed.FAST

    def __init__(self, dataset_path: str, name: Optional[str] = None,
                 marginalize_alpha_beta: bool = False, dtype=jnp.float64):
        ini = read_dataset_ini(dataset_path)
        super().__init__(name or ini.string("name", "SN"))
        ddir = os.path.dirname(os.path.abspath(dataset_path))
        root = os.path.dirname(ddir)  # dataset paths are relative to repo root

        def resolve(f):
            for cand in (os.path.join(ddir, os.path.basename(f)),
                         os.path.join(os.path.dirname(root), f),
                         os.path.join(root, f), f):
                if os.path.isfile(cand):
                    return cand
            raise FileNotFoundError(f"{self.name}: {f}")

        data_file = resolve(ini.string("data_file", required=True))
        names, cols = [], []
        with open(data_file) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                p = line.split()
                names.append(p[0])
                cols.append([float(x) for x in p[1:]])
        arr = np.array(cols)
        n = arr.shape[0]
        self.nsn = n
        (zcmb, zhel, dz, mb, dmb, x1, dx1, color, dcolor, thirdvar) = arr[:, :10].T
        cov_m_s, cov_m_c, cov_s_c = arr[:, 11], arr[:, 12], arr[:, 13]

        self.pecz = ini.float("pecz", 0.001)
        intrinsicdisp = ini.float("intrinsicdisp", 0.13)
        self.twoscriptmfit = ini.bool("twoscriptmfit", False)
        scriptmcut = ini.float("scriptmcut", 10.0)

        pre_vars = dmb ** 2 + intrinsicdisp ** 2
        pos = zcmb > 0
        pre_vars = pre_vars + np.where(
            pos, _ZFACSQ * self.pecz ** 2
            * ((1.0 + zcmb) / np.maximum(zcmb * (1 + 0.5 * zcmb), 1e-10)) ** 2, 0.0)

        def load_flag(key):
            if ini.bool(f"has_{key}_covmat", False):
                try:
                    return _read_cov(
                        resolve(ini.string(f"{key}_covmat_file", required=True)), n)
                except FileNotFoundError:
                    # this data tree may not ship the systematic covariances
                    # (e.g. Pantheon sys_full_long.txt); fall back to the
                    # diagonal/statistical terms with a loud warning
                    import warnings
                    warnings.warn(f"{self.name}: {key} covmat file missing; "
                                  "using statistical errors only")
                    return None
            return None

        self.C_mag = load_flag("mag")
        self.C_stretch = load_flag("stretch")
        self.C_colour = load_flag("colour")
        self.C_mag_stretch = load_flag("mag_stretch")
        self.C_mag_colour = load_flag("mag_colour")
        self.C_stretch_colour = load_flag("stretch_colour")
        self.varying_alpha_beta = any(
            c is not None for c in (self.C_stretch, self.C_colour,
                                    self.C_mag_stretch, self.C_mag_colour,
                                    self.C_stretch_colour)) or \
            np.any(x1 != 0) or np.any(color != 0)

        if self.varying_alpha_beta:
            # JLA convention: alpha, beta sampled (nuisance block)
            self.nuisance = [
                Param("alpha_JLA", 0.135, 0.01, 2.0, 0.003, 0.003,
                      label=r"\alpha_{JLA}", speed=Speed.FAST),
                Param("beta_JLA", 3.1, 0.9, 4.6, 0.03, 0.03,
                      label=r"\beta_{JLA}", speed=Speed.FAST),
            ]

        d = lambda x: jnp.asarray(x, dtype)
        self._zcmb, self._zhel = d(zcmb), d(zhel)
        self._mb, self._x1, self._color = d(mb), d(x1), d(color)
        self._pre_vars = d(pre_vars)
        self._svar, self._cvar = d(dx1 ** 2), d(dcolor ** 2)
        self._cov_ms, self._cov_mc, self._cov_sc = d(cov_m_s), d(cov_m_c), d(cov_s_c)
        self._A1 = d(np.where(thirdvar <= scriptmcut, 1.0, 0.0))
        self._A2 = 1.0 - self._A1
        zero = jnp.zeros((n, n), dtype)
        self._Cm = d(self.C_mag) if self.C_mag is not None else zero
        self._Cs = d(self.C_stretch) if self.C_stretch is not None else None
        self._Cc = d(self.C_colour) if self.C_colour is not None else None
        self._Cms = d(self.C_mag_stretch) if self.C_mag_stretch is not None else None
        self._Cmc = d(self.C_mag_colour) if self.C_mag_colour is not None else None
        self._Csc = d(self.C_stretch_colour) if self.C_stretch_colour is not None else None

        if not self.varying_alpha_beta:
            # fixed covariance: invert once on host (float64). Using the
            # explicit inverse turns the per-chain solve into a plain
            # matvec — under vmap that is ONE (nchains, nsn) @ (nsn, nsn)
            # MXU matmul, whereas a vmapped triangular solve broadcasts the
            # factor per chain (OOM at ~1000 chains x 1048^2).
            C = (self.C_mag if self.C_mag is not None else np.zeros((n, n)))
            C = C + np.diag(pre_vars)
            icov = np.linalg.inv(C)
            self._icov = jnp.asarray(icov, dtype)
            self._icov_sum_rows = jnp.asarray(icov.sum(axis=0), dtype)
            self._icov_total = float(icov.sum())
        else:
            self._icov = None

    # ------------------------------------------------------------------

    def _mu_model(self, theory) -> jnp.ndarray:
        da = bgm.angular_diameter_distance(theory.bf, self._zcmb)
        return 5.0 * jnp.log10((1.0 + self._zhel) * (1.0 + self._zcmb) * da)

    def _marg_chi2(self, diff, solve):
        """M-marginalized chi2 given a linear-solve closure x -> C^-1 x."""
        cinv_d = solve(diff)
        if self.twoscriptmfit:
            A1, A2 = self._A1.astype(diff.dtype), self._A2.astype(diff.dtype)
            A = diff @ cinv_d
            B = cinv_d @ A1
            Cc = cinv_d @ A2
            cinv_A1 = solve(A1)
            D = cinv_A1 @ A2
            E = cinv_A1 @ A1
            F = solve(A2) @ A2
            G = F - D * D / E
            return (A + jnp.log(E * _INV_TWOPI) + jnp.log(G * _INV_TWOPI)
                    - Cc * Cc / G - B * B * F / (E * G) + 2.0 * B * Cc * D / (E * G))
        ones = jnp.ones_like(diff)
        A = diff @ cinv_d
        B = jnp.sum(cinv_d)
        E = jnp.sum(solve(ones))
        return A + jnp.log(E * _INV_TWOPI) - B * B / E

    def log_like(self, theory, nuisance: jnp.ndarray) -> jnp.ndarray:
        dt = theory.bg.ombh2.dtype
        mu = self._mu_model(theory)
        if not self.varying_alpha_beta:
            diff = (self._mb - mu).astype(dt)
            icov = self._icov.astype(dt)
            if self.twoscriptmfit:
                return 0.5 * self._marg_chi2(diff, lambda x: icov @ x)
            cinv_d = icov @ diff
            A = diff @ cinv_d
            B = jnp.sum(cinv_d)
            E = jnp.asarray(self._icov_total, dt)
            return 0.5 * (A + jnp.log(E * _INV_TWOPI) - B * B / E)

        alpha, beta = nuisance[0], nuisance[1]
        diff = (self._mb + alpha * self._x1 - beta * self._color - mu).astype(dt)
        diag = (self._pre_vars + alpha ** 2 * self._svar + beta ** 2 * self._cvar
                + 2 * alpha * self._cov_ms - 2 * beta * self._cov_mc
                - 2 * alpha * beta * self._cov_sc)
        C = self._Cm + jnp.diag(diag)
        if self._Cs is not None:
            C = C + alpha ** 2 * self._Cs
        if self._Cc is not None:
            C = C + beta ** 2 * self._Cc
        if self._Cms is not None:
            C = C + 2 * alpha * self._Cms
        if self._Cmc is not None:
            C = C - 2 * beta * self._Cmc
        if self._Csc is not None:
            C = C - 2 * alpha * beta * self._Csc
        L = jnp.linalg.cholesky(C.astype(dt))

        def solve(x):
            y = jax.scipy.linalg.solve_triangular(L, x, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        return 0.5 * self._marg_chi2(diff, solve)
