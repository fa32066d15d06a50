"""Windowed matter-power-spectrum likelihoods: generic MPK and WiggleZ.

Reference: source/mpk.f90 (MPK_Lnlike :247-410), source/wigglez.f90
(WiggleZ_LnLike :473-649, GiggleZ corrections :44-107), MPK_Common
compute_scaling_factor (mpk.f90:46-58). Semantics reproduced:

  - data bandpowers P_i (h^-3 Mpc^3) with window matrix W (points x kbands)
    convolving the theory P(k/h) evaluated at the dataset redshift;
  - D_V dilation: a_scl = DV_fid / (H0 * D_V(z)); theory evaluated at
    k*a_scl and divided by a_scl^3 (mpk.f90:300-312, k in h/Mpc so the
    h-free product H0*D_V is used);
  - analytic marginalization over a flat prior on the bias b^2
    (appendix F of the CosmoMC paper): chi^2 = P.C^-1.P -
    (W Pth.C^-1.P)^2 / (W Pth.C^-1.W Pth) [+ log normV for MPK;
    the WiggleZ variant drops the log term, wigglez.f90:619];
  - optional Q-model marginalization P -> P (1+Qk^2)/(1+Ag k), either on a
    grid with Gaussian weight (Q_mid/Q_sigma) or analytically with a flat
    prior on (b^2, b^2 Q) (Q_flat, mpk.f90:318-350);
  - WiggleZ: 7 sky regions per redshift bin sharing one theory vector;
    the bias marginalization couples the regions (single b^2 across
    regions, wigglez.f90:592-620); optional GiggleZ N-body correction of
    the theory (polynomial fiducial / tabulated fiducial ratio).

TPU-native: all file parsing happens at construction (host numpy);
evaluation is a handful of (npoints x nkbands) matmuls — one fused kernel.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import Likelihood, read_dataset_ini
from cosmomc_tpu.models import background as bgm
from cosmomc_tpu.params.space import Speed

_NQ = 6
_DQ = 0.4


def _read_numbers(path: str) -> np.ndarray:
    vals = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals.extend(float(x) for x in line.split())
    return np.asarray(vals)


def _read_rows(path: str, skip_comments: bool = True) -> List[List[float]]:
    rows = []
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith("#"):
                continue
            rows.append([float(x) for x in s.split()])
    return rows


class _PKBase(Likelihood):
    """Shared scaling + marginalization machinery."""
    kind = "MPK"
    speed = Speed.FAST
    needs_matter_power = True
    #: set in subclass __init__ once the dataset redshift is known
    required_zmax = 0.0

    def _resolve(self, ddir, f):
        f = f.replace("%DATASETDIR%", "")
        for cand in (os.path.join(ddir, os.path.basename(f)),
                     os.path.join(os.path.dirname(ddir), f), f):
            if os.path.isfile(cand):
                return cand
        raise FileNotFoundError(f"{self.name}: {f}")

    def _scaling(self, theory):
        """a_scl = DV_fid / (H0 * D_V(z)) (mpk.f90 compute_scaling_factor)."""
        if not self.use_scaling:
            return jnp.asarray(1.0, self.dtype)
        dv = bgm.bao_d_v(theory.bf, self.redshift)
        return jnp.asarray(self.DV_fid, self.dtype) / (theory.bg.H0 * dv)

    def _theory_pk_h(self, theory, kh_data, a_scl):
        """Theory P(k) at the dataset redshift in h-units, D_V-scaled.
        kh_data: (nkbands,) in h/Mpc."""
        from cosmomc_tpu.models.matterpower import power_at
        mp = theory.mp
        if mp is None:
            raise ValueError(f"{self.name}: posterior has no matter power; "
                             "enable matter_power")
        h = mp.h
        kh = a_scl * jnp.asarray(kh_data, self.dtype)
        k = kh * h                                   # 1/Mpc
        zq = jnp.full(k.shape, self.redshift, self.dtype)
        P = power_at(mp, k, zq, nonlinear=self.nonlinear)
        return P * h ** 3 / a_scl ** 3, kh



class MPKLikelihood(_PKBase):
    """Generic windowed P(k) dataset (mpk.f90 MPKLikelihood)."""

    def __init__(self, dataset_path: str, name: Optional[str] = None,
                 nonlinear: bool = False, dtype=jnp.float64):
        ini = read_dataset_ini(dataset_path)
        super().__init__(name or ini.string("name", "MPK"))
        self.dtype = dtype
        self.nonlinear = nonlinear
        ddir = os.path.dirname(os.path.abspath(dataset_path))

        n_pts = ini.int("num_mpk_points_full", required=True)
        n_kb = ini.int("num_mpk_kbands_full", required=True)
        pmin = ini.int("min_mpk_points_use", 1) - 1
        pmax = ini.int("max_mpk_points_use", n_pts)
        kmin = ini.int("min_mpk_kbands_use", 1) - 1
        kmax = ini.int("max_mpk_kbands_use", n_kb)

        kb = _read_numbers(self._resolve(ddir, ini.string("kbands_file",
                                                          required=True)))
        self.kh = kb[:n_kb][kmin:kmax]
        rows = _read_rows(self._resolve(ddir, ini.string("measurements_file",
                                                         required=True)))
        m = np.asarray(rows[:n_pts])[pmin:pmax]
        self.P_data = m[:, 3]
        sdev = m[:, 4]
        W = np.loadtxt(self._resolve(ddir, ini.string("windows_file",
                                                      required=True)))
        self.W = W.reshape(n_pts, n_kb)[pmin:pmax, kmin:kmax]
        cov_f = ini.string("cov_file")
        if cov_f:
            cov = np.loadtxt(self._resolve(ddir, cov_f)).reshape(n_pts, n_pts)
            self.invcov = np.linalg.inv(cov[pmin:pmax, pmin:pmax])
        else:
            self.invcov = np.diag(1.0 / sdev ** 2)

        self.use_scaling = ini.bool("use_scaling", False)
        self.DV_fid = ini.float("DV_fid", -1.0)
        self.redshift = ini.float("redshift", 0.35)
        self.Q_marge = ini.bool("Q_marge", False)
        self.Q_flat = ini.bool("Q_flat", False)
        self.Q_mid = ini.float("Q_mid", 0.0)
        self.Q_sigma = ini.float("Q_sigma", 0.0)
        self.Ag = ini.float("Ag", 1.4)
        self.required_zmax = float(self.redshift)

    def log_like(self, theory, nuisance: jnp.ndarray) -> jnp.ndarray:
        a_scl = self._scaling(theory)
        P_lin, kh = self._theory_pk_h(theory, self.kh, a_scl)
        W = jnp.asarray(self.W, self.dtype)
        icov = jnp.asarray(self.invcov, self.dtype)
        Pd = jnp.asarray(self.P_data, self.dtype)
        covdat = icov @ Pd

        if self.Q_marge and self.Q_flat:
            # flat prior on (b^2, b^2 Q): 2x2 analytic marginalization
            Pth = P_lin / (1.0 + self.Ag * kh)
            Pk2 = Pth * kh ** 2
            WPth = W @ Pth
            WPk2 = W @ Pk2
            covth = icov @ WPth
            covk2 = icov @ WPk2
            M11 = covth @ WPth
            M22 = covk2 @ WPk2
            M12 = covth @ WPk2
            det = M11 * M22 - M12 ** 2
            v1 = covdat @ WPth
            v2 = covdat @ WPk2
            quad = (M22 * v1 * v1 - 2 * M12 * v1 * v2 + M11 * v2 * v2) / det
            return 0.5 * (Pd @ covdat - quad + jnp.log(det))

        def chisq_of(Q):
            Pth = (P_lin * (1.0 + Q * kh ** 2) / (1.0 + self.Ag * kh)
                   if self.Q_marge else P_lin)
            WPth = W @ Pth
            covth = icov @ WPth
            normV = WPth @ covth
            return (Pd @ covdat - (WPth @ covdat) ** 2 / normV
                    + jnp.log(normV))

        if not self.Q_marge or self.Q_sigma == 0:
            return 0.5 * chisq_of(self.Q_mid)
        iQ = jnp.arange(-_NQ, _NQ + 1, dtype=self.dtype)
        Qs = self.Q_mid + iQ * self.Q_sigma * _DQ
        chis = jax_vmap_chisq(chisq_of, Qs)
        w = jnp.exp(-(iQ * _DQ) ** 2 / 2.0)
        mc = jnp.min(chis)
        like = jnp.sum(jnp.exp(-(chis - mc) / 2.0) * w) / jnp.sum(w)
        return -jnp.log(jnp.maximum(like, 1e-300)) + mc / 2.0


def jax_vmap_chisq(fn, Qs):
    import jax
    return jax.vmap(fn)(Qs)


# WiggleZ redshift bins (wigglez.f90:34)
_WIGGLEZ_Z = {0.22: 1, 0.41: 2, 0.6: 3, 0.78: 4}

# GiggleZ polynomial fits per redshift bin (wigglez.f90 GiggleZtoICsmooth)
_GIGGLEZ_POLY = {
    1: [4.619, -13.7787, 58.941, -175.24, 284.321, -187.284],
    2: [4.63079, -12.6293, 42.9265, -91.8068, 97.808, -37.633],
    3: [4.69659, -12.7287, 42.5681, -89.5578, 96.664, -41.2564],
    4: [4.6849, -13.4747, 53.7172, -145.832, 216.638, -132.782],
}
_GIGGLEZ_FILES = {1: "gigglezfiducialmodel_matterpower_a.dat",
                  2: "gigglezfiducialmodel_matterpower_b.dat",
                  3: "gigglezfiducialmodel_matterpower_c.dat",
                  4: "gigglezfiducialmodel_matterpower_d.dat"}
_REGION_KEYS = ["Use_9-hr_region", "Use_11-hr_region", "Use_15-hr_region",
                "Use_22-hr_region", "Use_1-hr_region", "Use_3-hr_region",
                "Use_0-hr_region"]


class WiggleZLikelihood(_PKBase):
    """One WiggleZ redshift bin, all active sky regions
    (wigglez.f90 WiggleZLikelihood; data files wigglez_nov11{a..d})."""

    def __init__(self, dataset_path: str, common_path: Optional[str] = None,
                 name: Optional[str] = None, use_gigglez: bool = True,
                 nonlinear: bool = True, dtype=jnp.float64):
        ini = read_dataset_ini(dataset_path)
        ddir = os.path.dirname(os.path.abspath(dataset_path))
        common = read_dataset_ini(common_path or os.path.join(
            ddir, "wigglez_nov11_common.dataset"))
        super().__init__(name or ini.string("name", "WiggleZ"))
        self.dtype = dtype
        self.nonlinear = nonlinear
        self.use_gigglez = use_gigglez
        self.redshift = ini.float("redshift", required=True)
        self.zbin = _WIGGLEZ_Z[round(self.redshift, 2)]
        self.use_scaling = common.bool("use_scaling", True)
        self.DV_fid = ini.float("DV_fid", -1.0)
        self.Q_marge = common.bool("Q_marge", False)
        self.Q_mid = common.float("Q_mid", 0.0)
        self.Q_sigma = common.float("Q_sigma", 0.0)
        self.Ag = common.float("Ag", 1.4)
        self.required_zmax = float(self.redshift)

        n_pts = common.int("num_mpk_points_full", 50)
        n_kb = common.int("num_mpk_kbands_full", 100)
        pmin = common.int("min_mpk_points_use", 1) - 1
        pmax = common.int("max_mpk_points_use", n_pts)
        kmin = common.int("min_mpk_kbands_use", 1) - 1
        kmax = common.int("max_mpk_kbands_use", n_kb)
        active = [common.bool(k, True) for k in _REGION_KEYS]

        kb = _read_numbers(self._resolve(ddir, common.string(
            "kbands_file", "data/wigglez_nov11_kbands.txt")))
        self.kh = kb[:n_kb][kmin:kmax]

        rows = _read_rows(self._resolve(ddir, ini.string("measurements_file",
                                                         required=True)))
        assert len(rows) == 7 * n_pts, len(rows)
        W_all = np.loadtxt(self._resolve(ddir, ini.string("windows_file",
                                                          required=True)))
        W_all = W_all.reshape(7, n_pts, n_kb)
        C_all = np.loadtxt(self._resolve(ddir, ini.string("cov_file",
                                                          required=True)))
        C_all = C_all.reshape(7, n_pts, n_pts)

        P_regions, W_regions, IC_regions = [], [], []
        for r in range(7):
            if not active[r]:
                continue
            m = np.asarray(rows[r * n_pts:(r + 1) * n_pts])[pmin:pmax]
            P_regions.append(m[:, 3])
            W_regions.append(W_all[r][pmin:pmax, kmin:kmax])
            IC_regions.append(np.linalg.inv(C_all[r][pmin:pmax, pmin:pmax]))
        self.P_data = np.stack(P_regions)        # (nreg, npts)
        self.W = np.stack(W_regions)             # (nreg, npts, nkb)
        self.invcov = np.stack(IC_regions)       # (nreg, npts, npts)

        if use_gigglez:
            gig = _read_rows(self._resolve(ddir, _GIGGLEZ_FILES[self.zbin]))
            g = np.asarray(gig)
            self._gig_logk = np.log(g[:, 0])
            self._gig_logP = np.log(g[:, 1])
            # descending order for polyval
            self._gig_poly = np.asarray(_GIGGLEZ_POLY[self.zbin][::-1])

    def _gigglez_correct(self, P, kh):
        """P *= 10^poly(kh) / PK_gigglez(kh) (wigglez.f90 WiggleZPowerAt)."""
        fid = 10.0 ** jnp.polyval(jnp.asarray(self._gig_poly, self.dtype), kh)
        tab = jnp.exp(jnp.interp(jnp.log(kh),
                                 jnp.asarray(self._gig_logk, self.dtype),
                                 jnp.asarray(self._gig_logP, self.dtype)))
        return P * fid / tab

    def log_like(self, theory, nuisance: jnp.ndarray) -> jnp.ndarray:
        a_scl = self._scaling(theory)
        P_lin, kh = self._theory_pk_h(theory, self.kh, a_scl)
        if self.use_gigglez:
            P_lin = self._gigglez_correct(P_lin, kh)
        W = jnp.asarray(self.W, self.dtype)          # (nreg, npts, nkb)
        IC = jnp.asarray(self.invcov, self.dtype)    # (nreg, npts, npts)
        Pd = jnp.asarray(self.P_data, self.dtype)    # (nreg, npts)
        covdat = jnp.einsum("rij,rj->ri", IC, Pd)

        def chisq_of(Q):
            Pth = (P_lin * (1.0 + Q * kh ** 2) / (1.0 + self.Ag * kh)
                   if self.Q_marge else P_lin)
            WPth = jnp.einsum("rik,k->ri", W, Pth)
            covth = jnp.einsum("rij,rj->ri", IC, WPth)
            normV = jnp.sum(WPth * covth)
            # single-bias marginalization across regions; NOTE the log-normV
            # term is dropped (commented out in wigglez.f90:619)
            return (jnp.sum(Pd * covdat)
                    - jnp.sum(WPth * covdat) ** 2 / normV)

        if not self.Q_marge or self.Q_sigma == 0:
            return 0.5 * chisq_of(self.Q_mid)
        iQ = jnp.arange(-_NQ, _NQ + 1, dtype=self.dtype)
        Qs = self.Q_mid + iQ * self.Q_sigma * _DQ
        chis = jax_vmap_chisq(chisq_of, Qs)
        w = jnp.exp(-(iQ * _DQ) ** 2 / 2.0)
        mc = jnp.min(chis)
        like = jnp.sum(jnp.exp(-(chis - mc) / 2.0) * w) / jnp.sum(w)
        return -jnp.log(jnp.maximum(like, 1e-300)) + mc / 2.0
