"""BICEP/Keck/Planck B-mode likelihood: CMBlikes + dust/sync foregrounds.

Reference: source/CMB_BK_Planck.f90 (TBK_planck) — extends the generic
CMBlikes engine with a multi-component foreground model added to the EE/BB
theory spectra before binning:

  * modified-blackbody dust scaled from a pivot frequency (353 GHz) through
    each map's measured bandpass (DustScaling, :116-165);
  * power-law synchrotron from its pivot (23 GHz for BK15) (SyncScaling);
  * a dust-sync correlated component;
  * frequency decorrelation of dust/sync cross-spectra, with the BK15
    paper's exponential remapping (Decorrelation, :197-243, BK15 App. F);
  * band-center error parameters gamma_* multiplying effective frequencies.

TPU-native design: bandpass tables are loaded host-side; the traced
evaluation integrates the greybody/power-law SEDs over all bandpasses as
one batched sum (the SED exponents are sampled parameters, so the
integration must stay inside the trace), then adds the three l-power-law
components to every EE/BB pair with one fused `where`. All 16 foreground
parameters follow the dataset's `.paramnames` order; fixed entries take
their ini centers (BK15 defaults from batch3/BK15.ini).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import read_dataset_ini
from cosmomc_tpu.likelihoods.cmblikes import CMBLikes, FIELD_E, FIELD_B

T_CMB = 2.72548
GHZ_KELVIN = 6.62606957e-34 / 1.3806488e-23 * 1e9   # h nu / k_B per GHz

L_PIVOT = 80.0

# baseline BK15 parameter setup (batch3/BK15.ini): (center,) = fixed,
# 5-tuple = varying
BK15_PARAM_DEFAULTS: Dict[str, Sequence[float]] = {
    "BBdust": (3.0, 0.0, 15.0, 0.1, 0.1),
    "BBsync": (1.0, 0.0, 50.0, 1.0, 1.0),
    "BBalphadust": (-0.42, -1.0, 0.0, 0.01, 0.01),
    "BBbetadust": (1.59, 1.04, 2.14, 0.02, 0.02),
    "BBTdust": (19.6,),
    "BBalphasync": (-0.6, -1.0, 0.0, 0.01, 0.01),
    "BBbetasync": (-3.1, -4.5, -2.0, 0.02, 0.02),
    "BBdustsynccorr": (0.2, -1.0, 1.0, 0.01, 0.01),
    "EEtoBB_dust": (2.0,),
    "EEtoBB_sync": (2.0,),
    "Delta_dust": (1.0,),
    "Delta_sync": (1.0,),
    "gamma_corr": (0.0,),
    "gamma_95": (0.0,),
    "gamma_150": (0.0,),
    "gamma_220": (0.0,),
}
BK15_PRIORS = {"BBbetadust": (1.59, 0.11), "BBbetasync": (-3.1, 0.3)}


def _thermo_weight(nu):
    """d B_nu/dT blackbody weight ~ nu^4 e^x/(e^x-1)^2, x = h nu/(k T_cmb)."""
    x = GHZ_KELVIN * nu / T_CMB
    return nu ** 4 * jnp.exp(x) / jnp.expm1(x) ** 2


class Bandpass:
    """One map's bandpass table + precomputed pivot conversions
    (TBandpass + TBK_planck_Read_Bandpass, CMB_BK_Planck.f90:74-110)."""

    def __init__(self, path: str, fpivot_dust: float, fpivot_sync: float):
        R = np.loadtxt(path)
        nu = R[:, 0]
        dnu = np.empty_like(nu)
        dnu[0] = nu[1] - nu[0]
        dnu[1:-1] = (nu[2:] - nu[:-2]) / 2
        dnu[-1] = nu[-1] - nu[-2]
        self.nu = nu
        self.resp = R[:, 1]
        self.dnu = dnu
        x = GHZ_KELVIN * nu / T_CMB
        th_int = np.sum(dnu * self.resp * nu ** 4 * np.exp(x)
                        / np.expm1(x) ** 2)
        th0 = lambda nu0: (nu0 ** 4 * np.exp(GHZ_KELVIN * nu0 / T_CMB)
                           / np.expm1(GHZ_KELVIN * nu0 / T_CMB) ** 2)
        self.th_dust = th_int / th0(fpivot_dust)
        self.th_sync = th_int / th0(fpivot_sync)
        self.nu_bar = np.sum(dnu * nu * self.resp) / np.sum(dnu * self.resp)


class BKPlanckLikelihood(CMBLikes):
    """BK15/BKPlanck-style B-mode likelihood with foregrounds."""

    def __init__(self, dataset_path: str, name: str = "",
                 dataset_overrides: Optional[Dict[str, str]] = None,
                 param_specs: Optional[Dict[str, Sequence[float]]] = None,
                 dtype=jnp.float64):
        specs = dict(BK15_PARAM_DEFAULTS)
        specs.update(param_specs or {})
        super().__init__(dataset_path, name=name,
                         dataset_overrides=dataset_overrides,
                         param_specs=specs, dtype=dtype)

    def _read_ini(self, ini) -> None:
        super()._read_ini(ini)
        self.fpivot_dust = ini.float("fpivot_dust", 353.0)
        self.fpivot_sync = ini.float("fpivot_sync", 23.0)
        self.fpivot_dust_decorr = (ini.float("fpivot_dust_decorr(1)", 217.0),
                                   ini.float("fpivot_dust_decorr(2)", 353.0))
        self.fpivot_sync_decorr = (ini.float("fpivot_sync_decorr(1)", 23.0),
                                   ini.float("fpivot_sync_decorr(2)", 33.0))
        self.lform_dust_decorr = ini.string("lform_dust_decorr", "flat")
        self.lform_sync_decorr = ini.string("lform_sync_decorr", "flat")

        # nuisance parameters in .paramnames order = DataParams order
        pn_file = self._rel(ini, "nuisance_params", required=True)
        n_before = len(self.nuisance)
        self.add_nuisance_from_paramnames(pn_file)
        fg_params = self.nuisance[n_before:]
        self._fg_names = [p.name for p in fg_params]
        self._fg_centers = np.array([p.center for p in fg_params])
        # priors from the baseline ini (batch3/BK15.ini)
        for p in fg_params:
            if p.name in BK15_PRIORS and p.prior_std is None:
                p.prior_mean, p.prior_std = BK15_PRIORS[p.name]
        # map DataParams slot -> position among the *varying* nuisance
        # params, which is what log_like's nuisance slice contains
        varying_before = sum(1 for p in self.nuisance[:n_before] if p.varying)
        pos = varying_before
        self._fg_slice_pos = np.full(len(fg_params), -1, int)
        for i, p in enumerate(fg_params):
            if p.varying:
                self._fg_slice_pos[i] = pos
                pos += 1

        # bandpasses for every required map, in required order
        # (CMB_BK_Planck.f90:66-70)
        self.bandpasses: List[Bandpass] = []
        self._gamma_slot = np.zeros(self.nmaps_required, int)  # 0=none,1..3
        for i, mi in enumerate(self.required_order):
            mname = self.map_names[mi]
            path = self._rel(ini, f"bandpass[{mname}]", required=True)
            self.bandpasses.append(
                Bandpass(path, self.fpivot_dust, self.fpivot_sync))
            if "95" in mname:
                self._gamma_slot[i] = 1
            elif "150" in mname:
                self._gamma_slot[i] = 2
            elif "220" in mname:
                self._gamma_slot[i] = 3
        # dense bandpass operands (padded to common length for one batch sum)
        nmax = max(len(b.nu) for b in self.bandpasses)
        pad = lambda a: np.pad(a, (0, nmax - len(a)))
        self._bp_nu = np.stack([pad(b.nu) for b in self.bandpasses])
        self._bp_w = np.stack([pad(b.dnu * b.resp) for b in self.bandpasses])
        self._bp_th_dust = np.array([b.th_dust for b in self.bandpasses])
        self._bp_th_sync = np.array([b.th_sync for b in self.bandpasses])
        self._bp_nu_bar = np.array([b.nu_bar for b in self.bandpasses])

        # per-required-pair field classification for the foreground add
        self._pair_is_EE = np.array([f1 == FIELD_E and f2 == FIELD_E
                                     for f1, f2 in self.req_theory_pairs])
        self._pair_is_BB = np.array([f1 == FIELD_B and f2 == FIELD_B
                                     for f1, f2 in self.req_theory_pairs])
        self._pair_i = np.array([i for i, _ in self.req_pairs])
        self._pair_j = np.array([j for _, j in self.req_pairs])

    # ---------------------------------------------------------------- model

    def _data_params(self, nuisance: jnp.ndarray) -> jnp.ndarray:
        """Assemble the 16-slot DataParams vector (fixed -> centers)."""
        vals = jnp.asarray(self._fg_centers, nuisance.dtype)
        for i, pos in enumerate(self._fg_slice_pos):
            if pos >= 0:
                vals = vals.at[i].set(nuisance[pos])
        return vals

    def _dust_scaling(self, beta, Tdust, bandcenter_err):
        """Greybody scaling per required map (DustScaling, :116-165).
        All-maps batched; traced in (beta, Tdust, bandcenter_err)."""
        nu = jnp.asarray(self._bp_nu, beta.dtype)
        w = jnp.asarray(self._bp_w, beta.dtype)
        gb_int = jnp.sum(w * jnp.where(nu > 0, nu, 1.0) ** (3 + beta)
                         / jnp.expm1(GHZ_KELVIN * jnp.maximum(nu, 1e-3)
                                     / Tdust) * (nu > 0), axis=1)
        nu0 = self.fpivot_dust
        gb0 = nu0 ** (3 + beta) / jnp.expm1(GHZ_KELVIN * nu0 / Tdust)
        nub = jnp.asarray(self._bp_nu_bar, beta.dtype)
        th_err = (bandcenter_err ** 4
                  * jnp.exp(GHZ_KELVIN * nub * (bandcenter_err - 1) / T_CMB)
                  * jnp.expm1(GHZ_KELVIN * nub / T_CMB) ** 2
                  / jnp.expm1(GHZ_KELVIN * nub * bandcenter_err / T_CMB) ** 2)
        gb_err = (bandcenter_err ** (3 + beta)
                  * jnp.expm1(GHZ_KELVIN * nub / Tdust)
                  / jnp.expm1(GHZ_KELVIN * nub * bandcenter_err / Tdust))
        th = jnp.asarray(self._bp_th_dust, beta.dtype)
        return (gb_int / gb0) / th * (gb_err / th_err)

    def _sync_scaling(self, beta, bandcenter_err):
        """Power-law scaling per required map (SyncScaling, :167-196)."""
        nu = jnp.asarray(self._bp_nu, beta.dtype)
        w = jnp.asarray(self._bp_w, beta.dtype)
        pl_int = jnp.sum(w * jnp.where(nu > 0, nu, 1.0) ** (2 + beta)
                         * (nu > 0), axis=1)
        pl0 = self.fpivot_sync ** (2 + beta)
        nub = jnp.asarray(self._bp_nu_bar, beta.dtype)
        th_err = (bandcenter_err ** 4
                  * jnp.exp(GHZ_KELVIN * nub * (bandcenter_err - 1) / T_CMB)
                  * jnp.expm1(GHZ_KELVIN * nub / T_CMB) ** 2
                  / jnp.expm1(GHZ_KELVIN * nub * bandcenter_err / T_CMB) ** 2)
        pl_err = bandcenter_err ** (2 + beta)
        th = jnp.asarray(self._bp_th_sync, beta.dtype)
        return (pl_int / pl0) / th * (pl_err / th_err)

    def _decorrelation(self, Delta, nu_i, nu_j, nupivot, lform, ells):
        """Frequency-decorrelation factor per (pair, l), with the BK15
        exponential remapping (Decorrelation, :197-243)."""
        scl_nu = (jnp.log(nu_i / nu_j) ** 2
                  / np.log(nupivot[0] / nupivot[1]) ** 2)
        if lform == "lin":
            scl_ell = ells / L_PIVOT
        elif lform == "quad":
            scl_ell = (ells / L_PIVOT) ** 2
        else:
            scl_ell = jnp.ones_like(ells)
        arg = scl_nu[:, None] * scl_ell[None, :]
        # remap: Delta<=1 -> exp(ln(Delta) s); Delta>1 -> 2 - exp(ln(2-D) s)
        safe_lo = jnp.exp(jnp.log(jnp.clip(Delta, 1e-10, 1.0)) * arg)
        safe_hi = 2.0 - jnp.exp(jnp.log(jnp.clip(2.0 - Delta, 1e-10, None)) * arg)
        return jnp.where(Delta > 1.0, safe_hi, safe_lo)

    def add_foregrounds(self, cls_req: jnp.ndarray, nuisance: jnp.ndarray
                        ) -> jnp.ndarray:
        """(TBK_planck_AddForegrounds, CMB_BK_Planck.f90:245-344)."""
        dp = self._data_params(nuisance)
        (Adust, Async, alphadust, betadust, Tdust, alphasync, betasync,
         dustsync_corr, EEtoBB_dust, EEtoBB_sync, Delta_dust, Delta_sync,
         gamma_corr, gamma_95, gamma_150, gamma_220) = [dp[i] for i in range(16)]

        gammas = jnp.stack([jnp.zeros_like(gamma_95), gamma_95, gamma_150,
                            gamma_220])
        has_gamma = jnp.asarray((self._gamma_slot > 0), dp.dtype)
        bce = 1.0 + has_gamma * gamma_corr + gammas[self._gamma_slot]

        fdust = self._dust_scaling(betadust, Tdust, bce)   # (nmaps_req,)
        fsync = self._sync_scaling(betasync, bce)

        ells = jnp.arange(self.pcl_lmin, self.pcl_lmax + 1, dtype=dp.dtype)
        lr = ells / L_PIVOT
        dustpow = Adust * lr ** alphadust
        syncpow = Async * lr ** alphasync
        dustsyncpow = (dustsync_corr * jnp.sqrt(Adust * Async)
                       * lr ** ((alphadust + alphasync) / 2))

        i, j = self._pair_i, self._pair_j
        dust = fdust[i] * fdust[j]
        sync = fsync[i] * fsync[j]
        dustsync = fdust[i] * fsync[j] + fsync[i] * fdust[j]
        is_EE = jnp.asarray(self._pair_is_EE)
        is_BB = jnp.asarray(self._pair_is_BB)
        dust = jnp.where(is_EE, dust * EEtoBB_dust, dust)
        sync = jnp.where(is_EE, sync * EEtoBB_sync, sync)
        dustsync = jnp.where(is_EE, dustsync
                             * jnp.sqrt(EEtoBB_dust * EEtoBB_sync), dustsync)

        # decorrelation only on cross-frequency spectra (i != j)
        nub = jnp.asarray(self._bp_nu_bar, dp.dtype) * bce
        dd = self._decorrelation(Delta_dust, nub[i], nub[j],
                                 self.fpivot_dust_decorr,
                                 self.lform_dust_decorr, ells)
        ds = self._decorrelation(Delta_sync, nub[i], nub[j],
                                 self.fpivot_sync_decorr,
                                 self.lform_sync_decorr, ells)
        auto = (i == j)[:, None]
        dd = jnp.where(auto, 1.0, dd)
        ds = jnp.where(auto, 1.0, ds)

        fg = (dust[:, None] * dustpow[None, :] * dd
              + sync[:, None] * syncpow[None, :] * ds
              + dustsync[:, None] * dustsyncpow[None, :])
        add = jnp.where((is_EE | is_BB)[:, None], fg, 0.0)
        return cls_req + add.astype(cls_req.dtype)
