"""Full CMB theory assembly: params -> C_l spectra (+ P(k) transfers).

The TPU-native equivalent of the reference's CAMB_GetTransfers +
CAMB_TransfersToPowers pipeline (camb/camb.f90:25-102): background ->
recombination/thermal tables -> Einstein-Boltzmann evolution over k ->
line-of-sight C_l. All one pure jit-able function of the parameter pytree.

The slow/semi-slow split that CosmoMC's sampler exploits
(Calculator_CAMB.f90 two-stage compute) maps here to reusing
`PerturbationOutput` (transfers) across primordial-power changes:
`cls_from_transfers` is the cheap "TransfersToPowers" stage.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.perturbations import (build_thermo_funcs,
                                              evolve_perturbations,
                                              PerturbationOutput)
from cosmomc_tpu.models.cls import compute_cls, CMBSpectra
from cosmomc_tpu.models.primordial import PrimordialParams


def source_k_grid(kmax: float = 0.45, nk_log: int = 48, nk_lin: int = 200,
                  kmin: float = 8e-5, k_switch: float = 0.0115) -> np.ndarray:
    """Coarse k grid for source evolution: log-spaced through horizon
    scales, linear through the acoustic oscillations (the reference's
    SetkValuesForSources strategy, cmbmain.f90)."""
    klog = np.exp(np.linspace(np.log(kmin), np.log(k_switch), nk_log,
                              endpoint=False))
    klin = np.linspace(k_switch, kmax, nk_lin)
    return np.concatenate([klog, klin])


class CMBTheory(NamedTuple):
    spectra: CMBSpectra          # l(l+1)C_l/2pi in muK^2
    transfers: PerturbationOutput
    chi_star: jnp.ndarray
    tau0: jnp.ndarray


def compute_transfers(bg: BackgroundParams, tau_reion, yhe,
                      k: np.ndarray | jnp.ndarray,
                      z_outputs: Tuple[float, ...] = (0.0,),
                      return_thermo: bool = False,
                      n_step: int = 0,
                      massive_nu: bool = False,
                      de_perts: bool = False,
                      remat_chunks: int = 0,
                      iso_cdm_amp=0.0):
    """Slow stage: thermal history + Boltzmann evolution (the analog of
    CAMB_GetTransfers). Returns (transfers, chi_star); with
    `return_thermo`, also the ThermoFuncs tables (so the tensor stage can
    share the same thermal history, camb.f90 CAMB_GetResults tensor pass).
    n_step = 0 uses the module-default tau grid length; massive_nu/de_perts
    enable the extended perturbation sectors (perturbations.make_rhs)."""
    if n_step:
        tf, tau0 = build_thermo_funcs(bg, yhe, tau_reion, n_step=n_step)
    else:
        tf, tau0 = build_thermo_funcs(bg, yhe, tau_reion)
    po = evolve_perturbations(bg, tf, tau0, jnp.asarray(k), z_outputs,
                              massive_nu=massive_nu, de_perts=de_perts,
                              remat_chunks=remat_chunks,
                              iso_cdm_amp=iso_cdm_amp)
    # chi_star: distance to the visibility peak
    ipk = jnp.argmax(tf.vis)
    chi_star = tau0 - tf.tau[ipk]
    if return_thermo:
        return po, chi_star, tf
    return po, chi_star


def cls_from_transfers(po: PerturbationOutput, chi_star, pp: PrimordialParams,
                       tcmb_k: float = 2.7255, lmax: int = 2500,
                       tau0_hint: float = 14700.0, kmax_hint: float = 0.6,
                       points_per_osc: float = 4.0,
                       coarse_k: np.ndarray | None = None,
                       tau_stride: int = 1) -> CMBSpectra:
    """Semi-slow stage (TransfersToPowers): apply primordial power, get
    C_l in l(l+1)C_l/2pi muK^2 units (reference CosmoTheory convention).
    Pass the concrete host `coarse_k` grid to enable the static cubic
    source interpolation (measured ~2%% acoustic bias without it)."""
    raw = compute_cls(po, pp, chi_star, lmax=lmax, tau0_hint=tau0_hint,
                      kmax_hint=kmax_hint, points_per_osc=points_per_osc,
                      coarse_k=coarse_k, tau_stride=tau_stride)
    muk2 = (tcmb_k * 1e6) ** 2
    return CMBSpectra(raw.ls, raw.tt * muk2, raw.te * muk2, raw.ee * muk2,
                      raw.pp)


def compute_cmb_theory(bg: BackgroundParams, pp: PrimordialParams,
                       tau_reion, yhe, lmax: int = 2500,
                       kmax: float = 0.45) -> CMBTheory:
    k = source_k_grid(kmax)
    po, chi_star = compute_transfers(bg, tau_reion, yhe, k)
    spec = cls_from_transfers(po, chi_star, pp,
                              tcmb_k=float(jnp.asarray(bg.tcmb)), lmax=lmax,
                              coarse_k=k)
    return CMBTheory(spec, po, chi_star, po.tau0)
