"""Parameterizations: sampled-vector -> physical BackgroundParams.

Reference: source/CosmologyParameterizations.f90 — three parameterizations
selected by the `parameterization` ini key (CosmologyConfig.f90:58-85):

  - `theta` (default): ombh2, omch2, 100theta_MC, tau, ... with H0 solved by
    bisection on theta(H0) (TP_ParamArrayToTheoryParams :114-187);
  - `background`: omegam, H0, omk, mnu, w, wa, nnu; omnuh2 =
    mnu/94.07*(3.046/3)^0.75, everything else derived (:350-414);
  - `astro`: H0, omegam, omegab + power params (:416-527).

Here each parameterization is a pure function producing a BackgroundParams
pytree (plus extra blocks once the Boltzmann stage adds primordial power),
usable under jit/vmap/grad.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from cosmomc_tpu.models import constants as const
from cosmomc_tpu.models.background import BackgroundParams, h0_from_theta
from cosmomc_tpu.params.space import Param, ParameterSpace, Speed


def mnu_to_omnuh2(mnu, nnu=3.046):
    """Sum of neutrino masses (eV) -> omnuh2 (CosmologyParameterizations.f90
    BK_ParamArrayToTheoryParams: mnu/neutrino_mass_fac*(nnu_std/3)^0.75)."""
    return mnu / const.neutrino_mass_fac * (3.046 / 3.0) ** 0.75


class BackgroundParameterization:
    """Sampled: omegam, H0, omk, mnu, w, wa, nnu [+ ombh2 extension].

    The reference folds all matter minus neutrinos into `omb` since only
    total matter affects late-time background (:381-385); we instead keep
    ombh2 as an explicit (by default fixed) parameter because the drag
    sound horizon needs the baryon fraction. With ombh2 fixed to its
    default the background expansion matches the reference exactly.
    """

    names = ["omegam", "H0", "omk", "mnu", "w", "wa", "nnu", "ombh2"]

    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype

    def default_space(self, ini=None) -> ParameterSpace:
        sp = ParameterSpace()
        defaults = [
            Param("omegam", 0.3, 0.1, 0.7, 0.02, 0.02, r"\Omega_m", Speed.SLOW),
            Param("H0", 70.0, 40.0, 100.0, 2.0, 2.0, "H_0", Speed.SLOW),
            Param("omk", 0.0, 0.0, 0.0, 0, 0, r"\Omega_K", Speed.SLOW),
            Param("mnu", 0.06, 0.06, 0.06, 0, 0, r"\Sigma m_\nu", Speed.SLOW),
            Param("w", -1.0, -1.0, -1.0, 0, 0, "w", Speed.SLOW),
            Param("wa", 0.0, 0.0, 0.0, 0, 0, "w_a", Speed.SLOW),
            Param("nnu", 3.046, 3.046, 3.046, 0, 0, "N_{eff}", Speed.SLOW),
            # BBN-anchored baryon density (for r_drag); Cooke+18 prior
            Param("ombh2", 0.02236, 0.019, 0.026, 0.0005, 0.0005,
                  r"\Omega_b h^2", Speed.SLOW, prior_mean=0.02236,
                  prior_std=0.00036),
        ]
        for p in defaults:
            if ini is not None and f"param[{p.name}]" in ini:
                parts = [float(x) for x in ini.string(f"param[{p.name}]").split()]
                if len(parts) == 1:
                    p = Param(p.name, parts[0], parts[0], parts[0], 0, 0,
                              p.label, p.speed)
                else:
                    p = Param(p.name, *parts[:5], label=p.label, speed=p.speed)
            sp.add(p)
        return sp

    def to_background(self, full_P: jnp.ndarray) -> BackgroundParams:
        """full_P: vector over self.names order (fixed values embedded)."""
        omegam, H0, omk, mnu, w, wa, nnu, ombh2 = full_P[:8]
        h2 = (H0 / 100.0) ** 2
        omnuh2 = mnu_to_omnuh2(mnu, nnu)
        omch2 = omegam * h2 - omnuh2 - ombh2
        return BackgroundParams(
            ombh2=ombh2, omch2=omch2, H0=H0, omk=omk, omnuh2=omnuh2,
            nnu=nnu, w=w, wa=wa,
            tcmb=jnp.asarray(const.COBE_CMBTemp, full_P.dtype),
            num_massive_nu=1)


class AstroParameterization:
    """Sampled: omegam, omegab, H0, omk, mnu, w, wa, nnu — the reference's
    `astro` parameterization for LSS-only runs (AP_ParamArrayToTheoryParams,
    CosmologyParameterizations.f90:448-500).

    Deviations (documented): the primordial block is added by the pipeline
    as (logA, ns) rather than sampling 10^9 As directly — a monotone
    reparameterization; tau is carried as a fixed parameter so the thermal
    history is well-defined (the reference zeroes it; astro runs use no
    CMB likelihoods so it only perturbs P(k) negligibly)."""

    names = ["omegam", "omegab", "H0", "omk", "mnu", "w", "wa", "nnu", "tau"]

    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype

    def default_space(self, ini=None) -> ParameterSpace:
        sp = ParameterSpace()
        specs = [
            Param("omegam", 0.3, 0.1, 0.7, 0.02, 0.02, r"\Omega_m", Speed.SLOW),
            Param("omegab", 0.0462, 0.03, 0.07, 0.002, 0.002,
                  r"\Omega_b", Speed.SLOW),
            Param("H0", 70.0, 40.0, 100.0, 2.0, 2.0, "H_0", Speed.SLOW),
            Param("omk", 0.0, 0.0, 0.0, 0, 0, r"\Omega_K", Speed.SLOW),
            Param("mnu", 0.06, 0.06, 0.06, 0, 0, r"\Sigma m_\nu", Speed.SLOW),
            Param("w", -1.0, -1.0, -1.0, 0, 0, "w", Speed.SLOW),
            Param("wa", 0.0, 0.0, 0.0, 0, 0, "w_a", Speed.SLOW),
            Param("nnu", 3.046, 3.046, 3.046, 0, 0, "N_{eff}", Speed.SLOW),
            Param("tau", 0.055, 0.055, 0.055, 0, 0, r"\tau", Speed.SLOW),
        ]
        for p in specs:
            if ini is not None and f"param[{p.name}]" in ini:
                parts = [float(x) for x in ini.string(f"param[{p.name}]").split()]
                if len(parts) == 1:
                    p = Param(p.name, parts[0], parts[0], parts[0], 0, 0,
                              p.label, p.speed)
                else:
                    p = Param(p.name, *parts[:5], label=p.label, speed=p.speed)
            sp.add(p)
        return sp

    def to_background(self, full_P: jnp.ndarray) -> BackgroundParams:
        omegam, omegab, H0, omk, mnu, w, wa, nnu = full_P[:8]
        h2 = (H0 / 100.0) ** 2
        omnuh2 = mnu_to_omnuh2(mnu, nnu)
        ombh2 = omegab * h2
        omch2 = omegam * h2 - ombh2 - omnuh2
        return BackgroundParams(
            ombh2=ombh2, omch2=omch2, H0=H0, omk=omk, omnuh2=omnuh2,
            nnu=nnu, w=w, wa=wa,
            tcmb=jnp.asarray(const.COBE_CMBTemp, full_P.dtype),
            num_massive_nu=1)


class ThetaParameterization:
    """Sampled: ombh2, omch2, 100theta_MC, [tau], omk, mnu, w, wa, nnu.

    H0 found by bisection on theta(H0) (TP_ParamArrayToTheoryParams
    :114-187); H0 prior range [20,100] enforced as in the reference
    (:90-112). tau enters only once the CMB stage exists.
    """

    names = ["ombh2", "omch2", "theta", "tau", "omk", "mnu", "w", "wa",
             "nnu", "alpha1"]

    def __init__(self, dtype=jnp.float64, h0_min=20.0, h0_max=100.0,
                 bisect_iters=47):
        self.dtype = dtype
        self.h0_min = h0_min
        self.h0_max = h0_max
        self.bisect_iters = bisect_iters

    def default_space(self, ini=None) -> ParameterSpace:
        sp = ParameterSpace()
        specs = [
            Param("ombh2", 0.0221, 0.005, 0.1, 0.0001, 0.0001,
                  r"\Omega_b h^2", Speed.SLOW),
            Param("omch2", 0.12, 0.001, 0.99, 0.001, 0.0005,
                  r"\Omega_c h^2", Speed.SLOW),
            Param("theta", 1.0411, 0.5, 10.0, 0.0004, 0.0002,
                  r"100\theta_{MC}", Speed.SLOW),
            Param("tau", 0.055, 0.01, 0.8, 0.006, 0.003, r"\tau", Speed.SLOW),
            Param("omk", 0.0, 0.0, 0.0, 0, 0, r"\Omega_K", Speed.SLOW),
            Param("mnu", 0.06, 0.06, 0.06, 0, 0, r"\Sigma m_\nu", Speed.SLOW),
            Param("w", -1.0, -1.0, -1.0, 0, 0, "w", Speed.SLOW),
            Param("wa", 0.0, 0.0, 0.0, 0, 0, "w_a", Speed.SLOW),
            Param("nnu", 3.046, 3.046, 3.046, 0, 0, "N_{eff}", Speed.SLOW),
            # correlated CDM-isocurvature fraction (reference
            # params_CMB.paramnames alpha1; CosmologyParameterizations.f90
            # Params(12) iso_cdm_correlated). Fixed at 0 unless an ini
            # frees it: param[alpha1] = 0 -0.3 0.3 0.01 0.01
            Param("alpha1", 0.0, 0.0, 0.0, 0, 0, r"\alpha_{-1}",
                  Speed.SLOW),
        ]
        for p in specs:
            if ini is not None and f"param[{p.name}]" in ini:
                parts = [float(x) for x in ini.string(f"param[{p.name}]").split()]
                if len(parts) == 1:
                    p = Param(p.name, parts[0], parts[0], parts[0], 0, 0,
                              p.label, p.speed)
                else:
                    p = Param(p.name, *parts[:5], label=p.label, speed=p.speed)
            sp.add(p)
        return sp

    def to_background(self, full_P: jnp.ndarray) -> BackgroundParams:
        ombh2, omch2, theta = full_P[0], full_P[1], full_P[2]
        omk, mnu, w, wa, nnu = full_P[4], full_P[5], full_P[6], full_P[7], full_P[8]
        omnuh2 = mnu_to_omnuh2(mnu, nnu)
        tcmb = jnp.asarray(const.COBE_CMBTemp, full_P.dtype)

        def make_bg(H0):
            return BackgroundParams(
                ombh2=ombh2, omch2=omch2, H0=H0, omk=omk, omnuh2=omnuh2,
                nnu=nnu, w=w, wa=wa, tcmb=tcmb, num_massive_nu=1)

        H0 = h0_from_theta(theta, make_bg, self.h0_min, self.h0_max,
                           self.bisect_iters)
        return make_bg(H0)
