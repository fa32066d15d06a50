"""Posterior assembly: parameterization + theory + likelihood list -> logpost.

Plays the role of the reference's composition root (GeneralSetup.f90 TSetup +
calclike.f90 TTheoryLikeCalculator): wires the sampled parameter vector
through the parameterization to theory products, evaluates every registered
likelihood, and returns `(chi2/2 total, derived)` — all as one pure traced
function handed to the sampler.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import Likelihood, LikelihoodList
from cosmomc_tpu.models.theory import (compute_background_theory,
                                       background_derived,
                                       BACKGROUND_DERIVED_NAMES,
                                       CMBTheoryProducts)
from cosmomc_tpu.params.space import Param, ParameterSpace, Speed
from cosmomc_tpu.sampling.metropolis import make_bounded_posterior
from cosmomc_tpu.sampling.proposal import BlockedProposal
from cosmomc_tpu.utils.paramnames import ParamNames, ParamInfo


@dataclass
class BackgroundPosterior:
    """Background-only posterior (BASELINE config 1: BAO+SN+H0)."""
    parameterization: object          # has .to_background(full_P)
    space: ParameterSpace
    likes: LikelihoodList
    fixed_rs: Optional[float] = None
    dtype: object = jnp.float64

    def __post_init__(self):
        self.slices = self.likes.add_nuisance_to_space(self.space)
        self.varying_idx = self.space.varying_indices
        self._full_template = np.array([p.center for p in self.space.params])
        # drop derived params that are also sampled (e.g. H0 in the
        # background parameterization) — the sampled column already exists
        sampled = {p.name for p in self.space.params}
        self._derived_keep = [i for i, (n, _) in
                              enumerate(BACKGROUND_DERIVED_NAMES)
                              if n not in sampled]
        self.derived_names = [BACKGROUND_DERIVED_NAMES[i]
                              for i in self._derived_keep]
        self.num_derived = len(self.derived_names)

    def embed_full(self, varying: jnp.ndarray) -> jnp.ndarray:
        """Embed varying vector into the full parameter vector (traced)."""
        full = jnp.asarray(self._full_template, varying.dtype)
        return full.at[jnp.asarray(self.varying_idx)].set(varying)

    def raw_logpost(self) -> Callable:
        """P_varying -> (chi2/2, derived); to be wrapped with bounds/priors."""
        def fn(P):
            full = self.embed_full(P)
            bg = self.parameterization.to_background(full)
            th = compute_background_theory(bg, self.fixed_rs)
            total, _per = self.likes.total_log_like(th, P, self.slices)
            der = background_derived(th)
            return total, der[jnp.asarray(self._derived_keep, jnp.int32)]
        return fn

    def logpost(self) -> Callable:
        arr = self.space.device_arrays(self.dtype)
        return make_bounded_posterior(
            self.raw_logpost(), arr["lo"], arr["hi"],
            prior_arrays=arr, num_derived=self.num_derived)

    def per_likelihood(self, P_varying: np.ndarray) -> Dict[str, float]:
        """chi^2/2 per likelihood at one point (the action=4 table,
        GeneralSetup.f90:165-172)."""
        return _per_likelihood(self, P_varying)

    def paramnames(self) -> ParamNames:
        pn = self.space.param_names()
        for name, label in self.derived_names:
            pn.add(ParamInfo(name, label, derived=True))
        return pn

    def make_proposal(self, oversample_fast: int = 1,
                      propose_scale: float = 2.4) -> BlockedProposal:
        blocks = self.space.speed_blocks()
        n_slow_blocks = max(1, sum(1 for b in blocks if b and
                                   self.space.varying[b[0]].speed <= 1))
        return BlockedProposal(blocks, slow_block_max=n_slow_blocks,
                               oversample_fast=oversample_fast,
                               propose_scale=propose_scale)

    def start_positions(self, rng: np.random.Generator, nchains: int) -> np.ndarray:
        """Gaussian around center with start_width, truncated to bounds
        (BaseParameters.f90:85-105)."""
        var = self.space.varying
        out = np.empty((nchains, len(var)))
        for i, p in enumerate(var):
            vals = rng.normal(p.center, max(p.start_width, 1e-12), nchains)
            out[:, i] = np.clip(vals, p.min, p.max)
        return out


def _per_likelihood(post, P_varying) -> Dict[str, float]:
    """Evaluate each registered likelihood at one varying-parameter point.
    Host-side (one jit trace), used by the action=4 test gate."""
    P = jnp.asarray(P_varying, post.dtype)
    full = post.embed_full(P)
    if hasattr(post, "compute_theory"):
        theory, _ = post.compute_theory(full)
    else:
        bg = post.parameterization.to_background(full)
        th = compute_background_theory(bg, getattr(post, "fixed_rs", None))
        theory = th
    _, per = post.likes.total_log_like(theory, P, post.slices)
    per = np.asarray(per, np.float64)
    return {like.name: float(v) for like, v in zip(post.likes.likes, per)}


PRIMORDIAL_PARAMS = [
    Param("logA", 3.044, 1.61, 3.91, 0.001, 0.001,
          r"{\rm{ln}}(10^{10} A_s)", Speed.SEMISLOW),
    Param("ns", 0.965, 0.8, 1.2, 0.004, 0.002, "n_s", Speed.SEMISLOW),
]

# the reference's derived-parameter zoo (TP_CalcDerivedParams,
# CosmologyParameterizations.f90:189-272 + paramnames/params_CMB.paramnames,
# derived_theory/derived_bbn/derived_LSS.paramnames)
CMB_DERIVED_NAMES = [
    ("H0", "H_0"), ("omegam", r"\Omega_m"), ("omegal", r"\Omega_\Lambda"),
    ("omegamh2", r"\Omega_m h^2"), ("omeganuh2", r"\Omega_\nu h^2"),
    ("omegamh3", r"\Omega_m h^3"),
    ("zrei", "z_{re}"), ("A", "10^9 A_s"), ("clamp", r"10^9 A_s e^{-2\tau}"),
    ("yheused", "Y_P"), ("YpBBN", r"Y_P^{\rm{BBN}}"), ("DHBBN", r"10^5D/H"),
    ("age", r"{\rm{Age}}/{\rm{Gyr}}"),
    ("zstar", "z_*"), ("rstar", "r_*"), ("thetastar", r"100\theta_*"),
    ("DAstar", r"D_{\rm{M}}(z_*)/{\rm{Gpc}}"),
    ("zdrag", r"z_{\rm{drag}}"), ("rdrag", r"r_{\rm drag}"),
    ("rdragh", r"r_{\rm drag} h"),
    ("kd", r"k_{\rm D}"), ("thetad", r"100\theta_{\rm{D}}"),
    ("zeq", r"z_{\rm{eq}}"), ("keq", r"k_{\rm{eq}}"),
    ("thetaeq", r"100\theta_{\rm{eq}}"),
    ("thetarseq", r"100\theta_{\rm{s,eq}}"),
]

CMB_DERIVED_MP_NAMES = [
    ("sigma8", r"\sigma_8"), ("S8", "S_8"),
    ("s8omegamp5", r"\sigma_8 \Omega_m^{0.5}"),
    ("s8omegamp25", r"\sigma_8 \Omega_m^{0.25}"),
    ("s8h5", r"\sigma_8/h^{0.5}"),
]


def _ztag(z: float) -> str:
    """0.38 -> '038', 2.33 -> '233' (derived_LSS.paramnames convention)."""
    return f"{z:g}".replace(".", "")


@dataclass
class CMBPosterior:
    """Full CMB posterior: theta-parameterized LCDM -> Boltzmann C_l ->
    CMB + background likelihoods. The composition the reference wires for
    `parameterization = theta` + plik_lite/BAO runs (driver.F90 action=0;
    Calculator_CAMB two-stage compute; CalcLike_Cosmology.f90).

    Sampled blocks (BaseParameters.f90 SetFastSlowParams semantics):
      SLOW      ombh2, omch2, theta, tau (+ any varying of omk/mnu/w/wa/nnu)
      SEMISLOW  logA, ns           (primordial rescale reuses transfers)
      FAST      likelihood nuisance (A_planck, calibrations, ...)

    YHe follows BBN consistency (bbn_consistency=T default,
    CosmologyParameterizations.f90 SetForH): yhe = BBN(ombh2, nnu-3.046).
    """
    parameterization: object                 # ThetaParameterization
    space: ParameterSpace
    likes: LikelihoodList
    lmax: int = 2508
    kmax: float = 0.5
    lens_margin: int = 150                   # compute to lmax+margin, lens to lmax
    #: compute the Boltzmann C_l only to this l and fill (lmax_computed,
    #: lmax] with the fiducial lensed template normalized off TT at the
    #: boundary (Calculator_CAMB.f90:398-401 + LoadFiducialHighLTemplate).
    #: 0 = compute everything (no splice).
    lmax_computed: int = 0
    highl_template: str = ""                 # HighL_lensedCls.dat path
    matter_power: bool = False
    z_pk: Tuple[float, ...] = (0.0, 0.2, 0.38, 0.51, 0.61, 1.0, 2.0)
    #: background/LSS derived-output redshifts (CosmoSettings%z_outputs,
    #: batch3/common.ini 'derived_parameters' redshifts)
    z_outputs: Tuple[float, ...] = (0.38, 0.51, 0.61)
    n_step_boltzmann: int = 0                # 0 = module default
    #: (nk_log, nk_lin) override for the source k grid — smaller grids for
    #: cheap smoke/dryrun configs; None = module default
    source_nk: Optional[Tuple[int, int]] = None
    #: LOS integration method: "table" (Bessel-table gathers — fastest on
    #: CPU, exact f64 reference), "recurrence" (gather-free upward l-
    #: recurrence — the TPU path; the axon backend executes large gathers
    #: ~100x below memory speed and kills >60s kernels), or "auto" (pick
    #: by jax.default_backend() at first trace)
    los_method: str = "auto"
    #: LOS tau-grid subsampling stride (cls._strided_sources): the ODE
    #: grid is denser than the source integral needs; 4 cuts the dominant
    #: LOS cost 4x at a measured <0.1% C_l change. 1 = integrate on the
    #: full ODE grid (exact f64 reference configuration).
    los_tau_stride: int = 4
    #: scale the lensing-potential source by sqrt(P_NL/P_lin) (halofit at
    #: a fixed fiducial primordial spectrum) before the LOS integral —
    #: the reference's NonLinear_Lens Planck-baseline setting
    #: (cmbmain.f90 MakeNonlinearSources). Without it C_l^phiphi is
    #: 7-30% low at l>300 and the lensed TT damping tail ~-1% low.
    nonlinear_lens: bool = True
    #: extended perturbation sectors (perturbations.make_rhs): "auto"
    #: enables the massive-neutrino momentum hierarchy when mnu is SAMPLED
    #: (fixed mnu=0.06 keeps the documented <~0.1% massless approximation)
    #: and the DE fluid perturbations when w/wa are sampled or non-LCDM
    massive_nu_hierarchy: object = "auto"    # "auto" | bool
    de_perturbations: object = "auto"        # "auto" | bool
    #: sqrt-style checkpointing of the Boltzmann scan for reverse-mode
    #: (HMC/minimizer full-path gradients): 0 = off; ~64-128 bounds the
    #: reverse pass to ~(nstep/chunks + chunks) states instead of nstep
    remat_chunks: int = 0
    #: False = LSS-only run (astro parameterization): skip the C_l stack,
    #: compute only background + thermal history + matter power
    use_cmb: bool = True
    compute_tensors: bool = False            # r -> tensor TT/TE/EE/BB
    inflation_consistency: bool = True       # nt = -r/8
    dtype: object = jnp.float64
    bbn_table: object = None

    def __post_init__(self):
        # primordial block after the slow cosmological block
        for p in PRIMORDIAL_PARAMS:
            if p.name not in self.space:
                self.space.add(Param(**p.__dict__))
        if self.compute_tensors and "r" not in self.space:
            # test.ini's conventional range (compute_tensors=T + param[r])
            self.space.add(Param("r", 0.03, 0.0, 2.0, 0.04, 0.04, "r",
                                 Speed.SEMISLOW))
        self.slices = self.likes.add_nuisance_to_space(self.space)
        self.varying_idx = self.space.varying_indices
        self._full_template = np.array([p.center for p in self.space.params])
        self._i_logA = self.space.index("logA")
        self._i_ns = self.space.index("ns")
        self._i_tau = self.space.index("tau")
        self._i_r = self.space.index("r") if self.compute_tensors else None
        if self.bbn_table is None:
            from cosmomc_tpu.models.bbn import load_bbn_table
            self.bbn_table = load_bbn_table()
        # requirements aggregation across likelihoods (the role of
        # Initialize_CMBSettings / Initialize_PKSettings unions,
        # CosmologyTypes.f90:248-411).  Runs BEFORE the derived-name list
        # is frozen so a matter_power auto-enable keeps sigma8 in the
        # derived outputs.  A likelihood lmax need RAISES the computed
        # lmax (Initialize_CMBSettings takes the union, not an error).
        zmax_req = 0.0
        for like in self.likes.likes:
            need = getattr(like, "required_lmax", lambda: 0)()
            if need > self.lmax:
                self.lmax = int(need)
            if getattr(like, "needs_matter_power", False):
                self.matter_power = True
            if getattr(like, "required_kmax", 0.0) > self.kmax:
                self.kmax = float(like.required_kmax)
            zmax_req = max(zmax_req, getattr(like, "required_zmax", 0.0))
        if zmax_req > max(self.z_pk):
            # dense log(1+z) grid to the union max (PK interpolation grid)
            extra = np.expm1(np.linspace(
                np.log1p(max(self.z_pk)), np.log1p(zmax_req * 1.02), 24))[1:]
            self.z_pk = tuple(self.z_pk) + tuple(float(z) for z in extra)
        # high-L lensed template for the splice (l, TT, EE, BB, TE in
        # l(l+1)C_l/2pi muK^2 — CAMB lensedCls column order). Built AFTER
        # the requirements union so the template covers the final lmax;
        # reference semantics: lmax_computed_cl = min(lmax, lmax_computed_cl)
        # and the splice only engages when the cap is below lmax
        # (CosmologyTypes.f90:302, Calculator_CAMB.f90:387-401).
        self._highl = None
        if self.lmax_computed >= self.lmax:
            self.lmax_computed = 0          # cap above need: no splice
        if 0 < self.lmax_computed < self.lmax:
            if not self.highl_template:
                raise ValueError("lmax_computed < lmax needs highl_template")
            raw = np.loadtxt(self.highl_template)
            tmpl = np.zeros((self.lmax + 1, 4))
            ls = raw[:, 0].astype(int)
            keep = ls <= self.lmax
            tmpl[ls[keep]] = raw[keep, 1:5]
            if tmpl[2, 0] < 100:
                raise ValueError("highl template must be in muK^2")
            if ls.max() < self.lmax:
                raise ValueError("highl template does not reach lmax")
            self._highl = tmpl
        all_derived = list(CMB_DERIVED_NAMES)
        for z in self.z_outputs:
            t = _ztag(z)
            all_derived += [(f"Hubble{t}", f"H({z:g})"),
                            (f"DM{t}", f"D_{{\\rm{{M}}}}({z:g})")]
        if self.matter_power:
            all_derived += list(CMB_DERIVED_MP_NAMES)
            for z in self.z_outputs:
                t = _ztag(z)
                all_derived += [(f"fsigma8z{t}", f"f\\sigma_8({z:g})"),
                                (f"sigma8z{t}", f"\\sigma_8({z:g})")]
        sampled = {p.name for p in self.space.params}
        self._derived_keep = [i for i, (n, _) in enumerate(all_derived)
                              if n not in sampled]
        self.derived_names = [all_derived[i] for i in self._derived_keep]
        self.num_derived = len(self.derived_names)

        # resolve the extended-sector static switches (build time)
        def _varies(name):
            if name not in self.space:
                return False
            return self.space.get(name).varying
        if self.massive_nu_hierarchy == "auto":
            p = self.space.get("mnu") if "mnu" in self.space else None
            self.massive_nu_hierarchy = bool(
                _varies("mnu") or (p is not None and p.center > 0.2))
        # fiducial primordial parameters for the nonlinear-lensing
        # halofit ratio (fixed so the slow cache stays independent of the
        # semi-slow power parameters)
        self._fid_logA = float(self.space.get("logA").center) \
            if "logA" in self.space else 3.044
        self._fid_ns = float(self.space.get("ns").center) \
            if "ns" in self.space else 0.9649
        # correlated CDM isocurvature: static enable when alpha1 is free
        # or fixed nonzero (adiabatic runs keep the exact fast path)
        self._iso_enabled = ("alpha1" in self.space
                             and (_varies("alpha1")
                                  or abs(self.space.get("alpha1").center)
                                  > 1e-12))
        if self._iso_enabled:
            self._i_alpha1 = [p.name for p in self.space.params
                              ].index("alpha1")
        if self.de_perturbations == "auto":
            pw = self.space.get("w") if "w" in self.space else None
            pwa = self.space.get("wa") if "wa" in self.space else None
            self.de_perturbations = bool(
                _varies("w") or _varies("wa")
                or (pw is not None and abs(pw.center + 1.0) > 1e-6)
                or (pwa is not None and abs(pwa.center) > 1e-6))

    def embed_full(self, varying: jnp.ndarray) -> jnp.ndarray:
        full = jnp.asarray(self._full_template, varying.dtype)
        return full.at[jnp.asarray(self.varying_idx)].set(varying)

    # ------------------------------------------------------------------
    # Staged theory pipeline (the reference's two-stage compute:
    # Calculator_CAMB.f90 GetNewTransferData :179-218 = stage_slow,
    # GetNewPowerData :220-275 = stage_semi; the sampler picks the stage
    # from the proposal block class, CalcLike_Cosmology.f90:59-94)
    # ------------------------------------------------------------------

    def _primordial(self, full_P):
        from cosmomc_tpu.models.primordial import PrimordialParams
        if self.compute_tensors:
            r = full_P[self._i_r]
            nt = -r / 8.0 if self.inflation_consistency else 0.0
        else:
            r, nt = 0.0, 0.0
        return PrimordialParams.make(logA=full_P[self._i_logA],
                                     ns=full_P[self._i_ns], r=r, nt=nt,
                                     dtype=self.dtype)

    def stage_slow(self, full_P: jnp.ndarray) -> dict:
        """Everything independent of the primordial power and nuisance:
        thermal history, Boltzmann transfers Delta_l(k), matter transfers,
        background tables, thermal derived scalars."""
        from cosmomc_tpu.models import background as bgm
        from cosmomc_tpu.models.bbn import yhe_bbn
        from cosmomc_tpu.models.cmb import compute_transfers, source_k_grid
        from cosmomc_tpu.models.cls import compute_cl_transfers
        from cosmomc_tpu.models.recfast import compute_thermo
        from cosmomc_tpu.models.reionization import zre_from_tau
        from cosmomc_tpu.models.thermo import (compute_thermo_tables,
                                               thermo_derived)

        bg = self.parameterization.to_background(full_P)
        tau_re = full_P[self._i_tau]
        yhe = yhe_bbn(bg.ombh2, bg.nnu - 3.046, self.bbn_table)

        if self.use_cmb:
            lmax_c = (self.lmax_computed or self.lmax) + self.lens_margin
            if self.source_nk is not None:
                k = source_k_grid(kmax=self.kmax, nk_log=self.source_nk[0],
                                  nk_lin=self.source_nk[1])
            else:
                k = source_k_grid(kmax=self.kmax)
            from cosmomc_tpu.models.matterpower import (LENS_NL_Z,
                                                        lensing_nl_ratio)
            z_nl = LENS_NL_Z if self.nonlinear_lens else (0.0,)
            if getattr(self, "_iso_enabled", False):
                # alpha1 -> IC admixture amplitude beta =
                # sign(a) sqrt(|a|/(1-|a|)) (Calculator_CAMB.f90:109-111)
                a1 = full_P[self._i_alpha1]
                absa = jnp.clip(jnp.abs(a1), 0.0, 0.99)
                iso_amp = jnp.sign(a1) * jnp.sqrt(absa / (1.0 - absa))
            else:
                iso_amp = 0.0
            po, chi_star, tf = compute_transfers(
                bg, tau_re, yhe, k, return_thermo=True,
                z_outputs=z_nl,
                n_step=self.n_step_boltzmann,
                massive_nu=self.massive_nu_hierarchy,
                de_perts=self.de_perturbations,
                remat_chunks=self.remat_chunks,
                iso_cdm_amp=iso_amp)
            if self.nonlinear_lens:
                # CAMB MakeNonlinearSources: multiply the lensing source
                # by sqrt(P_NL/P_lin)(k, z(tau)) at the fiducial power
                from cosmomc_tpu.models.primordial import PrimordialParams
                pp_fid = PrimordialParams.make(logA=self._fid_logA,
                                               ns=self._fid_ns,
                                               dtype=self.dtype)
                ratio = lensing_nl_ratio(bg, pp_fid, jnp.asarray(k, self.dtype),
                                         po.delta_m_z, z_nl)   # (nz, nk)
                a_nl = jnp.asarray([1.0 / (1.0 + z) for z in z_nl],
                                   self.dtype)
                tau_nl = jnp.interp(a_nl, tf.a, tf.tau)        # z asc -> tau desc
                mult = jax.vmap(lambda col: jnp.interp(
                    po.tau, tau_nl[::-1], col[::-1]),
                    in_axes=1, out_axes=0)(ratio)              # (nk, ntau)
                # ratio -> 1 above the highest node (interp clamps to the
                # z=10 edge, which is already ~1)
                po = po._replace(slens=po.slens * mult)
            method = self.los_method
            if method == "auto":
                method = ("recurrence" if jax.default_backend()
                          not in ("cpu",) else "table")
            if method == "recurrence":
                from cosmomc_tpu.models.cls import \
                    compute_cl_transfers_recurrence
                clt = compute_cl_transfers_recurrence(
                    po, chi_star, lmax=lmax_c, kmax_hint=self.kmax,
                    coarse_k=k, tau_stride=self.los_tau_stride)
            else:
                clt = compute_cl_transfers(po, chi_star, lmax=lmax_c,
                                           kmax_hint=self.kmax, coarse_k=k,
                                           tau_stride=self.los_tau_stride)
        else:
            clt = None

        if self.compute_tensors and self.use_cmb:
            from cosmomc_tpu.models.tensors import (evolve_tensors,
                                                    tensor_k_grid,
                                                    compute_tensor_transfers)
            to = evolve_tensors(bg, tf, po.tau0, tensor_k_grid())
            lmax_t = min(700, self.lmax)
            tt_cache = compute_tensor_transfers(to, lmax=lmax_t)
        else:
            tt_cache = None

        th = compute_thermo(bg, yhe)
        tabs = compute_thermo_tables(bg, th, yhe)
        der = thermo_derived(bg, tabs)
        bf = bgm.background_functions(bg)

        if self.matter_power:
            from cosmomc_tpu.models.matterpower import compute_matter_transfers
            mt = compute_matter_transfers(bg, tau_re, yhe,
                                          z_outputs=tuple(sorted(self.z_pk)),
                                          massive_nu=self.massive_nu_hierarchy,
                                          de_perts=self.de_perturbations)
        else:
            mt = None

        # derived-zoo scalars that only need the slow stage
        # (TP_CalcDerivedParams + ThermoDerivedParams, modules.f90:2935-2956)
        dm_star = bgm.comoving_radial_distance(bf, der.z_star)
        z_eq = bgm.z_equality(bg)
        a_eq = 1.0 / (1.0 + z_eq)
        tau_eq = bgm.conformal_time(bg, a_eq)
        rs_eq = jnp.interp(jnp.log1p(z_eq), tabs.x, tabs.rs)
        from cosmomc_tpu.models.bbn import dh_bbn
        return dict(bg=bg, yhe=yhe, clt=clt, tt_cache=tt_cache, bf=bf,
                    mt=mt, rs_drag=der.r_drag, z_star=der.z_star,
                    r_star=der.r_star, zre=zre_from_tau(bg, tau_re, yhe),
                    tau=tau_re, z_drag=der.z_drag, kd=der.kd,
                    dm_star=dm_star, z_eq=z_eq,
                    keq=a_eq * bgm.hubble_mpc(bg, a_eq),
                    thetaeq=100.0 * tau_eq / dm_star,
                    thetarseq=100.0 * rs_eq / dm_star,
                    age=bgm.age_gyr(bg),
                    dhbbn=1e5 * dh_bbn(bg.ombh2, bg.nnu - 3.046,
                                       self.bbn_table))

    def stage_semi(self, full_P: jnp.ndarray, slow: dict) -> dict:
        """Primordial-power application: C_l stack (+tensors), lensing,
        P(k,z)/sigma8 tables (CAMB_TransfersToPowers + SetPowersFromCAMB)."""
        from cosmomc_tpu.models.cls import cls_from_cl_transfers
        from cosmomc_tpu.models.lensing import lens_cls

        pp = self._primordial(full_P)
        if not self.use_cmb:
            A9 = jnp.exp(full_P[self._i_logA]) / 10.0
            mp = None
            if self.matter_power:
                from cosmomc_tpu.models.matterpower import \
                    matter_power_from_transfers
                mp = matter_power_from_transfers(slow["bg"], pp, slow["mt"])
            return dict(cls=None, mp=mp, A9=A9)
        lm = self.lmax_computed or self.lmax    # computed cap
        lmax_c = lm + self.lens_margin
        raw = cls_from_cl_transfers(slow["clt"], pp, lmax=lmax_c)
        muk2 = (2.7255e6) ** 2
        spec_tt = raw.tt * muk2
        spec_te = raw.te * muk2
        spec_ee = raw.ee * muk2
        lensed = lens_cls(raw.ls, spec_tt, spec_te, spec_ee, raw.pp,
                          lmax_lensed=lm)
        nl = self.lmax + 1
        cls = jnp.zeros((4, 4, nl), self.dtype)
        sl = slice(2, lm + 1)
        cls = cls.at[0, 0, sl].set(lensed.tt)
        cls = cls.at[1, 0, sl].set(lensed.te)
        cls = cls.at[0, 1, sl].set(lensed.te)
        cls = cls.at[1, 1, sl].set(lensed.ee)
        cls = cls.at[2, 2, sl].set(lensed.bb)
        cls = cls.at[3, 3, sl].set(raw.pp[:lm - 1])
        if self._highl is not None:
            # splice: fill (lm, lmax] with the fiducial lensed template
            # normalized off TT at the boundary (Calculator_CAMB.f90:398-401)
            tmpl = jnp.asarray(self._highl, self.dtype)
            norm = cls[0, 0, lm] / tmpl[lm, 0]
            hi = slice(lm + 1, self.lmax + 1)
            cls = cls.at[0, 0, hi].set(norm * tmpl[lm + 1:, 0])
            cls = cls.at[1, 1, hi].set(norm * tmpl[lm + 1:, 1])
            cls = cls.at[2, 2, hi].set(norm * tmpl[lm + 1:, 2])
            cls = cls.at[1, 0, hi].set(norm * tmpl[lm + 1:, 3])
            cls = cls.at[0, 1, hi].set(norm * tmpl[lm + 1:, 3])

        if self.compute_tensors:
            from cosmomc_tpu.models.tensors import tensor_cls_from_transfers
            lmax_t = min(700, self.lmax)
            tens = tensor_cls_from_transfers(slow["tt_cache"], pp, lmax=lmax_t)
            slt = slice(2, lmax_t + 1)
            nlt = lmax_t - 1
            cls = cls.at[0, 0, slt].add(muk2 * tens.tt[:nlt])
            cls = cls.at[1, 0, slt].add(muk2 * tens.te[:nlt])
            cls = cls.at[0, 1, slt].add(muk2 * tens.te[:nlt])
            cls = cls.at[1, 1, slt].add(muk2 * tens.ee[:nlt])
            cls = cls.at[2, 2, slt].add(muk2 * tens.bb[:nlt])

        A9 = jnp.exp(full_P[self._i_logA]) / 10.0   # 10^9 A_s
        if self.matter_power:
            from cosmomc_tpu.models.matterpower import matter_power_from_transfers
            mp = matter_power_from_transfers(slow["bg"], pp, slow["mt"])
            return dict(cls=cls, mp=mp, A9=A9)
        return dict(cls=cls, mp=None, A9=A9)

    def assemble_theory(self, slow: dict, semi: dict):
        """Build the CMBTheoryProducts pytree from the two caches."""
        mp = semi["mp"]
        if mp is not None:
            z_pk, s8, fs8 = mp.z, mp.sigma8_z, mp.fsigma8_z
        else:
            z_pk = s8 = fs8 = None
        theory = CMBTheoryProducts(bg=slow["bg"], bf=slow["bf"],
                                   rs_drag=slow["rs_drag"], cls=semi["cls"],
                                   z_pk=z_pk, sigma8_z=s8, fsigma8_z=fs8,
                                   mp=mp)
        extras = dict(z_star=slow["z_star"], r_star=slow["r_star"],
                      yhe=slow["yhe"], zre=slow["zre"])
        return theory, extras

    def compute_theory(self, full_P: jnp.ndarray) -> CMBTheoryProducts:
        """One full theory forward pass (pure, traced)."""
        slow = self.stage_slow(full_P)
        semi = self.stage_semi(full_P, slow)
        return self.assemble_theory(slow, semi)

    def stage_fast(self, P: jnp.ndarray, slow: dict, semi: dict):
        """FAST stage: likelihoods + derived from the cached theory —
        nuisance-only moves pay exactly this (CalcLike_Cosmology.f90's
        'else fast-only' branch)."""
        from cosmomc_tpu.models import background as bgm_mod
        theory, ex = self.assemble_theory(slow, semi)
        total, _per = self.likes.total_log_like(theory, P, self.slices)
        bg = theory.bg
        h = bg.H0 / 100.0
        omm = (bg.ombh2 + bg.omch2 + bg.omnuh2) / h ** 2
        one = jnp.ones(())
        A9 = semi["A9"]
        yhe = slow["yhe"]
        # nucleon-ratio Yp (bbn.f90:37 GetYPBBN; m_He/m_H = 3.9715)
        mr = 3.9715
        ypbbn = 4.0 * yhe / (mr - yhe * (mr - 4.0))
        der = [bg.H0 * one, omm, 1.0 - bg.omk - omm,
               omm * h ** 2, bg.omnuh2 * one, omm * h ** 3,
               slow["zre"], A9, A9 * jnp.exp(-2.0 * slow["tau"]),
               yhe, ypbbn, slow["dhbbn"], slow["age"],
               slow["z_star"], slow["r_star"],
               100.0 * slow["r_star"] / slow["dm_star"],
               slow["dm_star"] / 1000.0,
               slow["z_drag"], theory.rs_drag, theory.rs_drag * h,
               slow["kd"], 100.0 * jnp.pi / slow["kd"] / slow["dm_star"],
               slow["z_eq"], slow["keq"], slow["thetaeq"],
               slow["thetarseq"]]
        for z in self.z_outputs:
            der += [bgm_mod.hofz_kms(bg, z),
                    bgm_mod.comoving_radial_distance(slow["bf"], z)]
        if self.matter_power:
            s8 = theory.sigma8_z[0]
            der += [s8, s8 * jnp.sqrt(omm / 0.3), s8 * jnp.sqrt(omm),
                    s8 * omm ** 0.25, s8 / jnp.sqrt(h)]
            for z in self.z_outputs:
                der += [theory.fsigma8_at(z), theory.sigma8_at(z)]
        der = jnp.stack([jnp.asarray(d, P.dtype) for d in der])
        return total, der[jnp.asarray(self._derived_keep, jnp.int32)]

    def raw_logpost(self) -> Callable:
        def fn(P):
            full = self.embed_full(P)
            slow = self.stage_slow(full)
            semi = self.stage_semi(full, slow)
            return self.stage_fast(P, slow, semi)
        return fn

    def logpost(self) -> Callable:
        arr = self.space.device_arrays(self.dtype)
        return make_bounded_posterior(
            self.raw_logpost(), arr["lo"], arr["hi"],
            prior_arrays=arr, num_derived=self.num_derived)

    def per_likelihood(self, P_varying: np.ndarray) -> Dict[str, float]:
        """chi^2/2 per likelihood at one point (the action=4 table,
        GeneralSetup.f90:165-172)."""
        return _per_likelihood(self, P_varying)

    def paramnames(self) -> ParamNames:
        pn = self.space.param_names()
        for name, label in self.derived_names:
            pn.add(ParamInfo(name, label, derived=True))
        return pn

    def make_proposal(self, oversample_fast: int = 1,
                      propose_scale: float = 2.4) -> BlockedProposal:
        blocks = self.space.speed_blocks()
        n_slow_blocks = max(1, sum(1 for b in blocks if b and
                                   self.space.varying[b[0]].speed <= 1))
        return BlockedProposal(blocks, slow_block_max=n_slow_blocks,
                               oversample_fast=oversample_fast,
                               propose_scale=propose_scale)

    def start_positions(self, rng: np.random.Generator, nchains: int) -> np.ndarray:
        var = self.space.varying
        out = np.empty((nchains, len(var)))
        for i, p in enumerate(var):
            vals = rng.normal(p.center, max(p.start_width, 1e-12), nchains)
            out[:, i] = np.clip(vals, p.min, p.max)
        return out
