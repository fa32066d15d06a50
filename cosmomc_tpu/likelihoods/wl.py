"""Galaxy weak lensing / galaxy-galaxy / galaxy clustering 2pt likelihood
(DES 1YR xip/xim/gammat/wtheta).

Reference: source/wl.f90 (WLLikelihood, WL_ReadIni :107-299, calc_theory
:409-620, cl2corr :622-655) — "following exactly the same approximations as
in the DES papers": Limber C_l from the (nonlinear) matter power spectrum,

  q_s(chi, b)   = 3/2 Omega_m H0^2 (1+z) chi int dchi' n_b(chi')(1-chi/chi')
                  [- DES1YR NLA intrinsic-alignment term]
  q_gal(chi, b) = bias_b n_b(chi) H(z)
  C^XY_l(b1,b2) = int dchi/chi^2 q^X_b1 q^Y_b2 P_m((l+1/2)/chi, z)
  xip/xim  = sum_l (l dl/2pi) <J_0/J_4> C^kappa_l (1+m_1)(1+m_2)
  gammat   = sum_l (l dl/2pi) <J_2>     C^cross_l (1+m_2)
  wtheta   = sum_l (l dl/2pi) <J_0>     C^gg_l
  -logL = 0.5 dvec^T Cov^-1 dvec over the selection-cut data vector

with source/lens photo-z shift parameters applied to the n(z) tables.

TPU-native design (one fused trace, no per-bin loops):

  * the reference's per-pair pipeline "cubic-spline C_l from the coarse
    ls_cl grid onto binned ell groups, then dot with bin-averaged Bessel
    tables" is LINEAR in the C_l values, so at load time it is collapsed
    into one dense (n_ls_cl, n_theta) operand per Bessel order
    (spline-basis matrix @ Bessel-average matrix) — at trace time each
    correlation function is a single small matmul on the MXU;
  * the lensing-efficiency double integral is two reversed cumulative sums
    (O(nz)) instead of the reference's O(nz^2) triangle loop;
  * all (l, z) power lookups are one batched bilinear gather from the
    MatterPower table carried in the theory pytree.

The in-tree DES dataset ships everything except `DES_1YR_final_cov.dat`
(absent from the read-only data mirror), so end-to-end chi^2 tests use a
synthetic covariance via dataset_overrides; the theory pipeline is pinned
against analytic small cases in tests/test_wl.py.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import Likelihood, read_dataset_ini
from cosmomc_tpu.models import background as bgm
from cosmomc_tpu.models.matterpower import power_at
from cosmomc_tpu.params.space import Param, Speed
from cosmomc_tpu.utils.interp import Spline, spline_fit, spline_eval

MEASUREMENT_NAMES = ["xip", "xim", "gammat", "wtheta"]
M_XIP, M_XIM, M_GAMMAT, M_WTHETA = 0, 1, 2, 3

C_KMS = 299792.458

# baseline DES 1YR nuisance setup (batch3/DES.ini)
DES_PARAM_DEFAULTS: Dict[str, Sequence[float]] = {
    "DES_b1": (1.45, 0.8, 3.0, 0.05, 0.05),
    "DES_b2": (1.55, 0.8, 3.0, 0.05, 0.05),
    "DES_b3": (1.65, 0.8, 3.0, 0.05, 0.05),
    "DES_b4": (1.8, 0.8, 3.0, 0.05, 0.05),
    "DES_b5": (2.0, 0.8, 3.0, 0.05, 0.05),
    "DES_m1": (0.012, -0.1, 0.1, 0.005, 0.005),
    "DES_m2": (0.012, -0.1, 0.1, 0.005, 0.005),
    "DES_m3": (0.012, -0.1, 0.1, 0.005, 0.005),
    "DES_m4": (0.012, -0.1, 0.1, 0.005, 0.005),
    "DES_AIA": (1.0, -5.0, 5.0, 0.2, 0.2),
    "DES_alphaIA": (1.0, -5.0, 5.0, 0.2, 0.2),
    "DES_z0AI": (0.62,),
    "DES_DzL1": (0.002, -0.05, 0.05, 0.005, 0.005),
    "DES_DzL2": (0.001, -0.05, 0.05, 0.005, 0.005),
    "DES_DzL3": (0.003, -0.05, 0.05, 0.005, 0.005),
    "DES_DzL4": (0.0, -0.05, 0.05, 0.005, 0.005),
    "DES_DzL5": (0.0, -0.05, 0.05, 0.005, 0.005),
    "DES_DzS1": (-0.001, -0.1, 0.1, 0.005, 0.005),
    "DES_DzS2": (-0.019, -0.1, 0.1, 0.005, 0.005),
    "DES_DzS3": (0.009, -0.1, 0.1, 0.005, 0.005),
    "DES_DzS4": (-0.018, -0.1, 0.1, 0.005, 0.005),
}
DES_PRIORS = {
    "DES_m1": (0.012, 0.023), "DES_m2": (0.012, 0.023),
    "DES_m3": (0.012, 0.023), "DES_m4": (0.012, 0.023),
    "DES_DzL1": (0.002, 0.007), "DES_DzL2": (0.001, 0.007),
    "DES_DzL3": (0.003, 0.006), "DES_DzL4": (0.0, 0.01),
    "DES_DzL5": (0.0, 0.01),
    "DES_DzS1": (-0.001, 0.016), "DES_DzS2": (-0.019, 0.013),
    "DES_DzS3": (0.009, 0.011), "DES_DzS4": (-0.018, 0.022),
}


def _ls_cl_grid(lmax: int, acc: float = 1.0) -> np.ndarray:
    """Coarse ell grid for the Limber C_l (WL_ReadIni :285-297)."""
    out = list(range(2, 100 - int(4 / acc), max(1, int(4 / acc))))
    i = 0
    while out[-1] < lmax:
        out.append(int(round(100 * np.exp(0.1266 * i / acc))))
        i += 1
    return np.array(out, float)


def _bessel_bins(lmax: int, acc: float = 1.0):
    """Log-binned ell groups for the Bessel sums (init_bessel_integration
    :320-347): returns (ls_bessel midpoints, lmin, lmax per bin)."""
    n = int(500 * acc)
    dlog = np.log(lmax) / n
    ell_last = 1
    mins, maxs, mids = [], [], []
    ell = 2
    dells = []
    for i in range(1, n + 1):
        e = int(np.exp(i * dlog))
        if e != ell_last:
            dells.append(e - ell_last)
            ell_last = e
    for d in dells:
        mids.append((2 * ell + d - 1.0) / 2)
        mins.append(ell)
        maxs.append(ell + d - 1)
        ell += d
    return np.array(mids), np.array(mins), np.array(maxs)


def _spline_basis_matrix(x_knots: np.ndarray, x_eval: np.ndarray
                         ) -> np.ndarray:
    """Matrix S with S @ y == natural-cubic-spline(x_knots, y)(x_eval).
    The spline map is linear in y; built by splining unit vectors."""
    n = len(x_knots)
    S = np.empty((len(x_eval), n))
    xk = jnp.asarray(x_knots)
    xe = jnp.asarray(x_eval)
    for i in range(n):
        y = np.zeros(n)
        y[i] = 1.0
        S[:, i] = np.asarray(spline_eval(spline_fit(xk, jnp.asarray(y)), xe))
    return S


class WLLikelihood(Likelihood):
    """DES-style 2pt function likelihood (wl.f90 WLLikelihood)."""

    kind = "WL"
    speed = Speed.SLOW
    #: theory requirements (CosmologyTypes.f90 TCosmologyRequirements)
    needs_matter_power = True

    def __init__(self, dataset_path: str, name: str = "",
                 dataset_overrides: Optional[Dict[str, str]] = None,
                 param_specs: Optional[Dict[str, Sequence[float]]] = None,
                 use_non_linear: bool = True, acc: float = 1.0,
                 dtype=jnp.float64):
        super().__init__(name or "DES")
        self.dtype = dtype
        self.use_non_linear = use_non_linear
        self.acc = acc
        ini = read_dataset_ini(dataset_path)
        if dataset_overrides:
            ini.params.update(dataset_overrides)
        self._dir = os.path.dirname(os.path.abspath(dataset_path))
        self._read_ini(ini, param_specs)

    def _rel(self, ini, key):
        v = ini.string(key, required=True)
        return v if os.path.isabs(v) else os.path.join(self._dir, v)

    # ------------------------------------------------------------------ load

    def _read_ini(self, ini, param_specs) -> None:
        if ini.string("measurements_format", required=True) != "DES":
            raise ValueError("WL: unknown measurements_format")
        self.num_z_bins = ini.int("num_z_bins", required=True)
        self.num_gal_bins = ini.int("num_gal_bins", 0)
        maxbin = max(self.num_z_bins, self.num_gal_bins)
        self.kmax = ini.float("kmax", required=True)
        self.lmax = ini.int("lmax", 50000)

        # source/lens n(z): columns Z_LOW Z_MID Z_HIGH BIN1.. (:141-170)
        nz = np.loadtxt(self._rel(ini, "nz_file"))
        nzp = nz.shape[0] + 2
        z_p = np.empty(nzp)
        z_p[:-2] = nz[:, 1]
        z_p[-2] = 2 * z_p[-3] - z_p[-4]
        z_p[-1] = 3 * z_p[-3] - 2 * z_p[-4]
        self.z_p = z_p
        self.num_z_p = nzp

        def make_splines(tab, nbins):
            sps = []
            for b in range(nbins):
                y = np.zeros(nzp)
                y[:-2] = tab[:, 3 + b]
                sps.append(spline_fit(jnp.asarray(z_p), jnp.asarray(y)))
            return sps

        self.required_zmax = float(z_p[-1])
        self.p_sp = make_splines(nz, self.num_z_bins)
        if self.num_gal_bins > 0:
            nzg = np.loadtxt(self._rel(ini, "nz_gal_file"))
            if nzg.shape[0] != nzp - 2 or np.any(nzg[:, 1] != z_p[:-2]):
                raise ValueError("wl assumes windows use the same z bins")
            self.pgal_sp = make_splines(nzg, self.num_gal_bins)
        else:
            self.pgal_sp = []

        self.theta_bins = np.loadtxt(self._rel(ini, "theta_bins_file"))
        self.num_theta_bins = ini.int("num_theta_bins",
                                      len(self.theta_bins))
        theta_rad = self.theta_bins / 60 * np.pi / 180

        self.ia_model = ini.string("intrinsic_alignment_model", "DES1YR")

        self.data_types = [MEASUREMENT_NAMES.index(t) for t in
                           ini.string_list("data_types", required=True)]
        used = ini.string_list("used_data_types")
        self.used_types = ([MEASUREMENT_NAMES.index(t) for t in used]
                           if used else list(self.data_types))

        # selection cuts (:207-221)
        sel = {}
        with open(self._rel(ini, "data_selection")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split()
                sel[(MEASUREMENT_NAMES.index(parts[0]), int(parts[1]),
                     int(parts[2]))] = (float(parts[3]), float(parts[4]))

        # measurements + cut bookkeeping (:223-266)
        cov_ix = 0
        self.corr_data = np.zeros((self.num_theta_bins, maxbin, maxbin,
                                   len(self.data_types)))
        self.bin_pairs: List[List[Tuple[int, int]]] = []
        used_indices, used_items = [], []
        for ti, tp in enumerate(self.data_types):
            pairs = []
            last = None
            dat = np.loadtxt(self._rel(ini,
                                       f"measurements[{MEASUREMENT_NAMES[tp]}]"))
            for row in dat:
                b1, b2, tb = int(row[0]), int(row[1]), int(row[2])
                cov_ix += 1
                if (b1, b2) != last:
                    pairs.append((b1, b2))
                    last = (b1, b2)
                self.corr_data[tb - 1, b1 - 1, b2 - 1, ti] = row[3]
                if tp in self.used_types:
                    rng = sel.get((tp, b1, b2), (-1.0, -1.0))
                    th = self.theta_bins[tb - 1]
                    if rng[0] <= th <= rng[1]:
                        used_indices.append(cov_ix - 1)
                        used_items.append((ti, b1 - 1, b2 - 1, tb - 1))
            self.bin_pairs.append(pairs)
        self.used_indices = np.array(used_indices, int)
        self.used_items = np.array(used_items, int)
        self.num_used = len(used_indices)

        cov = np.loadtxt(self._rel(ini, "cov_file"))
        if cov.shape != (cov_ix, cov_ix):
            raise ValueError("WL: cov size does not match data size")
        sub = cov[np.ix_(self.used_indices, self.used_indices)]
        sub = sub * ini.float("ah_factor", 1.0)
        self.inv_cov = np.linalg.inv(sub)
        self.data_vector = np.array(
            [self.corr_data[tb, b1, b2, ti]
             for (ti, b1, b2, tb) in self.used_items])

        # --- Limber ell grid + fused spline/Bessel operands (cl2corr)
        self.ls_cl = _ls_cl_grid(self.lmax, self.acc)
        mids, lmins, lmaxs = _bessel_bins(self.lmax, self.acc)
        from scipy.special import jv
        nth = self.num_theta_bins
        J = {0: np.zeros((len(mids), nth)), 2: np.zeros((len(mids), nth)),
             4: np.zeros((len(mids), nth))}
        for i, (lo, hi) in enumerate(zip(lmins, lmaxs)):
            ells = np.arange(lo, hi + 1)
            x = ells[:, None] * theta_rad[None, :]
            for order in (0, 2, 4):
                J[order][i] = (ells[:, None] * jv(order, x)).sum(0) / (2 * np.pi)
        S = _spline_basis_matrix(self.ls_cl, mids)     # (nb, ncl)
        # fused (ncl, ntheta) operands: corr(theta) = C_l @ M
        self.M0 = S.T @ J[0]
        self.M2 = S.T @ J[2]
        self.M4 = S.T @ J[4]

        # nuisance parameters (batch3/DES.ini defaults + priors)
        specs = dict(DES_PARAM_DEFAULTS)
        specs.update(param_specs or {})
        pn_file = self._rel(ini, "nuisance_params")
        from cosmomc_tpu.utils.paramnames import ParamNames
        pn = ParamNames.from_file(pn_file)
        self._slot, self._centers, pos = [], [], 0
        for info in pn.sampled():
            spec = specs[info.name]
            self._centers.append(spec[0])
            if len(spec) == 1:
                p = Param(info.name, spec[0], spec[0], spec[0], 0.0, 0.0,
                          label=info.label, speed=Speed.FAST)
                self._slot.append(-1)
            else:
                p = Param(info.name, *spec[:5], label=info.label,
                          speed=Speed.FAST)
                if info.name in DES_PRIORS:
                    p.prior_mean, p.prior_std = DES_PRIORS[info.name]
                self._slot.append(pos)
                pos += 1
            self.nuisance.append(p)
        self._centers = np.array(self._centers)

    # ---------------------------------------------------------------- theory

    def required_lmax(self) -> int:
        return 0      # needs P(k,z), not C_l

    def _params(self, nuisance: jnp.ndarray) -> jnp.ndarray:
        vals = jnp.asarray(self._centers, nuisance.dtype)
        for i, pos in enumerate(self._slot):
            if pos >= 0:
                vals = vals.at[i].set(nuisance[pos])
        return vals

    def log_like(self, theory, nuisance: jnp.ndarray) -> jnp.ndarray:
        vec = self.theory_vector(theory, nuisance) \
            - jnp.asarray(self.data_vector, self.dtype)
        icov = jnp.asarray(self.inv_cov, self.dtype)
        return 0.5 * vec @ icov @ vec

    def theory_vector(self, theory, nuisance: jnp.ndarray) -> jnp.ndarray:
        """Predicted (cut) data vector — the traced forward model."""
        dtype = self.dtype
        mp = getattr(theory, "mp", None)
        if mp is None:
            raise ValueError(f"{self.name}: theory has no matter power "
                             "(enable matter_power on the posterior)")
        p = self._params(nuisance.astype(dtype))
        ng, ns = self.num_gal_bins, self.num_z_bins
        bias = p[0:ng]
        shear_m = p[ng:ng + ns]
        ia_A, ia_alpha, ia_z0 = p[ng + ns], p[ng + ns + 1], p[ng + ns + 2]
        dz_lens = p[ng + ns + 3:2 * ng + ns + 3]
        dz_src = p[2 * ng + ns + 3:2 * ng + 2 * ns + 3]

        bg, bf = theory.bg, theory.bf
        z_p = jnp.asarray(self.z_p, dtype)
        chis = bgm.comoving_radial_distance(bf, z_p)
        dchis = jnp.concatenate([
            (chis[1:2] + chis[:1]) / 2,
            (chis[2:] - chis[:-2]) / 2,
            chis[-1:] - chis[-2:-1]])
        Hs = bgm.hubble_mpc(bg, 1.0 / (1.0 + z_p))       # 1/Mpc
        h = bg.H0 / 100.0
        omm = (bg.ombh2 + bg.omch2 + bg.omnuh2) / h ** 2

        # growth from linear P(k=0.01, z) (calc_theory :480-487)
        Pg = power_at(mp, jnp.full_like(z_p, 0.01), z_p)
        D_growth = jnp.sqrt(Pg / power_at(mp, jnp.asarray(0.01),
                                          jnp.asarray(0.0)))
        align_z = ia_A * ((1 + z_p) / (1 + ia_z0)) ** ia_alpha \
            * 0.0134 / D_growth

        # shifted n(z) -> n(chi) (:495-512)
        def shifted(sps, dzs, scale):
            cols = []
            for b, sp in enumerate(sps):
                zq = z_p - dzs[b]
                v = spline_eval(sp, zq)
                v = jnp.where((zq < z_p[0]) | (zq > z_p[-1]), 0.0, v)
                cols.append(Hs * v * (scale[b] if scale is not None else 1.0))
            return jnp.stack(cols, axis=1)       # (nz, nb)

        n_chi = shifted(self.p_sp, dz_src, None)
        qgal = (shifted(self.pgal_sp, dz_lens, None) * bias[None, :]
                if self.pgal_sp else None)

        # lensing efficiency q_s: two reversed cumsums (O(nz)) replace the
        # reference triangle loop (:514-521)
        fac = dchis[:, None] * n_chi                       # (nz, nb)
        from cosmomc_tpu.utils.interp import parallel_cumsum
        rev = lambda x: jnp.flip(parallel_cumsum(jnp.flip(x, 0), axis=0), 0)
        qs = rev(fac) - chis[:, None] * rev(fac / chis[:, None])
        # (100/c_kms)^2 = (H0/h c)^2 in 1/Mpc^2 — the reference writes
        # (1e5/const_c)^2 with const_c in m/s (wl.f90:523,529)
        h0c2 = (100.0 / C_KMS) ** 2
        if self.ia_model == "DES1YR":
            qs = qs - align_z[:, None] * n_chi / (
                chis * (1 + z_p) * 3 * h ** 2 * h0c2 / 2)[:, None]
        qs = qs * ((1.5 * omm * h ** 2 * h0c2)
                   * chis * (1 + z_p))[:, None]

        # Limber integrand weights: (nl, nz) P over the z grid (:537-560)
        ls = jnp.asarray(self.ls_cl, dtype)
        kq = (ls[:, None] + 0.5) / chis[None, :]           # 1/Mpc
        zq = jnp.broadcast_to(z_p[None, :], kq.shape)
        P = power_at(mp, kq, zq, nonlinear=self.use_non_linear)
        khq = kq / h
        khmin = mp.k[0] / h
        mask = (khq >= khmin) & (khq <= self.kmax)
        w = jnp.where(mask, P, 0.0) * (dchis / chis ** 2)[None, :]

        used = set(self.used_types)
        corrs = {}
        if M_XIP in used or M_XIM in used:
            clk = jnp.einsum("lz,zi,zj->lij", w, qs, qs)
            mfac = (1 + shear_m[:, None]) * (1 + shear_m[None, :])
            corrs[M_XIP] = jnp.einsum("lij,lt->tij", clk,
                                      jnp.asarray(self.M0, dtype)) * mfac
            corrs[M_XIM] = jnp.einsum("lij,lt->tij", clk,
                                      jnp.asarray(self.M4, dtype)) * mfac
        if M_GAMMAT in used:
            clx = jnp.einsum("lz,zi,zj->lij", w, qgal, qs)
            corrs[M_GAMMAT] = jnp.einsum("lij,lt->tij", clx,
                                         jnp.asarray(self.M2, dtype)) \
                * (1 + shear_m[None, None, :])
        if M_WTHETA in used:
            clw = jnp.einsum("lz,zi,zj->lij", w, qgal, qgal)
            corrs[M_WTHETA] = jnp.einsum("lij,lt->tij", clw,
                                         jnp.asarray(self.M0, dtype))

        # assemble the cut data vector (make_vector :395-407)
        vec = []
        for (ti, b1, b2, tb) in self.used_items:
            tp = self.data_types[ti]
            vec.append(corrs[tp][tb, b1, b2])
        return jnp.stack(vec)
