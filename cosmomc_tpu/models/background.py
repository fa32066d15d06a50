"""Background cosmology: H(a), distances, sound horizon, theta_MC.

Pure-JAX, differentiable, vmappable replacement for the reference's
background layer (camb/modules.f90 ModelParams + equations_ppf.f90 dtauda;
Calculator_Cosmology.f90 distance API). Numerical contract:

  (H(a)/H100)^2 = [ omkh2 a^-2 + (ombh2+omch2) a^-3 + og h2 a^-4
                    + onu_massless h2 a^-4
                    + onu_massive-per-eigenstate * rho_nu(a m)/a^4 (massless units)
                    + odeh2 f_de(a) ] / a^0          (all Omega h^2 units)

  f_de(a) = a^{-3(1+w0+wa)} exp(-3 wa (1-a))   (w0-wa PPF background,
            camb/equations_ppf.f90 grho_de)

  dtau/da = 1 / (a^2 H_Mpc)  with H_Mpc = H/c in 1/Mpc
            (equations_ppf.f90 dtauda)

  theta_MC: Hu & Sugiyama z*, r_s from the R = 3e4 a ombh2 approximation,
            theta = r_s(z*) / D_M(z*) (camb/modules.f90 CosmomcTheta :729-751)

Dark-energy closure matches the reference: omdeh2 = h^2 (1-omk) - ombh2 -
omch2 - omnuh2 (radiation NOT subtracted; Calculator_CAMB.f90
CAMBCalc_CMBToCAMB :84-129 sets omegav = 1-omk-omb-omc-omnu).

All functions take a `BackgroundParams` pytree -> work under jit/vmap/grad.
Distance evaluation builds a cumulative-chi spline on a fixed log-a grid
(static shape) and interpolates — one fused kernel on TPU, reused for any
number of redshifts.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.models import constants as const
from cosmomc_tpu.models.neutrino import nu_rho
from cosmomc_tpu.utils.interp import spline_fit, spline_eval, spline_cumint, Spline
from cosmomc_tpu.utils.quad import gl_nodes

# H100 in 1/Mpc (units where c=1): (100 km/s/Mpc) / c
H100_MPC = 1e5 / const.c


_BG_FIELDS = ("ombh2", "omch2", "H0", "omk", "omnuh2", "nnu", "w", "wa", "tcmb")


@jax.tree_util.register_pytree_node_class
class BackgroundParams:
    """Physical background parameters.

    A pytree whose array fields trace through jit/vmap/grad; the structural
    field `num_massive_nu` is static aux data (it selects code paths, so it
    must NOT become a tracer)."""

    __slots__ = _BG_FIELDS + ("num_massive_nu",)

    def __init__(self, ombh2, omch2, H0, omk, omnuh2, nnu, w, wa, tcmb,
                 num_massive_nu=1):
        self.ombh2, self.omch2, self.H0, self.omk = ombh2, omch2, H0, omk
        self.omnuh2, self.nnu, self.w, self.wa = omnuh2, nnu, w, wa
        self.tcmb = tcmb
        self.num_massive_nu = num_massive_nu

    @classmethod
    def make(cls, ombh2=0.0224, omch2=0.120, H0=67.5, omk=0.0, omnuh2=0.000644,
             nnu=3.046, w=-1.0, wa=0.0, tcmb=const.COBE_CMBTemp,
             num_massive_nu=1, dtype=jnp.float64):
        f = lambda x: jnp.asarray(x, dtype)
        return cls(f(ombh2), f(omch2), f(H0), f(omk), f(omnuh2), f(nnu),
                   f(w), f(wa), f(tcmb), num_massive_nu)

    def _replace(self, **kw):
        vals = {k: getattr(self, k) for k in _BG_FIELDS}
        nm = kw.pop("num_massive_nu", self.num_massive_nu)
        vals.update(kw)
        return BackgroundParams(num_massive_nu=nm, **vals)

    def tree_flatten(self):
        return tuple(getattr(self, k) for k in _BG_FIELDS), self.num_massive_nu

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_massive_nu=aux)

    def __repr__(self):
        vals = ", ".join(f"{k}={getattr(self, k)}" for k in _BG_FIELDS)
        return f"BackgroundParams({vals}, num_massive_nu={self.num_massive_nu})"


def _densities(bg: BackgroundParams):
    """Derived Omega h^2 components and neutrino mass parameter."""
    h2 = (bg.H0 / 100.0) ** 2
    ogh2 = const.omega_gamma_h2() * (bg.tcmb / const.COBE_CMBTemp) ** 4
    onu1 = 7.0 / 8.0 * (4.0 / 11.0) ** (4.0 / 3.0) * ogh2  # per unit degeneracy
    if bg.num_massive_nu > 0:
        # one massive eigenstate with degeneracy nnu/3 (Planck convention);
        # remaining degeneracy massless (Calculator_CAMB neutrino setup)
        massive_deg = bg.nnu / 3.0
        massless_deg = bg.nnu - massive_deg
        # nu mass parameter: m c^2/(k_B T_nu0) such that large-am limit
        # reproduces omnuh2 (camb/modules.f90:1546)
        nu_mass = (const.nu_const / (1.5 * const.zeta3) * bg.omnuh2
                   / (onu1 * massive_deg))
    else:
        massive_deg = 0.0 * bg.nnu
        massless_deg = bg.nnu
        nu_mass = jnp.zeros_like(bg.ombh2)
    omdeh2 = h2 * (1.0 - bg.omk) - bg.ombh2 - bg.omch2 - bg.omnuh2
    omkh2 = bg.omk * h2
    return dict(h2=h2, ogh2=ogh2, onu1=onu1, massive_deg=massive_deg,
                massless_deg=massless_deg, nu_mass=nu_mass, omdeh2=omdeh2,
                omkh2=omkh2)


def grho_h2_a4(bg: BackgroundParams, a):
    """Total (8 pi G rho / 3 H100^2) * a^4 in Omega h^2 units (the reference's
    grhoa2/grhom pattern, equations_ppf.f90 dtauda)."""
    d = _densities(bg)
    a = jnp.asarray(a)
    a2 = a * a
    tot = (d["omkh2"] * a2
           + (bg.ombh2 + bg.omch2) * a
           + d["ogh2"]
           + d["onu1"] * d["massless_deg"])
    # w0-wa background density
    fde = a ** (1.0 - 3.0 * (1.0 + bg.w + bg.wa)) * jnp.exp(-3.0 * bg.wa * (1.0 - a)) * a2 * a
    tot = tot + d["omdeh2"] * fde
    if bg.num_massive_nu > 0:
        tot = tot + d["onu1"] * d["massive_deg"] * nu_rho(a * d["nu_mass"])
    return tot


def hubble_mpc(bg: BackgroundParams, a):
    """H(a)/c in 1/Mpc."""
    a = jnp.asarray(a)
    return H100_MPC * jnp.sqrt(grho_h2_a4(bg, a)) / (a * a)


def hofz_kms(bg: BackgroundParams, z):
    """H(z) in km/s/Mpc (Calculator_Cosmology Hofz contract, but km/s/Mpc)."""
    return hubble_mpc(bg, 1.0 / (1.0 + jnp.asarray(z))) * const.c / 1e3


def dtauda(bg: BackgroundParams, a):
    """Conformal time derivative dtau/da in Mpc (equations_ppf.f90 dtauda)."""
    return 1.0 / (jnp.asarray(a) ** 2 * hubble_mpc(bg, a))


# ---------------------------------------------------------------------------
# Distances
# ---------------------------------------------------------------------------

N_CHI_GRID = 512   # trapezoid on the log(1+z) grid: ~2e-5 relative accuracy
Z_GRID_MAX = 1100.0 * 3  # covers recombination for theta


class BackgroundFunctions(NamedTuple):
    """Precomputed distance tables for one parameter point.

    Built with cumulative Simpson on a uniform log(1+z) grid + cubic-Hermite
    interpolation (both O(dx^4)) — deliberately NO cubic-spline (Thomas)
    solves: those are sequential scans, and nested inside the sampler's step
    scan they blow up XLA compile time and serialize the TPU. 512 points
    give ~1e-7 relative distance accuracy, all embarrassingly parallel."""
    bg: BackgroundParams
    lz_grid: jnp.ndarray      # (N,) log(1+z)
    chi_grid: jnp.ndarray     # (N,) comoving radial distance, Mpc
    curvature_k: jnp.ndarray  # omk h^2 signal
    dchi_grid: jnp.ndarray | None = None  # (N,) dchi/dlz at nodes (Hermite)


def background_functions(bg: BackgroundParams, zmax: float = Z_GRID_MAX,
                         n: int = N_CHI_GRID) -> BackgroundFunctions:
    d = _densities(bg)
    dtype = jnp.asarray(bg.ombh2).dtype
    lz = jnp.linspace(0.0, jnp.log1p(zmax), n).astype(dtype)
    dx = lz[1] - lz[0]
    # chi = int dz / H_mpc ; in x = log(1+z): dchi/dx = (1+z)/H.
    # Cumulative SIMPSON (node + midpoint evals): error O(dx^4), so 512
    # points beat the old 2048-point trapezoid at a quarter the HBM traffic.
    lz_all = jnp.concatenate([lz, lz[:-1] + dx / 2.0])   # nodes then midpoints
    z_all = jnp.expm1(lz_all)
    f_all = (1.0 + z_all) / hubble_mpc(bg, 1.0 / (1.0 + z_all))
    f, fm = f_all[:n], f_all[n:]
    seg = (dx / 6.0) * (f[:-1] + 4.0 * fm + f[1:])
    from cosmomc_tpu.utils.interp import parallel_cumsum
    # TPU: jnp.cumsum at this length lowers to a serial loop (O(s) compile
    # blowup + ~ms runtime); the associative scan is log-depth
    chi = jnp.concatenate([jnp.zeros((1,), f.dtype), parallel_cumsum(seg)])
    return BackgroundFunctions(bg, lz, chi, d["omkh2"], f)


def comoving_radial_distance(bf: BackgroundFunctions, z):
    """chi(z) in Mpc (Calculator_Cosmology ComovingRadialDistance).

    The lz grid is UNIFORM, so the lookup is a closed-form index — no
    searchsorted (jnp.interp's binary search, vmapped over chains, cost
    ~200 ms/step at 1024 chains on the TPU backend)."""
    lz = jnp.log1p(jnp.asarray(z))
    n = bf.chi_grid.shape[-1]
    dx = bf.lz_grid[1] - bf.lz_grid[0]
    t = lz / dx
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    f = jnp.clip(t - i, 0.0, 1.0)
    c0, c1 = bf.chi_grid[i], bf.chi_grid[i + 1]
    if bf.dchi_grid is None:
        return c0 * (1.0 - f) + c1 * f
    # cubic Hermite using the known dchi/dlz at the nodes: O(dx^4)
    d0, d1 = bf.dchi_grid[i] * dx, bf.dchi_grid[i + 1] * dx
    f2 = f * f
    f3 = f2 * f
    return ((2 * f3 - 3 * f2 + 1) * c0 + (f3 - 2 * f2 + f) * d0
            + (-2 * f3 + 3 * f2) * c1 + (f3 - f2) * d1)


def _rofchi(bf: BackgroundFunctions, chi):
    """Curvature-corrected transverse distance f_K(chi) (modules.f90 rofChi).

    Uses the double-where pattern so the flat-universe case has no NaN
    gradients: sqrt(|omkh2|) at omkh2=0 has infinite derivative, and omkh2
    is symbolically a function of H0 even when omk is fixed to 0."""
    omkh2 = bf.curvature_k
    flat = jnp.abs(omkh2) < 1e-9
    safe = jnp.where(flat, 1.0, jnp.abs(omkh2))
    sqrtk = jnp.sqrt(safe) * H100_MPC    # 1/curvature radius in 1/Mpc
    x = chi * sqrtk
    open_case = jnp.sinh(x) / sqrtk
    closed_case = jnp.sin(x) / sqrtk
    return jnp.where(flat, chi,
                     jnp.where(omkh2 > 0, open_case, closed_case))


def angular_diameter_distance(bf: BackgroundFunctions, z):
    """D_A(z) in Mpc (modules.f90 AngularDiameterDistance :574-581)."""
    z = jnp.asarray(z)
    chi = comoving_radial_distance(bf, z)
    return _rofchi(bf, chi) / (1.0 + z)


def luminosity_distance(bf: BackgroundFunctions, z):
    z = jnp.asarray(z)
    return angular_diameter_distance(bf, z) * (1.0 + z) ** 2


def bao_d_v(bf: BackgroundFunctions, z):
    """D_V(z) = [(1+z)^2 D_A^2 c z / H]^(1/3) (modules.f90 BAO_D_v)."""
    z = jnp.asarray(z)
    da = angular_diameter_distance(bf, z)
    hz = hubble_mpc(bf.bg, 1.0 / (1.0 + z))   # 1/Mpc (H/c)
    return ((1.0 + z) ** 2 * da ** 2 * z / hz) ** (1.0 / 3.0)


# ---------------------------------------------------------------------------
# Sound horizon and theta_MC
# ---------------------------------------------------------------------------

_N_RS = 128


def sound_horizon(bg: BackgroundParams, astar):
    """r_s(a*) = int_0^a* cs dtau/da da with R = 3e4 a ombh2
    (modules.f90 dsound_da — the CosmoMC-consistent approximation)."""
    # integrate in x = sqrt(a): da = 2 x dx, regularizes the a->0 endpoint
    xs, ws = gl_nodes(jnp.sqrt(1e-8), jnp.sqrt(astar), _N_RS,
                      dtype=jnp.asarray(astar).dtype)
    a = xs * xs
    R = 3.0e4 * a * bg.ombh2
    cs = 1.0 / jnp.sqrt(3.0 * (1.0 + R))
    return jnp.sum(ws * 2.0 * xs * dtauda(bg, a) * cs)


def z_star_hu_sugiyama(bg: BackgroundParams):
    """Recombination redshift fit (Hu & Sugiyama 1996; modules.f90 :740-744)."""
    ombh2 = bg.ombh2
    omdmh2 = bg.omch2 + bg.omnuh2
    return (1048.0 * (1.0 + 0.00124 * ombh2 ** (-0.738))
            * (1.0 + (0.0783 * ombh2 ** (-0.238) / (1.0 + 39.5 * ombh2 ** 0.763))
               * (omdmh2 + ombh2) ** (0.560 / (1.0 + 21.1 * ombh2 ** 1.81))))


def _chi_direct(bg: BackgroundParams, astar, n: int = 160):
    """chi(a*) = int_a*^1 dtau/da da by direct GL in sqrt(a) — no spline
    build; used inside the theta->H0 bisection where only one distance is
    needed (cheap to trace, cheap to run)."""
    xs, ws = gl_nodes(jnp.sqrt(astar), jnp.sqrt(1.0), n,
                      dtype=jnp.asarray(astar).dtype)
    a = xs * xs
    return jnp.sum(ws * 2.0 * xs * dtauda(bg, a))


def conformal_time(bg: BackgroundParams, a_end, n: int = 192):
    """tau(a_end) = int_0^a_end dtau/da da, GL in sqrt(a) (the role of
    CAMB's TimeOfz, modules.f90)."""
    xs, ws = gl_nodes(jnp.sqrt(1e-9), jnp.sqrt(a_end), n,
                      dtype=jnp.asarray(a_end).dtype)
    a = xs * xs
    return jnp.sum(ws * 2.0 * xs * dtauda(bg, a))


def age_gyr(bg: BackgroundParams, n: int = 192):
    """Age of the universe in Gyr: int_0^1 a dtau/da da * Mpc/c
    (modules.f90 DeltaPhysicalTimeGyr :559-572)."""
    xs, ws = gl_nodes(jnp.sqrt(1e-9), 1.0, n, dtype=bg.H0.dtype)
    a = xs * xs
    t_mpc = jnp.sum(ws * 2.0 * xs * a * dtauda(bg, a))
    return t_mpc * const.Mpc / const.c / const.Gyr


def z_equality(bg: BackgroundParams):
    """Matter-radiation equality with massive nu counted relativistic
    (modules.f90:2951 'z_EQ (if v_nu=1)')."""
    d = _densities(bg)
    rad = d["ogh2"] + d["onu1"] * (d["massless_deg"] + d["massive_deg"])
    return (bg.ombh2 + bg.omch2) / rad - 1.0


def cosmomc_theta(bg: BackgroundParams):
    """theta_MC = r_s(z*)/D_M(z*) (modules.f90 CosmomcTheta :729-751)."""
    zstar = z_star_hu_sugiyama(bg)
    astar = 1.0 / (1.0 + zstar)
    rs = sound_horizon(bg, astar)
    chi = _chi_direct(bg, astar)
    d = _densities(bg)
    bf_like = BackgroundFunctions(bg, None, None, d["omkh2"])
    dm = _rofchi(bf_like, chi)
    return rs / dm


def h0_from_theta(theta_target, make_bg, lo=20.0, hi=120.0, iters=50):
    """Solve H0 from 100*theta_MC by bisection (the reference's
    TP_ParamArrayToTheoryParams H0 search, CosmologyParameterizations.f90
    :114-187). `make_bg(H0) -> BackgroundParams`; theta is monotonic in H0.
    Fixed iteration count -> jit-able; 50 halvings of [20,120] ~ 1e-13.
    """
    theta_target = jnp.asarray(theta_target)
    dtype = theta_target.dtype

    def body(carry, _):
        lo_, hi_ = carry
        mid = 0.5 * (lo_ + hi_)
        t = cosmomc_theta(make_bg(mid)) * 100.0
        too_small = t < theta_target   # theta increases with H0
        return (jnp.where(too_small, mid, lo_), jnp.where(too_small, hi_, mid)), None

    (lo_f, hi_f), _ = jax.lax.scan(
        body, (jnp.asarray(lo, dtype), jnp.asarray(hi, dtype)), None, length=iters)
    mid = jax.lax.stop_gradient(0.5 * (lo_f + hi_f))
    # Newton polish: the bisection midpoint depends on the inputs only
    # through boolean branch decisions, so its derivative is identically
    # ZERO — HMC/minimizer gradients through theta (and through
    # ombh2/omch2 via theta(H0)'s shape) silently vanished. One Newton
    # step from the (converged) midpoint leaves the value unchanged at
    # ~1e-13 but carries the implicit-function derivative
    # dH0/dp = -(d f/d p)/(d f/d H0).
    f_val, f_h0 = jax.value_and_grad(
        lambda h: cosmomc_theta(make_bg(h)) * 100.0 - theta_target)(mid)
    return mid - f_val / f_h0


# ---------------------------------------------------------------------------
# Eisenstein-Hu z_drag + r_drag (background-only runs; replaced by the
# full thermal history when the Boltzmann stack computes z_drag exactly)
# ---------------------------------------------------------------------------

def z_drag_eh(bg: BackgroundParams):
    """Eisenstein & Hu 1998 Eq.(4) drag redshift fit."""
    ombh2 = bg.ombh2
    omh2 = bg.ombh2 + bg.omch2 + bg.omnuh2
    b1 = 0.313 * omh2 ** (-0.419) * (1.0 + 0.607 * omh2 ** 0.674)
    b2 = 0.238 * omh2 ** 0.223
    return (1291.0 * omh2 ** 0.251 / (1.0 + 0.659 * omh2 ** 0.828)
            * (1.0 + b1 * ombh2 ** b2))


def r_drag_approx(bg: BackgroundParams):
    """Drag-epoch sound horizon via the Aubourg+2015 (1411.1074 Eq. 16)
    fitting formula — matches CAMB's thermal-history r_drag to ~0.02% over
    the standard parameter range (the EH98 route is ~2.5% biased). Used by
    background-only runs; the Boltzmann stack supersedes this with the exact
    recombination-history value."""
    om_b = bg.ombh2
    om_cb = bg.ombh2 + bg.omch2
    om_nu = bg.omnuh2
    return (55.154 * jnp.exp(-72.3 * (om_nu + 0.0006) ** 2)
            / (om_cb ** 0.25351 * om_b ** 0.12807))
