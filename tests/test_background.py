"""Background cosmology parity tests.

Anchors: Planck 2018 best-fit derived values (public, and reproduced by the
reference CAMB at these parameters): 100 theta_MC, age, D_M, r_drag.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cosmomc_tpu.models.background import (
    BackgroundParams, background_functions, hofz_kms, hubble_mpc,
    comoving_radial_distance, angular_diameter_distance, luminosity_distance,
    bao_d_v, cosmomc_theta, z_star_hu_sugiyama, h0_from_theta,
    z_drag_eh, r_drag_approx, sound_horizon, dtauda)
from cosmomc_tpu.models.neutrino import nu_rho, nu_pres
from cosmomc_tpu.models import constants as const


PLANCK18 = dict(ombh2=0.022383, omch2=0.12011, H0=67.32, omnuh2=0.06 / 94.07)


@pytest.fixture(scope="module")
def bg():
    return BackgroundParams.make(**PLANCK18)


@pytest.fixture(scope="module")
def bf(bg):
    return background_functions(bg)


class TestNeutrino:
    def test_limits(self):
        # massless limit
        assert abs(float(nu_rho(1e-5)) - 1.0) < 1e-8
        assert abs(float(nu_pres(1e-5)) - 1.0 / 3.0) < 1e-6
        # non-relativistic limit: rho ~ (3 zeta3/(2 const)) am
        am = 5000.0
        expect = 3.0 / (2.0 * const.nu_const) * const.zeta3 * am
        assert abs(float(nu_rho(am)) / expect - 1.0) < 1e-3

    def test_table_continuity(self):
        # series <-> table joins must be continuous (rho grows ~linearly at
        # large am, so compare across a tiny step around each switch point)
        for am_switch in (0.011, 540.0):
            lo = float(nu_rho(am_switch * (1 - 1e-5)))
            hi = float(nu_rho(am_switch * (1 + 1e-5)))
            assert abs(hi / lo - 1.0) < 1e-4, am_switch


class TestBackground:
    def test_h0(self, bg):
        # H(0) slightly above H0 because the reference's omegav closure
        # ignores radiation (Calculator_CAMB.f90:84-129) — we match it
        h = float(hofz_kms(bg, 0.0))
        assert abs(h - 67.32) < 0.01

    def test_matter_domination_scaling(self, bg):
        # H^2 ~ a^-3 deep in matter era
        h10 = float(hubble_mpc(bg, 1.0 / 11.0))
        h20 = float(hubble_mpc(bg, 1.0 / 21.0))
        ratio = (h20 / h10) ** 2
        expect = (21.0 / 11.0) ** 3
        assert abs(ratio / expect - 1.0) < 0.02

    def test_theta_mc_planck2018(self, bg):
        # Planck 2018 chain value at these parameters: 1.040909
        th = 100.0 * float(cosmomc_theta(bg))
        assert abs(th - 1.04091) < 5e-4

    def test_zstar(self, bg):
        # the Hu-Sugiyama *fit* (used by the reference for theta_MC) gives
        # ~1091.9 at Planck18 params — distinct from the exact thermal z*
        assert abs(float(z_star_hu_sugiyama(bg)) - 1091.9) < 1.0

    def test_age(self, bg):
        from cosmomc_tpu.utils.quad import gl_nodes
        xs, ws = gl_nodes(jnp.sqrt(1e-9), 1.0, 256, dtype=jnp.float64)
        a = xs * xs
        age_mpc = float(jnp.sum(ws * 2 * xs / (a * hubble_mpc(bg, a))))
        age_gyr = age_mpc * const.Mpc / const.c / const.Gyr
        assert abs(age_gyr - 13.797) < 0.03

    def test_distance_relations(self, bf):
        z = 0.5
        da = float(angular_diameter_distance(bf, z))
        dl = float(luminosity_distance(bf, z))
        chi = float(comoving_radial_distance(bf, z))
        assert abs(dl - da * (1 + z) ** 2) < 1e-6 * dl
        # flat universe: D_A = chi/(1+z)
        assert abs(da - chi / (1 + z)) < 1e-6 * da

    def test_chi_against_direct_quadrature(self, bg, bf):
        # independent check of the spline path with direct Gauss-Legendre
        from cosmomc_tpu.utils.quad import gl_integrate
        for z in (0.15, 1.0, 3.0, 30.0):
            direct = float(gl_integrate(
                lambda zz: 1.0 / hubble_mpc(bg, 1.0 / (1.0 + zz)), 0.0, z, n=96))
            sp = float(comoving_radial_distance(bf, z))
            assert abs(sp / direct - 1.0) < 2e-5, z

    def test_bao_dv(self, bf):
        # DR12-like scale: D_V(0.57) ~ 2050 Mpc for Planck-ish params
        dv = float(bao_d_v(bf, 0.57))
        assert 1900 < dv < 2200

    def test_rdrag(self, bg):
        # CAMB exact at Planck18 params: 147.05 Mpc; Aubourg+15 fit ~0.02%
        rd = float(r_drag_approx(bg))
        assert abs(rd / 147.05 - 1.0) < 2e-3

    def test_h0_from_theta_roundtrip(self, bg):
        th = 100.0 * float(cosmomc_theta(bg))
        make = lambda H0: BackgroundParams.make(
            ombh2=PLANCK18["ombh2"], omch2=PLANCK18["omch2"], H0=H0,
            omnuh2=PLANCK18["omnuh2"])
        H0 = float(h0_from_theta(th, make))
        assert abs(H0 - 67.32) < 1e-4

    def test_curved_universe(self):
        bg_open = BackgroundParams.make(omk=0.02, **PLANCK18)
        bg_closed = BackgroundParams.make(omk=-0.02, **PLANCK18)
        z = 2.0
        for bfc, sign in ((background_functions(bg_open), +1),
                          (background_functions(bg_closed), -1)):
            chi = float(comoving_radial_distance(bfc, z))
            fk = float(angular_diameter_distance(bfc, z)) * (1 + z)
            # open: sinh amplifies (fk > chi); closed: sin shrinks (fk < chi)
            assert sign * (fk - chi) > 0
            # small curvature: |fk/chi - 1| ~ omk (chi H0/c)^2 / 6
            assert abs(fk / chi - 1.0) < 0.05

    def test_w0wa(self):
        bg_w = BackgroundParams.make(w=-0.9, wa=0.1, **PLANCK18)
        # just check it evaluates and differs from LCDM sensibly
        bf_w = background_functions(bg_w)
        bf_l = background_functions(BackgroundParams.make(**PLANCK18))
        dl_w = float(luminosity_distance(bf_w, 1.0))
        dl_l = float(luminosity_distance(bf_l, 1.0))
        assert dl_w != dl_l
        assert abs(dl_w / dl_l - 1.0) < 0.05

    def test_vmap_and_grad(self, bg):
        import jax
        f = lambda ombh2: cosmomc_theta(bg._replace(ombh2=ombh2))
        g = float(jax.grad(f)(bg.ombh2))
        assert np.isfinite(g) and g != 0.0
        zs = jnp.asarray([0.1, 0.5, 1.0])
        bf = background_functions(bg)
        das = np.asarray(angular_diameter_distance(bf, zs))
        assert das.shape == (3,) and np.all(np.isfinite(das))
