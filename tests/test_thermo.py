"""Recombination + thermal history parity vs pinned CAMB values.

Anchors (Planck 2018 base-LCDM best fit, computed by the reference CAMB):
z* = 1089.92, r* = 144.43 Mpc, z_drag = 1059.97(94), r_drag = 147.09 Mpc.
Our recfast implementation targets ~0.2% on z*/z_drag and ~0.1% on the
sound horizons at this stage (Heswitch corrections deferred).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.recfast import compute_thermo
from cosmomc_tpu.models.thermo import compute_thermo_tables, thermo_derived

PLANCK18 = dict(ombh2=0.022383, omch2=0.12011, H0=67.32, omnuh2=0.06 / 94.07)
YHE = 0.2454  # BBN-consistent value at Planck18 ombh2


@pytest.fixture(scope="module")
def thermo():
    bg = BackgroundParams.make(**PLANCK18)
    th = jax.jit(lambda b: compute_thermo(b, YHE))(bg)
    tab = compute_thermo_tables(bg, th, YHE)
    der = thermo_derived(bg, tab)
    return bg, th, tab, der


class TestRecfast:
    def test_xe_freezeout(self, thermo):
        _, th, _, _ = thermo
        z = np.asarray(th.z)
        xe = np.asarray(th.xe)
        x0 = xe[np.argmin(np.abs(z - 0.0))]
        assert 1.5e-4 < x0 < 2.5e-4     # residual ionization ~2e-4

    def test_xe_through_recombination(self, thermo):
        # recfast reference profile at Planck params (z, xe, rel tol)
        anchors = [(1000.0, 0.0497, 0.05), (1100.0, 0.148, 0.05),
                   (1200.0, 0.325, 0.05), (1500.0, 0.963, 0.02)]
        _, th, _, _ = thermo
        z = np.asarray(th.z)
        xe = np.asarray(th.xe)
        for zz, val, tol in anchors:
            got = xe[np.argmin(np.abs(z - zz))]
            assert abs(got / val - 1.0) < tol, (zz, got)

    def test_helium_plateaus(self, thermo):
        bg, th, _, _ = thermo
        z = np.asarray(th.z)
        xe = np.asarray(th.xe)
        fHe = 0.2454 / (3.9715 * (1 - 0.2454))
        # He+ plateau (H and He+ ionized): xe ~ 1 + fHe around z~2500-3500
        mid = xe[np.argmin(np.abs(z - 3000.0))]
        assert abs(mid - (1 + fHe)) < 0.01
        # He++ region: approaches 1 + 2 fHe at z ~ 7000+
        hi = xe[np.argmin(np.abs(z - 8000.0))]
        assert abs(hi - (1 + 2 * fHe)) < 0.02

    def test_matter_temp_decouples(self, thermo):
        bg, th, _, _ = thermo
        z = np.asarray(th.z)
        tm = np.asarray(th.tm)
        # tightly coupled at z>500: Tm ~ Trad
        i = np.argmin(np.abs(z - 600.0))
        assert abs(tm[i] / (2.7255 * (1 + z[i])) - 1.0) < 0.02
        # decoupled by z=10: Tm < 0.7 Trad
        i = np.argmin(np.abs(z - 10.0))
        assert tm[i] < 0.7 * 2.7255 * (1 + z[i])


class TestDerived:
    def test_zstar(self, thermo):
        *_, der = thermo
        assert abs(float(der.z_star) / 1089.92 - 1.0) < 3e-3

    def test_rstar(self, thermo):
        *_, der = thermo
        assert abs(float(der.r_star) / 144.43 - 1.0) < 2e-3

    def test_zdrag(self, thermo):
        *_, der = thermo
        assert abs(float(der.z_drag) / 1059.97 - 1.0) < 3e-3

    def test_rdrag(self, thermo):
        *_, der = thermo
        assert abs(float(der.r_drag) / 147.09 - 1.0) < 2e-3

    def test_rdrag_agrees_with_aubourg_fit(self, thermo):
        from cosmomc_tpu.models.background import r_drag_approx
        bg, *_, der = thermo
        fit = float(r_drag_approx(bg))
        assert abs(float(der.r_drag) / fit - 1.0) < 3e-3

    def test_ombh2_sensitivity(self):
        # more baryons -> earlier drag epoch release & smaller r_drag
        bgs = [BackgroundParams.make(**{**PLANCK18, "ombh2": v})
               for v in (0.021, 0.024)]
        rds = []
        for bg in bgs:
            th = compute_thermo(bg, YHE)
            tab = compute_thermo_tables(bg, th, YHE)
            rds.append(float(thermo_derived(bg, tab).r_drag))
        assert rds[1] < rds[0]


class TestFloat32Stability:
    """The TPU path runs float32; the recombination integrator must stay
    finite (the He Crate Boltzmann ratio overflows if formed naively —
    regression for the exp(+Bfact/tm) inf/inf NaN)."""

    def test_thermo_finite_f32(self):
        bg = BackgroundParams.make(dtype=jnp.float32, **PLANCK18)
        th = jax.jit(lambda b: compute_thermo(b, jnp.float32(YHE)))(bg)
        assert th.xe.dtype == jnp.float32
        assert bool(jnp.isfinite(th.xe).all())
        assert bool(jnp.isfinite(th.tm).all())
        # and the history is still the right shape physically
        xe = np.asarray(th.xe)
        assert xe[0] > 1.1          # He++ early
        assert xe[-1] < 3e-4 + 0.1  # frozen out (pre-reionization)

    def test_thermo_f32_matches_f64(self):
        bg64 = BackgroundParams.make(**PLANCK18)
        bg32 = BackgroundParams.make(dtype=jnp.float32, **PLANCK18)
        xe64 = np.asarray(compute_thermo(bg64, YHE).xe, np.float64)
        xe32 = np.asarray(compute_thermo(bg32, jnp.float32(YHE)).xe, np.float64)
        # agreement where xe is non-negligible (relative, floored)
        d = np.abs(xe32 - xe64) / np.maximum(xe64, 1e-3)
        assert d.max() < 5e-3, d.max()
