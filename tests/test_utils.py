"""Unit tests for the utility runtime (ini, paramnames, interp, quad).

Modeled on the reference's tests/ (inifile_tests.f90, interpolation_tests.f90)
but broader.
"""

import os
import textwrap

import numpy as np
import pytest

from cosmomc_tpu.utils.ini import IniFile, IniError
from cosmomc_tpu.utils.paramnames import ParamNames
from cosmomc_tpu.utils import interp
from cosmomc_tpu.utils.quad import gl_integrate

import jax.numpy as jnp


def write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


class TestIni:
    def test_basic_types(self, tmp_path):
        p = write(tmp_path, "a.ini", """
            an_int = 3
            a_float = 2.5
            a_bool = T
            a_str = hello world   # trailing comment
        """)
        ini = IniFile(p)
        assert ini.int("an_int") == 3
        assert ini.float("a_float") == 2.5
        assert ini.bool("a_bool") is True
        assert ini.string("a_str") == "hello world"
        assert ini.int("missing", 7) == 7
        with pytest.raises(IniError):
            ini.string("nope", required=True)

    def test_default_include_precedence(self, tmp_path):
        write(tmp_path, "base.ini", """
            x = 1
            y = base
        """)
        p = write(tmp_path, "top.ini", """
            y = top
            DEFAULT(base.ini)
        """)
        ini = IniFile(p)
        assert ini.string("y") == "top"   # top file wins over DEFAULT
        assert ini.int("x") == 1          # filled from default

    def test_nested_includes(self, tmp_path):
        write(tmp_path, "lvl2.ini", "z = 2\nshadow = lvl2\n")
        write(tmp_path, "lvl1.ini", "INCLUDE(lvl2.ini)\nshadow = lvl1\n")
        p = write(tmp_path, "top.ini", "DEFAULT(lvl1.ini)\n")
        ini = IniFile(p)
        assert ini.int("z") == 2
        assert ini.string("shadow") == "lvl1"  # nearer file wins

    def test_macros(self, tmp_path):
        p = write(tmp_path, "m.ini", "file = %DATASETDIR%bao.dat\n")
        ini = IniFile(p, macros={"DATASETDIR": "/data/"})
        assert ini.string("file") == "/data/bao.dat"

    def test_tagged_keys(self, tmp_path):
        p = write(tmp_path, "t.ini", """
            cmb_dataset[SPTSZ] = spt.dataset
            cmb_dataset[SPTSZ,lmax] = 3000
            cmb_dataset[BK15] = bk.dataset
        """)
        ini = IniFile(p)
        assert ini.tags("cmb_dataset") == ["SPTSZ", "BK15"]
        assert ini.tagged("cmb_dataset", "SPTSZ") == "spt.dataset"
        assert ini.tag_overrides("cmb_dataset", "SPTSZ") == {"lmax": "3000"}

    def test_provenance(self, tmp_path):
        p = write(tmp_path, "p.ini", "a = 1\nb = 2\n")
        ini = IniFile(p)
        ini.int("a")
        out = str(tmp_path / "out.inputparams")
        ini.write_read_values(out)
        assert "a = 1" in open(out).read()
        assert "b" not in open(out).read()


class TestParamNames:
    def test_reference_file(self):
        ref = "/root/reference/paramnames/params_CMB.paramnames"
        if not os.path.isfile(ref):
            pytest.skip("reference not mounted")
        pn = ParamNames.from_file(ref)
        assert pn.has("omegabh2")
        assert not pn.names[pn.index("omegabh2")].derived
        assert pn.names[pn.index("H0")].derived
        assert pn.names[pn.index("theta")].label.startswith("100")

    def test_roundtrip(self, tmp_path):
        pn = ParamNames()
        from cosmomc_tpu.utils.paramnames import ParamInfo
        pn.add(ParamInfo("a", "\\alpha"))
        pn.add(ParamInfo("b", "\\beta", derived=True))
        path = str(tmp_path / "x.paramnames")
        pn.write(path)
        pn2 = ParamNames.from_file(path)
        assert pn2.names[1].derived and pn2.names[1].name == "b"


class TestInterp:
    def test_spline_exact_cubic(self):
        # clamped spline reproduces a cubic exactly
        x = jnp.linspace(0.0, 2.0, 12)
        f = lambda t: t ** 3 - 2 * t ** 2 + 0.5 * t
        df = lambda t: 3 * t ** 2 - 4 * t + 0.5
        sp = interp.spline_fit(x, f(x), bc_start=float(df(x[0])), bc_end=float(df(x[-1])))
        xq = jnp.linspace(0.0, 2.0, 101)
        np.testing.assert_allclose(np.asarray(interp.spline_eval(sp, xq)),
                                   np.asarray(f(xq)), atol=1e-10)
        np.testing.assert_allclose(np.asarray(interp.spline_eval_deriv(sp, xq)),
                                   np.asarray(df(xq)), atol=1e-9)

    def test_spline_sin_natural(self):
        x = jnp.linspace(0.0, np.pi, 40)
        sp = interp.spline_fit(x, jnp.sin(x))
        xq = jnp.linspace(0.1, np.pi - 0.1, 77)
        np.testing.assert_allclose(np.asarray(interp.spline_eval(sp, xq)),
                                   np.sin(np.asarray(xq)), atol=2e-5)

    def test_spline_integral(self):
        x = jnp.linspace(0.0, 1.0, 60)
        sp = interp.spline_fit(x, jnp.exp(x))
        assert abs(float(interp.spline_integral(sp)) - (np.e - 1)) < 1e-5
        cum = interp.spline_cumint(sp)
        assert abs(float(cum[-1]) - (np.e - 1)) < 1e-5

    def test_grid2d(self):
        x = jnp.linspace(0, 1, 30)
        y = jnp.linspace(0, 2, 40)
        z = jnp.sin(x[:, None] * 3) * jnp.cos(y[None, :])
        g = interp.Grid2D(x, y, z)
        xq = jnp.asarray([0.33, 0.71])
        yq = jnp.asarray([0.5, 1.3])
        expect = np.sin(np.asarray(xq) * 3) * np.cos(np.asarray(yq))
        np.testing.assert_allclose(np.asarray(interp.grid2d_eval(g, xq, yq)),
                                   expect, atol=2e-4)


class TestQuad:
    def test_gauss_legendre(self):
        val = gl_integrate(lambda t: jnp.exp(-t * t), 0.0, 3.0, n=48)
        assert abs(float(val) - np.sqrt(np.pi) / 2 * 0.9999779) < 1e-6
