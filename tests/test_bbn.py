"""BBN consistency tables (models/bbn.py) vs reference values.

Oracle: the PArthENoPE_880.2_standard grid itself (exact nodes must be
reproduced) and the Planck-2018 published YHe at the best fit
(yheused = 0.2453985 for ombh2 = 0.0223774, base_plikHM_TTTEEE_lowl_lowE
.minimum line 94, computed by the reference's bbn.f90 bicubic interp).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cosmomc_tpu.models.bbn import (load_bbn_table, yhe_bbn, ypbbn_bbn,
                                    dh_bbn)


@pytest.fixture(scope="module")
def tab():
    return load_bbn_table()


def test_grid_nodes_reproduced(tab):
    """Resampled fine grid must hit the coarse nodes to spline accuracy."""
    import os
    path = os.path.join(os.environ.get("COSMOMC_DATA",
                                       "/root/reference/data"),
                        "PArthENoPE_880.2_standard.dat")
    raw = np.loadtxt(path)
    # a scatter of rows incl. edges
    for r in raw[:: max(1, len(raw) // 37)]:
        got = float(yhe_bbn(r[0], r[2], tab))
        assert abs(got - r[3]) < 3e-6, (r[0], r[2], got, r[3])
    for r in raw[:: max(1, len(raw) // 11)]:
        got = float(dh_bbn(r[0], r[2], tab))
        assert abs(got / r[6] - 1) < 2e-3


def test_planck_2018_yhe(tab):
    """Reference-computed derived YHe at the Planck 2018 best fit."""
    got = float(yhe_bbn(0.02237737, 3.046 - 3.046, tab))
    assert abs(got - 0.2453985) < 5e-5


def test_jit_and_vmap(tab):
    import jax
    f = jax.jit(lambda o: yhe_bbn(o, 0.0, tab))
    v = f(jnp.asarray([0.020, 0.022, 0.024]))
    assert v.shape == (3,)
    assert np.all(np.diff(np.asarray(v)) > 0)   # Yp increases with ombh2
    g = jax.grad(lambda o: yhe_bbn(o, 0.0, tab))(0.0224)
    assert np.isfinite(float(g)) and float(g) > 0
