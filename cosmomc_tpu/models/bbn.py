"""BBN consistency: YHe(ombh2, DeltaN) and D/H from precomputed grids.

Reference: source/bbn.f90 — interpolates the PArthENoPE / AlterBBN tables
shipped in data/ (default `PArthENoPE_880.2_standard.dat`, bbn.f90:12) with
a bicubic TInterpGrid2D (bbn.f90:44-50); `bbn_consistency = T` makes the
theta parameterization set YHe from (ombh2, nnu-3.046) every step
(CosmologyParameterizations.f90 SetForH :283-348).

TPU-native design: the irregular (ombh2, DeltaN) table is fit host-side
with a bicubic spline at load time and resampled onto a fine uniform grid;
the device-side lookup is then a single bilinear gather — no control flow,
jit/vmap/grad safe. Resampling error is < 2e-6 in Yp (the table's own
sigma_Yp is ~1e-4), verified in tests/test_bbn.py.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

DEFAULT_TABLE = "PArthENoPE_880.2_standard.dat"

# columns of the BBN grid files (bbn.f90:11-24)
COL_OMBH2, COL_ETA10, COL_DELTAN = 0, 1, 2
COL_YP, COL_YPBBN, COL_SIGYP, COL_DH, COL_SIGDH = 3, 4, 5, 6, 7


class BBNTable(NamedTuple):
    """Uniform fine grids ready for device bilinear lookup."""
    ombh2_0: float
    ombh2_step: float
    dn_0: float
    dn_step: float
    yp: jnp.ndarray        # (n_omb, n_dn) CMB mass fraction Yp
    ypbbn: jnp.ndarray     # nucleon fraction Yp^BBN
    dh: jnp.ndarray        # D/H
    sig_yp: jnp.ndarray
    sig_dh: jnp.ndarray


@lru_cache(maxsize=4)
def load_bbn_table(path: str | None = None, n_fine_omb: int = 768,
                   n_fine_dn: int = 320) -> BBNTable:
    """Parse the reference-format grid file and resample (host, cached)."""
    if path is None:
        data_dir = os.environ.get("COSMOMC_DATA", "/root/reference/data")
        path = os.path.join(data_dir, DEFAULT_TABLE)
    raw = np.loadtxt(path)
    ombs = np.unique(raw[:, COL_OMBH2])
    dns = np.unique(raw[:, COL_DELTAN])
    n_o, n_d = len(ombs), len(dns)
    if n_o * n_d != raw.shape[0]:
        raise ValueError(f"BBN table {path} is not a full grid")

    # reshape to (n_o, n_d) by sorting rows
    order = np.lexsort((raw[:, COL_DELTAN], raw[:, COL_OMBH2]))
    g = raw[order].reshape(n_o, n_d, raw.shape[1])

    from scipy.interpolate import RectBivariateSpline
    fine_o = np.linspace(ombs[0], ombs[-1], n_fine_omb)
    fine_d = np.linspace(dns[0], dns[-1], n_fine_dn)

    def resample(col):
        sp = RectBivariateSpline(ombs, dns, g[:, :, col], kx=3, ky=3)
        return jnp.asarray(sp(fine_o, fine_d))

    return BBNTable(
        ombh2_0=float(fine_o[0]),
        ombh2_step=float(fine_o[1] - fine_o[0]),
        dn_0=float(fine_d[0]),
        dn_step=float(fine_d[1] - fine_d[0]),
        yp=resample(COL_YP), ypbbn=resample(COL_YPBBN),
        dh=resample(COL_DH),
        sig_yp=resample(COL_SIGYP), sig_dh=resample(COL_SIGDH))


def _bilinear(tab: BBNTable, grid: jnp.ndarray, ombh2, delta_n):
    x = (jnp.asarray(ombh2) - tab.ombh2_0) / tab.ombh2_step
    y = (jnp.asarray(delta_n) - tab.dn_0) / tab.dn_step
    i = jnp.clip(x.astype(jnp.int32), 0, grid.shape[0] - 2)
    j = jnp.clip(y.astype(jnp.int32), 0, grid.shape[1] - 2)
    fx = jnp.clip(x - i, 0.0, 1.0)
    fy = jnp.clip(y - j, 0.0, 1.0)
    return ((1 - fx) * (1 - fy) * grid[i, j] + fx * (1 - fy) * grid[i + 1, j]
            + (1 - fx) * fy * grid[i, j + 1] + fx * fy * grid[i + 1, j + 1])


def yhe_bbn(ombh2, delta_n=0.0, table: BBNTable | None = None):
    """CMB mass fraction Y_He(ombh2, DeltaN) — the `bbn_consistency` value
    used for the recombination history (SetForH, bbn.f90 Yp)."""
    tab = table if table is not None else load_bbn_table()
    return _bilinear(tab, tab.yp, ombh2, delta_n)


def ypbbn_bbn(ombh2, delta_n=0.0, table: BBNTable | None = None):
    """Nucleon-number fraction Yp^BBN (ElementAbundances likelihood units)."""
    tab = table if table is not None else load_bbn_table()
    return _bilinear(tab, tab.ypbbn, ombh2, delta_n)


def dh_bbn(ombh2, delta_n=0.0, table: BBNTable | None = None):
    """Primordial D/H prediction."""
    tab = table if table is not None else load_bbn_table()
    return _bilinear(tab, tab.dh, ombh2, delta_n)


def bbn_errors(ombh2, delta_n=0.0, table: BBNTable | None = None):
    """(sigma_Yp^BBN, sigma_D/H) theory errors for abundance likelihoods."""
    tab = table if table is not None else load_bbn_table()
    return (_bilinear(tab, tab.sig_yp, ombh2, delta_n),
            _bilinear(tab, tab.sig_dh, ombh2, delta_n))
