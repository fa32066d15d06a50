"""plik_lite native likelihood vs an independent numpy computation.

The real plik_lite release files are not shipped in the reference tree, so
the test builds a synthetic dataset in the exact release format (data,
blmin, blmax, weights, cov_file; reference reader CMB.f90:208-303) and
checks the JAX implementation against a from-scratch numpy evaluation of
the same math (CMB.f90:305-329).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.pliklite import PlikLiteLikelihood


@pytest.fixture(scope="module")
def plik_fixture(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pliklite"))
    rng = np.random.default_rng(3)
    plmin, lmax = 30, 2508
    nbincl = (215, 199, 199)
    nbins = sum(nbincl)
    nL = lmax - plmin + 1
    # contiguous bins: ~9 l's per TT bin over 30..2508, rebuilt per spectrum
    # identical blmin/blmax arrays (plik_lite uses one grid; first 215 for TT)
    maxbin = max(nbincl)
    edges = np.unique(np.linspace(0, nL - 1, maxbin + 1).astype(int))
    blmin0 = edges[:-1]
    blmax0 = np.append(edges[1:-1] - 1, nL - 1)
    np.savetxt(f"{d}/blmin.dat", blmin0, fmt="%d")
    np.savetxt(f"{d}/blmax.dat", blmax0, fmt="%d")
    weights = 0.5 + rng.random(nL)
    np.savetxt(f"{d}/weights.dat", weights)
    X = 1000 * (1 + 0.1 * rng.standard_normal(nbins))
    np.savetxt(f"{d}/data.dat",
               np.column_stack([np.arange(1, nbins + 1), X, 0.05 * np.abs(X)]))
    A = rng.standard_normal((nbins, 2 * nbins))
    cov = (A @ A.T) / (2 * nbins) * 25.0
    np.savetxt(f"{d}/cov.dat", cov)
    with open(f"{d}/plik_lite.dataset", "w") as f:
        f.write("""calibration_param = cal.paramnames
data = data.dat
blmin = blmin.dat
blmax = blmax.dat
weights = weights.dat
cov_file = cov.dat
use_cl = TT TE EE
""")
    with open(f"{d}/cal.paramnames", "w") as f:
        f.write("A_planck    A_{\\rm planck}\n")
    return d, plmin, lmax, nbincl, blmin0, blmax0, weights, X, cov


def _numpy_loglike(cls_stack, cal, plmin, lmax, nbincl, blmin0, blmax0,
                   weights, X, cov, used=(True, True, True), usebins=None):
    ls = plmin + np.arange(lmax - plmin + 1)
    w = weights * 2 * np.pi / (ls * (ls + 1.0))
    pairs = ((0, 0), (1, 0), (1, 1))
    binned = []
    keep = []
    off = 0
    for i, nb in enumerate(nbincl):
        if used[i]:
            bins = (usebins[usebins <= nb] if usebins is not None
                    else np.arange(1, nb + 1))
            dl = cls_stack[pairs[i][0], pairs[i][1], plmin:lmax + 1]
            for b in bins:
                sl = slice(blmin0[b - 1], blmax0[b - 1] + 1)
                binned.append(np.dot(dl[sl], w[sl]))
            keep.extend(bins - 1 + off)
        off += nb
    binned = np.array(binned)
    keep = np.array(keep, int)
    r = X[keep] - binned / cal ** 2
    icov = np.linalg.inv(cov[np.ix_(keep, keep)])
    return 0.5 * r @ icov @ r


def _smooth_stack(lmax):
    L = np.arange(lmax + 1).astype(float)
    L[0] = 1
    cls = np.zeros((4, 4, lmax + 1))
    cls[0, 0] = 1e3 * (L / 200.0) ** -0.6
    cls[1, 1] = 20.0 * (L / 500.0) ** -0.4
    cls[1, 0] = cls[0, 1] = 0.4 * np.sqrt(cls[0, 0] * cls[1, 1]) * np.sin(L / 95)
    cls[:, :, :2] = 0
    return cls


def test_full_tt_te_ee(plik_fixture):
    d, plmin, lmax, nbincl, blmin0, blmax0, weights, X, cov = plik_fixture
    like = PlikLiteLikelihood(f"{d}/plik_lite.dataset")
    assert [p.name for p in like.nuisance] == ["A_planck"]
    cls = _smooth_stack(lmax)
    for cal in (1.0, 1.003):
        want = _numpy_loglike(cls, cal, plmin, lmax, nbincl, blmin0, blmax0,
                              weights, X, cov)
        got = float(like.log_like_cls(jnp.asarray(cls), jnp.array([cal])))
        assert got == pytest.approx(want, rel=1e-10)


def test_tt_only_with_l_range(plik_fixture):
    d, plmin, lmax, nbincl, blmin0, blmax0, weights, X, cov = plik_fixture
    # build a TT-only, L-range-restricted variant via a second dataset file
    with open(f"{d}/plik_lite_tt.dataset", "w") as f:
        f.write("""calibration_param = cal.paramnames
data = data.dat
blmin = blmin.dat
blmax = blmax.dat
weights = weights.dat
cov_file = cov.dat
use_cl = TT
bins_for_L_range = 100 1500
""")
    like = PlikLiteLikelihood(f"{d}/plik_lite_tt.dataset")
    cls = _smooth_stack(lmax)
    centre = plmin + (blmin0[:max(nbincl)] + blmax0[:max(nbincl)]) / 2.0
    usebins = np.where((centre >= 100) & (centre <= 1500))[0] + 1
    want = _numpy_loglike(cls, 1.0, plmin, lmax, nbincl, blmin0, blmax0,
                          weights, X, cov, used=(True, False, False),
                          usebins=usebins)
    got = float(like.log_like_cls(jnp.asarray(cls), jnp.array([1.0])))
    assert got == pytest.approx(want, rel=1e-10)
