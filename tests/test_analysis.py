"""Analysis layer (analysis/mcsamples.py): statistical recovery tests.

Pattern from the reference's only statistically-grounded tests
(python/getdist_tests/getdist_test.py): simulate weighted chains from known
distributions, check recovered means/limits/covariances; round-trip the
GetDist file formats.
"""

import os

import numpy as np
import pytest

from cosmomc_tpu.analysis.mcsamples import MCSamples
from cosmomc_tpu.io.chains import ChainWriter
from cosmomc_tpu.utils.paramnames import ParamNames, ParamInfo


def _gaussian_samples(n=200_000, seed=0):
    rng = np.random.default_rng(seed)
    mean = np.array([1.5, -0.3])
    cov = np.array([[0.04, 0.012], [0.012, 0.09]])
    x = rng.multivariate_normal(mean, cov, size=n)
    names = ParamNames([ParamInfo("a", "a"), ParamInfo("b", "b")])
    return MCSamples(x, np.ones(n), np.zeros(n), names), mean, cov


def test_moments_recovered():
    s, mean, cov = _gaussian_samples()
    np.testing.assert_allclose(s.means(), mean, atol=3e-3)
    np.testing.assert_allclose(s.cov(), cov, rtol=0.03, atol=1e-4)


def test_two_tail_limits_match_gaussian():
    s, mean, cov = _gaussian_samples()
    stats = s.marge_stats(contours=(0.68, 0.95))
    for j, st in enumerate(stats):
        sd = np.sqrt(cov[j, j])
        lo68, hi68, tag = st.limits[0]
        assert tag == "two"
        # equal-tail 68% limits of a Gaussian are mean +/- 0.9945 sigma
        assert abs(lo68 - (mean[j] - 0.9945 * sd)) < 0.03 * sd
        assert abs(hi68 - (mean[j] + 0.9945 * sd)) < 0.03 * sd
        lo95, hi95, _ = st.limits[1]
        assert abs(hi95 - (mean[j] + 1.9600 * sd)) < 0.05 * sd


def test_one_tail_detection():
    """A half-Gaussian truncated at 0 must report a '<' upper limit."""
    rng = np.random.default_rng(1)
    x = np.abs(rng.normal(0, 1.0, 100_000))[:, None]
    names = ParamNames([ParamInfo("r", "r")])
    s = MCSamples(x, np.ones(len(x)), np.zeros(len(x)), names,
                  ranges={"r": (0.0, 20.0)})
    st = s.marge_stats(contours=(0.95,))[0]
    lo, hi, tag = st.limits[0]
    assert tag == "<"
    assert lo == 0.0
    assert abs(hi - 1.96) < 0.05   # 95% of |N(0,1)|


def test_kde_density_integrates_to_one():
    s, mean, cov = _gaussian_samples()
    x, d = s.kde_1d(0)
    dx = x[1] - x[0]
    assert abs(d.sum() * dx - 1.0) < 1e-6
    # peak near the mean
    assert abs(x[np.argmax(d)] - mean[0]) < 0.05


def test_weighted_stats():
    """Doubling weight == duplicating the sample."""
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (5000, 1))
    names = ParamNames([ParamInfo("a", "a")])
    s1 = MCSamples(np.concatenate([x, x[:1000]]), np.ones(6000),
                   np.zeros(6000), names)
    w = np.ones(5000); w[:1000] = 2.0
    s2 = MCSamples(x, w, np.zeros(5000), names)
    assert abs(s1.means()[0] - s2.means()[0]) < 1e-12
    assert abs(s1.cov()[0, 0] - s2.cov()[0, 0]) < 1e-12


def test_file_roundtrip(tmp_path):
    """Write chains via ChainWriter + sidecars, load via MCSamples.load,
    write all GetDist-format outputs."""
    rng = np.random.default_rng(3)
    nsteps, nchains = 2000, 4
    root = str(tmp_path / "run")
    names = ParamNames([ParamInfo("a", "a"), ParamInfo("b", "b")])
    w = ChainWriter(root, nchains)
    accept = rng.random((nsteps, nchains)) < 0.3
    P = rng.normal(0, 1, (nsteps, nchains, 2)).cumsum(axis=0) * 0.01 \
        + rng.normal([1.0, 2.0], 0.1, (nsteps, nchains, 2))
    mll = rng.random((nsteps, nchains))
    w.add_segment(accept, P, mll)
    w.close()
    names.write(root + ".paramnames")
    with open(root + ".ranges", "w") as f:
        f.write("a -1e30 1e30\nb -1e30 1e30\n")

    s = MCSamples.load(root, ignore_frac=0.2)
    assert s.samples.shape[1] == 2
    assert len(s.names) == 2
    out = s.write_all(root)
    assert np.isfinite(out["R-1"])
    for ext in (".margestats", ".likestats", ".covmat", ".corr", ".converge"):
        assert os.path.getsize(root + ext) > 0
    # covmat round-trips through numpy
    cv = np.loadtxt(root + ".covmat")
    np.testing.assert_allclose(cv, s.cov(), rtol=1e-6)


def test_converge_r_sane():
    """Identical chains -> tiny R-1; shifted chains -> big R-1."""
    rng = np.random.default_rng(4)
    names = ParamNames([ParamInfo("a", "a")])
    base = rng.normal(0, 1, (40_000, 1))
    x = np.concatenate([base[:20_000], base[20_000:]])
    s = MCSamples(x, np.ones(len(x)), np.zeros(len(x)), names,
                  chain_offsets=[0, 20_000, 40_000])
    assert s.converge_tests()["R-1"] < 0.01
    x2 = np.concatenate([base[:20_000], base[20_000:] + 3.0])
    s2 = MCSamples(x2, np.ones(len(x2)), np.zeros(len(x2)), names,
                   chain_offsets=[0, 20_000, 40_000])
    assert s2.converge_tests()["R-1"] > 1.0


def test_converge_battery(tmp_path):
    """Split-limit tests, correlation lengths, Raftery-Lewis: sane values
    on a synthetic AR(1) chain (GetDist.f90:307-373 battery analog)."""
    from cosmomc_tpu.analysis.mcsamples import MCSamples
    from cosmomc_tpu.utils.paramnames import ParamNames, ParamInfo

    rng = np.random.default_rng(3)
    n = 4000
    rho = 0.8
    x = np.empty((n, 2))
    x[0] = 0.0
    eps = rng.standard_normal((n, 2))
    for i in range(1, n):
        x[i] = rho * x[i - 1] + np.sqrt(1 - rho ** 2) * eps[i]
    names = ParamNames([ParamInfo("a", "a"), ParamInfo("b", "b")])
    s = MCSamples(x, np.ones(n), np.zeros(n), names, [0, n // 2, n])

    sp = s.split_limit_tests()
    assert set(sp) == {2, 3, 4}
    for v in sp.values():
        assert v.shape == (2,)
        assert np.all(v >= 0) and np.all(v < 1.0)

    cl = s.correlation_lengths()
    # AR(1) integrated autocorr time = (1+rho)/(1-rho) = 9
    assert np.all(cl > 4) and np.all(cl < 20), cl

    rl = s.raftery_lewis()
    assert np.all(rl["thin_k"] >= 1)
    assert np.all(np.isfinite(rl["N_min"]))
    assert np.all(rl["N_min"] > 100)

    s.write_converge(str(tmp_path / "t.converge"))
    txt = (tmp_path / "t.converge").read_text()
    assert "Split tests" in txt and "Correlation lengths" in txt \
        and "Raftery-Lewis" in txt
