"""CMBLikes engine vs the reference implementation.

Oracle values pinned from the reference's own Python mirror of the Fortran
likelihood (`/root/reference/python/CMBlikes.py` chi_squared — the same
math as source/CMBlikes.f90 CMBLikes_LogLike), evaluated on
 (a) the in-tree SPT-SZ 2500d TT dataset (gaussian + calibration +
     aberration + log cal prior),
 (b) the in-tree Planck 2018 smica lensing dataset (PP bandpowers with
     TT/EE/TE/PP linear corrections, required maps beyond used maps),
 (c) synthetic HL / gaussian / exact datasets generated deterministically
     below (BK15's covmat is not shipped in-tree, so HL is pinned via the
     synthetic set).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.cmblikes import CMBLikes, read_cl_text

REF_DATA = "/root/reference/data"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF_DATA),
                               reason="reference data not present")


def _write_smooth_theory(path, lmax=4500):
    L = np.arange(2, lmax + 1).astype(float)
    tt = 1e3 * (L / 200.0) ** -0.6 * (1 + 0.2 * np.sin(L / 90.0))
    ee = 20.0 * (L / 500.0) ** -0.4 * (1 + 0.3 * np.sin(L / 90.0 + 1.0))
    te = np.sign(np.sin(L / 95.0)) * np.sqrt(np.abs(tt * ee)) * 0.4
    bb = 0.05 * (L / 1000.0) ** 0.8
    pp = 1.3e-7 * (L / 30.0) ** -0.9
    np.savetxt(path, np.column_stack([L, tt, te, ee, bb, pp]), fmt="%12.6e",
               header="   L    TT             TE             EE             "
                      "BB             PP")


@pytest.fixture(scope="module")
def smooth_cls(tmp_path_factory):
    p = tmp_path_factory.mktemp("cls") / "theory_cl.txt"
    _write_smooth_theory(str(p))
    return jnp.asarray(read_cl_text(str(p), 4500))


@needs_ref
class TestRealDatasets:
    def test_sptsz_gaussian(self, smooth_cls):
        like = CMBLikes(
            f"{REF_DATA}/sptsz_2500d_tt/spt_s13_margfg.dataset",
            param_specs={"sptsz_cal": (1.0, 0.1, 10, 0.002, 0.002)})
        assert [p.name for p in like.nuisance] == ["sptsz_cal"]
        got = 2 * float(like.log_like_cls(smooth_cls, jnp.array([1.0])))
        assert got == pytest.approx(19853.62342037586, abs=1e-5)
        got = 2 * float(like.log_like_cls(smooth_cls, jnp.array([1.01])))
        assert got == pytest.approx(19746.569244953276, abs=1e-5)

    def test_planck_lensing_2018(self, smooth_cls):
        like = CMBLikes(
            f"{REF_DATA}/planck_lensing_2018/"
            "smicadx12_Dec5_ftl_mv2_ndclpp_p_teb_agr2.dataset")
        # PP-only in likelihood, T E P required for linear correction
        assert like.nmaps == 1 and like.nmaps_required == 3
        got = 2 * float(like.log_like_cls(smooth_cls, jnp.array([1.0])))
        assert got == pytest.approx(9875.38509836303, abs=1e-5)
        got = 2 * float(like.log_like_cls(smooth_cls, jnp.array([1.05])))
        assert got == pytest.approx(10103.458592947438, abs=1e-5)

    def test_jit_and_grad(self, smooth_cls):
        like = CMBLikes(
            f"{REF_DATA}/planck_lensing_2018/"
            "smicadx12_Dec5_ftl_mv2_ndclpp_p_teb_agr2.dataset")
        f = jax.jit(like.log_like_cls)
        v = float(f(smooth_cls, jnp.array([1.0])))
        assert v == pytest.approx(9875.38509836303 / 2, rel=1e-10)
        g = jax.grad(lambda n: like.log_like_cls(smooth_cls, n))(jnp.array([1.01]))
        assert np.isfinite(float(g[0])) and abs(float(g[0])) > 0


def _make_hl_fixture(d):
    """Deterministic synthetic binned TT/TE/EE dataset (seed 42)."""
    rng = np.random.default_rng(42)
    os.makedirs(f"{d}/windows", exist_ok=True)
    lmin, lmax, nbins = 30, 300, 6
    L = np.arange(lmin, lmax + 1)
    edges = np.linspace(lmin, lmax + 1, nbins + 1).astype(int)
    for b in range(nbins):
        w = np.zeros(len(L))
        w[(L >= edges[b]) & (L < edges[b + 1])] = 1.0
        w /= w.sum()
        np.savetxt(f"{d}/windows/win_{b + 1}.txt",
                   np.column_stack([L, w, w, w]), fmt="%10.6e")
    tt = 2000 * (L / 100.) ** -0.5
    ee = 30 * (L / 300.) ** -0.3
    te = 0.3 * np.sqrt(tt * ee) * np.sin(L / 40.)
    ntt, nee = 0.1 * tt, 0.2 * ee

    def binv(x):
        return np.array([x[(L >= edges[b]) & (L < edges[b + 1])].mean()
                         for b in range(nbins)])

    bins = np.arange(1, nbins + 1)
    hat_tt = binv(tt) * (1 + 0.05 * rng.standard_normal(nbins))
    hat_te = binv(te) + 0.03 * np.abs(binv(te)).mean() * rng.standard_normal(nbins)
    hat_ee = binv(ee) * (1 + 0.08 * rng.standard_normal(nbins))
    hdr = "  L TT TE EE"
    np.savetxt(f"{d}/cl_hat.dat", np.column_stack([bins, hat_tt, hat_te, hat_ee]),
               fmt="%12.6e", header=hdr)
    np.savetxt(f"{d}/cl_fid.dat",
               np.column_stack([bins, binv(tt), binv(te), binv(ee)]),
               fmt="%12.6e", header=hdr)
    np.savetxt(f"{d}/cl_noise.dat",
               np.column_stack([bins, binv(ntt), 0 * bins, binv(nee)]),
               fmt="%12.6e", header=hdr)
    n = 3 * nbins
    A = rng.standard_normal((n, 2 * n))
    cov = (A @ A.T) / (2 * n)
    scale = np.concatenate(
        [[binv(tt)[b] * 0.05, np.abs(binv(te)[b]) * 0.08 + 1.0,
          binv(ee)[b] * 0.08] for b in range(nbins)])
    np.savetxt(f"{d}/covmat.dat", cov * np.outer(scale, scale), fmt="%15.8e")
    base = """fields_use = T E
binned = T
nbins = 6
cl_lmin = 30
cl_lmax = 300
bin_window_files = windows/win_%u.txt
bin_window_in_order = TT TE EE
bin_window_out_order = TT TE EE
covmat_cl = TT TE EE
covmat_fiducial = covmat.dat
cl_hat_file = cl_hat.dat
cl_fiducial_file = cl_fid.dat
cl_noise_file = cl_noise.dat
"""
    with open(f"{d}/hl.dataset", "w") as f:
        f.write("like_approx = HL\n" + base)
    with open(f"{d}/gauss.dataset", "w") as f:
        f.write("like_approx = gaussian\n" + base)
    # theory used for the pinned evaluation
    th_tt = 2100 * (L / 100.) ** -0.52
    th_ee = 28 * (L / 300.) ** -0.28
    th_te = 0.28 * np.sqrt(th_tt * th_ee) * np.sin(L / 40. + 0.05)
    full_L = np.arange(2, 501).astype(float)
    ftt = np.interp(full_L, L, th_tt)
    fee = np.interp(full_L, L, th_ee)
    fte = np.interp(full_L, L, th_te)
    np.savetxt(f"{d}/theory_cl.txt",
               np.column_stack([full_L, ftt, fte, fee, 0 * full_L, 0 * full_L]),
               fmt="%12.6e",
               header="   L    TT             TE             EE             "
                      "BB             PP")


@pytest.fixture(scope="module")
def hl_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hl_test"))
    _make_hl_fixture(d)
    return d


class TestSynthetic:
    def test_hl(self, hl_dir):
        cls_j = jnp.asarray(read_cl_text(f"{hl_dir}/theory_cl.txt", 500))
        like = CMBLikes(f"{hl_dir}/hl.dataset")
        got = 2 * float(like.log_like_cls(cls_j, jnp.zeros(0)))
        assert got == pytest.approx(112.29098181576978, abs=1e-7)

    def test_gaussian(self, hl_dir):
        cls_j = jnp.asarray(read_cl_text(f"{hl_dir}/theory_cl.txt", 500))
        like = CMBLikes(f"{hl_dir}/gauss.dataset")
        got = 2 * float(like.log_like_cls(cls_j, jnp.zeros(0)))
        assert got == pytest.approx(112.71041212668412, abs=1e-7)

    def test_exact(self, tmp_path):
        d = str(tmp_path)
        lmin, lmax = 2, 40
        L = np.arange(lmin, lmax + 1).astype(float)
        tt = 1000 * (L / 10.) ** -0.3
        ee = 5 * (L / 10.) ** 0.2
        te = 0.3 * np.sqrt(tt * ee)
        rng = np.random.default_rng(7)
        hat_tt = tt * (1 + 0.1 * rng.standard_normal(len(L)))
        hat_ee = ee * (1 + 0.1 * rng.standard_normal(len(L)))
        hat_te = te * (1 + 0.1 * rng.standard_normal(len(L)))
        hdr = "  L TT TE EE"
        np.savetxt(f"{d}/cl_hat.dat",
                   np.column_stack([L, hat_tt, hat_te, hat_ee]),
                   fmt="%12.6e", header=hdr)
        np.savetxt(f"{d}/cl_noise.dat",
                   np.column_stack([L, 0.05 * tt, 0 * L, 0.1 * ee]),
                   fmt="%12.6e", header=hdr)
        with open(f"{d}/exact.dataset", "w") as f:
            f.write("""like_approx = exact
fields_use = T E
binned = F
cl_lmin = 2
cl_lmax = 40
fullsky_exact_fksy = 0.57
cl_hat_file = cl_hat.dat
cl_noise_file = cl_noise.dat
""")
        full_L = np.arange(2, 101).astype(float)
        th_tt = np.interp(full_L, L, 1050 * (L / 10.) ** -0.31)
        th_ee = np.interp(full_L, L, 5.2 * (L / 10.) ** 0.19)
        th_te = 0.29 * np.sqrt(th_tt * th_ee)
        np.savetxt(f"{d}/theory_cl.txt",
                   np.column_stack([full_L, th_tt, th_te, th_ee,
                                    0 * full_L, 0 * full_L]),
                   fmt="%12.6e",
                   header="   L    TT             TE             EE"
                          "             BB             PP")
        cls_j = jnp.asarray(read_cl_text(f"{d}/theory_cl.txt", 100))
        like = CMBLikes(f"{d}/exact.dataset")
        got = 2 * float(like.log_like_cls(cls_j, jnp.zeros(0)))
        assert got == pytest.approx(12.727922201034445, abs=1e-9)

    def test_vmapped_batch(self, hl_dir):
        """Hot path: HL likelihood vmapped over a batch of theory stacks."""
        cls_j = jnp.asarray(read_cl_text(f"{hl_dir}/theory_cl.txt", 500))
        like = CMBLikes(f"{hl_dir}/hl.dataset")
        batch = jnp.stack([cls_j, cls_j * 1.01, cls_j * 0.99])
        f = jax.jit(jax.vmap(lambda c: like.log_like_cls(c, jnp.zeros(0))))
        out = np.asarray(f(batch))
        assert out.shape == (3,)
        assert out[0] == pytest.approx(112.29098181576978 / 2, rel=1e-9)
        assert np.all(np.isfinite(out))


@needs_ref
class TestBK15RealData:
    """Full HL likelihood on the REAL BK15 dataset files (12 maps x E/B,
    9 bins, bandpass windows) pinned against the reference python
    CMBlikes.py chi_squared. The fork ships every BK15 file EXCEPT the
    covariance matrix, so a deterministic diagonal covmat built from the
    measured bandpower scales is injected identically in both
    implementations (oracle generator: the reference python/CMBlikes.py
    DatasetLikelihood run offline with the same files)."""

    @pytest.fixture(scope="class")
    def bk15(self, tmp_path_factory):
        import shutil
        src = f"{REF_DATA}/BK15"
        d = str(tmp_path_factory.mktemp("bk15"))
        dd = os.path.join(d, "BK15")
        shutil.copytree(src, dd)
        dat = np.loadtxt(f"{src}/BK15_cl_hat.dat")
        s_b = 0.1 * np.abs(dat[:, 1:]).mean(axis=1)
        cov = np.diag(np.repeat(s_b ** 2, 300))
        np.savetxt(f"{dd}/BK15_covmat_dust.dat", cov, fmt="%14.8e")
        like = CMBLikes(f"{dd}/BK15_dust.dataset")
        L = np.arange(2, 4501).astype(float)
        tt = 1e3 * (L / 200.0) ** -0.6 * (1 + 0.2 * np.sin(L / 90.0))
        ee = 20.0 * (L / 500.0) ** -0.4 * (1 + 0.3 * np.sin(L / 90.0 + 1.0))
        te = np.sign(np.sin(L / 95.0)) * np.sqrt(np.abs(tt * ee)) * 0.4
        return like, d, L, tt, te, ee

    def _cls(self, d, L, tt, te, ee, amp):
        bb = amp * 0.05 * (L / 1000.0) ** 0.8
        p = os.path.join(d, f"cl_{amp}.txt")
        np.savetxt(p, np.column_stack([L, tt, te, ee, bb]), fmt="%12.6e",
                   header="   L    TT             TE             EE        "
                          "     BB")
        return jnp.asarray(read_cl_text(p, 4500))

    def test_hl_vs_reference_python(self, bk15):
        like, d, L, tt, te, ee = bk15
        assert like.nmaps == 24 and like.nbins == 9
        cls = self._cls(d, L, tt, te, ee, 1.0)
        got = 2 * float(like.log_like_cls(cls, jnp.zeros((0,))))
        assert got == pytest.approx(2136251.7193756984, rel=2e-9)

    def test_hl_bb_sensitivity(self, bk15):
        like, d, L, tt, te, ee = bk15
        cls = self._cls(d, L, tt, te, ee, 2.0)
        got = 2 * float(like.log_like_cls(cls, jnp.zeros((0,))))
        assert got == pytest.approx(2134943.785995634, rel=2e-9)
