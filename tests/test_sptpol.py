"""SPTpol TE/EE (Henning+17) and BB (Sayre+19) likelihoods vs the reference
model equations (CMB_SPTpol_TEEE_2017.f90 SPTpolEELnLike :354-567;
CMB_SPTpol_BB_2019.f90 SPTpolBBLnLike :441-656).

The fork does not ship the SPTpol data files, so a synthetic dataset in the
documented text format is fabricated here; every model component (poisson,
super-sample-lensing kappa derivative, aberration, dust power law, dust
frequency scaling, calibrations, beam factors, priors) is pinned against an
independent numpy evaluation of the reference formulas on that dataset.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cosmomc_tpu.likelihoods.sptpol import (SPTpolTEEELikelihood,
                                            SPTpolBBLikelihood,
                                            dust_freq_scaling_from_150,
                                            D3000, ABERRATION_BETA,
                                            ABERRATION_COS)

LMIN, LMAX, NBIN = 50, 250, 4
NL = LMAX - LMIN + 1


def make_dataset(tmp, prefix, n_spectra, nband, seed=0):
    """Fabricate desc/bp/cov/windows/beam files + dataset ini."""
    rng = np.random.default_rng(seed)
    d = str(tmp)
    nall = NBIN * n_spectra
    with open(f"{d}/desc.txt", "w") as f:
        f.write(f"{NBIN} 1\n{LMIN} {LMAX}\n")
    bp = rng.uniform(1.0, 30.0, (nband, NBIN))
    with open(f"{d}/bp.txt", "w") as f:
        for i in range(nband):
            for j in range(NBIN):
                f.write(f"{j + 1} {bp[i, j]:.17g}\n")
    A = rng.standard_normal((nall, nall)) * 0.1
    cov = A @ A.T + np.eye(nall) * 4.0
    np.savetxt(f"{d}/cov.txt", cov)
    os.makedirs(f"{d}/windows", exist_ok=True)
    edges = np.linspace(LMIN, LMAX + 1, NBIN + 1).astype(int)
    Wfull = np.zeros((nall, NL))
    for i in range(nall):
        b = i % NBIN
        lo, hi = edges[b], edges[b + 1]
        Wfull[i, lo - LMIN:hi - LMIN] = 1.0 / (hi - lo)
        with open(f"{d}/windows/window_{i + 1}", "w") as f:
            for l in range(LMIN, LMAX + 1):
                f.write(f"{l} {Wfull[i, l - LMIN]:.17g}\n")
    beam = rng.uniform(-0.02, 0.02, (2, nall))
    with open(f"{d}/beam.txt", "w") as f:
        for t in range(2):
            for i in range(nall):
                f.write(f"{i + 1} {beam[t, i]:.17g}\n")
    with open(f"{d}/{prefix}.dataset", "w") as f:
        f.write(f"{prefix}_desc_file = desc.txt\n"
                f"{prefix}_bp_file = bp.txt\n"
                f"{prefix}_cov_file = cov.txt\n"
                f"{prefix}_window_dir = windows\n"
                f"{prefix}_beam_file = beam.txt\n")
    return dict(bp=bp, cov=cov, W=Wfull, beam=beam, path=f"{d}/{prefix}.dataset")


def fake_theory(lmax=LMAX + 2):
    """Smooth power-law C_l stack."""
    class T:
        pass
    t = T()
    cls = np.zeros((4, 4, lmax + 1))
    l = np.arange(2, lmax + 1, dtype=float)
    cls[1, 0, 2:] = 30.0 * (l / 100.0) ** -0.4          # TE (Dl)
    cls[0, 1, 2:] = cls[1, 0, 2:]
    cls[1, 1, 2:] = 20.0 * (l / 100.0) ** -0.2          # EE
    cls[2, 2, 2:] = 0.05 * (l / 100.0) ** 0.7           # BB
    t.cls = jnp.asarray(cls)
    return t, cls


class TestTEEE:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("sptpol")
        data = make_dataset(tmp, "sptpol_TEEE", n_spectra=2, nband=3)
        like = SPTpolTEEELikelihood(
            data["path"],
            dataset_overrides={"correct_aberration": "T",
                               "sptpol_kappa_prior": "T",
                               "sptpol_tcal_prior": "T"})
        return like, data

    def test_matches_reference_formula(self, setup):
        """Full -logL vs an independent numpy transcription."""
        like, data = setup
        theory, cls = fake_theory()
        vals = dict(kappa=0.003, czero_psTE=0.0, czero_psEE=2.0,
                    ADust_TE=0.3, alphaDust_TE=-2.42, ADust_EE=0.2,
                    alphaDust_EE=-2.42, mapTcal=1.01, mapPcal=0.99,
                    beam1=0.5, beam2=-0.3)
        nu = jnp.asarray([vals[p.name] for p in like.nuisance if p.varying])
        got = float(like.log_like(theory, nu))

        # ---- independent model (follows the Fortran line by line) ----
        ells_pad = np.arange(LMIN - 1, LMAX + 2, dtype=float)
        cl2dl = ells_pad * (ells_pad + 1) / (2 * np.pi)
        dls = np.stack([cls[1, 0, LMIN - 1:LMAX + 2],
                        cls[1, 1, LMIN - 1:LMAX + 2]])
        raw = ells_pad ** 3 / cl2dl * dls
        lc = ells_pad[1:-1]
        deriv = (raw[:, 2:] - raw[:, :-2]) * 0.5 / lc ** 2
        aberr = (-ABERRATION_BETA * ABERRATION_COS) * lc * \
            (dls[:, 2:] - dls[:, :-2]) / 2
        ps = np.array([vals["czero_psTE"], vals["czero_psEE"]]) / D3000
        Ad = np.array([vals["ADust_TE"], vals["ADust_EE"]])
        al = np.array([vals["alphaDust_TE"], vals["alphaDust_EE"]])
        cl2dl_c = lc * (lc + 1) / (2 * np.pi)
        dl_fgs = ((ps[:, None] - vals["kappa"] * deriv) * cl2dl_c
                  + dls[:, 1:-1] + aberr
                  + Ad[:, None] * (lc / 80.0) ** (al[:, None] + 2))
        W = data["W"].reshape(2, NBIN, NL)
        binned = np.einsum("kbl,kl->kb", W, dl_fgs)
        t, pc = vals["mapTcal"], vals["mapPcal"]
        binned[0] /= t * t * pc
        binned[1] /= t * t * pc * pc
        flat = binned.reshape(-1)
        bf = ((1 + data["beam"][0] * vals["beam1"])
              * (1 + data["beam"][1] * vals["beam2"]))
        delta = flat * bf - data["bp"][:2].reshape(-1)
        icov = np.linalg.inv(data["cov"])
        want = 0.5 * delta @ icov @ delta \
            + 0.5 * np.linalg.slogdet(data["cov"])[1]
        want += 0.5 * (vals["beam1"] ** 2 + vals["beam2"] ** 2)
        want += 0.5 * (np.log(t / 1.0) / np.log(1.005)) ** 2
        want += 0.5 * (vals["kappa"] / 0.001) ** 2
        assert got == pytest.approx(want, rel=1e-10)

    def test_nuisance_registration(self, setup):
        like, _ = setup
        names = [p.name for p in like.nuisance]
        assert names == like.PARAM_ORDER
        # fixed params (single-value specs) are not varying
        assert not like.nuisance[1].varying      # czero_psTE
        assert like.nuisance[0].varying          # kappa

    def test_gradient(self, setup):
        import jax
        like, _ = setup
        theory, _ = fake_theory()
        nu = jnp.asarray([p.center + 0.01 for p in like.nuisance
                          if p.varying])
        g = jax.grad(lambda n: like.log_like(theory, n))(nu)
        assert np.all(np.isfinite(np.asarray(g)))


class TestBB:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("sptbb")
        data = make_dataset(tmp, "sptpol_BB", n_spectra=3, nband=3, seed=1)
        like = SPTpolBBLikelihood(
            data["path"],
            dataset_overrides={"sptpol_cal_prior": "T",
                               "sptpol_Add_prior": "T"})
        return like, data

    def test_dust_frequency_scaling(self):
        """95x95 dust is much dimmer than 150x150 (beta=1.59 greybody)."""
        s150 = dust_freq_scaling_from_150(148.84, 148.84)
        s95 = dust_freq_scaling_from_150(95.64, 95.64)
        assert s150 == pytest.approx(1.0, rel=0.05)
        assert 0.1 < s95 < 0.5

    def test_matches_reference_formula(self, setup):
        like, data = setup
        theory, cls = fake_theory()
        vals = dict(Abb=1.0, r_tmpl=0.0, const_bb=0.0, ADust=0.01,
                    Poisson150=0.3, Poisson90x150=0.2, Poisson90=0.25,
                    mapBcal150=1.005, mapBcal90=0.995, beam1=0.2,
                    beam2=-0.1)
        nu = jnp.asarray([vals[p.name] for p in like.nuisance if p.varying])
        got = float(like.log_like(theory, nu))

        ells = np.arange(LMIN, LMAX + 1, dtype=float)
        dls_bb = cls[2, 2, LMIN:LMAX + 1]
        poisson_tmpl = ells * (ells + 1) / (3000.0 * 3001.0)
        galdust_tmpl = ((ells + 1) / 81.0) * (80.0 / ells) ** 1.42
        ps = np.array([vals["Poisson150"], vals["Poisson90x150"],
                       vals["Poisson90"]])
        scal = np.array([dust_freq_scaling_from_150(a, b)
                         for a, b in like.eff_freqs])
        dl_fgs = (ps[:, None] * poisson_tmpl
                  + vals["ADust"] * galdust_tmpl * scal[:, None]
                  + dls_bb[None, :])
        W = data["W"].reshape(3, NBIN, NL)
        binned = np.einsum("kbl,kl->kb", W, dl_fgs)
        c150, c90 = vals["mapBcal150"], vals["mapBcal90"]
        binned[0] /= c150 * c150
        binned[1] /= c90 * c150
        binned[2] /= c90 * c90
        flat = binned.reshape(-1)
        bf = ((1 + data["beam"][0] * vals["beam1"])
              * (1 + data["beam"][1] * vals["beam2"]))
        delta = flat * bf - data["bp"].reshape(-1)
        icov = np.linalg.inv(data["cov"])
        want = 0.5 * delta @ icov @ delta \
            + 0.5 * np.linalg.slogdet(data["cov"])[1]
        want += 0.5 * (vals["beam1"] ** 2 + vals["beam2"] ** 2)
        y1, y2 = np.log(c90), np.log(c150)
        ic = like.inv_cal_cov
        want += 0.5 * (ic[0, 0] * y1 * y1 + 2 * ic[0, 1] * y1 * y2
                       + ic[1, 1] * y2 * y2)
        want += 0.5 * ((vals["ADust"] - 0.0094) / 0.0021) ** 2
        assert got == pytest.approx(want, rel=1e-10)

    def test_abb_scales_bb(self, setup):
        """Abb=0 kills the CMB contribution entirely."""
        like, data = setup
        theory, _ = fake_theory()
        specs = dict(like.PARAM_DEFAULTS)
        # make Abb varying for this check
        tmp2 = SPTpolBBLikelihood(
            data["path"], param_specs={"Abb": (1.0, 0.0, 5.0, 0.1, 0.1)})
        nu0 = jnp.asarray([p.center for p in tmp2.nuisance if p.varying])
        i_abb = [p.name for p in tmp2.nuisance if p.varying].index("Abb")
        v1 = float(tmp2.log_like(theory, nu0))
        v0 = float(tmp2.log_like(theory, nu0.at[i_abb].set(0.0)))
        assert v1 != pytest.approx(v0)
