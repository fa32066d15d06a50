"""Element-abundance likelihoods (likelihoods/abundances.py) vs the
reference's math (ElementAbundances.f90 Abundance_LnLike).

Oracle: the Gaussian is evaluated by hand from the dataset numbers and the
BBN table prediction (itself pinned in test_bbn.py vs the reference grid),
so any regression in the table lookup or the quadrature-combined error
shows up here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cosmomc_tpu.likelihoods.abundances import (AbundanceLikelihood,
                                                yp_bbn_from_mass_fraction)
from cosmomc_tpu.models import bbn
from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.theory import compute_background_theory

DATA = "/root/reference/data"
OMBH2 = 0.02236


@pytest.fixture(scope="module")
def theory():
    return compute_background_theory(BackgroundParams.make(ombh2=OMBH2))


def test_yp_dataset(theory):
    like = AbundanceLikelihood(f"{DATA}/Yp_Aver2015.dataset")
    got = float(like.log_like(theory, jnp.zeros(0)))
    # hand-evaluate the reference formula: Yp^BBN prediction vs mean=0.2449,
    # error=0.0040, theory_effective_error=0.0003
    pred = float(bbn.ypbbn_bbn(OMBH2, 0.0))
    want = 0.5 * (pred - 0.2449) ** 2 / (0.0040 ** 2 + 0.0003 ** 2)
    assert got == pytest.approx(want, rel=1e-12)
    assert got < 2.0  # fiducial ombh2 must be unpenalized


def test_dh_dataset_with_bias_offset(theory):
    like = AbundanceLikelihood(f"{DATA}/D_Cooke2017.dataset")
    got = float(like.log_like(theory, jnp.zeros(0)))
    pred = float(bbn.dh_bbn(OMBH2, 0.0)) - 0.091e-5
    want = 0.5 * (pred - 2.527e-5) ** 2 / (0.030e-5 ** 2 + 0.089e-5 ** 2)
    assert got == pytest.approx(want, rel=1e-12)
    assert got < 2.0


def test_dh_uses_table_error_when_no_effective(theory):
    """D_Cooke2013 has no theory_effective_error -> grid sigma_DH used."""
    like = AbundanceLikelihood(f"{DATA}/D_Cooke2013.dataset")
    v = float(like.log_like(theory, jnp.zeros(0)))
    assert np.isfinite(v)


def test_nnu_dependence(theory):
    """DeltaN shifts the prediction (second table axis is live)."""
    like = AbundanceLikelihood(f"{DATA}/Yp_Aver2015.dataset")
    bg2 = BackgroundParams.make(ombh2=OMBH2, nnu=3.5)
    th2 = compute_background_theory(bg2)
    assert float(like.log_like(th2, jnp.zeros(0))) != pytest.approx(
        float(like.log_like(theory, jnp.zeros(0))))


def test_mass_to_nucleon_fraction():
    """bbn.f90 GetYPBBN at Yhe=0.2454: m_He = 3.9715 m_H < 4 m_H, so the
    nucleon-number ratio comes out slightly above the mass fraction."""
    y = float(yp_bbn_from_mass_fraction(0.2454))
    assert 0.2454 < y < 0.248
    # exact closed form
    m_H, m_He = 1.673575e-27, 1.673575e-27 * 3.9715
    want = 4 * m_H * 0.2454 / (m_He - 0.2454 * (m_He - 4 * m_H))
    assert y == pytest.approx(want, rel=1e-14)


def test_gradient_flows(theory):
    """Differentiable through the table lookup (autodiff contract)."""
    import jax
    like = AbundanceLikelihood(f"{DATA}/Yp_Aver2015.dataset")

    def f(omb):
        th = compute_background_theory(BackgroundParams.make(ombh2=omb))
        return like.log_like(th, jnp.zeros(0))

    g = float(jax.grad(f)(jnp.asarray(OMBH2)))
    assert np.isfinite(g) and g != 0.0
