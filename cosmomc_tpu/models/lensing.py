"""Lensed CMB spectra: accurate curved-sky correlation-function method.

The TPU-native equivalent of the reference's camb/lensing.f90
CorrFuncFullSkyImpl (lensing_method=1, Challinor & Lewis astro-ph/0502425):
non-perturbative isotropic term with a 2nd-order expansion in C_{gl,2},
neglecting C_gl(theta) cross terms (same approximation as the reference,
lensing.f90:106-518).

Design for XLA: the reference's OMP loop over theta with inner l loops
becomes three `lax.scan`s over l with every theta point a vector lane
(theta grid size ~2*lmax):

  pass 1: accumulate sigma^2(theta), C_gl2(theta) from C_l^phiphi;
  pass 2: accumulate the four lensed-minus-unlensed correlation deltas
          xi_i(theta) (X-factor series below);
  pass 3: project back, DeltaC_l = 2pi int dtheta sin(theta) xi_i d^l_..(theta).

All Wigner-d functions are closed-form in the Legendre P_l, dP_l carried
through the scans (exactly the reference's recursion set), so memory stays
O(n_theta) — nothing of shape (n_theta, lmax) is ever materialized.

Units: inputs and outputs are l(l+1)C_l/2pi (TT/TE/EE) and
[l(l+1)]^2 C_l^pp / 2pi (lensing potential), the CMBSpectra convention.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class LensedCls(NamedTuple):
    ls: jnp.ndarray   # (nl,) multipoles 2..lmax_lensed
    tt: jnp.ndarray   # l(l+1)C_l/2pi
    te: jnp.ndarray
    ee: jnp.ndarray
    bb: jnp.ndarray


def _legendre_step(carry, x):
    """One l step of the P_l / dP_l recursion, vectorized over theta.
    carry = (l, pmm, pmmp1); x = cos(theta) lanes."""
    l, pmm, pmmp1 = carry
    P = ((2 * l - 1) * x * pmmp1 - (l - 1) * pmm) / l
    return (l + 1, pmmp1, P), P


def _jacobi_advance(s, a, b, x, Jm1, J):
    """P^{(a,b)}_s(x) from carried (P_{s-2}, P_{s-1}) = (Jm1, J).

    Upward Jacobi recurrence — the stable (dominant-solution) direction on
    |x| < 1. Used to build the high-spin Wigner-d functions as
    [exact sin/cos(theta/2) prefactor] x [Jacobi value]: the classical
    closed forms in (P_l, P_l') cancel catastrophically at small theta
    (even in f64 they are wrong by ~1e9 at theta ~ 1e-3 before the Taylor
    patch; in f32 the corruption band is so wide that lensed EE came out
    ~50x high). `s` is a traced scalar."""
    n = jnp.asarray(s, x.dtype)
    apb = a + b
    c1 = 2.0 * n * (n + apb) * (2.0 * n + apb - 2.0)
    c2 = (2.0 * n + apb - 1.0) * (a * a - b * b)
    c3 = (2.0 * n + apb - 1.0) * (2.0 * n + apb) * (2.0 * n + apb - 2.0)
    c4 = 2.0 * (n + a - 1.0) * (n + b - 1.0) * (2.0 * n + apb)
    rec = ((c2 + c3 * x) * J - c4 * Jm1) / jnp.where(c1 == 0.0, 1.0, c1)
    p1 = (a + 1.0) + (apb + 2.0) * (x - 1.0) / 2.0
    return jnp.where(n < 0.0, 0.0,
                     jnp.where(n == 0.0, 1.0,
                               jnp.where(n == 1.0, p1, rec)))


def lens_cls(ls, tt, te, ee, pp, lmax_lensed: int | None = None,
             n_theta: int | None = None, apodize: bool = True,
             delta_only: bool = False) -> LensedCls:
    """Lensed TT/TE/EE/BB from unlensed spectra + lensing potential.

    ls must be the dense integer range 2..lmax (static). Output covers
    2..lmax_lensed (default lmax-250, the reference's
    lensed_convolution_margin behavior)."""
    ls = jnp.asarray(ls)
    dtype = jnp.asarray(tt).dtype
    # ls is the dense range 2..lmax, so lmax is shape-derived (static under
    # jit; int(ls[-1]) would break tracing)
    lmax = int(ls.shape[0]) + 1
    if lmax_lensed is None:
        lmax_lensed = lmax - 250
    if n_theta is None:
        n_theta = 2 * lmax
    nl_out = lmax_lensed - 1

    lf = ls.astype(dtype)
    llp1 = lf * (lf + 1.0)
    lfacs2 = (lf + 2.0) * (lf - 1.0)
    lrootfacs = jnp.sqrt(llp1 * lfacs2)
    rootllp1 = jnp.sqrt(llp1)
    rootfac1 = jnp.sqrt(lfacs2)
    rootfac2 = jnp.sqrt((lf + 3.0) * (lf - 2.0))
    rootfac3 = jnp.sqrt(jnp.maximum((lf - 3.0) * (lf + 4.0), 0.0))

    # raw-C_l weights (lensing.f90:209-216)
    two_l1_4pi = (2.0 * lf + 1.0) / (4.0 * jnp.pi)
    conv = 2.0 * jnp.pi / llp1                  # l(l+1)C/2pi -> C
    CTT = tt * conv * two_l1_4pi
    CTE = te * conv * two_l1_4pi
    CEE = ee * conv * two_l1_4pi
    # Cphil3 = (2l+1) l(l+1) C^pp / 4pi ; pp input is [l(l+1)]^2 C^pp/2pi
    Cphil3 = pp * (2.0 * jnp.pi / llp1 ** 2) * llp1 * two_l1_4pi

    # theta grid: interior points i*dtheta, i = 1..n_theta-1
    dtheta = np.pi / n_theta
    theta = (jnp.arange(1, n_theta, dtype=dtype)) * dtheta
    x = jnp.cos(theta)
    sinth = jnp.sin(theta)
    sin2 = sinth ** 2
    fac1 = 1.0 - x
    fac2 = 1.0 + x

    P0 = jnp.ones_like(x)   # P_1 seeds: pmm=P_1? (reference seeds pmm=1=P_0)
    P1 = x

    # ---- pass 1: sigma^2(theta), Cgl2(theta) ----
    def pass1(carry, cl3):
        l, pmm, pmmp1, sig, cg2 = carry
        (l, pmm, pmmp1), P = _legendre_step((l, pmm, pmmp1), x)
        dP = (l - 1.0) * (pmm - x * P) / sin2     # after step, pmm = P_{l-1}
        d11 = fac1 * dP / ((l - 1.0) * l) + P
        dm11 = fac2 * dP / ((l - 1.0) * l) - P
        sig = sig + (1.0 - d11) * cl3
        cg2 = cg2 + dm11 * cl3
        return (l, pmm, pmmp1, sig, cg2), None

    init = (jnp.asarray(2.0, dtype), P0, P1,
            jnp.zeros_like(x), jnp.zeros_like(x))
    (_, _, _, sigmasq, Cg2), _ = jax.lax.scan(pass1, init, Cphil3)

    Cg2sq = Cg2 ** 2

    sin2half = fac1 / 2.0       # sin^2(theta/2)
    cos2half = fac2 / 2.0       # cos^2(theta/2)

    # ---- pass 2: lensed-correlation deltas xi_1..4(theta) ----
    def wigner_set(l, P, Pm1, J40, J44, J80):
        """All needed d^l_mm'(theta) from P_l (=P), P_{l-1} (=Pm1) and the
        stable Jacobi values J40 = P^{(4,0)}_{l-2}, J44 = P^{(4,4)}_{l-4},
        J80 = P^{(8,0)}_{l-4} (see _jacobi_advance)."""
        llp1 = l * (l + 1.0)
        lfacs2 = (l + 2.0) * (l - 1.0)
        lrootfacs = jnp.sqrt(llp1 * lfacs2)
        rf1 = jnp.sqrt(lfacs2)
        rf2 = jnp.sqrt((l + 3.0) * (l - 2.0))
        rf3 = jnp.sqrt(jnp.maximum((l - 3.0) * (l + 4.0), 0.0))
        dP = l * (Pm1 - x * P) / sin2
        fac = fac1 / fac2
        d11 = fac1 * dP / llp1 + P
        dm11 = fac2 * dP / llp1 - P
        d22 = (((4.0 * x - 8.0) / fac2 + llp1) * P
               + 4.0 * fac * (fac2 + (x - 2.0) / llp1) * dP) / lfacs2
        # d^l_{2,-2} = sin^4(theta/2) P^{(4,0)}_{l-2}: exact prefactor x
        # stable recurrence (no cancellation at any theta)
        d2m2 = sin2half ** 2 * J40
        d20 = (2.0 * x * dP - llp1 * P) / lrootfacs
        d1m2 = sinth / rf1 * (dP - 2.0 / fac1 * dm11)
        d12 = sinth / rf1 * (dP - 2.0 / fac2 * d11)
        sinfac = 4.0 / sinth
        ok3 = l >= 3.0
        rf2s = jnp.where(ok3, rf2, 1.0)
        d1m3 = jnp.where(ok3, (-(x + 0.5) * d1m2 * sinfac
                               - lfacs2 * dm11 / rf1) / rf2s, 0.0)
        d2m3 = jnp.where(ok3, (-fac2 * d2m2 * sinfac - rf1 * d1m2) / rf2s, 0.0)
        d3m3 = jnp.where(ok3, (-(x + 1.5) * d2m3 * sinfac
                               - rf1 * d1m3) / rf2s, 0.0)
        d13 = jnp.where(ok3, ((x - 0.5) * d12 * sinfac
                              - lfacs2 * d11 / rf1) / rf2s, 0.0)
        d23 = jnp.where(ok3, (-fac1 * d22 * sinfac + rf1 * d12) / rf2s, 0.0)
        d33 = jnp.where(ok3, (-(x - 1.5) * d23 * sinfac
                              - rf1 * d13) / rf2s, 0.0)
        ok4 = l >= 4.0
        rf3s = jnp.where(ok4, rf3, 1.0)
        # d^l_{0,4} = norm sin^2(th/2)^2 cos^2(th/2)^2 P^{(4,4)}_{l-4},
        # norm = sqrt((s+5)(s+6)(s+7)(s+8)/((s+1)(s+2)(s+3)(s+4))), s=l-4
        s4 = l - 4.0
        norm04 = jnp.sqrt(jnp.where(
            ok4, ((s4 + 5.0) * (s4 + 6.0) * (s4 + 7.0) * (s4 + 8.0))
            / ((s4 + 1.0) * (s4 + 2.0) * (s4 + 3.0) * (s4 + 4.0)), 1.0))
        d04 = jnp.where(ok4, norm04 * (sin2half * cos2half) ** 2 * J44, 0.0)
        d2m4 = jnp.where(ok4, (-(6.0 * x + 4.0) * d2m3 / sinth
                               - rf2 * d2m2) / rf3s, 0.0)
        # d^l_{4,-4} = sin^8(theta/2) P^{(8,0)}_{l-4}
        d4m4 = jnp.where(ok4, sin2half ** 4 * J80, 0.0)
        return dict(P=P, dP=dP, d11=d11, dm11=dm11, d22=d22, d2m2=d2m2,
                    d20=d20, d1m3=d1m3, d3m3=d3m3, d13=d13, d33=d33,
                    d04=d04, d2m4=d2m4, d4m4=d4m4,
                    llp1=llp1, lrootfacs=lrootfacs, rf1=rf1, rf2=rf2, rf3=rf3,
                    rootllp1=jnp.sqrt(llp1))

    def pass2(carry, cls_l):
        l, pmm, pmmp1, jac, xi = carry
        ctt, cte, cee = cls_l
        (l, pmm, pmmp1), P = _legendre_step((l, pmm, pmmp1), x)
        lc = l - 1.0          # current multipole (carry l is next)
        (j40m1, j40), (j44m1, j44), (j80m1, j80) = jac
        J40 = _jacobi_advance(lc - 2.0, 4.0, 0.0, x, j40m1, j40)
        J44 = _jacobi_advance(lc - 4.0, 4.0, 4.0, x, j44m1, j44)
        J80 = _jacobi_advance(lc - 4.0, 8.0, 0.0, x, j80m1, j80)
        jac = ((j40, J40), (j44, J44), (j80, J80))
        d = wigner_set(lc, P, pmm, J40, J44, J80)
        llp1 = d["llp1"]
        # non-perturbative isotropic X integrals (lensing.f90:375-393)
        X000 = jnp.exp(-llp1 * sigmasq / 4.0)
        X022 = X000 * (1.0 + sigmasq)
        X220 = d["lrootfacs"] / 4.0 * X000
        X121 = -0.5 * d["rf1"] * X000
        X132 = -0.5 * d["rf2"] * X000
        X242 = 0.25 * d["rf2"] * d["rf3"] * X022
        dX000 = -llp1 / 4.0 * X000
        dX022 = (1.0 - llp1 / 4.0) * X022
        fac1v = dX000 ** 2
        fac3 = X220 ** 2
        # TT
        f = ((X000 ** 2 - 1.0) + Cg2sq * fac1v) * d["P"] \
            + Cg2sq * fac3 * d["d2m2"] + 8.0 / llp1 * fac1v * Cg2 * d["dm11"]
        xi0 = xi[0] + ctt * f
        # Q+U
        fac2v = (Cg2 * dX022) ** 2 + (X022 ** 2 - 1.0)
        f = 2.0 * Cg2 * X121 * X132 * d["d13"] + fac2v * d["d22"] \
            + Cg2sq * X242 * X220 * d["d04"]
        xi1 = xi[1] + cee * f
        # Q-U
        f = (fac3 * d["P"] + X242 ** 2 * d["d4m4"]) * Cg2sq / 2.0 \
            + Cg2 * (X121 ** 2 * d["dm11"] + X132 ** 2 * d["d3m3"]) \
            + fac2v * d["d2m2"]
        xi2 = xi[2] + cee * f
        # TE
        f = (X000 * X022 - 1.0) * d["d20"] \
            + 2.0 * dX000 * Cg2 * (X121 * d["d11"] + X132 * d["d1m3"]) \
            / d["rootllp1"] \
            + Cg2sq * (X220 / 2.0 * d["d2m4"] * X242
                       + (fac3 / 2.0 + dX022 * dX000) * d["d20"])
        xi3 = xi[3] + cte * f
        return (l, pmm, pmmp1, jac, (xi0, xi1, xi2, xi3)), None

    z = jnp.zeros_like(x)
    jac0 = ((z, z), (z, z), (z, z))
    init2 = (jnp.asarray(2.0, dtype), P0, P1, jac0, (z, z, z, z))
    (_, _, _, _, xi), _ = jax.lax.scan(pass2, init2, (CTT, CTE, CEE))
    xi = jnp.stack(xi)      # (4, ntheta)

    if apodize:
        # taper the large-theta end to suppress ringing when the unlensed
        # input stops at lmax (the reference apodizes when integrating a
        # short range; with the full range a gentle taper is still safer
        # for the low-l tail of BB)
        i = jnp.arange(1, n_theta, dtype=dtype)
        wid = max(int(0.003 / dtheta), 1)
        tail = jnp.exp(-jnp.maximum(i - (n_theta - 3.0 * wid), 0.0) ** 2
                       / (2.0 * wid ** 2))
        xi = xi * tail[None, :]

    # ---- pass 3: project back to DeltaC_l for l = 2..lmax_lensed ----
    sw = sinth * dtheta
    xi_t, xi_p, xi_m, xi_x = xi[0] * sw, xi[1] * sw, xi[2] * sw, xi[3] * sw

    def pass3(carry, _):
        l, pmm, pmmp1, j40m1, j40 = carry
        (l, pmm, pmmp1), P = _legendre_step((l, pmm, pmmp1), x)
        lc = l - 1.0
        llp1 = lc * (lc + 1.0)
        lfacs2 = (lc + 2.0) * (lc - 1.0)
        lrootfacs = jnp.sqrt(llp1 * lfacs2)
        dP = lc * (pmm - x * P) / sin2
        fac = fac1 / fac2
        d22 = (((4.0 * x - 8.0) / fac2 + llp1) * P
               + 4.0 * fac * (fac2 + (x - 2.0) / llp1) * dP) / lfacs2
        J40 = _jacobi_advance(lc - 2.0, 4.0, 0.0, x, j40m1, j40)
        d2m2 = sin2half ** 2 * J40
        d20 = (2.0 * x * dP - llp1 * P) / lrootfacs
        dctt = 2.0 * jnp.pi * jnp.sum(xi_t * P)
        T2 = jnp.sum(xi_p * d22)
        T4 = jnp.sum(xi_m * d2m2)
        dcee = 2.0 * jnp.pi * 0.5 * (T2 + T4)
        dcbb = 2.0 * jnp.pi * 0.5 * (T2 - T4)
        dcte = 2.0 * jnp.pi * jnp.sum(xi_x * d20)
        return (l, pmm, pmmp1, j40, J40), (dctt, dcte, dcee, dcbb)

    (_, _, _, _, _), deltas = jax.lax.scan(
        pass3, (jnp.asarray(2.0, dtype), P0, P1, z, z),
        None, length=nl_out)
    dctt, dcte, dcee, dcbb = deltas

    ls_out = ls[:nl_out]
    lo = ls_out.astype(dtype)
    back = lo * (lo + 1.0) / (2.0 * jnp.pi)     # raw C -> l(l+1)C/2pi
    if delta_only:
        ttl = back * dctt
        tel = back * dcte
        eel = back * dcee
    else:
        ttl = tt[:nl_out] + back * dctt
        tel = te[:nl_out] + back * dcte
        eel = ee[:nl_out] + back * dcee
    bbl = back * dcbb
    return LensedCls(ls_out, ttl, tel, eel, bbl)
