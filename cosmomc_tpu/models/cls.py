"""CMB angular power spectra from line-of-sight source integration.

Replaces camb/cmbmain.f90 SourceToTransfers + ClTransferToCl
(cmbmain.f90:259,478): for each sampled multipole l,

  Delta_Tl(k) = int dtau [ S0 j_l(x) + S1 j_l'(x) + S2 j_l''(x) ]
  Delta_El(k) = int dtau  S2 sqrt((l+2)!/(l-2)!) j_l(x)/x^2
  Delta_Pl(k) = int dtau  SL j_l(x) (chi*-chi)/(chi* chi)   [lensing pot.]
  x = k (tau0 - tau);  j_l'' = -2 j_l'/x + (l(l+1)/x^2 - 1) j_l

  C_l^XY = 4 pi int dlnk P_R(k) Delta_Xl Delta_Yl

The sources are smooth in k: evolved on a coarse k grid (a few hundred
points) and linearly interpolated onto a fine quadrature grid in k whose
spacing resolves the Bessel oscillations (dk ~ 2pi/(4 tau0), the same
two-level strategy as the reference's SetkValuesForInt). The tau
integration uses the trapezoid weights of the evolution grid. Sampled l's
are spline-interpolated to every integer l (lSamp strategy,
camb/modules.f90 lvalues).

TPU mapping: per-l work is a (nk_fine, ntau) gather + weighted contraction,
scanned over the ~100 sampled l's with `lax.map`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.models.bessel import build_bessel_table, default_l_samples
from cosmomc_tpu.models.perturbations import PerturbationOutput
from cosmomc_tpu.models.primordial import PrimordialParams, scalar_power


class CMBSpectra(NamedTuple):
    """l(l+1)C_l/2pi for TT/TE/EE (dimensionless primordial units; the
    (T_cmb*1e6)^2 muK^2 factor is applied by the theory assembly), and
    [l(l+1)]^2 C_l^pp / 2pi for the lensing potential."""
    ls: jnp.ndarray       # (lmax-1,) integer l = 2..lmax
    tt: jnp.ndarray
    te: jnp.ndarray
    ee: jnp.ndarray
    pp: jnp.ndarray


def fine_k_grid(tau0: float, kmax: float, points_per_osc: float = 4.0,
                kmin: float = 3e-5) -> np.ndarray:
    """Quadrature k grid resolving Bessel oscillations (static, host)."""
    dk = 2.0 * np.pi / (points_per_osc * tau0)
    n = int(np.ceil((kmax - kmin) / dk))
    return kmin + dk * np.arange(n + 1)


def _cubic_k_weights(coarse_k: np.ndarray, kf_pad: np.ndarray):
    """Host-precomputed 4-point Lagrange interpolation (in ln k) from the
    coarse source grid onto the fine quadrature grid: returns (idx, w) with
    idx (nkf,4) int row indices and w (nkf,4) weights. Cubic instead of
    linear matters: the acoustic source oscillation (period 2 pi / r_s) is
    sampled ~20 points/period by the coarse grid, and linear interpolation
    systematically attenuates that oscillation by ~1%% in amplitude — a
    measured ~-2%% bias on every acoustic C_l (the round-4 residual
    plateau). Cubic drops the attenuation to ~1e-4. The reference
    interpolates sources in k with cubic splines (cmbmain.f90
    InterpolateSources); 4-point Lagrange on static indices is the
    TPU-native equivalent (no tridiagonal solve on device)."""
    lg = np.log(np.asarray(coarse_k))
    n = len(lg)
    x = np.log(kf_pad)
    t = np.interp(x, lg, np.arange(n))
    i1 = np.clip(t.astype(np.int64), 0, n - 2)
    i0 = np.clip(i1 - 1, 0, n - 1)
    i2 = np.clip(i1 + 1, 0, n - 1)
    i3 = np.clip(i1 + 2, 0, n - 1)
    idx = np.stack([i0, i1, i2, i3], axis=1)
    w = np.empty((len(x), 4))
    for r in range(len(x)):
        xs = lg[idx[r]]
        # degenerate stencils at the boundaries (clamped duplicate nodes):
        # fall back to linear on the bracketing pair
        if len(np.unique(idx[r])) < 4:
            w[r] = 0.0
            a, b = idx[r, 1], idx[r, 2]
            if a == b:
                w[r, 1] = 1.0
            else:
                f = (x[r] - lg[a]) / (lg[b] - lg[a])
                w[r, 1] = 1.0 - f
                w[r, 2] = f
        else:
            for j in range(4):
                num = 1.0
                for m in range(4):
                    if m != j:
                        num *= (x[r] - xs[m]) / (xs[j] - xs[m])
                w[r, j] = num
    return idx, w


class ClTransferCache(NamedTuple):
    """Line-of-sight transfer functions Delta_l(k) on the fine k grid —
    the semi-slow cache of the reference's two-stage compute: CAMB stores
    exactly this in `CAMBTransferCache` so `CAMB_TransfersToPowers`
    (camb/camb.f90:87-102) can re-apply a new primordial power without
    re-evolving perturbations. `wk` are the dlnk quadrature weights."""
    ls: jnp.ndarray        # (nl,) sampled multipoles (f dtype)
    kf: jnp.ndarray        # (nkf,) fine quadrature k grid
    wk: jnp.ndarray        # (nkf,) dlnk trapezoid weights
    dT: jnp.ndarray        # (nl, nkf) temperature transfer
    dE: jnp.ndarray        # (nl, nkf) E-polarization transfer
    dP: jnp.ndarray        # (nl, nkf) lensing-potential transfer


def compute_cls(po: PerturbationOutput, pp: PrimordialParams,
                chi_star, lmax: int = 2500, tau0_hint: float = 14200.0,
                kmax_hint: float = 0.6, points_per_osc: float = 4.0,
                coarse_k: np.ndarray | None = None,
                tau_stride: int = 1) -> CMBSpectra:
    """Assemble TT/TE/EE/phiphi (one-shot: transfer stage + power stage)."""
    cache = compute_cl_transfers(po, chi_star, lmax=lmax, tau0_hint=tau0_hint,
                                 kmax_hint=kmax_hint,
                                 points_per_osc=points_per_osc,
                                 coarse_k=coarse_k, tau_stride=tau_stride)
    return cls_from_cl_transfers(cache, pp, lmax=lmax)


def _strided_sources(po: PerturbationOutput, tau_stride: int):
    """Subsample the evolution tau grid for the LOS integral.

    The ODE grid (N_STEP nodes) is 4-8x denser than the source integral
    needs: its density is set by explicit-RK4 stability (opacity) and
    oscillator phase error, while the integral only needs the visibility
    structure resolved (width ~20 Mpc -> strided dtau ~1.6 near
    recombination) and Bessel phase k*dtau <~ 1 for k's whose sources are
    still alive at that time. Striding cuts the LOS contraction FLOPs and
    HBM traffic by the same factor (the LOS stage is ~97% of the measured
    TPU slow-stage time). Returns (taus, s0, s1, s2, slens)."""
    if tau_stride <= 1:
        return po.tau, po.s0, po.s1, po.s2, po.slens
    sl = slice(None, None, tau_stride)
    return (po.tau[sl], po.s0[:, sl], po.s1[:, sl], po.s2[:, sl],
            po.slens[:, sl])


def compute_cl_transfers(po: PerturbationOutput, chi_star, lmax: int = 2500,
                         tau0_hint: float = 14200.0, kmax_hint: float = 0.6,
                         points_per_osc: float = 4.0, k_chunk: int = 256,
                         l_batch: int = 4,
                         coarse_k: np.ndarray | None = None,
                         tau_stride: int = 1
                         ) -> ClTransferCache:
    """SLOW stage: source x Bessel time integration -> Delta_l(k).
    `chi_star` is the comoving distance to recombination (for the lensing
    kernel). tau0_hint/kmax_hint bound the static table sizes (actual
    tau0/k are traced values).

    TPU shape: the (nkf ~ 4500) x (ntau ~ 8192) working plane is far too
    large to materialize per chain (the un-chunked form holds ~600 MB of
    fine-grid sources plus 37M-element Bessel gathers, which both OOMs
    under chain-vmap and kernel-faults the axon backend). The integral is
    computed in k-chunks x l-batches with a bounded working set: an outer
    `lax.map` walks k-chunks (source interpolation happens per chunk), an
    inner `lax.map` walks batches of sampled l's with a vmapped Bessel
    gather-and-contract. Results are bit-identical in structure to the
    monolithic form (same quadrature, same tables)."""
    dtype = po.s0.dtype
    ls = default_l_samples(lmax)
    nl = len(ls)
    kf_np = fine_k_grid(tau0_hint, kmax_hint, points_per_osc)
    nkf = len(kf_np)

    # pad k to a chunk multiple (pad lanes repeat the last k; their
    # quadrature weights are zero so they contribute nothing)
    npad_k = (-nkf) % k_chunk
    kf_pad = np.concatenate([kf_np, np.full(npad_k, kf_np[-1])])
    n_chunks = len(kf_pad) // k_chunk
    # pad l to a batch multiple (duplicates of the last l, sliced off)
    npad_l = (-nl) % l_batch
    ls_pad = np.concatenate([ls, np.full(npad_l, ls[-1])]).astype(int)
    n_lb = len(ls_pad) // l_batch

    tab = build_bessel_table(tuple(int(l) for l in ls_pad),
                             kmax_hint * tau0_hint * 1.02 + 10)

    lnk_coarse = jnp.log(po.k)
    taus, src0, src1, src2, srcL = _strided_sources(po, tau_stride)
    tau0 = po.tau0
    dt = jnp.diff(taus)
    wt = jnp.concatenate([dt[:1] / 2, (dt[1:] + dt[:-1]) / 2, dt[-1:] / 2])
    chi = jnp.maximum(tau0 - taus, 1e-6)
    # lensing kernel (flat): (chi* - chi)/(chi* chi), zero past chi*
    lens_w = jnp.where(chi < chi_star, (chi_star - chi) / (chi_star * chi), 0.0)

    dlnk = np.diff(np.log(kf_np))
    wk = np.zeros(len(kf_pad))
    wk[:nkf] = np.concatenate([dlnk[:1] / 2, (dlnk[1:] + dlnk[:-1]) / 2,
                               dlnk[-1:] / 2])

    jl_tab = jnp.asarray(tab.jl, dtype)        # (nl_pad, nx)
    jlp_tab = jnp.asarray(tab.jlp, dtype)
    inv_dx = jnp.asarray(1.0 / tab.dx, dtype)
    ls_f = jnp.asarray(tab.ls).astype(dtype)   # (nl_pad,)
    kc_all = jnp.asarray(kf_pad.reshape(n_chunks, k_chunk), dtype)

    # coarse-k -> fine-k interpolation indices/weights: when the caller
    # provides the concrete (host) coarse grid, precompute the indices
    # host-side (avoids a runtime searchsorted per element — the axon
    # backend lowers searchsorted serially). po.k is traced under jit, so
    # the grid VALUES cannot be recovered from it — callers that evolve on
    # a non-default grid must pass `coarse_k` or get the traced fallback.
    nk_coarse = po.k.shape[0]
    use_static = coarse_k is not None and len(coarse_k) == nk_coarse
    if use_static:
        idx_np, w_np = _cubic_k_weights(coarse_k, kf_pad)
        k_idx = jnp.asarray(idx_np.reshape(n_chunks, k_chunk, 4))
        k_w = jnp.asarray(w_np.reshape(n_chunks, k_chunk, 4), dtype)
    else:
        k_idx = jnp.zeros((n_chunks, k_chunk, 4), jnp.int32)
        k_w = jnp.zeros((n_chunks, k_chunk, 4), dtype)

    # ONE flat lax.map over (k-chunk, l-batch) pairs. The axon TPU backend
    # kernel-faults on nested scans with gather-heavy bodies (empirically
    # bisected: a single chunk with the inner l-loop runs, an outer
    # lax.map over chunks around it faults), so the two loops are flattened
    # into a single scan; the source interpolation is recomputed per pair
    # (n_lb-fold redundancy, ~2x the jl-gather traffic — cheap next to
    # nesting that does not run at all).
    n_pairs = n_chunks * n_lb
    ci_flat = jnp.repeat(jnp.arange(n_chunks), n_lb)
    ib_flat = jnp.tile(jnp.arange(n_lb), n_chunks)

    def do_pair(args):
        ci, ib = args
        kc = kc_all[ci]                        # (k_chunk,)
        kidx = k_idx[ci]
        kw = k_w[ci]
        if not use_static:
            lnkc = jnp.log(kc)

            def k_interp(S):                   # (nk, ntau) -> (k_chunk, ntau)
                return jax.vmap(lambda col: jnp.interp(lnkc, lnk_coarse, col),
                                in_axes=1, out_axes=1)(S)
        else:
            def k_interp(S):                   # cubic Lagrange in ln k
                return (kw[:, 0:1] * S[kidx[:, 0]]
                        + kw[:, 1:2] * S[kidx[:, 1]]
                        + kw[:, 2:3] * S[kidx[:, 2]]
                        + kw[:, 3:4] * S[kidx[:, 3]])

        S0w = k_interp(src0) * wt
        S1w = k_interp(src1) * wt
        S2w = k_interp(src2) * wt
        SLw = k_interp(srcL) * (wt * lens_w)
        x = kc[:, None] * (tau0 - taus)[None, :]   # (k_chunk, ntau)
        t = x * inv_dx
        i = jnp.clip(t.astype(jnp.int32), 0, jl_tab.shape[1] - 2)
        f = t - i.astype(dtype)
        xs = jnp.maximum(x, 1e-8)
        inv_xs = 1.0 / xs
        inv_xs2 = inv_xs * inv_xs
        ils = ib * l_batch + jnp.arange(l_batch)

        def one_l(il):
            l = ls_f[il]
            jl = jl_tab[il, i] * (1 - f) + jl_tab[il, i + 1] * f
            jp = jlp_tab[il, i] * (1 - f) + jlp_tab[il, i + 1] * f
            jpp = -2.0 * jp * inv_xs + (l * (l + 1) * inv_xs2 - 1.0) * jl
            dT = jnp.sum(S0w * jl + S1w * jp + S2w * jpp, axis=1)
            efac = jnp.sqrt(jnp.maximum(
                (l + 2) * (l + 1) * l * (l - 1), 0.0))
            # E transfer: sqrt((l+2)!/(l-2)!) int (3/4) g Pi j_l/x^2 —
            # the canonical ZS97 scalar E source, Pi in temperature
            # units (S2 = (3/4) g Pi exactly)
            dE = efac * jnp.sum(S2w * jl * inv_xs2, axis=1)
            # lensing potential: phi_l(k) = -2 int dtau W(chi) Psi_W j_l
            # with Psi_W = (phi+psi)/2; SL carries e^-kappa (phi+psi)
            # = 2 Psi_W (sign drops in the auto-power)
            dP = jnp.sum(SLw * jl, axis=1)
            return dT, dE, dP                  # each (k_chunk,)

        return jax.vmap(one_l)(ils)            # (l_batch, k_chunk) x3

    dT, dE, dP = jax.lax.map(do_pair, (ci_flat, ib_flat))
    # shapes: (n_pairs, l_batch, k_chunk) with pair index = ci * n_lb + ib

    def collect(A):
        A = A.reshape(n_chunks, n_lb, l_batch, k_chunk)
        A = jnp.transpose(A, (1, 2, 0, 3)).reshape(len(ls_pad), len(kf_pad))
        return A[:nl, :nkf]

    return ClTransferCache(jnp.asarray(ls, dtype),
                           jnp.asarray(kf_np, dtype),
                           jnp.asarray(wk[:nkf], dtype),
                           collect(dT), collect(dE), collect(dP))


def compute_cl_transfers_recurrence(po: PerturbationOutput, chi_star,
                                    lmax: int = 2500,
                                    tau0_hint: float = 14200.0,
                                    kmax_hint: float = 0.6,
                                    points_per_osc: float = 4.0,
                                    k_chunk: int = 512,
                                    unroll: int = 16,
                                    coarse_k: np.ndarray | None = None,
                                    tau_stride: int = 1
                                    ) -> ClTransferCache:
    """SLOW stage, gather-free variant for the TPU backend.

    The table-lookup form (`compute_cl_transfers`) is gather-bound: ~40M
    random Bessel-table lookups per l-batch, which the axon TPU backend
    executes ~100x below memory speed and which pushes one execution past
    the backend's ~60 s watchdog (empirically bisected; see
    scripts/probe_scanlen_tpu.py). This variant never gathers: spherical
    Bessel functions are generated in-register by the upward recurrence

        j_{l+1}(x) = ((2l+1)/x) j_l(x) - j_{l-1}(x)

    which is numerically stable in the oscillatory region x > l and is
    clamped to zero below the Airy turning region (x < nu - 2.5 nu^{1/3},
    nu = l+1/2) before the growing-solution contamination can amplify
    (error ~ e^{2/3 (2 delta)^{3/2}/sqrt(nu)} ~ e^7.5 x f32 eps at the cut,
    where the true j_l is already e^{-7} of its peak — a <~0.1% effect on
    C_l, validated against the table path in tests/test_cls.py).

    One flat `lax.scan` walks (k-chunk, l-superstep) pairs chunk-major;
    the carry holds the two-term recurrence state per chunk and the
    accumulating Delta_l(k) buffers. Every op is an elementwise FMA or a
    row-take — the patterns the TPU VPU runs at memory speed.

    Same contract as compute_cl_transfers: a ClTransferCache on the
    sampled-l grid (reference: cmbmain.f90 SourceToTransfers + lvalues).
    """
    dtype = po.s0.dtype
    ls = default_l_samples(lmax)
    nl = len(ls)
    kf_np = fine_k_grid(tau0_hint, kmax_hint, points_per_osc)
    nkf = len(kf_np)
    npad_k = (-nkf) % k_chunk
    kf_pad = np.concatenate([kf_np, np.full(npad_k, kf_np[-1])])
    nkf_pad = len(kf_pad)
    n_chunks = nkf_pad // k_chunk

    # l supersteps: l = 2 .. lmax walked `unroll` at a time
    n_sup = int(np.ceil((lmax - 1) / unroll))
    # sampled-l lookup tables (host-built, static)
    is_samp_np = np.zeros(lmax + unroll + 3, np.float32)
    slot_np = np.zeros(lmax + unroll + 3, np.int32)
    for s, l in enumerate(ls):
        is_samp_np[l] = 1.0
        slot_np[l] = s
    is_samp = jnp.asarray(is_samp_np, dtype)
    slot_tab = jnp.asarray(slot_np)

    # static coarse->fine interpolation indices (see compute_cl_transfers):
    # the recurrence path REQUIRES the concrete coarse grid (its whole point
    # is zero runtime gathers/searchsorteds); without it, fall back to the
    # table path with traced interpolation
    if coarse_k is None or len(coarse_k) != po.k.shape[0]:
        return compute_cl_transfers(po, chi_star, lmax=lmax,
                                    tau0_hint=tau0_hint, kmax_hint=kmax_hint,
                                    points_per_osc=points_per_osc,
                                    coarse_k=coarse_k,
                                    tau_stride=tau_stride)
    idx_np, w_np = _cubic_k_weights(coarse_k, kf_pad)
    k_idx = jnp.asarray(idx_np.reshape(n_chunks, k_chunk, 4))
    k_w = jnp.asarray(w_np.reshape(n_chunks, k_chunk, 4), dtype)
    kc_all = jnp.asarray(kf_pad.reshape(n_chunks, k_chunk), dtype)

    dlnk = np.diff(np.log(kf_np))
    wk = np.zeros(nkf_pad)
    wk[:nkf] = np.concatenate([dlnk[:1] / 2, (dlnk[1:] + dlnk[:-1]) / 2,
                               dlnk[-1:] / 2])

    taus, src0, src1, src2, srcL = _strided_sources(po, tau_stride)
    tau0 = po.tau0
    dt = jnp.diff(taus)
    wt = jnp.concatenate([dt[:1] / 2, (dt[1:] + dt[:-1]) / 2, dt[-1:] / 2])
    chi = jnp.maximum(tau0 - taus, 1e-6)
    lens_w = jnp.where(chi < chi_star, (chi_star - chi) / (chi_star * chi), 0.0)

    ci_flat = jnp.repeat(jnp.arange(n_chunks), n_sup)
    ib_flat = jnp.tile(jnp.arange(n_sup), n_chunks)

    zero_state = jnp.zeros((k_chunk, taus.shape[0]), dtype)
    buf0 = jnp.zeros((nl, nkf_pad), dtype)

    def step(carry, args):
        jm1, jl, pser, dT, dE, dP = carry
        ci, ib = args
        kc = kc_all[ci]
        kidx = k_idx[ci]
        kw = k_w[ci]

        def k_interp(S):                       # cubic Lagrange in ln k
            return (kw[:, 0:1] * S[kidx[:, 0]]
                    + kw[:, 1:2] * S[kidx[:, 1]]
                    + kw[:, 2:3] * S[kidx[:, 2]]
                    + kw[:, 3:4] * S[kidx[:, 3]])

        S0w = k_interp(src0) * wt
        S1w = k_interp(src1) * wt
        S2w = k_interp(src2) * wt
        SLw = k_interp(srcL) * (wt * lens_w)
        x = kc[:, None] * (tau0 - taus)[None, :]
        xs = jnp.maximum(x, 1e-6)
        inv_x = 1.0 / xs
        inv_x2 = inv_x * inv_x
        y2 = 0.5 * x * x                      # series variable x^2/2
        sx = jnp.sin(x)
        cx = jnp.cos(x)
        small = x < 1e-3
        j0 = jnp.where(small, 1.0 - x * x / 6.0, sx * inv_x)
        j1 = jnp.where(small, x / 3.0, sx * inv_x2 - cx * inv_x)
        # chunk start (ib == 0): reset the recurrence at (j_0, j_1) and the
        # series prefactor carry at p_1 = x/3  (p_l = x^l/(2l+1)!!,
        # clamped at 1 so the out-of-series-region values never overflow)
        fresh = (ib == 0)
        jm1 = jnp.where(fresh, j0, jm1)
        jl = jnp.where(fresh, j1, jl)
        pser = jnp.where(fresh, jnp.minimum(x / 3.0, 1.0), pser)

        l0 = 2 + ib * unroll
        for u in range(unroll):
            l = l0 + u                                   # traced scalar
            lf = l.astype(dtype)
            nu = lf + 0.5
            cut = jnp.maximum(nu - 2.5 * jnp.cbrt(nu), 0.0)
            jnew = ((2.0 * lf - 1.0) * inv_x) * jl - jm1
            # small-x series overwrite: in the deep region x^2 < l+1 the
            # recurrence amplifies roundoff by ((2l+1)/x)^2 per step; the
            # 3-term ascending series j_l = p_l (1 - y/(2l+3)
            # + y^2/(2(2l+3)(2l+5))), y = x^2/2, is ~1e-4-accurate there
            # and caps the state error. p_l = x^l/(2l+1)!! is carried
            # MULTIPLICATIVELY (p_l = p_{l-1} x/(2l+1), clamped at 1):
            # one fma per step instead of the exp/gammaln transcendentals
            # per lattice point the closed form costs (~20% of the whole
            # LOS kernel on the TPU VPU). The clamp keeps the (unused)
            # large-x values finite for reverse-mode cotangents.
            pser = jnp.minimum(pser * (x / (2.0 * lf + 1.0)), 1.0)
            poly = (1.0 - y2 / (2.0 * lf + 3.0)
                    + y2 * y2 / (2.0 * (2.0 * lf + 3.0) * (2.0 * lf + 5.0)))
            jnew = jnp.where(x * x < lf + 1.0, pser * poly, jnew)
            # Airy-region cutoff: below the turning point the true j_l is
            # exponentially small and upward recurrence is unstable — zero
            # it (the series region at large l underflows to 0 consistently)
            jnew = jnp.where(x > cut, jnew, 0.0)
            jm1, jl = jl, jnew                           # state now at l
            jp = jm1 - (lf + 1.0) * inv_x * jl
            jpp = -2.0 * jp * inv_x + (lf * (lf + 1.0) * inv_x2 - 1.0) * jl
            vT = jnp.sum(S0w * jl + S1w * jp + S2w * jpp, axis=1)
            efac = jnp.sqrt(jnp.maximum(
                (lf + 2.0) * (lf + 1.0) * lf * (lf - 1.0), 0.0))
            vE = efac * jnp.sum(S2w * jl * inv_x2, axis=1)
            vP = jnp.sum(SLw * jl, axis=1)
            m = is_samp[l]
            sl = slot_tab[l]
            off = (ci * k_chunk).astype(sl.dtype)
            for buf_name, v in (("T", vT), ("E", vE), ("P", vP)):
                buf = {"T": dT, "E": dE, "P": dP}[buf_name]
                row = jax.lax.dynamic_slice(buf, (sl, off), (1, k_chunk))
                buf = jax.lax.dynamic_update_slice(
                    buf, row + m * v[None, :], (sl, off))
                if buf_name == "T":
                    dT = buf
                elif buf_name == "E":
                    dE = buf
                else:
                    dP = buf
        return (jm1, jl, pser, dT, dE, dP), 0

    (jm1, jl, pser, dT, dE, dP), _ = jax.lax.scan(
        step, (zero_state, zero_state, zero_state, buf0, buf0, buf0),
        (ci_flat, ib_flat))

    return ClTransferCache(jnp.asarray(ls, dtype),
                           jnp.asarray(kf_np, dtype),
                           jnp.asarray(wk[:nkf], dtype),
                           dT[:, :nkf], dE[:, :nkf], dP[:, :nkf])


def cls_from_cl_transfers(cache: ClTransferCache, pp: PrimordialParams,
                          lmax: int = 2500) -> CMBSpectra:
    """SEMI-SLOW stage (CAMB_TransfersToPowers): apply the primordial power
    to cached Delta_l(k) and spline-fill to every integer l."""
    dtype = cache.dT.dtype
    wP = (cache.wk * scalar_power(pp, cache.kf)).astype(dtype)
    tts = 4.0 * jnp.pi * jnp.sum(wP * cache.dT * cache.dT, axis=1)
    tes = 4.0 * jnp.pi * jnp.sum(wP * cache.dT * cache.dE, axis=1)
    ees = 4.0 * jnp.pi * jnp.sum(wP * cache.dE * cache.dE, axis=1)
    pps = 4.0 * jnp.pi * jnp.sum(wP * cache.dP * cache.dP, axis=1)

    # cubic-spline fill to all integer l in the l(l+1)C_l/2pi representation
    # (camb/modules.f90 lvalues semantics: the sampled-l spectra are smooth
    # in this representation; linear fill loses ~1-2% across acoustic peaks)
    from cosmomc_tpu.utils.interp import spline_fit, spline_eval
    ls_f = cache.ls
    fac = ls_f * (ls_f + 1) / (2 * jnp.pi)
    fac_pp = (ls_f * (ls_f + 1)) ** 2 / (2 * jnp.pi)
    all_l = jnp.arange(2, lmax + 1, dtype=dtype)

    def fill(vals):
        return spline_eval(spline_fit(ls_f, vals), all_l)

    tt = fill(fac * tts)
    te = fill(fac * tes)
    ee = fill(fac * ees)
    ppp = fill(fac_pp * pps)
    return CMBSpectra(all_l.astype(jnp.int32), tt, te, ee, ppp)
