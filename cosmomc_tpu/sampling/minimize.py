"""Best-fit finding (action=2) and Hessian covariance estimation (action=3).

Reference: source/minimize.f90 (BOBYQA in whitened/rotated coordinates +
low-temperature MCMC refinement rounds, :46-64,136+) and EstCovmat.f90
(finite-difference Hessian tuned to Delta(-logL) ~ 4).

TPU redesign: autodiff supersedes both derivative-free machinery pieces.
  - L-BFGS-B (scipy host loop) over propose-width-whitened coordinates
    with jitted jax value_and_grad — minimization is inherently
    sequential, so the host loop costs nothing vs the device evaluation;
  - optional low-temperature vectorized MCMC refine (the reference's
    minimization_points_factor rounds) using the existing sampler at
    temperature << 1, which also polishes non-smooth posteriors;
  - covariance = inverse autodiff Hessian at the best fit (EstCovmat's
    quadratic-model estimate, exact to machine precision).

Outputs a GetDist/CosmoMC-style `.minimum` text file (calclike.f90
WriteBestFitParams format: -logL header then "index value name label").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.params.space import ParameterSpace


@dataclass
class BestFit:
    P: np.ndarray            # (n,) varying-parameter best fit
    mloglike: float
    n_evals: int
    converged: bool
    cov: Optional[np.ndarray] = None   # inverse-Hessian covariance


def find_best_fit(logpost: Callable, space: ParameterSpace,
                  start: Optional[np.ndarray] = None,
                  use_grad: bool = True,
                  refine_temperature: Optional[float] = 0.02,
                  refine_steps: int = 512, refine_chains: int = 64,
                  seed: int = 0, dtype=jnp.float64,
                  maxiter: int = 500) -> BestFit:
    """Minimize -log posterior. `logpost(P) -> (mloglike, derived)`."""
    from scipy.optimize import minimize as sp_minimize

    var = space.varying
    n = len(var)
    scale = np.array([max(p.propose_width, 1e-8) for p in var])
    lo = np.array([p.min for p in var]) / scale
    hi = np.array([p.max for p in var]) / scale
    x0 = (np.array([p.center for p in var]) if start is None
          else np.asarray(start, float)) / scale

    fn = jax.jit(lambda x: logpost(jnp.asarray(x * scale, dtype))[0])
    if use_grad:
        vg = jax.jit(jax.value_and_grad(
            lambda x: logpost(jnp.asarray(x * scale, dtype))[0]))

        # error/out-of-range points surface as a huge FLAT plateau
        # (LOG_ZERO sentinels), which breaks L-BFGS-B's zoom linesearch
        # (zero slope -> degenerate interpolation -> refuses to move; its
        # very first Cauchy trial can land there when the gradient is
        # steep). Replace the plateau with a SLOPED quadratic pulling back
        # toward the best finite point seen, so backtracking recovers.
        track = {"x": np.array(x0), "v": np.inf}

        def obj(x):
            v, g = vg(jnp.asarray(x, dtype))
            v = float(v)
            if not np.isfinite(v) or v >= 1e28:
                d = np.asarray(x, float) - track["x"]
                return 1e12 * (1.0 + 0.5 * float(d @ d)), 1e12 * d
            if v < track["v"]:
                track["v"], track["x"] = v, np.array(x, float)
            return v, np.asarray(g, float)

        res = sp_minimize(obj, x0, jac=True, method="L-BFGS-B",
                          bounds=list(zip(lo, hi)),
                          options=dict(maxiter=maxiter, ftol=1e-12,
                                       gtol=1e-9))
    else:
        res = sp_minimize(lambda x: float(fn(jnp.asarray(x, dtype))), x0,
                          method="Nelder-Mead",
                          options=dict(maxiter=4000, xatol=1e-8, fatol=1e-10))
    best_x = np.clip(res.x, lo, hi)
    best_v = float(fn(jnp.asarray(best_x, dtype)))
    n_evals = int(res.nfev)

    if refine_temperature:
        # low-T MCMC refinement (minimize.f90 refinement rounds): many
        # chains started at the optimum, temperature ~0.02, keep the best
        # visited point
        from cosmomc_tpu.sampling.metropolis import MetropolisSampler
        from cosmomc_tpu.sampling.proposal import BlockedProposal
        prop = BlockedProposal(space.speed_blocks(), slow_block_max=1,
                               propose_scale=1.0)
        prop.set_covariance(np.diag((scale * 0.05) ** 2))
        sampler = MetropolisSampler(prop, logpost,
                                    num_derived=0,
                                    temperature=refine_temperature)
        rng = np.random.default_rng(seed)
        P0 = best_x * scale + rng.normal(0, 0.02, (refine_chains, n)) * scale
        P0 = np.clip(P0, np.array([p.min for p in var]),
                     np.array([p.max for p in var]))
        state = sampler.init_state(jax.random.PRNGKey(seed),
                                   jnp.asarray(P0, dtype))
        seg = 64
        for _ in range(max(1, refine_steps // seg)):
            sched = prop.make_schedule(seg, rng)
            state, out = sampler.run_segment(state, sched)
        mll = np.asarray(state.mloglike, float)
        i = int(np.argmin(mll))
        if mll[i] < best_v:
            best_v = float(mll[i])
            best_x = np.asarray(state.P[i], float) / scale
        n_evals += refine_steps * refine_chains

    return BestFit(best_x * scale, best_v, n_evals,
                   converged=bool(getattr(res, "success", True)))


def estimate_covariance(logpost: Callable, P_best: np.ndarray,
                        dtype=jnp.float64) -> np.ndarray:
    """Parameter covariance = inverse Hessian of -log posterior at the best
    fit (supersedes EstCovmat.f90's finite-difference quadratic fit)."""
    H = jax.hessian(lambda p: logpost(p)[0])(jnp.asarray(P_best, dtype))
    H = np.asarray(H, float)
    # symmetrize + guard against non-PD (flat directions get prior width)
    H = 0.5 * (H + H.T)
    w, V = np.linalg.eigh(H)
    w = np.maximum(w, 1e-12 * max(w.max(), 1e-30))
    return (V / w) @ V.T


def write_minimum_file(path: str, space: ParameterSpace, best: BestFit,
                       derived: Optional[np.ndarray] = None,
                       derived_names=None) -> None:
    """.minimum file in the reference's text layout (calclike.f90:208-257)."""
    with open(path, "w") as f:
        f.write(f" -log(Like) = {best.mloglike:18.8f}\n")
        f.write(f"  chi-sq    = {2 * best.mloglike:18.8f}\n\n")
        for i, (p, v) in enumerate(zip(space.varying, best.P)):
            f.write(f"{i + 1:5d}  {v: .7E}   {p.name:20s}  {p.label}\n")
        if derived is not None and derived_names:
            f.write("\n")
            base = len(best.P)
            for j, ((name, label), v) in enumerate(zip(derived_names, derived)):
                f.write(f"{base + j + 1:5d}  {v: .7E}   {name:20s}  {label}\n")
