"""Gelman-Rubin convergence diagnostics.

Reference math (source/samples.f90:40-80 `GelmanRubinEvalues`, used by
SampleCollector.f90 UpdateCovAndCheckConverge :212-322): given per-chain
means and covariances, form

    meancov = mean_c cov_c              (within-chain covariance)
    meanscov = cov_c(mean_c)            (between-chain covariance of means)

whiten ``meanscov`` by the Cholesky root of ``meancov`` and take its
eigenvalues; the convergence statistic "R-1" is the largest eigenvalue.
Sampling stops when R-1 < MPI_R_Stop (default 0.05; grids use 0.01).

Here chains are a vector axis so the "MPI_ALLGATHER of chain statistics"
becomes a plain mean/covariance reduction over the chain axis — and under
multi-host sharding a `psum` over the mesh axis (see parallel/mesh.py).
Host-side numpy (float64) is used between segments; a pure-JAX version is
provided for use inside jit (e.g. fully on-device runs).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def chain_moments(samples: np.ndarray, weights: np.ndarray | None = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-chain weighted means/covs. samples: (nchains, nsamp, n)."""
    x = np.asarray(samples, np.float64)
    nchains, nsamp, n = x.shape
    if weights is None:
        w = np.ones((nchains, nsamp))
    else:
        w = np.asarray(weights, np.float64)
    wsum = w.sum(axis=1, keepdims=True)
    means = (w[..., None] * x).sum(axis=1) / wsum
    xc = x - means[:, None, :]
    covs = np.einsum("cs,csi,csj->cij", w, xc, xc) / wsum[..., None]
    return means, covs


def gelman_rubin_evalues(means: np.ndarray, covs: np.ndarray) -> np.ndarray:
    """Eigenvalues of the whitened between-chain covariance (ascending)."""
    means = np.asarray(means, np.float64)
    covs = np.asarray(covs, np.float64)
    meancov = covs.mean(axis=0)
    mu = means.mean(axis=0)
    d = means - mu
    meanscov = d.T @ d / (means.shape[0] - 1)
    L = np.linalg.cholesky(meancov)
    Linv = np.linalg.inv(L)
    W = Linv @ meanscov @ Linv.T
    return np.linalg.eigvalsh(W)


def gelman_rubin_r(means: np.ndarray, covs: np.ndarray) -> float:
    """R-1 statistic: worst eigenvalue direction."""
    return float(gelman_rubin_evalues(means, covs)[-1])


# ---------- in-jit version (f32/f64 jnp) ----------

def gelman_rubin_r_device(samples: jnp.ndarray) -> jnp.ndarray:
    """R-1 from (nchains, nsamp, n) device samples (unweighted)."""
    means = samples.mean(axis=1)
    xc = samples - means[:, None, :]
    covs = jnp.einsum("csi,csj->cij", xc, xc) / samples.shape[1]
    meancov = covs.mean(axis=0)
    mu = means.mean(axis=0)
    d = means - mu
    meanscov = d.T @ d / (means.shape[0] - 1)
    L = jnp.linalg.cholesky(meancov)
    Linv = jnp.linalg.inv(L)
    W = Linv @ meanscov @ Linv.T
    return jnp.linalg.eigvalsh(W)[-1]
