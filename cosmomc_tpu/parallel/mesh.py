"""Multi-device chain parallelism: sharded statistics over a device Mesh.

The reference pools per-rank chain statistics with MPI_ALLGATHER every fixed
step count (SampleCollector.f90:248-251) and computes the Gelman-Rubin
worst-eigenvalue R-1 from the gathered means/covariances
(UpdateCovAndCheckConverge, SampleCollector.f90:212-322; math in
samples.f90:40-80). Here chains live on a `jax.sharding.Mesh` axis
("chains"); the ALLGATHER becomes `psum` collectives inside a `shard_map`,
riding ICI on a real pod slice. The statistics are exact: pooled moments of
the sharded sample block equal the single-device ones.

Usage: build a Mesh over the chain axis (`chain_mesh`), place chain-major
arrays with `shard_chains`, and call `sharded_chain_stats` (jit-able; safe
under a Mesh of 1 device too) to get (per-chain means, per-chain covs,
pooled mean, pooled cov) from which R-1 follows via
convergence.gelman_rubin_r.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


CHAIN_AXIS = "chains"


def chain_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the chain (data-parallel) axis. On a pod slice this is
    the ICI-contiguous device order jax.devices() already provides."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"chain_mesh: {n_devices} devices requested "
                             f"but only {len(devs)} available")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (CHAIN_AXIS,))


def shard_chains(tree, mesh: Mesh, nchains: int):
    """Place every array whose leading dim == nchains on the chain axis;
    replicate everything else (proposal mapping, PRNG key, scalars)."""
    chain_s = NamedSharding(mesh, P(CHAIN_AXIS))
    repl = NamedSharding(mesh, P())

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == nchains:
            return jax.device_put(x, chain_s)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, tree)


class ChainStats(NamedTuple):
    means: jnp.ndarray       # (nchains, n) per-chain means
    covs: jnp.ndarray        # (nchains, n, n) per-chain covariances
    pooled_mean: jnp.ndarray # (n,)
    pooled_cov: jnp.ndarray  # (n, n) covariance of ALL samples pooled


def chain_stats_local(samples: jnp.ndarray) -> ChainStats:
    """Single-device reference implementation. samples: (nchains, S, n)."""
    means = samples.mean(axis=1)
    xc = samples - means[:, None, :]
    covs = jnp.einsum("csi,csj->cij", xc, xc) / samples.shape[1]
    mu = means.mean(axis=0)
    d = samples.reshape(-1, samples.shape[-1]) - mu
    pooled_cov = d.T @ d / d.shape[0]
    return ChainStats(means, covs, mu, pooled_cov)


def sharded_chain_stats(samples: jnp.ndarray, mesh: Mesh) -> ChainStats:
    """Chain statistics with cross-device reductions (psum over the mesh
    axis — the TPU equivalent of the reference's MPI_ALLGATHER pooling).

    samples: (nchains, S, n) sharded on axis 0 over mesh's chain axis.
    Per-chain means/covs stay sharded (no gather of O(C n^2) data); the
    pooled mean/cov are O(n^2) replicated scalars from two psums.
    """
    nchains = samples.shape[0]

    def local_block(x):
        # x: (nchains/ndev, S, n) local shard
        means = x.mean(axis=1)
        xc = x - means[:, None, :]
        covs = jnp.einsum("csi,csj->cij", xc, xc) / x.shape[1]
        s1 = x.sum(axis=(0, 1))                       # (n,)
        s2 = jnp.einsum("csi,csj->ij", x, x)          # (n, n)
        s1 = jax.lax.psum(s1, CHAIN_AXIS)
        s2 = jax.lax.psum(s2, CHAIN_AXIS)
        ntot = nchains * x.shape[1]
        mu = s1 / ntot
        pooled_cov = s2 / ntot - jnp.outer(mu, mu)
        return means, covs, mu, pooled_cov

    from jax.experimental.shard_map import shard_map
    fn = shard_map(local_block, mesh=mesh,
                   in_specs=P(CHAIN_AXIS),
                   out_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS), P(), P()))
    means, covs, mu, pooled_cov = fn(samples)
    return ChainStats(means, covs, mu, pooled_cov)


def sharded_gelman_rubin_r(samples: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """R-1 (worst eigenvalue) computed with sharded statistics.

    The between/within covariances are O(n^2): after the psum reductions the
    eigen-problem is tiny and runs replicated (every device computes the
    same answer — the reference's rank-0 compute + broadcast collapsed).
    """
    stats = sharded_chain_stats(samples, mesh)
    # all-gather the per-chain moments (O(C n^2), tiny) for the R-1 math
    means = jax.lax.with_sharding_constraint(
        stats.means, NamedSharding(mesh, P()))
    covs = jax.lax.with_sharding_constraint(
        stats.covs, NamedSharding(mesh, P()))
    meancov = covs.mean(axis=0)
    mu = means.mean(axis=0)
    d = means - mu
    meanscov = d.T @ d / (means.shape[0] - 1)
    L = jnp.linalg.cholesky(meancov)
    Linv = jnp.linalg.inv(L)
    W = Linv @ meanscov @ Linv.T
    return jnp.linalg.eigvalsh(W)[-1]
