"""Blocked random-rotation proposal, vectorized over chains.

Reproduces the proposal *math* of the reference (source/propose.f90:53-298):

  - varying parameters are grouped into speed blocks, ordered slow -> fast;
  - the correlation matrix (in block order) is Cholesky-factored; the
    proposal mapping for block b is ``M[:, s_b:e_b]`` where
    ``M = diag(sigma) @ L`` — lower-triangularity means a slow-block move
    drags all faster parameters along their conditional correlations, while
    a fast-block move touches only fast parameters
    (propose.f90 BlockedProposer_SetCovariance);
  - within a block, proposals step along columns of a random orthogonal
    matrix, cycling through all directions before drawing a fresh rotation
    (propose.f90 ProposeVec);
  - the step radius is a mixture: w.p. 1/3 an Exp(1) draw, else the rms of
    min(block_dim, 2) standard normals (propose.f90 Propose_r), times
    ``propose_scale`` (default 2.4);
  - the slow/fast visit order cycles through random permutations of all
    directions, with ``oversample_fast`` consecutive fast proposals whenever
    a fast direction comes up (propose.f90 GetProposal :257-298).

TPU-native re-design: thousands of chains are a vmapped axis. The *schedule*
(which block, which direction-in-block, rotation-refresh flags at each step)
is precomputed host-side per segment and shared by all chains, so every
chain works on the same block at the same step — uniform compute per step,
and slow-theory recomputations align across the whole batch. Rotation
matrices remain per-chain (shape (nchains, nb, nb) per block), so chains
explore independently; accept/reject randomness is per-chain.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class ProposalSchedule(NamedTuple):
    """Per-step shared schedule for a segment of S steps (host precomputed)."""
    block: np.ndarray     # (S,) int32: which block this step proposes in
    direction: np.ndarray  # (S,) int32: direction index within the block
    refresh: np.ndarray   # (S,) bool: draw a fresh rotation before this step


@dataclass
class BlockedProposal:
    """Host-side proposal builder; produces device mapping matrices + schedules."""
    block_indices: List[np.ndarray]   # varying-param indices per block, slow first
    slow_block_max: int = 1           # blocks [0, slow_block_max) count as slow
    oversample_fast: int = 1
    propose_scale: float = 2.4

    def __post_init__(self):
        self.block_indices = [np.asarray(b, np.int32) for b in self.block_indices
                              if len(b) > 0]
        self.order = np.concatenate(self.block_indices)      # block-order -> varying
        self.n = int(self.order.size)
        self.inv_order = np.empty(self.n, np.int64)
        self.inv_order[self.order] = np.arange(self.n)
        sizes = [len(b) for b in self.block_indices]
        self.block_sizes = sizes
        self.block_starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]
        self.n_slow = int(sum(sizes[:self.slow_block_max]))
        self._dir_count = np.zeros(len(sizes), np.int64)  # visits per block so far
        self.mapping = None   # (n, n) f32 device matrix M (block order)

    # ---------- covariance ----------

    def set_covariance(self, cov: np.ndarray) -> None:
        """Build the triangular mapping M = diag(sigma) L from a covariance
        over the varying parameters (propose.f90 SetCovariance math)."""
        cov = np.asarray(cov, np.float64)
        sig = np.sqrt(np.diag(cov))
        corr = cov / np.outer(sig, sig)
        corr_ord = corr[np.ix_(self.order, self.order)]
        # tolerate semi-definite matrices the way the reference's
        # `zeroed` Cholesky does: add tiny jitter
        jitter = 1e-12
        for _ in range(8):
            try:
                L = np.linalg.cholesky(corr_ord + jitter * np.eye(self.n))
                break
            except np.linalg.LinAlgError:
                jitter *= 100
        else:
            raise np.linalg.LinAlgError("proposal covariance not factorizable")
        M = sig[self.order, None] * L
        self.covariance = cov
        self.mapping = jnp.asarray(M, jnp.float32)

    # ---------- schedule ----------

    def make_schedule(self, steps: int, rng: np.random.Generator) -> ProposalSchedule:
        """Precompute (block, direction, refresh) for `steps` steps, following
        the reference's cycling-permutation visit order with fast oversampling."""
        nb = len(self.block_sizes)
        blocks = np.empty(steps, np.int32)
        dirs = np.empty(steps, np.int32)
        refresh = np.zeros(steps, bool)

        # cyclic randomizers: over all-dirs, slow-dirs, fast-dirs
        def cycler(n):
            buf = []
            while True:
                perm = rng.permutation(n)
                for v in perm:
                    yield int(v)
        all_cyc = cycler(self.n)
        slow_cyc = cycler(self.n_slow) if self.n_slow else None
        nfast = self.n - self.n_slow
        fast_cyc = cycler(nfast) if nfast else None

        # map a position in block-order to (block, within-block handled by
        # per-block direction cycling below)
        pos_to_block = np.empty(self.n, np.int32)
        for b, (s, size) in enumerate(zip(self.block_starts, self.block_sizes)):
            pos_to_block[s:s + size] = b

        fast_ix = 0
        for t in range(steps):
            if fast_ix > 0:
                use_fast = True
                fast_ix -= 1
            else:
                pick = next(all_cyc)
                use_fast = pick >= self.n_slow and nfast > 0
                if use_fast:
                    fast_ix = self.oversample_fast - 1
            if use_fast:
                pos = self.n_slow + next(fast_cyc)
            else:
                pos = next(slow_cyc) if slow_cyc else next(fast_cyc)
            b = int(pos_to_block[pos])
            size = self.block_sizes[b]
            d = int(self._dir_count[b] % size)
            refresh[t] = d == 0
            self._dir_count[b] += 1
            blocks[t] = b
            dirs[t] = d
        return ProposalSchedule(blocks, dirs, refresh)

    # ---------- device-side proposal ----------

    def init_rotations(self, key: jax.Array, nchains: int) -> List[jnp.ndarray]:
        keys = jax.random.split(key, len(self.block_sizes))
        return [random_rotation(k, nchains, s) for k, s in
                zip(keys, self.block_sizes)]

    def propose(self, key: jax.Array, P: jnp.ndarray, rots: List[jnp.ndarray],
                block: jnp.ndarray, direction: jnp.ndarray,
                refresh: jnp.ndarray,
                mapping: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """One proposal step for all chains.

        P: (nchains, n) in *varying order*. block/direction/refresh are
        traced scalars from the shared schedule. `mapping` MUST be passed as
        a traced argument when called under jit — closing over
        `self.mapping` would freeze the proposal covariance at trace time
        and silently disable adaptation. Returns (trial P, rots).
        """
        if mapping is None:
            mapping = self.mapping
        nchains = P.shape[0]
        k_rot, k_r = jax.random.split(key)
        new_rots = []
        deltas = []
        for b, (s, size) in enumerate(zip(self.block_starts, self.block_sizes)):
            is_b = jnp.logical_and(block == b, refresh)
            rot = jax.lax.cond(
                is_b,
                lambda _r, k=jax.random.fold_in(k_rot, b), sz=size:
                    random_rotation(k, nchains, sz),
                lambda r: r,
                rots[b])
            new_rots.append(rot)
            # direction column for each chain: (nchains, size)
            col = rot[:, :, jnp.minimum(direction, size - 1)]
            r = _propose_r(jax.random.fold_in(k_r, b), nchains, size, P.dtype)
            vec = col * (r * self.propose_scale)[:, None]       # (nchains, size)
            Mb = mapping[:, s:s + size].astype(P.dtype)         # (n, size)
            delta_ord = vec @ Mb.T                              # (nchains, n)
            deltas.append(delta_ord)
        delta_ord = jnp.select([block == b for b in range(len(deltas))], deltas)
        inv = jnp.asarray(self.inv_order)
        trial = P + delta_ord[:, inv]
        return trial, new_rots


def random_rotation(key: jax.Array, nchains: int, n: int) -> jnp.ndarray:
    """Batch of random orthogonal matrices (nchains, n, n) via QR of Gaussians
    (reference RandUtils RandRotation)."""
    if n == 1:
        sign = jnp.where(jax.random.bernoulli(key, shape=(nchains, 1, 1)), 1.0, -1.0)
        return sign.astype(jnp.float32)
    g = jax.random.normal(key, (nchains, n, n), jnp.float32)
    q, r = jnp.linalg.qr(g)
    # fix signs so the distribution is Haar
    d = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    return q * d[:, None, :]


def _propose_r(key: jax.Array, nchains: int, block_size: int, dtype) -> jnp.ndarray:
    """Radius mixture: 1/3 Exp(1), 2/3 rms of min(n,2) normals
    (propose.f90 Propose_r)."""
    k1, k2, k3 = jax.random.split(key, 3)
    use_exp = jax.random.uniform(k1, (nchains,)) < (1.0 / 3.0)
    r_exp = jax.random.exponential(k2, (nchains,), dtype)
    m = min(block_size, 2)
    g = jax.random.normal(k3, (nchains, m), dtype)
    r_gauss = jnp.sqrt(jnp.sum(g * g, axis=1) / m)
    return jnp.where(use_exp, r_exp, r_gauss)
