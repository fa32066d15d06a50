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
    """Per-step shared schedule for a segment of S steps (host precomputed).

    `rot_index[t]` selects which pregenerated rotation the scheduled block
    uses at step t: rotations for a whole segment are drawn with ONE batched
    QR before the scan (a `lax.cond`-gated QR inside the scan body is
    pathologically slow to compile on TPU and serializes the step)."""
    block: np.ndarray     # (S,) int32: which block this step proposes in
    direction: np.ndarray  # (S,) int32: direction index within the block
    rot_index: np.ndarray  # (S,) int32: rotation cycle index within segment
    num_rots: Tuple[int, ...]  # static: rotations needed per block


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

    def make_schedule(self, steps: int, rng: np.random.Generator,
                      slow_every: Optional[int] = None,
                      expensive_blocks: Optional[Sequence[int]] = None
                      ) -> ProposalSchedule:
        """Precompute (block, direction, refresh) for `steps` steps, following
        the reference's cycling-permutation visit order with fast oversampling.

        `slow_every` (optional) switches to a *patterned* schedule: exactly
        one expensive-block step every `slow_every` steps (at offsets 0,
        slow_every, ...), all other steps cycling the cheap directions.
        This bounds the number of full-theory recomputes per compiled
        segment — required on backends with a per-execution watchdog
        (axon kills kernels >~60s) and the natural generalization of the
        reference's oversample_fast economics (propose.f90:261-272): cheap
        directions are nearly free against the cached theory, so visiting
        them more often costs nothing. Deterministic block cycling within
        a random-direction proposal remains a valid irreducible MH kernel.
        `expensive_blocks` lists the block indices that count as expensive
        (default: blocks [0, slow_block_max))."""
        if slow_every is not None:
            return self._make_schedule_patterned(steps, rng, slow_every,
                                                 expensive_blocks)
        nb = len(self.block_sizes)
        blocks = np.empty(steps, np.int32)
        dirs = np.empty(steps, np.int32)

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

        rot_ix = np.empty(steps, np.int32)
        # rotations restart each segment (one batched QR per segment); the
        # direction cycle within each rotation is preserved
        dir_count = np.zeros(len(self.block_sizes), np.int64)
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
            d = int(dir_count[b] % size)
            rot_ix[t] = dir_count[b] // size
            dir_count[b] += 1
            blocks[t] = b
            dirs[t] = d
        # deterministic upper bound so shapes are identical across segments
        # of the same length (no recompiles): visits_b <= steps
        num_rots = tuple(steps // sz + 1 for sz in self.block_sizes)
        return ProposalSchedule(blocks, dirs, rot_ix, num_rots)

    def _make_schedule_patterned(self, steps, rng, slow_every,
                                 expensive_blocks):
        if expensive_blocks is None:
            expensive_blocks = list(range(self.slow_block_max))
        exp = set(int(b) for b in expensive_blocks)
        pos_block = []
        for b, (s, size) in enumerate(zip(self.block_starts, self.block_sizes)):
            pos_block += [b] * size
        exp_pos = [p for p, b in enumerate(pos_block) if b in exp]
        cheap_pos = [p for p, b in enumerate(pos_block) if b not in exp]
        if not exp_pos or not cheap_pos:
            raise ValueError("patterned schedule needs both expensive and "
                             "cheap directions")

        def cycler(items):
            while True:
                for v in rng.permutation(len(items)):
                    yield items[int(v)]
        e_cyc = cycler(exp_pos)
        c_cyc = cycler(cheap_pos)

        blocks = np.empty(steps, np.int32)
        dirs = np.empty(steps, np.int32)
        rot_ix = np.empty(steps, np.int32)
        dir_count = np.zeros(len(self.block_sizes), np.int64)
        for t in range(steps):
            pos = next(e_cyc) if t % slow_every == 0 else next(c_cyc)
            b = pos_block[pos]
            size = self.block_sizes[b]
            d = int(dir_count[b] % size)
            rot_ix[t] = dir_count[b] // size
            dir_count[b] += 1
            blocks[t] = b
            dirs[t] = d
        num_rots = tuple(steps // sz + 1 for sz in self.block_sizes)
        return ProposalSchedule(blocks, dirs, rot_ix, num_rots)

    # ---------- device-side proposal ----------

    def segment_rotations(self, key: jax.Array, nchains: int,
                          num_rots: Tuple[int, ...]) -> List[jnp.ndarray]:
        """Pregenerate every rotation a segment needs: one batched
        orthogonalization per block, shape (nchains, num_rots_b, size, size)."""
        keys = jax.random.split(key, len(self.block_sizes))
        return [random_rotation(k, nchains * nr, sz).reshape(nchains, nr, sz, sz)
                for k, nr, sz in zip(keys, num_rots, self.block_sizes)]

    def segment_deltas(self, key: jax.Array, nchains: int,
                       schedule: ProposalSchedule,
                       mapping: jnp.ndarray, dtype) -> jnp.ndarray:
        """Precompute the proposal *direction* for every step of a segment:
        (S, nchains, n) in varying order, unit radius.

        The schedule (block, direction-in-block, rotation index) is static
        host data, so the per-step rotation column and mapping slice are
        selected with static indexing and contracted in one batched einsum
        per block — the compiled scan body then only scales by the random
        radius and adds. (The previous design computed EVERY block's delta
        at every step and `jnp.select`-ed; at 1024 chains the resulting
        graph took >13 min to compile on the TPU backend.)

        `mapping` MUST be a traced argument (closing over self.mapping would
        freeze the covariance at trace time and silently disable adaptation).
        """
        S = len(schedule.block)
        seg_rots = self.segment_rotations(key, nchains, schedule.num_rots)
        # the schedule reaches the trace as device arrays so segments with
        # fresh random schedules reuse ONE compile; each block contributes a
        # batched gather+einsum over all S steps (a few nb x S x C x n flops,
        # negligible outside the scan), then the scheduled block's row wins.
        block = jnp.asarray(schedule.block)
        direction = jnp.asarray(schedule.direction)
        rot_index = jnp.asarray(schedule.rot_index)
        out = jnp.zeros((S, nchains, self.n), dtype)
        for b, (s, size) in enumerate(zip(self.block_starts, self.block_sizes)):
            rb = seg_rots[b]                                  # (C, nr, sz, sz)
            ri = jnp.minimum(rot_index, rb.shape[1] - 1)
            di = jnp.minimum(direction, size - 1)
            # advanced indices at axes 1,3 are non-adjacent -> result
            # (S, nchains, size)
            cols = rb[:, ri, :, di].astype(dtype)
            Mb = mapping[:, s:s + size].astype(dtype)         # (n, sz)
            d = jnp.einsum("scp,np->scn", cols, Mb)           # (S, C, n)
            out = jnp.where((block == b)[:, None, None], d, out)
        return out[:, :, jnp.asarray(self.inv_order)]

    def schedule_radius_dims(self, schedule: ProposalSchedule) -> np.ndarray:
        """Static per-step min(block_dim, 2) for the radius mixture."""
        sizes = np.asarray(self.block_sizes)
        return np.minimum(sizes[np.asarray(schedule.block)], 2).astype(np.int32)

    def propose_step(self, key: jax.Array, P: jnp.ndarray,
                     delta_dir: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
        """Apply one precomputed direction: trial = P + r * scale * delta.
        `delta_dir`: (nchains, n) from `segment_deltas`; `m2`: traced scalar
        min(block_dim, 2) from `schedule_radius_dims`."""
        r = _propose_r_m(key, P.shape[0], m2, P.dtype)
        return P + delta_dir * (r * self.propose_scale)[:, None]


def random_rotation(key: jax.Array, nchains: int, n: int) -> jnp.ndarray:
    """Batch of random orthogonal matrices (nchains, n, n), Haar-distributed
    (reference RandUtils RandRotation).

    Implemented as a `lax.scan` over columns doing classical Gram-Schmidt
    with reorthogonalization (CGS2, "twice is enough") on Gaussian matrices
    rather than jnp.linalg.qr: the TPU QR custom-call allocates the whole
    batch in VMEM and dies on large chain counts (and compiles far slower).
    The previous statically-unrolled MGS emitted O(n^2) HLO ops and was the
    main contributor to the 1024-chain compile blowup. GS on Gaussians with
    the positive-norm convention is exactly Haar.
    """
    if n == 1:
        sign = jnp.where(jax.random.bernoulli(key, shape=(nchains, 1, 1)), 1.0, -1.0)
        return sign.astype(jnp.float32)
    g = jax.random.normal(key, (n, nchains, n), jnp.float32)  # columns first
    eye = jnp.eye(n, dtype=jnp.float32)

    def body(Q, xs):
        v, j = xs                      # v: (nchains, n) candidate column
        for _ in range(2):             # CGS2 reorthogonalization
            coef = jnp.einsum("cni,cn->ci", Q, v)
            v = v - jnp.einsum("cni,ci->cn", Q, coef)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        Q = Q + v[:, :, None] * eye[j][None, None, :]
        return Q, None

    Q0 = jnp.zeros((nchains, n, n), jnp.float32)
    Q, _ = jax.lax.scan(body, Q0, (g, jnp.arange(n)))
    return Q


def _propose_r(key: jax.Array, nchains: int, block_size: int, dtype) -> jnp.ndarray:
    """Radius mixture: 1/3 Exp(1), 2/3 rms of min(n,2) normals
    (propose.f90 Propose_r)."""
    return _propose_r_m(key, nchains, min(block_size, 2), dtype)


def _propose_r_m(key: jax.Array, nchains: int, m2, dtype) -> jnp.ndarray:
    """Radius mixture with traced m2 = min(block_dim, 2): draw 2 normals and
    mask the second, so the shape is static inside the scan body."""
    k1, k2, k3 = jax.random.split(key, 3)
    use_exp = jax.random.uniform(k1, (nchains,)) < (1.0 / 3.0)
    r_exp = jax.random.exponential(k2, (nchains,), dtype)
    g = jax.random.normal(k3, (nchains, 2), dtype)
    m2f = jnp.asarray(m2, dtype)
    use2 = (m2f > 1.5).astype(dtype)
    r_gauss = jnp.sqrt((g[:, 0] ** 2 + use2 * g[:, 1] ** 2) / m2f)
    return jnp.where(use_exp, r_exp, r_gauss)
