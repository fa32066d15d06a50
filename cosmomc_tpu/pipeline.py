"""Posterior assembly: parameterization + theory + likelihood list -> logpost.

Plays the role of the reference's composition root (GeneralSetup.f90 TSetup +
calclike.f90 TTheoryLikeCalculator): wires the sampled parameter vector
through the parameterization to theory products, evaluates every registered
likelihood, and returns `(chi2/2 total, derived)` — all as one pure traced
function handed to the sampler.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from cosmomc_tpu.likelihoods.base import Likelihood, LikelihoodList
from cosmomc_tpu.models.theory import (compute_background_theory,
                                       background_derived,
                                       BACKGROUND_DERIVED_NAMES)
from cosmomc_tpu.params.space import ParameterSpace
from cosmomc_tpu.sampling.metropolis import make_bounded_posterior
from cosmomc_tpu.sampling.proposal import BlockedProposal
from cosmomc_tpu.utils.paramnames import ParamNames, ParamInfo


@dataclass
class BackgroundPosterior:
    """Background-only posterior (BASELINE config 1: BAO+SN+H0)."""
    parameterization: object          # has .to_background(full_P)
    space: ParameterSpace
    likes: LikelihoodList
    fixed_rs: Optional[float] = None
    dtype: object = jnp.float64

    def __post_init__(self):
        self.slices = self.likes.add_nuisance_to_space(self.space)
        self.varying_idx = self.space.varying_indices
        self._full_template = np.array([p.center for p in self.space.params])
        self.num_derived = len(BACKGROUND_DERIVED_NAMES)

    def embed_full(self, varying: jnp.ndarray) -> jnp.ndarray:
        """Embed varying vector into the full parameter vector (traced)."""
        full = jnp.asarray(self._full_template, varying.dtype)
        return full.at[jnp.asarray(self.varying_idx)].set(varying)

    def raw_logpost(self) -> Callable:
        """P_varying -> (chi2/2, derived); to be wrapped with bounds/priors."""
        def fn(P):
            full = self.embed_full(P)
            bg = self.parameterization.to_background(full)
            th = compute_background_theory(bg, self.fixed_rs)
            total, _per = self.likes.total_log_like(th, P, self.slices)
            der = background_derived(th)
            return total, der
        return fn

    def logpost(self) -> Callable:
        arr = self.space.device_arrays(self.dtype)
        return make_bounded_posterior(
            self.raw_logpost(), arr["lo"], arr["hi"],
            prior_arrays=arr, num_derived=self.num_derived)

    def paramnames(self) -> ParamNames:
        pn = self.space.param_names()
        for name, label in BACKGROUND_DERIVED_NAMES:
            pn.add(ParamInfo(name, label, derived=True))
        return pn

    def make_proposal(self, oversample_fast: int = 1,
                      propose_scale: float = 2.4) -> BlockedProposal:
        blocks = self.space.speed_blocks()
        n_slow_blocks = max(1, sum(1 for b in blocks if b and
                                   self.space.varying[b[0]].speed <= 1))
        return BlockedProposal(blocks, slow_block_max=n_slow_blocks,
                               oversample_fast=oversample_fast,
                               propose_scale=propose_scale)

    def start_positions(self, rng: np.random.Generator, nchains: int) -> np.ndarray:
        """Gaussian around center with start_width, truncated to bounds
        (BaseParameters.f90:85-105)."""
        var = self.space.varying
        out = np.empty((nchains, len(var)))
        for i, p in enumerate(var):
            vals = rng.normal(p.center, max(p.start_width, 1e-12), nchains)
            out[:, i] = np.clip(vals, p.min, p.max)
        return out
