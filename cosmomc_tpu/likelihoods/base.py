"""Likelihood framework: registry of jit-able log-prob components.

Reference architecture being re-expressed (GeneralTypes.f90:105-146
TDataLikelihood / TLikelihoodList; DataLikelihoods.f90:9-41 registry):
each likelihood declares a type tag, a speed class, nuisance parameters
(with their own priors/bounds), and the theory products it needs; the list
allocates nuisance blocks and sums -logL over active likelihoods.

TPU-native design: a likelihood is a host-side object built from its
`.dataset` files (static device arrays baked in), exposing

    log_like(theory, nuisance) -> chi2/2  (a traced scalar)

where `theory` is a typed pytree of theory products computed once per
parameter point, and `nuisance` is the likelihood's slice of the sampled
vector. The whole sum is jit-fused with the theory computation — there is
no per-likelihood dispatch at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from cosmomc_tpu.params.space import Param, ParameterSpace, Speed
from cosmomc_tpu.utils.ini import IniFile
from cosmomc_tpu.utils.paramnames import ParamNames


class Likelihood:
    """Base likelihood. Subclasses bake data into device arrays at init."""

    #: reference LikelihoodType tag (CMB/BAO/SN/Hubble/MPK/WL/SZ/Abund)
    kind: str = "generic"
    name: str = ""
    speed: Speed = Speed.FAST

    def __init__(self, name: str = ""):
        self.name = name or type(self).__name__
        self.nuisance: List[Param] = []

    # -- nuisance declaration ------------------------------------------------

    def add_nuisance_from_paramnames(self, path: str, ini: Optional[IniFile] = None,
                                     defaults: Optional[dict] = None) -> None:
        """Register nuisance parameters from a .paramnames file; their
        center/range come from `param[name]` ini lines or the defaults dict
        (reference: TDataLikelihood nuisance_params + AddNuisanceParameters,
        GeneralTypes.f90:618-669)."""
        pn = ParamNames.from_file(path)
        for info in pn.sampled():
            spec = None
            if ini is not None:
                spec = ini.string(f"param[{info.name}]")
            if spec is not None:
                parts = [float(x) for x in spec.split()]
                if len(parts) == 1:
                    p = Param(info.name, parts[0], parts[0], parts[0], 0, 0,
                              label=info.label, speed=Speed.FAST)
                else:
                    p = Param(info.name, *parts[:5], label=info.label,
                              speed=Speed.FAST)
                if ini is not None:
                    pr = ini.string(f"prior[{info.name}]")
                    if pr:
                        m, s = (float(x) for x in pr.split())
                        p.prior_mean, p.prior_std = m, s
            elif defaults and info.name in defaults:
                spec = defaults[info.name]
                if len(spec) == 1:
                    # single value = fixed parameter (BaseParameters.f90:122)
                    p = Param(info.name, spec[0], spec[0], spec[0], 0.0, 0.0,
                              label=info.label, speed=Speed.FAST)
                else:
                    p = Param(info.name, *spec[:5], label=info.label,
                              speed=Speed.FAST)
            else:
                raise ValueError(
                    f"{self.name}: no param[] spec for nuisance {info.name}")
            self.nuisance.append(p)

    # -- evaluation ----------------------------------------------------------

    def log_like(self, theory, nuisance: jnp.ndarray) -> jnp.ndarray:
        """Return -log L (chi^2 / 2) as a traced scalar."""
        raise NotImplementedError


@dataclass
class LikelihoodList:
    """Ordered collection wiring nuisance blocks into the parameter space
    (reference: TLikelihoodList, GeneralTypes.f90:618-736)."""
    likes: List[Likelihood] = field(default_factory=list)

    def add(self, like: Likelihood) -> None:
        self.likes.append(like)

    def add_nuisance_to_space(self, space: ParameterSpace) -> Dict[str, slice]:
        """Append each likelihood's nuisance params to the space; returns
        {likelihood name: slice into the *varying* vector}."""
        slices: Dict[str, slice] = {}
        for like in self.likes:
            before = space.num_varying
            for p in like.nuisance:
                if p.name not in space:
                    space.add(p)
            after = space.num_varying
            slices[like.name] = slice(before, after)
        return slices

    def total_log_like(self, theory, varying: jnp.ndarray,
                       slices: Dict[str, slice]) -> jnp.ndarray:
        """Sum of chi^2/2 over all likelihoods (traced)."""
        total = jnp.zeros((), varying.dtype)
        per_like = []
        for like in self.likes:
            sl = slices[like.name]
            val = like.log_like(theory, varying[sl])
            per_like.append(val)
            total = total + val
        return total, jnp.stack(per_like) if per_like else jnp.zeros((0,), varying.dtype)


def read_dataset_ini(path: str) -> IniFile:
    """Load a `.dataset` file; relative file keys resolve against its dir
    (reference: likelihood.f90:37-66 ReadDatasetFile)."""
    ini = IniFile(path)
    import os
    ini.search_dirs.append(os.path.dirname(os.path.abspath(path)))
    return ini
