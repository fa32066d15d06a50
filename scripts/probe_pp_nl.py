#!/usr/bin/env python3
"""PP + lensed-TT accuracy through the PIPELINE (exercises nonlinear_lens).
CPU f64, stride per pipeline default."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
from cosmomc_tpu.likelihoods.base import LikelihoodList
from cosmomc_tpu.params.parameterizations import ThetaParameterization
from cosmomc_tpu.pipeline import CMBPosterior

F = jnp.float64
BF = dict(ombh2=0.02237737, omch2=0.1201035, theta=1.0409020,
          tau=0.05430138, logA=3.0447260, ns=0.9658923)
par = ThetaParameterization(F)
space = par.default_space()
likes = LikelihoodList()
nl = not os.environ.get("NO_NL")
post = CMBPosterior(par, space, likes, lmax=2508, nonlinear_lens=nl,
                    los_tau_stride=int(os.environ.get("TSTRIDE", 4)),
                    dtype=F)
for k, v in BF.items():
    post.space.get(k).center = v
P = jnp.asarray([p.center for p in post.space.varying], F)
slow = jax.jit(lambda p: post.stage_slow(post.embed_full(p)))(P)
semi = jax.jit(lambda p: post.stage_semi(post.embed_full(p), slow))(P)
C = np.asarray(semi["cls"])
ref = np.loadtxt("/root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl")
L = ref[:, 0].astype(int)
bands = [(2, 10), (10, 30), (30, 80), (80, 150), (150, 300), (300, 500),
         (500, 800), (800, 1200), (1200, 1700), (1700, 2200), (2200, 2500)]
print(f"nonlinear_lens={nl} stride={post.los_tau_stride}")
print("         " + "".join(f"{lo}-{hi:>5} " for lo, hi in bands))
for name, ours, refc in [("TT", C[0, 0, 2:], ref[:, 1]),
                         ("EE", C[1, 1, 2:], ref[:, 3]),
                         ("PP", C[3, 3, 2:], ref[:, 5])]:
    n = min(len(ours), len(refc))
    lv = L[:n]
    r = ours[:n] / refc[:n] - 1.0
    row = f"{name}  "
    for lo, hi in bands:
        m = (lv >= lo) & (lv < hi)
        row += f"{r[m].mean()*100:+7.2f} " if m.sum() else "      - "
    print(row)
