"""Smoke: staged CMB posterior (plik_lite forecast + BAO) on the live device.

Times: init compile, slow-step, semi-step, fast-step segment costs for the
StagedMetropolisSampler at bench-like settings. Run with JAX_PLATFORMS=cpu
to debug, default (axon TPU) for the real numbers.

Env: SMOKE_CHAINS (default 16), SMOKE_STEPS (default 8), SMOKE_DTYPE
(float32 default), SMOKE_LMAX (0 = posterior default).
"""
import os, sys, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cosmomc_tpu.likelihoods.base import LikelihoodList
from cosmomc_tpu.likelihoods.bao import BAOLikelihood
from cosmomc_tpu.likelihoods.forecast import write_plik_lite_fiducial
from cosmomc_tpu.likelihoods.pliklite import PlikLiteLikelihood
from cosmomc_tpu.params.parameterizations import ThetaParameterization
from cosmomc_tpu.pipeline import CMBPosterior
from cosmomc_tpu.sampling.staged import StagedMetropolisSampler

REF = os.environ.get("COSMOMC_DATA", "/root/reference/data")
THEORY_CL = f"{REF}/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl"

def log(m):
    print(m, file=sys.stderr, flush=True)

dtype = jnp.float64 if os.environ.get("SMOKE_DTYPE") == "float64" else jnp.float32
nchains = int(os.environ.get("SMOKE_CHAINS", 16))
nsteps = int(os.environ.get("SMOKE_STEPS", 8))

d = tempfile.mkdtemp(prefix="plikfid_")
ds = write_plik_lite_fiducial(d, THEORY_CL)
par = ThetaParameterization(dtype)
space = par.default_space()
space.get("tau").prior_mean = 0.0544
space.get("tau").prior_std = 0.0073
likes = LikelihoodList()
likes.add(PlikLiteLikelihood(ds, name="plik_lite_fid", dtype=dtype))
likes.add(BAOLikelihood(f"{REF}/DR12/sdss_DR12Consensus_bao.dataset", dtype=dtype))
kw = {}
if int(os.environ.get("SMOKE_LMAX", 0)):
    kw["lmax"] = int(os.environ["SMOKE_LMAX"])
post = CMBPosterior(par, space, likes, dtype=dtype, **kw)
log(f"device={jax.devices()[0]} dtype={dtype.__name__} nchains={nchains} lmax={post.lmax}")

prop = post.make_proposal(oversample_fast=4)
w = np.array([p.propose_width for p in post.space.varying])
prop.set_covariance(np.diag(w ** 2))
sampler = StagedMetropolisSampler(prop, post)

rng = np.random.default_rng(0)
P0 = post.start_positions(rng, nchains).astype(np.float32 if dtype == jnp.float32 else np.float64)

t0 = time.time()
state = sampler.init_state(jax.random.PRNGKey(0), jnp.asarray(P0))
jax.block_until_ready(state.mloglike)
log(f"init (compile+run) {time.time()-t0:.1f}s  mll[:4]={np.asarray(state.mloglike[:4])}")

# cache footprint
tot = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(state)
          if hasattr(x, 'size'))
log(f"state bytes = {tot/1e6:.1f} MB")

for trial in range(3):
    t0 = time.time()
    sched = prop.make_schedule(nsteps, rng)
    state, out = sampler.run_segment(state, sched)
    jax.block_until_ready(state.P)
    dt = time.time() - t0
    cls = sampler.block_class[np.asarray(sched.block)]
    n_slow = int((cls == 0).sum()); n_semi = int((cls == 1).sum())
    n_fast = int((cls == 2).sum())
    log(f"segment {trial}: {nsteps} steps ({n_slow} slow/{n_semi} semi/{n_fast} fast) "
        f"{dt:.2f}s  acc_mean={float(np.asarray(out.accept).mean()):.3f} "
        f"mll_mean={float(np.asarray(state.mloglike).mean()):.1f}")
log("OK")
