"""Bisect which CMB-pipeline stage faults on the axon TPU backend.

Runs each stage under jit with progressively larger shapes; prints timing
or the failure. Env: PROBE_NSTEP, PROBE_LMAX, PROBE_KMAX, PROBE_STAGE
(csv of stage names to run: thermo,pert,clt,semi,all).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.cmb import source_k_grid
from cosmomc_tpu.models.perturbations import build_thermo_funcs, evolve_perturbations
from cosmomc_tpu.models.cls import compute_cl_transfers, cls_from_cl_transfers
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

def log(m):
    print(m, file=sys.stderr, flush=True)

NSTEP = int(os.environ.get("PROBE_NSTEP", 8192))
LMAX = int(os.environ.get("PROBE_LMAX", 2658))
KMAX = float(os.environ.get("PROBE_KMAX", 0.5))
STAGES = os.environ.get("PROBE_STAGE", "thermo,pert,clt,semi").split(",")

f = jnp.float32
bg = BackgroundParams(
    ombh2=f(0.02238), omch2=f(0.1201), H0=f(67.32), omk=f(0.0),
    omnuh2=f(mnu_to_omnuh2(0.06)), nnu=f(3.046), w=f(-1.0), wa=f(0.0),
    tcmb=f(2.7255), num_massive_nu=1)
yhe, tau_re = f(0.2454), f(0.0543)
k = jnp.asarray(source_k_grid(kmax=KMAX), f)
log(f"device={jax.devices()[0]} nstep={NSTEP} lmax={LMAX} nk={k.shape[0]}")

def timed(name, fn, *a):
    t0 = time.time()
    try:
        out = jax.block_until_ready(jax.jit(fn)(*a))
        log(f"{name}: compile+run {time.time()-t0:.1f}s")
        t0 = time.time()
        out = jax.block_until_ready(jax.jit(fn)(*a))
        log(f"{name}: warm {time.time()-t0:.3f}s")
        return out
    except Exception as e:
        log(f"{name}: FAILED after {time.time()-t0:.1f}s: {type(e).__name__}: {e}")
        raise SystemExit(1)

if "thermo" in STAGES:
    tf, tau0 = timed("thermo", lambda: build_thermo_funcs(bg, yhe, tau_re, n_step=NSTEP))
else:
    tf, tau0 = jax.jit(lambda: build_thermo_funcs(bg, yhe, tau_re, n_step=NSTEP))()

if "pert" in STAGES:
    po = timed("pert", lambda: evolve_perturbations(bg, tf, tau0, k))
else:
    po = None

if "clt" in STAGES and po is not None:
    ipk = jnp.argmax(tf.vis)
    chi_star = tau0 - tf.tau[ipk]
    clt = timed("clt", lambda: compute_cl_transfers(po, chi_star, lmax=LMAX,
                                                    kmax_hint=KMAX))
    if "semi" in STAGES:
        pp = PrimordialParams.make(logA=3.0447, ns=0.9659, dtype=f)
        raw = timed("semi", lambda: cls_from_cl_transfers(clt, pp, lmax=LMAX))
log("probe OK")
