"""Finer axon-TPU fault bisection for the LOS transfer stage.

Separates AOT compile from execution, and sweeps sizes. Each case prints
compile_s / run_s or the failure mode.
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
from cosmomc_tpu.models.cls import compute_cl_transfers
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

def log(m):
    print(m, file=sys.stderr, flush=True)

f = jnp.float32
bg = BackgroundParams(
    ombh2=f(0.02238), omch2=f(0.1201), H0=f(67.32), omk=f(0.0),
    omnuh2=f(mnu_to_omnuh2(0.06)), nnu=f(3.046), w=f(-1.0), wa=f(0.0),
    tcmb=f(2.7255), num_massive_nu=1)
yhe, tau_re = f(0.2454), f(0.0543)
log(f"device={jax.devices()[0]}")

CASES = [
    # (name, nstep, lmax, kmax)
    ("l300_full", 8192, 300, 0.5),
    ("l1000_full", 8192, 1000, 0.5),
    ("l2658_n2048", 2048, 2658, 0.5),
    ("l2658_full", 8192, 2658, 0.5),
]
only = os.environ.get("PROBE_ONLY")
if only:
    CASES = [c for c in CASES if c[0] in only.split(",")]

for name, nstep, lmax, kmax in CASES:
    k = jnp.asarray(source_k_grid(kmax=kmax), f)
    try:
        t0 = time.time()
        tf, tau0 = jax.jit(lambda: build_thermo_funcs(bg, yhe, tau_re,
                                                      n_step=nstep))()
        po = jax.block_until_ready(
            jax.jit(lambda: evolve_perturbations(bg, tf, tau0, k))())
        log(f"{name}: pert done {time.time()-t0:.1f}s")
        ipk = jnp.argmax(tf.vis)
        chi_star = tau0 - tf.tau[ipk]
        fn = lambda: compute_cl_transfers(po, chi_star, lmax=lmax,
                                          kmax_hint=kmax)
        t0 = time.time()
        lowered = jax.jit(fn).lower()
        log(f"{name}: lowered {time.time()-t0:.1f}s")
        t0 = time.time()
        compiled = lowered.compile()
        log(f"{name}: compiled {time.time()-t0:.1f}s "
            f"(mem: {compiled.memory_analysis().temp_size_in_bytes/1e6:.0f}MB temp)")
        t0 = time.time()
        out = jax.block_until_ready(compiled())
        log(f"{name}: ran {time.time()-t0:.2f}s dT[0,0]={float(out.dT[0,0]):.3e}")
        t0 = time.time()
        out = jax.block_until_ready(compiled())
        log(f"{name}: warm {time.time()-t0:.2f}s")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
log("sweep done")
