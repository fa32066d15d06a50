#!/usr/bin/env python3
"""Measure the TPU slow-stage split: Boltzmann ODE evolve vs LOS recurrence,
vmapped over chains, f32 — to target perf work. Run on the axon TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/cosmomc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from cosmomc_tpu.models.background import BackgroundParams
from cosmomc_tpu.models.cmb import source_k_grid
from cosmomc_tpu.models.perturbations import build_thermo_funcs, evolve_perturbations
from cosmomc_tpu.models.cls import compute_cl_transfers_recurrence
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

def log(m):
    print(m, flush=True)

f = jnp.float32
NCH = int(os.environ.get("NCH", 8))
log(f"device={jax.devices()[0]} nchains={NCH}")

k_np = source_k_grid(kmax=0.45)
k = jnp.asarray(k_np, f)

def make_bg(ombh2):
    return BackgroundParams(
        ombh2=f(1.0) * ombh2, omch2=f(0.1201), H0=f(67.32), omk=f(0.0),
        omnuh2=f(mnu_to_omnuh2(0.06)), nnu=f(3.046), w=f(-1.0), wa=f(0.0),
        tcmb=f(2.7255), num_massive_nu=1)

def stage_evolve(ombh2):
    bg = make_bg(ombh2)
    tf, tau0 = build_thermo_funcs(bg, f(0.2454), f(0.0543))
    po = evolve_perturbations(bg, tf, tau0, k)
    ipk = jnp.argmax(tf.vis)
    chi = tau0 - tf.tau[ipk]
    return po, chi

def stage_los(po, chi):
    return compute_cl_transfers_recurrence(
        po, chi, lmax=2658, kmax_hint=0.45, coarse_k=k_np,
        tau_stride=int(os.environ.get("TSTRIDE", 1)))

x = jnp.full((NCH,), 0.02238, f) + 1e-5 * jnp.arange(NCH, dtype=f)

ev = jax.jit(jax.vmap(stage_evolve))
t0 = time.time(); po, chi = jax.block_until_ready(ev(x)); log(f"evolve compile+run {time.time()-t0:.1f}s")
t0 = time.time(); po, chi = jax.block_until_ready(ev(x + 1e-6)); log(f"evolve run {time.time()-t0:.2f}s")

los = jax.jit(jax.vmap(stage_los))
t0 = time.time(); clt = jax.block_until_ready(los(po, chi)); log(f"los compile+run {time.time()-t0:.1f}s")
t0 = time.time(); clt = jax.block_until_ready(los(po, chi)); log(f"los run {time.time()-t0:.2f}s")
log(f"dT[0,40,100] = {np.asarray(clt.dT)[0,40,100]:.4e}")
