"""Bisect INSIDE compute_cl_transfers on the axon TPU: run cumulative
sub-computations of the LOS integral with real pert output at lmax=300.
PROBE_PART selects the deepest part to run (1..6)."""
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
from cosmomc_tpu.models.bessel import build_bessel_table, default_l_samples
from cosmomc_tpu.models.cls import fine_k_grid
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

def log(m):
    print(m, file=sys.stderr, flush=True)

PART = int(os.environ.get("PROBE_PART", 6))
LMAX, KMAX = 300, 0.5
f = jnp.float32
bg = BackgroundParams(
    ombh2=f(0.02238), omch2=f(0.1201), H0=f(67.32), omk=f(0.0),
    omnuh2=f(mnu_to_omnuh2(0.06)), nnu=f(3.046), w=f(-1.0), wa=f(0.0),
    tcmb=f(2.7255), num_massive_nu=1)
yhe, tau_re = f(0.2454), f(0.0543)
k = jnp.asarray(source_k_grid(kmax=KMAX), f)
log(f"device={jax.devices()[0]} part={PART}")

t0 = time.time()
tf, tau0 = jax.jit(lambda: build_thermo_funcs(bg, yhe, tau_re))()
po = jax.block_until_ready(jax.jit(lambda: evolve_perturbations(bg, tf, tau0, k))())
chi_star = tau0 - tf.tau[jnp.argmax(tf.vis)]
log(f"pert done {time.time()-t0:.1f}s")

dtype = jnp.float32
ls = default_l_samples(LMAX)
nl = len(ls)
kf_np = fine_k_grid(14200.0, KMAX, 4.0)
nkf = len(kf_np)
k_chunk, l_batch = 256, 4
npad_k = (-nkf) % k_chunk
kf_pad = np.concatenate([kf_np, np.full(npad_k, kf_np[-1])])
n_chunks = len(kf_pad) // k_chunk
npad_l = (-nl) % l_batch
ls_pad = np.concatenate([ls, np.full(npad_l, ls[-1])]).astype(int)
n_lb = len(ls_pad) // l_batch
tab = build_bessel_table(tuple(int(l) for l in ls_pad), KMAX * 14200.0 * 1.02 + 10)
log(f"tables: nl={nl} nkf={nkf} chunks={n_chunks} lb={n_lb} nx={tab.jl.shape[1]}")

grid = source_k_grid(kmax=KMAX)
lgn = np.log(grid)
t_np = np.interp(np.log(kf_pad), lgn, np.arange(len(grid)))
idx_np = np.clip(t_np.astype(np.int64), 0, len(grid) - 2)
frac_np = t_np - idx_np
k_idx = jnp.asarray(idx_np.reshape(n_chunks, k_chunk))
k_frac = jnp.asarray(frac_np.reshape(n_chunks, k_chunk), dtype)
kc_all = jnp.asarray(kf_pad.reshape(n_chunks, k_chunk), dtype)
jl_tab = jnp.asarray(tab.jl, dtype)
jlp_tab = jnp.asarray(tab.jlp, dtype)
inv_dx = jnp.asarray(1.0 / tab.dx, dtype)
ls_f = jnp.asarray(tab.ls).astype(dtype)

def build(part):
    def fn(po, chi_star):
        taus = po.tau
        tau0 = po.tau0
        dt = jnp.diff(taus)
        wt = jnp.concatenate([dt[:1]/2, (dt[1:]+dt[:-1])/2, dt[-1:]/2])
        chi = jnp.maximum(tau0 - taus, 1e-6)
        lens_w = jnp.where(chi < chi_star, (chi_star-chi)/(chi_star*chi), 0.0)

        def do_chunk(args):
            kc, kidx, kfrac = args
            def k_interp(S):
                lo = S[kidx]; hi = S[kidx+1]
                return lo + (hi-lo)*kfrac[:, None]
            S0w = k_interp(po.s0) * wt
            if part == 1:
                return jnp.sum(S0w, axis=1), 0.0, 0.0
            S1w = k_interp(po.s1) * wt
            S2w = k_interp(po.s2) * wt
            SLw = k_interp(po.slens) * (wt*lens_w)
            x = kc[:, None]*(tau0-taus)[None, :]
            t = x*inv_dx
            i = jnp.clip(t.astype(jnp.int32), 0, jl_tab.shape[1]-2)
            fr = t - i.astype(dtype)
            xs = jnp.maximum(x, 1e-8)
            inv_xs = 1.0/xs
            inv_xs2 = inv_xs*inv_xs
            if part == 2:
                return (jnp.sum(S0w+S1w+S2w+SLw, axis=1) +
                        jnp.sum(fr, axis=1) + i.astype(dtype).sum(axis=1),
                        0.0, 0.0)

            def one_l(il):
                l = ls_f[il]
                jl = jl_tab[il, i]*(1-fr) + jl_tab[il, i+1]*fr
                if part == 3:
                    return jnp.sum(S0w*jl, axis=1), jnp.zeros(kc.shape), jnp.zeros(kc.shape)
                jp = jlp_tab[il, i]*(1-fr) + jlp_tab[il, i+1]*fr
                jpp = -2.0*jp*inv_xs + (l*(l+1)*inv_xs2 - 1.0)*jl
                dT = jnp.sum(S0w*jl + S1w*jp + S2w*jpp, axis=1)
                efac = jnp.sqrt(jnp.maximum((l+2)*(l+1)*l*(l-1), 0.0))
                dE = efac*jnp.sum(S2w*jl*inv_xs2, axis=1)
                dP = jnp.sum(SLw*jl, axis=1)
                return dT, dE, dP

            if part <= 4:
                # only first l-batch
                return tuple(a[0] for a in jax.vmap(one_l)(jnp.arange(l_batch)))
            out = jax.lax.map(lambda ib: jax.vmap(one_l)(
                jax.lax.dynamic_slice(jnp.arange(len(ls_pad)), (ib*l_batch,),
                                      (l_batch,))), jnp.arange(n_lb))
            return tuple(o.reshape(-1, kc.shape[0]).sum(axis=0) for o in out)

        if part < 6:
            return do_chunk((kc_all[0], k_idx[0], k_frac[0]))
        return jax.lax.map(do_chunk, (kc_all, k_idx, k_frac))
    return fn

for p in range(1, PART + 1):
    t0 = time.time()
    try:
        out = jax.block_until_ready(jax.jit(build(p))(po, chi_star))
        log(f"part {p}: OK {time.time()-t0:.1f}s")
    except Exception as e:
        log(f"part {p}: FAILED {time.time()-t0:.1f}s {type(e).__name__}: {str(e)[:140]}")
        break
log("done")
