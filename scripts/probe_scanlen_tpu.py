"""Find the axon scan-length fault threshold for the LOS-style body.

Body ~ the production do_pair: 4 static-index source interps + 2 Bessel
gathers x l_batch + contractions. Sweeps scan length N; one fault kills the
session so run ascending and report the last good N.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

def log(m):
    print(m, file=sys.stderr, flush=True)

log(f"device={jax.devices()[0]}")

NL, NX = 56, 36264
KC, NT = 256, 8192
NKC = 248          # coarse k
L_BATCH = 4

key = jax.random.PRNGKey(0)
jl_tab = jax.random.normal(key, (NL, NX), jnp.float32)
jlp_tab = jax.random.normal(key, (NL, NX), jnp.float32)
S = [jax.random.normal(jax.random.PRNGKey(i), (NKC, NT), jnp.float32)
     for i in range(4)]
wt = jnp.ones((NT,), jnp.float32)
kidx = jax.random.randint(key, (KC,), 0, NKC - 2, jnp.int32)
kfrac = jax.random.uniform(key, (KC,), jnp.float32)
x = jax.random.uniform(key, (KC, NT), jnp.float32) * (NX - 2) * 0.125
inv_dx = jnp.float32(8.0)

def body(args):
    ci, ib = args
    def k_interp(Si):
        lo = Si[kidx]; hi = Si[kidx + 1]
        return lo + (hi - lo) * kfrac[:, None]
    S0w = k_interp(S[0]) * wt
    S1w = k_interp(S[1]) * wt
    S2w = k_interp(S[2]) * wt
    SLw = k_interp(S[3]) * wt
    t = x * inv_dx + ci * 0.0
    i = jnp.clip(t.astype(jnp.int32), 0, NX - 2)
    f = t - i.astype(jnp.float32)
    xs = jnp.maximum(x, 1e-8)
    inv_xs2 = 1.0 / (xs * xs)
    ils = (ib * L_BATCH + jnp.arange(L_BATCH)) % NL
    def one_l(il):
        l = il.astype(jnp.float32) + 2.0
        jl = jl_tab[il, i] * (1 - f) + jl_tab[il, i + 1] * f
        jp = jlp_tab[il, i] * (1 - f) + jlp_tab[il, i + 1] * f
        jpp = -2.0 * jp / xs + (l * (l + 1) * inv_xs2 - 1.0) * jl
        dT = jnp.sum(S0w * jl + S1w * jp + S2w * jpp, axis=1)
        dE = jnp.sum(S2w * jl * inv_xs2, axis=1)
        dP = jnp.sum(SLw * jl, axis=1)
        return dT, dE, dP
    return jax.vmap(one_l)(ils)

for n in [13, 26, 52, 104, 234]:
    ci = jnp.arange(n) % 18
    ib = jnp.arange(n) % 13
    t0 = time.time()
    try:
        out = jax.block_until_ready(
            jax.jit(lambda a: jax.lax.map(body, a))((ci, ib)))
        t1 = time.time()
        out = jax.block_until_ready(
            jax.jit(lambda a: jax.lax.map(body, a))((ci, ib)))
        log(f"N={n}: OK compile+run {t1-t0:.1f}s warm {time.time()-t1:.2f}s")
    except Exception as e:
        log(f"N={n}: FAILED {time.time()-t0:.1f}s {type(e).__name__}: {str(e)[:100]}")
        break
log("done")
