"""Microbench isolated ops at LOS-integration shapes on the axon TPU.

Each case runs in this one process; a kernel fault kills the session, so
order matters (put suspects last) — or run with PROBE_OP=<name> one at a
time from the shell.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

def log(m):
    print(m, file=sys.stderr, flush=True)

log(f"device={jax.devices()[0]}")

NL, NX = 136, 147000
KC, NT = 256, 8192

key = jax.random.PRNGKey(0)
tab = jax.random.normal(key, (NL, NX), jnp.float32)
idx = jax.random.randint(key, (KC, NT), 0, NX - 2, jnp.int32)
src = jax.random.normal(key, (KC, NT), jnp.float32)

def timed(name, fn, *a):
    try:
        t0 = time.time()
        out = jax.block_until_ready(jax.jit(fn)(*a))
        t1 = time.time()
        out = jax.block_until_ready(jax.jit(fn)(*a))
        log(f"{name}: compile+run {t1-t0:.2f}s warm {time.time()-t1:.3f}s")
        return True
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return False

OP = os.environ.get("PROBE_OP", "all")

def want(n):
    return OP in ("all", n)

if want("elemwise"):
    timed("elemwise", lambda s: jnp.sum(s * s + 2.0 * s, axis=1), src)

if want("row_gather"):
    # gather one row then 1D-gather 2M indices from 147k
    timed("row_gather", lambda t, i: jnp.sum(t[3][i], axis=1), tab, idx)

if want("gather2d"):
    # the production pattern: leading traced row index + full index array
    def g(t, i):
        il = jnp.int32(3)
        return jnp.sum(t[il, i], axis=1)
    timed("gather2d", g, tab, idx)

if want("gather_vmap"):
    def g(t, i):
        ils = jnp.arange(4)
        return jax.vmap(lambda il: jnp.sum(t[il, i], axis=1))(ils)
    timed("gather_vmap", g, tab, idx)

if want("float_cast"):
    x = jax.random.uniform(key, (KC, NT), jnp.float32) * (NX - 2)
    timed("float_cast", lambda x: jnp.sum(x.astype(jnp.int32)), x)

if want("scan_gather"):
    def g(t, i):
        def body(c, j):
            return c + jnp.sum(t[j % NL, i], axis=1), 0
        c, _ = jax.lax.scan(body, jnp.zeros((KC,)), jnp.arange(18))
        return c
    timed("scan_gather", g, tab, idx)

log("ops sweep done")
