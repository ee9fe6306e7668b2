import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from medane_tchakorom_ufc_thesis_repository_tpu.ops import stencil_pallas as sp

def fence(a): return float(np.asarray(a.ravel()[:1])[0])
n = 512
rng = np.random.default_rng(0)
xb = jnp.asarray(rng.standard_normal((n,n,n))*0.01, jnp.bfloat16)
bb = jnp.asarray(rng.standard_normal((n,n,n))*0.01, jnp.bfloat16)
eb = jnp.asarray(rng.standard_normal((n//2,n//2,n//2))*0.01, jnp.bfloat16)

def slope(make, i1=20, i2=60):
    c1, c2 = make(i1), make(i2)
    fence(c1()); fence(c2())
    def best(c):
        ts=[]
        for _ in range(3):
            t0=time.perf_counter(); fence(c()); ts.append(time.perf_counter()-t0)
        return min(ts)
    return (best(c2)-best(c1))/(i2-i1)

import functools
for name, fn, tms in (
    ("jacobi", lambda tm: (lambda: None, ), None),
):
    pass

def chain_pj(iters, tm):
    @jax.jit
    def c():
        def body(i, s):
            x, b = s
            y = sp.stencil3d_prolong_jacobi_pallas(x, b, eb, nx=n, ny=n, nz=n, tile_m=tm, omega=0.1428)
            return lax.optimization_barrier((y, b))
        return lax.fori_loop(0, iters, body, (xb, bb))[0]
    return c

def chain_rr(iters, tm):
    @jax.jit
    def c():
        def body(i, s):
            x, b = s
            y = sp.stencil3d_residual_restrict_pallas(x, b, nx=n, ny=n, nz=n, tile_m=tm, scale=4.0)
            return lax.optimization_barrier((x + y[0,0,0]*jnp.bfloat16(1e-6), b))
        return lax.fori_loop(0, iters, body, (xb, bb))[0]
    return c

def chain_j(iters, tm):
    @jax.jit
    def c():
        def body(i, s):
            x, b = s
            y = sp.stencil3d_apply_pallas(x, b, nx=n, ny=n, nz=n, tile_m=tm, kind="jacobi", omega=0.1428)
            return lax.optimization_barrier((y, b))
        return lax.fori_loop(0, iters, body, (xb, bb))[0]
    return c

for name, mk in (("prolong_jacobi", chain_pj), ("jacobi", chain_j)):
    for tm in (8, 16):
        try:
            t = slope(lambda it, tm=tm, mk=mk: mk(it, tm))
            print(name, "tile_m", tm, round(t*1e3, 3), "ms")
        except Exception as e:
            print(name, "tile_m", tm, "FAIL", str(e)[:120])
