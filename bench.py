"""Benchmark entry point — run on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric (BASELINE.json): 3D Poisson 7-point SpMV throughput per
chip in nnz/s.  The reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is computed against an estimated PETSc MatMult rate on the
reference's laptop/Grid'5000 class hardware: a 7-point AIJ SpMV streams
~20 bytes/nnz and a 2-socket node sustains ~40 GB/s => ~2e9 nnz/s.  That
constant is recorded here so the comparison is reproducible.

Secondary metrics (same JSON object): time and sweeps for an SMSM_GLOBAL
multisplitting solve of 3D Poisson to 1e-6 relative residual (f32 floor
on TPU; the 1e-8 target of the north-star needs the f64-refinement path,
tracked in README), plus GMRES-baseline solve time on the same system.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

REFERENCE_SPMV_NNZ_PER_S = 2.0e9  # estimated PETSc MatMult on 2-socket CPU


def _fence(arr):
    """Force completion: device->host copy of one element.  On the
    experimental axon platform ``block_until_ready`` has been observed to
    return before execution finishes; a host readback cannot."""
    import numpy as np

    return float(np.asarray(arr.ravel()[:1])[0])


def _time_ondevice_chain(step, x, iters=200, warmup=1):
    """Time ``iters`` chained applications of ``step`` inside ONE jitted
    ``fori_loop`` — a single dispatch, so tunnel/dispatch latency (several
    ms per call on the axon tunnel) cannot pollute per-op timing, and the
    chain dependency defeats any result caching."""
    import jax
    from jax import lax

    @jax.jit
    def chain(v):
        return lax.fori_loop(0, iters, lambda i, s: step(s), v)

    for _ in range(warmup):
        _fence(chain(x))
    t0 = time.perf_counter()
    _fence(chain(x))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
    from medane_tchakorom_ufc_thesis_repository_tpu.models import (
        blockops,
        multisplitting as ms,
    )

    # --- primary: 3D Poisson stencil SpMV nnz/s per chip ----------------
    nx = ny = nz = 256
    op = poisson.poisson3d(nx, ny, nz)
    x = jnp.ones((nx * ny * nz,), jnp.float32)
    # scale by 1/8 each application (spectral radius < 8) so the chained
    # values stay bounded; the scalar multiply fuses into the stencil pass
    dt = _time_ondevice_chain(lambda v: op.mv(v) * jnp.float32(0.125), x)
    nnz_per_s = op.nnz / dt

    # --- secondary: SMSM_GLOBAL solve of 3D Poisson to 1e-5 -------------
    sop = blockops.block_poisson3d(64, 64, 64)
    b = blockops.rhs_ones(sop, jnp.float32)
    solve = jax.jit(
        lambda bb: ms.smsm(
            sop, bb, scope="global", s=4, rtol=1e-5, maxiter=400,
            inner=ms.InnerConfig(restart=30, maxiter=30, rtol=1e-8),
        )
    )
    res = solve(b)  # compile + run
    _fence(res.x)
    b2 = b * jnp.float32(1.0 + 1e-6)  # distinct input defeats result caching
    t0 = time.perf_counter()
    res = solve(b2)
    _fence(res.x)
    solve_s = time.perf_counter() - t0
    rel = float(
        jnp.linalg.norm(b.reshape(-1) - sop.global_mv(res.x.reshape(-1)))
        / res.rnorm0
    )

    # --- secondary: GMRES baseline on the same 3D system ----------------
    from medane_tchakorom_ufc_thesis_repository_tpu.solvers import gmres

    gop = poisson.poisson3d(64, 64, 64)
    gb = poisson.rhs_for_exact_ones(gop)
    gsolve = jax.jit(
        lambda bb: gmres(gop.mv, bb, restart=30, maxiter=3000, rtol=1e-6)
    )
    gres = gsolve(gb)
    _fence(gres.x)
    gb2 = gb * jnp.float32(1.0 + 1e-6)
    t0 = time.perf_counter()
    gres = gsolve(gb2)
    _fence(gres.x)
    gmres_s = time.perf_counter() - t0

    # --- north-star: 3D Poisson to 1e-8 relative residual --------------
    # (BASELINE.json: "wall-time + iters to 1e-8 residual on 3D Poisson")
    # f32 device solves + f64 host residuals via iterative refinement
    from medane_tchakorom_ufc_thesis_repository_tpu.solvers.refine import (
        iterative_refinement,
        stencil3d_mv_np,
    )
    import numpy as _np

    mv64 = stencil3d_mv_np(64, 64, 64)
    b64 = mv64(_np.ones(64 ** 3))
    refine_solve = jax.jit(
        lambda rr: gmres(gop.mv, rr, restart=30, maxiter=3000, rtol=1e-5).x
    )
    _ = refine_solve(jnp.asarray(b64 / _np.linalg.norm(b64), jnp.float32))
    _fence(_)
    t0 = time.perf_counter()
    rres = iterative_refinement(refine_solve, mv64, b64, rtol=1e-8)
    refine_s = time.perf_counter() - t0

    # measured CPU reference on this host: scipy CSR SpMV (the PETSc-AIJ
    # class of kernel the reference runs), single thread
    cpu_nnz_per_s = None
    try:
        import numpy as _np
        import scipy.sparse as _sp

        rows, cols, vals, shape = poisson.poisson3d_coo(128, 128, 128)
        A = _sp.csr_matrix((vals, (rows, cols)), shape=shape)
        xc = _np.ones(shape[0])
        xc = A @ xc
        t0 = time.perf_counter()
        for _ in range(10):
            xc = A @ xc * 0.125
        cpu_nnz_per_s = A.nnz / ((time.perf_counter() - t0) / 10)
    except Exception:
        pass

    print(json.dumps({
        "metric": "3d_poisson_spmv_throughput_per_chip",
        "value": round(nnz_per_s / 1e9, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnz_per_s / REFERENCE_SPMV_NNZ_PER_S, 2),
        "measured_cpu_csr_gnnz_per_s": (
            round(cpu_nnz_per_s / 1e9, 3) if cpu_nnz_per_s else None
        ),
        "vs_measured_cpu_core": (
            round(nnz_per_s / cpu_nnz_per_s, 1) if cpu_nnz_per_s else None
        ),
        "spmv_grid": f"{nx}x{ny}x{nz}",
        "spmv_ms": round(dt * 1e3, 4),
        "smsm_global_3d_64_solve_s": round(solve_s, 3),
        "smsm_global_3d_64_sweeps": int(res.sweeps),
        "smsm_global_3d_64_rel_residual": f"{rel:.2e}",
        "smsm_global_3d_64_converged": bool(res.converged),
        "gmres_3d_64_solve_s": round(gmres_s, 3),
        "gmres_3d_64_iters": int(gres.iters),
        "northstar_3d_64_to_1e8_s": round(refine_s, 3),
        "northstar_3d_64_rel_residual": f"{rres.rnorm / rres.rnorm0:.2e}",
        "northstar_3d_64_refine_passes": rres.passes,
        "northstar_3d_64_converged": bool(rres.converged),
    }))


if __name__ == "__main__":
    main()
