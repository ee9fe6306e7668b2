"""Weak-scaling harness: fixed per-device load, growing device count.

The north-star (BASELINE.json) asks for >=80% weak-scaling nnz/s
efficiency at N hosts vs 1.  Real multi-host slices are not available in
this environment, so the harness runs the SAME sharded program over
virtual device counts (``--xla_force_host_platform_device_count``) or a
real slice when one exists: per-device grid rows are fixed, the mesh
grows, and we time a fixed number of multisplitting sweeps.

Efficiency(N) = T(N_min) / T(N) for fixed per-device work (ideal = 1.0).

Usage::

    python -m medane_tchakorom_ufc_thesis_repository_tpu.utils.scaling \
        --rows-per-device 128 --n 512 --sweeps 20 --devices 2,4,8
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Dict, List

import numpy as np


def run_weak_scaling(
    rows_per_device: int = 128,
    n: int = 512,
    sweeps: int = 20,
    device_counts: List[int] = (2, 4, 8),
    inner_maxiter: int = 20,
    alg: str = "SM",
) -> List[Dict]:
    import jax
    import jax.numpy as jnp

    from medane_tchakorom_ufc_thesis_repository_tpu.models.multisplitting import (
        InnerConfig,
    )
    from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
        ShardedPoisson2D,
        ShardedPoisson3D,
        make_mesh,
        sharded_df_northstar,
        sharded_multisplit_solve,
    )

    def fence(arr):
        np.asarray(arr.ravel()[:1])

    records = []
    for nd in device_counts:
        if nd % 2:
            raise ValueError("device counts must be even (2 Jacobi blocks)")
        if nd > len(jax.devices()):
            print(f"[scaling] skipping {nd} devices (only "
                  f"{len(jax.devices())} available)")
            continue
        mesh = make_mesh(nblocks=2, intra=nd // 2)
        m = rows_per_device * nd

        if alg.upper() == "MGPCG":
            # weak-scale the north-star itself: fixed x-planes per device
            # on a 3D grid, full MG-PCG + df refinement to 1e-8.  MG
            # iteration counts are grid-independent, so time-to-1e-8 at
            # fixed per-device load is the honest weak-scaling metric.
            cfg3 = ShardedPoisson3D(m, n, n)

            res = sharded_df_northstar(mesh, cfg3, rtol=1e-8)  # compile
            t0 = time.perf_counter()
            res = sharded_df_northstar(mesh, cfg3, rtol=1e-8)
            fence(res.x[0])
            dt = time.perf_counter() - t0
            rec = {
                "devices": nd,
                "grid": f"{m}x{n}x{n}",
                "refine_passes": int(res.passes),
                "rel_residual": f"{res.rnorm / res.rnorm0:.2e}",
                "converged": bool(res.converged),
                "wall_s": round(dt, 4),
            }
            records.append(rec)
            print(f"[scaling] {json.dumps(rec)}")
            continue

        cfg = ShardedPoisson2D(m, n)
        # b = A @ ones via the canonical host-side operator
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.refine import (
            stencil2d_mv_np,
        )

        b = jnp.asarray(
            stencil2d_mv_np(m, n)(np.ones(m * n)).reshape(m, n), jnp.float32
        )

        def solve():
            return sharded_multisplit_solve(
                mesh, cfg, b, rtol=1e-30, maxiter=sweeps,
                inner=InnerConfig(maxiter=inner_maxiter, rtol=1e-10),
            )

        res = solve()          # compile + run
        fence(res.x)
        t0 = time.perf_counter()
        res = solve()
        fence(res.x)
        dt = time.perf_counter() - t0
        nnz = cfg.nnz
        # each inner GMRES iteration applies A_ii once (plus orthog):
        # count SpMV-equivalent work for a throughput figure
        spmv_equiv = int(res.inner_iters) * nnz
        rec = {
            "devices": nd,
            "grid": f"{m}x{n}",
            "sweeps": int(res.sweeps),
            "inner_iters": int(res.inner_iters),
            "wall_s": round(dt, 4),
            "spmv_equiv_nnz_per_s": round(spmv_equiv / dt / 1e9, 3),
        }
        records.append(rec)
        print(f"[scaling] {json.dumps(rec)}")

    if records:
        t_base = records[0]["wall_s"]
        for r in records:
            r["weak_efficiency"] = round(t_base / r["wall_s"], 3)
        print(f"[scaling] efficiencies: "
              f"{[(r['devices'], r['weak_efficiency']) for r in records]}")
    return records


def run_structural(
    rows_per_device: int = 128,
    n: int = 512,
    device_counts: List[int] = (2, 4, 8),
    inner_maxiter: int = 20,
    alg: str = "SM",
) -> List[Dict]:
    """STRUCTURAL weak-scaling evidence (no wall clock): lower the same
    sharded program at each mesh size with fixed per-device load and
    account the collectives in the compiled SPMD HLO (per-device
    shapes).  The >=80% north-star holds structurally when
    bytes-per-device stays flat as the mesh grows — virtual-CPU timing
    cannot show this (host contention dominates), hardware being absent
    this round.

    For SM (fixed-sweep multisplitting) counts and bytes/device are
    exactly mesh-size-independent.  For MGPCG the global grid grows
    with N, so the V/W-cycle gains one level per doubling: collective
    COUNT grows ~log(N) while bytes/device stay dominated by the finest
    level (halo planes decay geometrically down the hierarchy).
    """
    import jax
    import jax.numpy as jnp

    from medane_tchakorom_ufc_thesis_repository_tpu.models.multisplitting import (
        InnerConfig,
    )
    from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
        ShardedPoisson2D,
        ShardedPoisson3D,
        make_mesh,
        sharded_multisplit_solve,
    )
    from medane_tchakorom_ufc_thesis_repository_tpu.utils import hlostats

    records = []
    for nd in device_counts:
        if nd % 2:
            raise ValueError("device counts must be even (2 Jacobi blocks)")
        if nd > len(jax.devices()):
            print(f"[scaling] skipping {nd} devices (only "
                  f"{len(jax.devices())} available)")
            continue
        mesh = make_mesh(nblocks=2, intra=nd // 2)
        m = rows_per_device * nd

        if alg.upper() == "MGPCG":
            from medane_tchakorom_ufc_thesis_repository_tpu.parallel.mgpcg import (
                _northstar_fused_run,
            )

            cfg3 = ShardedPoisson3D(m, n, n)
            run = _northstar_fused_run(
                mesh, cfg3, 1e-8, 1e-5, 40, 6, 2, 4, 40, "w",
            )
            stats = hlostats.jitted_collective_stats(run)
            grid = f"{m}x{n}x{n}"
        else:
            cfg = ShardedPoisson2D(m, n)
            b = jax.ShapeDtypeStruct((m, n), jnp.float32)
            run = jax.jit(lambda bb, _mesh=mesh, _cfg=cfg: (
                sharded_multisplit_solve(
                    _mesh, _cfg, bb, rtol=1e-30, maxiter=20,
                    inner=InnerConfig(maxiter=inner_maxiter, rtol=1e-10),
                ).x
            ))
            stats = hlostats.jitted_collective_stats(run, b)
            grid = f"{m}x{n}"

        rec = {
            "devices": nd,
            "grid": grid,
            "collectives": stats,
            "total_count": hlostats.total_collective_count(stats),
            "bytes_per_device": hlostats.total_collective_bytes(stats),
        }
        records.append(rec)
        print(f"[scaling] {json.dumps(rec)}")

    if len(records) >= 2:
        base = records[0]["bytes_per_device"]
        for r in records:
            r["bytes_vs_smallest_mesh"] = round(
                r["bytes_per_device"] / max(base, 1), 3
            )
        print(f"[scaling] bytes/device vs smallest mesh: "
              f"{[(r['devices'], r['bytes_vs_smallest_mesh'])
                  for r in records]}")
    return records


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="scaling")
    p.add_argument("--rows-per-device", type=int, default=128)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--sweeps", type=int, default=20)
    p.add_argument("--devices", default="2,4,8")
    p.add_argument("--alg", default="SM",
                   help="SM (fixed sweeps) | MGPCG (north-star to 1e-8)")
    p.add_argument("--structural", action="store_true",
                   help="no wall clock: account collectives in the "
                        "compiled SPMD HLO at each mesh size")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    counts = [int(x) for x in args.devices.split(",")]
    if args.structural:
        recs = run_structural(
            args.rows_per_device, args.n, counts, alg=args.alg,
        )
    else:
        recs = run_weak_scaling(
            args.rows_per_device, args.n, args.sweeps, counts,
            alg=args.alg,
        )
    if args.out:
        with open(args.out, "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
