"""2D-tiled sharded multisplitting: mesh ``('block', 'ir', 'ic')``.

The reference (and ``parallel.sharded``) split the grid along ROWS only —
fine at small scale, but strips get thin as devices grow and halo traffic
scales with the full grid width.  This driver tiles each Jacobi block's
strip in BOTH grid directions, matching TPU slices' physical 2D torus:

* ``'block'`` — Jacobi blocks (row bands, as always);
* ``'ir'``    — row tiles within a block;
* ``'ic'``    — column tiles (shared by all blocks).

Halo pattern for the 5-point stencil (no corners needed):
  N/S rows: ppermute over 'ir' inside a block; the block-boundary rows
  ride the wrap + 'block'-shift two-step (see ``parallel.sharded``);
  W/E cols: ppermute over 'ic' (no cross-block component — blocks split
  rows only, exactly the reference's decomposition).

Surface-to-volume: a P-device 1-D split moves ``2 n`` points per device
per sweep; a (P_r x P_c) tiling moves ``2 (rows_loc + cols_loc)`` —
asymptotically ``sqrt`` of the 1-D cost at equal device counts.

2D grids only (the reference's primary benchmark family); the 3D
x-plane split composes with this by tiling (ny, nz) the same way.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from medane_tchakorom_ufc_thesis_repository_tpu.solvers import krylov
from medane_tchakorom_ufc_thesis_repository_tpu.models.multisplitting import (
    InnerConfig,
    MultisplitResult,
    OuterConfig,
)


def make_tiled_mesh(nblocks: int = 2, ir: int = 2, ic: int = 2,
                    devices=None) -> Mesh:
    devices = list(jax.devices() if devices is None else devices)
    need = nblocks * ir * ic
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(nblocks, ir, ic)
    return Mesh(grid, ("block", "ir", "ic"))


def tiled_multisplit_solve(
    mesh: Mesh,
    m: int,
    n: int,
    b: jax.Array,
    *,
    diag: float = 4.0,
    off: float = -1.0,
    schedule: str = "sync",
    staleness: Union[int, Sequence[int]] = 1,
    minimization: Optional[str] = None,
    s: int = 4,
    inner: InnerConfig = InnerConfig(),
    outer: OuterConfig = OuterConfig(),
    rtol: float = 1e-3,
    atol: float = 1e-100,
    maxiter: int = 10000,
    min_convergence_count: int = 4,
) -> MultisplitResult:
    """2D Poisson multisplitting over a ``('block','ir','ic')`` mesh.

    ``b`` is the global RHS in grid shape ``(m, n)``.  Semantics match
    ``models.multisplitting.multisplit_solve`` / ``parallel.sharded``.
    """
    if schedule not in ("sync", "async"):
        raise ValueError(f"unknown schedule {schedule!r}")
    if minimization not in (None, "local", "semi_local", "global"):
        raise ValueError(f"unknown minimization {minimization!r}")
    is_async = schedule == "async"
    if minimization is None:
        s = 1

    nb = mesh.shape["block"]
    pr = mesh.shape["ir"]
    pc = mesh.shape["ic"]
    if m % (nb * pr) or n % pc:
        raise ValueError(
            f"grid {m}x{n} not divisible by ({nb}*{pr}) x {pc} tiles"
        )
    rows_loc = m // (nb * pr)
    cols_loc = n // pc
    lshape = (rows_loc, cols_loc)
    lsize = rows_loc * cols_loc
    dtype = b.dtype
    if tuple(b.shape) != (m, n):
        raise ValueError(f"b must be ({m}, {n}), got {b.shape}")

    stal_host = np.broadcast_to(np.asarray(staleness, np.int32), (nb,)).copy()
    if not is_async and not np.all(stal_host == 1):
        raise ValueError("sync schedule requires staleness == 1")
    stal = jnp.asarray(stal_host)

    r_up = [(i, i + 1) for i in range(pr - 1)]
    r_dn = [(i, i - 1) for i in range(1, pr)]
    c_up = [(i, i + 1) for i in range(pc - 1)]
    c_dn = [(i, i - 1) for i in range(1, pc)]
    blk_up = [(k, k + 1) for k in range(nb - 1)]
    blk_dn = [(k, k - 1) for k in range(1, nb)]

    def interior(g):
        p = jnp.pad(g, ((0, 0),) * (g.ndim - 2) + ((1, 1), (1, 1)))
        sl = (slice(None),) * (g.ndim - 2)
        c, lo, hi = slice(1, -1), slice(0, -2), slice(2, None)
        return diag * g + off * (
            p[sl + (lo, c)] + p[sl + (hi, c)]
            + p[sl + (c, lo)] + p[sl + (c, hi)]
        )

    def intra_halos(g):
        """N/S/W/E halos from same-block neighbors (zeros at block/grid
        edges).  Works on stacked ``(s, rows, cols)`` too."""
        north = lax.ppermute(g[..., -1, :], "ir", r_up)
        south = lax.ppermute(g[..., 0, :], "ir", r_dn)
        west = lax.ppermute(g[..., :, -1], "ic", c_up)
        east = lax.ppermute(g[..., :, 0], "ic", c_dn)
        return north, south, west, east

    def cross_block_halos(g):
        """Block-boundary rows from the neighboring blocks (same 'ic'
        column range — column tiling is aligned across blocks)."""
        wrap_n = lax.ppermute(g[..., -1, :], "ir", [(pr - 1, 0)])
        north = lax.ppermute(wrap_n, "block", blk_up)
        wrap_s = lax.ppermute(g[..., 0, :], "ir", [(0, pr - 1)])
        south = lax.ppermute(wrap_s, "block", blk_dn)
        return north, south

    def diag_mv(g):
        nh, sh, wh, eh = intra_halos(g)
        y = interior(g)
        y = y.at[..., 0, :].add(off * nh)
        y = y.at[..., -1, :].add(off * sh)
        y = y.at[..., :, 0].add(off * wh)
        y = y.at[..., :, -1].add(off * eh)
        return y

    def coupling_mv(g_vis):
        nh, sh = cross_block_halos(g_vis)
        c = jnp.zeros_like(g_vis)
        c = c.at[..., 0, :].add(off * nh)
        c = c.at[..., -1, :].add(off * sh)
        return c

    def inner_solve(rhs, x):
        return krylov.gmres(
            lambda v: diag_mv(v.reshape(lshape)).reshape(-1),
            rhs.reshape(-1), x.reshape(-1),
            restart=inner.restart, maxiter=inner.maxiter,
            rtol=inner.rtol, atol=inner.atol, orthog=inner.orthog,
            axis_name=("ir", "ic"), fixed_cycles=True,
        )

    def solve_gram(G, c):
        eps = jnp.finfo(dtype).eps
        jitter = eps * jnp.trace(G) / G.shape[0] + outer.damping
        G = G + jitter * jnp.eye(G.shape[0], dtype=dtype)
        ch, low = jax.scipy.linalg.cho_factor(G, lower=True)
        return jax.scipy.linalg.cho_solve((ch, low), c)

    all_axes = ("block", "ir", "ic")
    intra_axes = ("ir", "ic")

    def body(b_loc):
        rnorm0 = jnp.sqrt(lax.psum(jnp.sum(b_loc * b_loc), all_axes))
        tol_global = jnp.maximum(rtol * rnorm0, atol)
        tol_local = jnp.maximum(
            rtol / jnp.sqrt(jnp.asarray(float(nb), dtype)) * rnorm0, atol
        )
        my_stal = stal[lax.axis_index("block")]

        x0 = jnp.zeros(lshape, dtype)
        rhs0 = b_loc - coupling_mv(x0)

        def publish(x, x_vis, sweeps):
            return jnp.where((sweeps % my_stal) == 0, x, x_vis)

        def sweep_body(i, carry):
            x, x_vis, rhs, sweeps, inner_total, S, pub = carry
            res = inner_solve(rhs, x)
            x = res.x.reshape(lshape)
            inner_total = inner_total + lax.psum(res.iters, "block").astype(
                jnp.int32
            )
            sweeps = sweeps + 1
            pub = jnp.logical_or(pub, (sweeps % my_stal) == 0)
            x_vis = publish(x, x_vis, sweeps)
            rhs = b_loc - coupling_mv(x_vis)
            S = S.at[i].set(x)
            return (x, x_vis, rhs, sweeps, inner_total, S, pub)

        def minimize(S, x, x_vis, rhs, sweeps):
            if minimization == "local":
                Rcols = diag_mv(S)
                target = rhs
                axes = intra_axes
            else:
                Rcols = diag_mv(S) + coupling_mv(S)
                target = b_loc
                axes = intra_axes if minimization == "semi_local" else all_axes
            Rmat = Rcols.reshape(s, lsize).T
            tgt = target.reshape(-1)
            G = lax.psum(Rmat.T @ Rmat, axes)
            c = lax.psum(Rmat.T @ tgt, axes)
            alpha = solve_gram(G, c)
            out_sq = lax.psum(jnp.sum((tgt - Rmat @ alpha) ** 2), axes)
            outer_rnorm = jnp.sqrt(out_sq)
            x_new = (S.reshape(s, lsize).T @ alpha).reshape(lshape)
            x_vis = publish(x_new, x_vis, sweeps)
            rhs = b_loc - coupling_mv(x_vis)
            return x_new, x_vis, rhs, outer_rnorm

        def cycle(carry):
            (x, x_vis, rhs, sweeps, cycles, inner_total,
             conv_count, rnorm, outer_rnorm, converged) = carry
            S0 = jnp.zeros((s,) + lshape, dtype)
            pub0 = jnp.zeros((), bool)
            x, x_vis, rhs, sweeps, inner_total, S, pub = lax.fori_loop(
                0, s, sweep_body,
                (x, x_vis, rhs, sweeps, inner_total, S0, pub0),
            )
            if minimization is not None:
                x, x_vis, rhs, outer_rnorm = minimize(S, x, x_vis, rhs, sweeps)

            local_r = rhs - diag_mv(x)
            block_sq = lax.psum(jnp.sum(local_r * local_r), intra_axes)
            block_norm = jnp.sqrt(block_sq)
            rnorm = jnp.sqrt(lax.psum(block_sq, "block"))
            cycles = cycles + 1

            if is_async:
                under = block_norm <= tol_local
                all_pub = lax.psum(pub.astype(jnp.int32), "block") == nb
                conv_count = jnp.where(
                    ~under, 0,
                    jnp.where(all_pub, conv_count + 1, conv_count),
                )
                ok = (conv_count >= min_convergence_count).astype(jnp.int32)
                converged = lax.psum(ok, "block") == nb
            elif minimization == "global":
                converged = outer_rnorm <= tol_global
            elif minimization is not None:
                ok = (block_norm <= tol_local).astype(jnp.int32)
                converged = lax.psum(ok, "block") == nb
            else:
                converged = rnorm <= tol_global

            return (x, x_vis, rhs, sweeps, cycles, inner_total,
                    conv_count, rnorm, outer_rnorm, converged)

        def cond(carry):
            return jnp.logical_and(~carry[-1], carry[3] < maxiter)

        init = (
            x0, x0, rhs0,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            rnorm0, jnp.asarray(jnp.inf, dtype),
            rnorm0 <= tol_global,
        )
        (x, _, rhs, sweeps, cycles, inner_total, _, rnorm, outer_rnorm,
         converged) = lax.while_loop(cond, cycle, init)

        local_r = rhs - diag_mv(x)
        block_norm = jnp.sqrt(
            lax.psum(jnp.sum(local_r * local_r), intra_axes)
        ).reshape(1, 1, 1)
        return (x, sweeps, cycles, inner_total, rnorm, rnorm0, block_norm,
                outer_rnorm, converged)

    shard_spec = P(("block", "ir"), "ic")
    scalar = P()
    run = shard_map(
        body, mesh=mesh,
        in_specs=(shard_spec,),
        out_specs=(shard_spec, scalar, scalar, scalar, scalar, scalar,
                   P("block", None, None), scalar, scalar),
        check_rep=False,
    )
    b_sh = jax.device_put(b, NamedSharding(mesh, shard_spec))
    (x, sweeps, cycles, inner_total, rnorm, rnorm0, block_norms, outer_rnorm,
     converged) = run(b_sh)
    return MultisplitResult(
        x=x, sweeps=sweeps, cycles=cycles, inner_iters=inner_total,
        rnorm=rnorm, rnorm0=rnorm0,
        local_rnorms=block_norms.reshape(-1)[:nb],
        outer_rnorm=outer_rnorm, converged=converged,
    )
