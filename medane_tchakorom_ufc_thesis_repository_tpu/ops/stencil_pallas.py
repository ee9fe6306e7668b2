"""Pallas TPU kernels: row-tiled 2D/3D Poisson stencil SpMV.

Design: grid over row tiles; each program DMAs its ``(TILE_M + 2, n)``
window (tile + one halo row each side) from HBM into VMEM scratch, then
computes the 5/7-point stencil as VPU shifted adds and writes the
``(TILE_M, n)`` output tile.  Boundary programs zero the missing halo.

This is the hand-scheduled version of what XLA emits for the matrix-free
``Stencil2D.mv``; it exists to (a) pin the speed-of-light reference for
the stencil path, (b) serve as the template for fused stencil+reduction
kernels (residual norm fused into the SpMV pass).

Status: validated in interpreter mode (exact vs the XLA path).  The
current TPU-tunnel environment cannot compile Pallas (its remote AOT
compile helper fails libtpu init), so the production SpMV path is the
XLA pad+slice formulation in ``core.operators`` (measured 163 Gnnz/s on
v5e vs 31 for the naive form); these kernels are the starting point for
real-chip runs where Mosaic is available.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel2d(x_hbm, out_ref, scratch, sems, *, tile_m, n, diag, off):
    i = pl.program_id(0)
    nprog = pl.num_programs(0)

    body = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_m, tile_m), :],
        scratch.at[pl.ds(1, tile_m), :],
        sems.at[0],
    )
    body.start()

    @pl.when(i > 0)
    def _():
        top = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tile_m - 1, 1), :],
            scratch.at[pl.ds(0, 1), :],
            sems.at[1],
        )
        top.start()
        top.wait()

    @pl.when(i == 0)
    def _():
        scratch[0, :] = jnp.zeros((n,), scratch.dtype)

    @pl.when(i < nprog - 1)
    def _():
        bot = pltpu.make_async_copy(
            x_hbm.at[pl.ds((i + 1) * tile_m, 1), :],
            scratch.at[pl.ds(tile_m + 1, 1), :],
            sems.at[2],
        )
        bot.start()
        bot.wait()

    @pl.when(i == nprog - 1)
    def _():
        scratch[tile_m + 1, :] = jnp.zeros((n,), scratch.dtype)

    body.wait()

    c = scratch[1:tile_m + 1, :]
    # column shifts via pad+slice (in-kernel .at[].add would lower to an
    # unsupported scatter-add on the TPU backend)
    cp = jnp.pad(c, ((0, 0), (1, 1)))
    y = diag * c + off * (
        scratch[0:tile_m, :]        # north
        + scratch[2:tile_m + 2, :]  # south
        + cp[:, :-2]                # west
        + cp[:, 2:]                 # east
    )
    out_ref[:, :] = y


@partial(jax.jit, static_argnames=("m", "n", "diag", "off", "tile_m"))
def stencil2d_mv_pallas(
    x: jax.Array, *, m: int, n: int,
    diag: float = 4.0, off: float = -1.0, tile_m: int = 256,
) -> jax.Array:
    """y = A @ x for the 2D 5-point Poisson operator, ``x`` flat (m*n,)."""
    tile_m = min(tile_m, m)
    while m % tile_m:
        tile_m //= 2
    grid = m // tile_m
    xg = x.reshape(m, n)
    out = pl.pallas_call(
        partial(_kernel2d, tile_m=tile_m, n=n, diag=diag, off=off),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_m + 2, n), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(xg)
    return out.reshape(-1)


def _kernel3d(x_hbm, out_ref, scratch, sems, *, tile_m, ny, nz, diag, off):
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    f = ny * nz

    body = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile_m, tile_m), :],
        scratch.at[pl.ds(1, tile_m), :],
        sems.at[0],
    )
    body.start()

    @pl.when(i > 0)
    def _():
        top = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tile_m - 1, 1), :],
            scratch.at[pl.ds(0, 1), :],
            sems.at[1],
        )
        top.start()
        top.wait()

    @pl.when(i == 0)
    def _():
        scratch[0, :] = jnp.zeros((f,), scratch.dtype)

    @pl.when(i < nprog - 1)
    def _():
        bot = pltpu.make_async_copy(
            x_hbm.at[pl.ds((i + 1) * tile_m, 1), :],
            scratch.at[pl.ds(tile_m + 1, 1), :],
            sems.at[2],
        )
        bot.start()
        bot.wait()

    @pl.when(i == nprog - 1)
    def _():
        scratch[tile_m + 1, :] = jnp.zeros((f,), scratch.dtype)

    body.wait()

    # x-axis neighbors via the halo'd plane stack; y/z via in-plane
    # pad+slice shifts (no scatter-add in-kernel)
    c = scratch[1:tile_m + 1, :].reshape(tile_m, ny, nz)
    cp = jnp.pad(c, ((0, 0), (1, 1), (1, 1)))
    y = diag * c + off * (
        scratch[0:tile_m, :].reshape(tile_m, ny, nz)
        + scratch[2:tile_m + 2, :].reshape(tile_m, ny, nz)
        + cp[:, :-2, 1:-1] + cp[:, 2:, 1:-1]
        + cp[:, 1:-1, :-2] + cp[:, 1:-1, 2:]
    )
    out_ref[:, :] = y.reshape(tile_m, f)


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "diag", "off", "tile_m"))
def stencil3d_mv_pallas(
    x: jax.Array, *, nx: int, ny: int, nz: int,
    diag: float = 6.0, off: float = -1.0, tile_m: int = 32,
) -> jax.Array:
    """y = A @ x for the 3D 7-point Poisson operator, ``x`` flat."""
    tile_m = min(tile_m, nx)
    while nx % tile_m:
        tile_m //= 2
    grid = nx // tile_m
    f = ny * nz
    xg = x.reshape(nx, f)
    out = pl.pallas_call(
        partial(_kernel3d, tile_m=tile_m, ny=ny, nz=nz, diag=diag, off=off),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile_m, f), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nx, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_m + 2, f), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(xg)
    return out.reshape(-1)
