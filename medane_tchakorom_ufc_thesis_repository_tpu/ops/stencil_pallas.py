"""Pallas TPU kernels: row-tiled 2D/3D Poisson stencil SpMV.

Design: grid over row tiles; each tile's rows are DMA'd from HBM into a
two-slot VMEM window with the NEXT tile's copy issued before the
current tile's compute (manual double buffering — the input rides HBM
so the halo overlap can't use the automatic pipeline).

Mosaic alignment rules discovered on-chip (round 4) shape everything
here:

* DMA slices of an HBM array and vector slices of VMEM values must be
  8-row aligned (``Slice shape along dimension 0 must be aligned to
  tiling (8)``), so single-halo-row copies are illegal.  2D copies an
  8-row halo BLOCK on each side (3-6% extra read at tile 256-512); 3D
  views the grid as ``(nx*ny, nz)`` so one x-plane is ``ny`` aligned
  rows and the halo copies are exact (no overhead).
* ``jnp.pad``/concatenate on the lane dim don't lower (``result/input
  offset mismatch``); in-plane neighbor shifts are ``pltpu.roll``
  rotations with boundary masks instead.  Sublane (row) shifts are
  whole-window rolls followed by aligned slices.

This is the hand-scheduled version of what XLA emits for the
matrix-free ``Stencil2D/3D.mv`` (reference ``MatMult`` hotspot,
``/root/reference/tmp/function-calling-stack:1-60``); it exists for the
HBM-bound sizes where XLA's pad+slice/slab formulations pay extra
memory passes (512^3 measured ~10 passes whole-pad, 1.63x better
slab-routed — see BENCHMARKS.md).  Validated exactly against the XLA
path in interpreter mode AND on-chip (``tests/test_pallas.py``;
round-4 on-chip runs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8  # 2D halo block rows (Mosaic's sublane-tile DMA granularity)


def _slot(t):
    return lax.rem(jnp.asarray(t, jnp.int32), jnp.int32(2))


# ---------------------------------------------------------------------------
# Shared in-kernel pieces
# ---------------------------------------------------------------------------

def lane_shift_sum(c, n):
    """West+east neighbor sum of a ``(rows, n)`` plane via lane
    rotations with boundary masks (the Mosaic-compilable shift —
    ``pltpu.roll`` requires non-negative shifts, hence ``n - 1``)."""
    lanes = lax.broadcasted_iota(jnp.int32, c.shape, 1)
    west = jnp.where(lanes == 0, 0.0, pltpu.roll(c, 1, 1))
    east = jnp.where(lanes == n - 1, 0.0, pltpu.roll(c, n - 1, 1))
    return west + east


def window_copy(x_hbm, win, sems, t, tile_r, halo_r, nprog):
    """The 3-piece aligned copy of row-tile ``t`` (``tile_r`` rows at
    ``halo_r``-row granularity) into window slot ``t % 2``:

    * body rows ``[t*tile_r, (t+1)*tile_r)`` → ``win[halo_r:+tile_r]``
    * halo block above (last ``halo_r`` rows of the previous tile) →
      ``win[0:halo_r]`` (when ``t > 0``)
    * halo block below (first ``halo_r`` rows of the next tile) →
      ``win[halo_r+tile_r:]`` (when ``t < nprog-1``)

    Returns three CONSTRUCTOR thunks, not descriptors: callers build
    each descriptor inside the ``pl.when`` body that ``.start()``s or
    ``.wait()``s it, so edge tiles never trace a descriptor they don't
    use (an unused descriptor logs ``AsyncCopyDescriptor was not used``
    at trace time — it polluted every bench tail until round 5).  A DMA
    semaphore is decremented by the byte count of the copy that
    signalled it, so start/wait must construct identical shapes."""
    s = _slot(t)
    # pl.multiple_of: the offsets are all multiples of halo_r (>= 8) by
    # construction, but Mosaic's divisibility prover can't see through
    # the dynamic t — assert it
    def _al(idx):
        return pl.multiple_of(idx, halo_r)

    def body():
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(_al(t * tile_r), tile_r), :],
            win.at[s, pl.ds(halo_r, tile_r), :], sems.at[s, 0],
        )

    def top():
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(_al(t * tile_r - halo_r), halo_r), :],
            win.at[s, pl.ds(0, halo_r), :], sems.at[s, 1],
        )

    def bot():
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(_al((t + 1) * tile_r), halo_r), :],
            win.at[s, pl.ds(halo_r + tile_r, halo_r), :], sems.at[s, 2],
        )

    return body, top, bot


def issue_window(x_hbm, win, sems, t, tile_r, halo_r, nprog,
                 vmem_top: bool = False):
    """``vmem_top``: skip the top-halo HBM DMA — the caller sources it
    from the PREVIOUS window slot's last body rows (they are the same x
    rows, already resident).  Saves one halo plane of read traffic per
    tile AND removes the only read-after-write hazard of running the
    kernel IN-PLACE (``input_output_aliases``): the output write of
    tile ``t`` overlaps exactly the top halo of window ``t+1``."""
    body, top, bot = window_copy(x_hbm, win, sems, t, tile_r, halo_r, nprog)
    body().start()

    if not vmem_top:
        @pl.when(t > 0)
        def _():
            top().start()

    @pl.when(t < nprog - 1)
    def _():
        bot().start()


def wait_window(x_hbm, win, sems, t, tile_r, halo_r, nprog,
                vmem_top: bool = False):
    """Wait for ``issue_window(t)``'s copies; zero-fill the halo blocks
    edge tiles don't receive.  With ``vmem_top`` the top halo arrives by
    a VMEM copy issued by the PREVIOUS grid step (see ``issue_window``),
    so only body+bottom are waited."""
    s = _slot(t)
    body, top, bot = window_copy(x_hbm, win, sems, t, tile_r, halo_r, nprog)
    body().wait()

    if not vmem_top:
        @pl.when(t > 0)
        def _():
            top().wait()

    @pl.when(t == 0)
    def _():
        win[s, pl.ds(0, halo_r), :] = jnp.zeros(
            (halo_r, win.shape[2]), win.dtype)

    @pl.when(t < nprog - 1)
    def _():
        bot().wait()

    @pl.when(t == nprog - 1)
    def _():
        win[s, pl.ds(halo_r + tile_r, halo_r), :] = jnp.zeros(
            (halo_r, win.shape[2]), win.dtype)


def copy_top_from_prev(win, t, tile_r, halo_r, nprog):
    """VMEM-source window ``t+1``'s top halo: the last ``halo_r`` body
    rows of window ``t``'s slot ARE those x rows.  Must run at grid step
    ``t`` (slot ``t``'s body already waited; window ``t+2``'s DMA into
    that slot not yet issued)."""
    @pl.when(t + 1 < nprog)
    def _():
        s = _slot(t)
        sn = _slot(t + 1)
        win[sn, pl.ds(0, halo_r), :] = win[s, pl.ds(tile_r, halo_r), :]


def pipelined_window(x_hbm, win, sems, i, tile_r, halo_r, nprog):
    """Double-buffer schedule: after this, tile ``i``'s window (slot
    ``i % 2``) is ready and tile ``i+1``'s copy is in flight.  Callers
    read the window through the REF (plane-sized slices) — loading the
    whole window as one vector value spills the register allocator."""
    @pl.when(i == 0)
    def _():
        issue_window(x_hbm, win, sems, 0, tile_r, halo_r, nprog)

    @pl.when(i + 1 < nprog)
    def _():
        issue_window(x_hbm, win, sems, i + 1, tile_r, halo_r, nprog)

    wait_window(x_hbm, win, sems, i, tile_r, halo_r, nprog)


def window_scratch(nrows, f, dtype):
    """Two-slot window + DMA semaphores shared by every row-tiled
    stencil kernel (here and in ``fused_pallas``)."""
    return [
        pltpu.VMEM((2, nrows, f), dtype),
        pltpu.SemaphoreType.DMA((2, 3)),
    ]


def out_write_copy(o_hbm, obuf, osems, t, tile_r):
    """Descriptor for the output write of tile ``t``: VMEM slot
    ``t % 2`` → HBM rows ``[t*tile_r, (t+1)*tile_r)``."""
    s = _slot(t)
    return pltpu.make_async_copy(
        obuf.at[s],
        o_hbm.at[pl.ds(pl.multiple_of(t * tile_r, 8), tile_r), :],
        osems.at[s],
    )


def output_pipeline(o_hbm, obuf, osems, i, tile_r, nprog, fill):
    """Two-slot manual output write-back.

    Pallas' AUTOMATIC output pipeline moves blocks at ~215 GB/s on this
    chip while manual VMEM→HBM copies run at the ~690 GB/s streaming
    rate (round-4 measurement: an HBM→HBM copy kernel went 4.98 →
    1.5-1.7 ms at 512^3 from this change alone), so every stencil
    kernel writes its output through manual DMA: wait the write issued
    two steps ago (it used this slot), ``fill(slot)``, start this
    tile's write, and drain everything on the last step."""
    @pl.when(i >= 2)
    def _():
        out_write_copy(o_hbm, obuf, osems, i - 2, tile_r).wait()

    fill(_slot(i))
    out_write_copy(o_hbm, obuf, osems, i, tile_r).start()

    @pl.when(i == nprog - 1)
    def _():
        out_write_copy(o_hbm, obuf, osems, i, tile_r).wait()

    @pl.when((i == nprog - 1) & (i >= 1))
    def _():
        out_write_copy(o_hbm, obuf, osems, i - 1, tile_r).wait()


def output_scratch(tile_r, f, dtype):
    """Two-slot output buffer + write semaphores for
    ``output_pipeline``."""
    return [
        pltpu.VMEM((2, tile_r, f), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]


# ---------------------------------------------------------------------------
# 2D 5-point
# ---------------------------------------------------------------------------

def _kernel2d(x_hbm, o_hbm, win, sems, obuf, osems, *, tile_m, n,
              diag, off):
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    pipelined_window(x_hbm, win, sems, i, tile_m, _HALO, nprog)

    def fill(s):
        w = win[s]
        rows = tile_m + 2 * _HALO
        c = w[_HALO:_HALO + tile_m, :]
        # row neighbors: whole-window sublane rolls, then ALIGNED
        # slices (a direct slice at offset _HALO±1 fails Mosaic's
        # tiling check)
        north = pltpu.roll(w, 1, 0)[_HALO:_HALO + tile_m, :]
        south = pltpu.roll(w, rows - 1, 0)[_HALO:_HALO + tile_m, :]
        obuf[s, :, :] = diag * c + off * (
            north + south + lane_shift_sum(c, n)
        )

    output_pipeline(o_hbm, obuf, osems, i, tile_m, nprog, fill)


@partial(jax.jit, static_argnames=("m", "n", "diag", "off", "tile_m"))
def stencil2d_mv_pallas(
    x: jax.Array, *, m: int, n: int,
    diag: float = 4.0, off: float = -1.0, tile_m: int = 256,
) -> jax.Array:
    """y = A @ x for the 2D 5-point Poisson operator.

    Shape-polymorphic like ``Stencil2D.mv``: pass GRID-shaped ``(m, n)``
    state in hot loops — the 2D reshape is then a layout bitcast.  A
    FLAT ``(m*n,)`` boundary costs a tiled-layout conversion copy
    (T(1024) 1D vs T(8,128) 2D — measured ~2.6 ms at 512^3, dwarfing
    the kernel itself)."""
    shape = x.shape
    # largest 8-row-aligned divisor of m at most tile_m (every DMA
    # offset must be a multiple of the 8-row halo granularity)
    tile_m = min(tile_m, m) - (min(tile_m, m) % _HALO)
    while tile_m >= _HALO and m % tile_m:
        tile_m -= _HALO
    if tile_m < _HALO:
        raise ValueError(
            f"stencil2d_mv_pallas needs m divisible into 8-row tiles, "
            f"got m={m}")
    grid = m // tile_m
    xg = x.reshape(m, n)
    out = pl.pallas_call(
        partial(_kernel2d, tile_m=tile_m, n=n, diag=diag, off=off),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=(window_scratch(tile_m + 2 * _HALO, n, x.dtype)
                        + output_scratch(tile_m, n, x.dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xg)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# 3D 7-point, with optional fused elementwise epilogues
# ---------------------------------------------------------------------------

def extra_copy(e_hbm, ebuf, esems, t, tile_r, align):
    """Body-rows-only copy of an extra elementwise operand (the RHS of
    a fused residual/jacobi epilogue) for tile ``t`` into slot
    ``t % 2`` — extras need no halo."""
    s = _slot(t)
    return pltpu.make_async_copy(
        e_hbm.at[pl.ds(pl.multiple_of(t * tile_r, align), tile_r), :],
        ebuf.at[s], esems.at[s],
    )


def _kernel3d(x_hbm, *rest, tile_m, ny, nz, diag, off, kind, omega):
    """One x-slab of ``tile_m`` planes; the grid is viewed
    ``(nx*ny, nz)`` so a plane is ``ny`` aligned rows and every window
    slice below is ny-aligned.

    Compute runs PLANE AT A TIME (statically unrolled): operating on
    the whole ``(tile_m*ny, nz)`` window as one vector value spills the
    register allocator catastrophically (tile=16 at 512^3 measured 5 ms
    — no better than XLA; tile=32 OOMs VMEM on spill slots).  Per-plane
    values are ~1 MB and pipeline cleanly against the DMA.

    ``kind``: 'mv' (y = A x), 'residual' (b - A x), 'jacobi'
    (x + omega (b - A x)) — the fused forms save the separate
    elementwise passes of the MG smoother hot path exactly like the
    slab epilogues in ``Stencil3D._fused_apply``; 'mv_dot'
    (y = A x plus the scalar x·Ax accumulated across the sequential
    grid — CG's direction dot p·Ap with ZERO extra HBM traffic, the
    reference's VecTDot-after-MatMult pair); 'jacobi_dot' (the jacobi
    sweep plus the scalar b·x' — PCG's post-preconditioner vdot(r, z)
    accumulated while the MG cycle's final smoothing kernel already
    holds both operands in VMEM)."""
    has_extra = kind in ("residual", "jacobi", "jacobi_dot")
    has_acc = kind in ("mv_dot", "jacobi_dot")
    if kind == "jacobi_dot":
        (e_hbm, o_hbm, acc_ref, win, sems, ebuf, esems, obuf,
         osems) = rest
    elif has_extra:
        (e_hbm, o_hbm, win, sems, ebuf, esems, obuf, osems) = rest
    elif has_acc:
        (o_hbm, acc_ref, win, sems, obuf, osems) = rest
    else:
        (o_hbm, win, sems, obuf, osems) = rest
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    r = tile_m * ny

    @pl.when(i == 0)
    def _():
        issue_window(x_hbm, win, sems, 0, r, ny, nprog, vmem_top=True)
        if has_extra:
            extra_copy(e_hbm, ebuf, esems, 0, r, ny).start()

    @pl.when(i + 1 < nprog)
    def _():
        issue_window(x_hbm, win, sems, i + 1, r, ny, nprog,
                     vmem_top=True)
        if has_extra:
            extra_copy(e_hbm, ebuf, esems, i + 1, r, ny).start()

    wait_window(x_hbm, win, sems, i, r, ny, nprog, vmem_top=True)
    # source window i+1's top halo from this slot's last body plane
    # (same x rows, already resident — and the in-place hazard fix,
    # see issue_window)
    copy_top_from_prev(win, i, r, ny, nprog)
    if has_extra:
        extra_copy(e_hbm, ebuf, esems, i, r, ny).wait()

    rows = lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    dt = obuf.dtype

    if has_acc:
        @pl.when(i == 0)
        def _():
            # Mosaic cannot store SCALARS to VMEM — keep every
            # accumulator access (1, 1)-shaped
            acc_ref[...] = jnp.zeros((1, 1), acc_ref.dtype)

    def fill(s):
        parts = []
        for p in range(tile_m):
            # compute in f32 regardless of the storage dtype: Mosaic's
            # rotate only handles 32-bit data ("Rotate with non-32-bit
            # data" on bf16), and the DMA traffic — the binding cost —
            # stays in the storage dtype either way
            c = win[s, (p + 1) * ny:(p + 2) * ny, :].astype(jnp.float32)
            xn = win[s, p * ny:(p + 1) * ny, :].astype(jnp.float32)
            xs = win[s, (p + 2) * ny:(p + 3) * ny, :].astype(jnp.float32)
            # y-neighbors: in-plane sublane rolls; the wrapped row is
            # the y-boundary, masked off the row index
            ynorth = jnp.where(rows == 0, 0.0, pltpu.roll(c, 1, 0))
            ysouth = jnp.where(rows == ny - 1, 0.0,
                               pltpu.roll(c, ny - 1, 0))
            ys = diag * c + off * (
                xn + xs + ynorth + ysouth + lane_shift_sum(c, nz)
            )
            if kind == "residual":
                b = ebuf[s, p * ny:(p + 1) * ny, :].astype(jnp.float32)
                ys = b - ys
            elif kind in ("jacobi", "jacobi_dot"):
                b = ebuf[s, p * ny:(p + 1) * ny, :].astype(jnp.float32)
                ys = c + jnp.float32(omega) * (b - ys)
                if kind == "jacobi_dot":
                    # b and the smoothed result are both on-core —
                    # vdot(b, x') costs zero extra HBM traffic (PCG's
                    # r·z right after the MG cycle)
                    parts.append(jnp.sum(b * ys, keepdims=True))
            elif kind == "mv_dot":
                # both operands of the dot are already on-core (c is the
                # window's center plane, ys just computed) — collect
                # per-plane (1, 1) partial sums in registers, one VMEM
                # read-modify-write per TILE below
                parts.append(jnp.sum(c * ys, keepdims=True))
            obuf[s, p * ny:(p + 1) * ny, :] = ys.astype(dt)
        if parts:
            # TPU grid programs run sequentially, so += on the shared
            # (1, 1) accumulator block is race-free
            acc_ref[...] += sum(parts)

    output_pipeline(o_hbm, obuf, osems, i, r, nprog, fill)


def sublane_granularity(dtype) -> int:
    """Mosaic's DMA/vector row-alignment granularity: the sublane tile
    is 8 rows for 4-byte types, 16 for 2-byte (bf16)."""
    return 8 * (4 // jnp.dtype(dtype).itemsize)


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "diag", "off",
                                   "tile_m", "kind", "omega",
                                   "out_dtype", "in_place"))
def stencil3d_apply_pallas(
    x: jax.Array, *extras, nx: int, ny: int, nz: int,
    diag: float = 6.0, off: float = -1.0, tile_m: int = 0,
    kind: str = "mv", omega: float | None = None, out_dtype=None,
    in_place: bool = False,
) -> jax.Array:
    """3D 7-point stencil apply with optional fused epilogue.

    ``kind='mv'`` → ``A @ x``; ``'residual'`` → ``b - A @ x``;
    ``'jacobi'`` → ``x + omega (b - A @ x)`` with ``b = extras[0]`` and
    STATIC ``omega`` (it compiles into the kernel); ``'mv_dot'`` →
    ``(A @ x, x · A x)`` with the dot accumulated in f32 on-core (both
    operands already live in VMEM — no extra HBM pass vs 'mv').

    ``out_dtype``: output storage dtype (default: ``x.dtype``).  The
    kernel computes in f32 regardless, so writing a different width is
    free — it removes the separate cast pass at a precision boundary
    (e.g. the bf16 MG cycle's correction returned to the f32 CG loop).
    Extras may also differ in dtype from ``x`` for the same reason.

    ``in_place``: alias the output onto ``x``'s buffer
    (``input_output_aliases``).  Round-5 finding: in a chained loop
    (the smoother sweeps, the bench's SpMV chain), XLA materializes a
    whole-array COPY per iteration to feed the loop carry — 1.56 ms of
    the 3.28 ms chained 512³ apply.  Aliasing removes it when the
    caller's ``x`` dies at the call; when ``x`` stays live, XLA inserts
    the protective copy again (donation semantics), so pass it only at
    call sites where the input is dead.  Safe in-place execution is
    guaranteed by the VMEM-sourced top halo (``copy_top_from_prev``) —
    the output write of tile ``t`` otherwise races the top-halo read of
    window ``t+1``.  Requires ``out_dtype == x.dtype``.

    Shape-polymorphic like ``Stencil3D.mv`` (see the 2D twin's note on
    layout bitcasts: pass GRID-shaped ``(nx, ny, nz)`` state in hot
    loops).  Requires ``ny`` divisible by the dtype's sublane
    granularity (8 f32 / 16 bf16 — the plane-halo DMA alignment);
    callers route other shapes to the XLA formulation."""
    gran = sublane_granularity(x.dtype)
    if ny % gran:
        raise ValueError(
            f"stencil3d_apply_pallas needs ny % {gran} == 0 for "
            f"{x.dtype}, got ny={ny}")
    odt = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    shape = x.shape
    if not tile_m:
        # fused kinds carry an extra two-slot operand buffer; smaller
        # tiles keep the working set under the ~128 MB VMEM
        budget = 8 if (extras and ny * nz * x.dtype.itemsize >= 2**20) \
            else 16
        tile_m = budget
    tile_m = min(tile_m, nx)
    while nx % tile_m:
        tile_m //= 2
    grid = nx // tile_m
    xg = x.reshape(nx * ny, nz)
    eg = tuple(e.reshape(nx * ny, nz) for e in extras)
    scratch = window_scratch((tile_m + 2) * ny, nz, x.dtype)
    if extras:
        scratch += [pltpu.VMEM((2, tile_m * ny, nz), eg[0].dtype),
                    pltpu.SemaphoreType.DMA((2,))]
    scratch += output_scratch(tile_m * ny, nz, odt)
    out_specs = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    out_shape = jax.ShapeDtypeStruct((nx * ny, nz), odt)
    if kind in ("mv_dot", "jacobi_dot"):
        # second output: the f32 dot accumulator — a (1, 1) VMEM block
        # every program maps to (sequential grid => race-free +=)
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    if in_place and odt != x.dtype:
        in_place = False   # aliasing needs matching buffers; the
        #                    precision-boundary sweeps keep the copy
    out = pl.pallas_call(
        partial(_kernel3d, tile_m=tile_m, ny=ny, nz=nz, diag=diag,
                off=off, kind=kind, omega=omega),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
                  for _ in range(1 + len(eg))],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases={0: 0} if in_place else {},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xg, *eg)
    if kind in ("mv_dot", "jacobi_dot"):
        y, acc = out
        return y.reshape(shape), acc[0, 0]
    return out.reshape(shape)


def stencil3d_mv_pallas(x, *, nx, ny, nz, diag=6.0, off=-1.0, tile_m=16):
    """y = A @ x for the 3D 7-point Poisson operator (``kind='mv'`` of
    ``stencil3d_apply_pallas``)."""
    return stencil3d_apply_pallas(
        x, nx=nx, ny=ny, nz=nz, diag=diag, off=off, tile_m=tile_m,
        kind="mv")


def output_pipeline2(outs, i, nprog, fill):
    """``output_pipeline`` for kernels with several HBM outputs.
    ``outs``: sequence of ``(o_hbm, obuf, osems, tile_r)``."""
    for (o, ob, osm, tr) in outs:
        @pl.when(i >= 2)
        def _(o=o, ob=ob, osm=osm, tr=tr):
            out_write_copy(o, ob, osm, i - 2, tr).wait()

    fill(_slot(i))
    for (o, ob, osm, tr) in outs:
        out_write_copy(o, ob, osm, i, tr).start()

        @pl.when(i == nprog - 1)
        def _(o=o, ob=ob, osm=osm, tr=tr):
            out_write_copy(o, ob, osm, i, tr).wait()

        @pl.when((i == nprog - 1) & (i >= 1))
        def _(o=o, ob=ob, osm=osm, tr=tr):
            out_write_copy(o, ob, osm, i - 1, tr).wait()


def _kernel3d_mvc(x_hbm, y_hbm, c_hbm, win, sems, ybuf, ysems, cbuf,
                  csems, *, tile_m, ny, nz, diag, off):
    """``y = A x`` AND a cast copy of ``x`` in one streaming pass — the
    MG cycle's entry: the f32 residual arrives, the bf16 pre-smoothed
    iterate and the bf16 RHS copy leave, so the precision boundary costs
    no separate cast pass (x is read ONCE at f32 width instead of
    cast-write + bf16 reread)."""
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    r = tile_m * ny

    @pl.when(i == 0)
    def _():
        issue_window(x_hbm, win, sems, 0, r, ny, nprog)

    @pl.when(i + 1 < nprog)
    def _():
        issue_window(x_hbm, win, sems, i + 1, r, ny, nprog)

    wait_window(x_hbm, win, sems, i, r, ny, nprog)

    rows = lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    ydt, cdt2 = ybuf.dtype, cbuf.dtype

    def fill(s):
        for p in range(tile_m):
            c = win[s, (p + 1) * ny:(p + 2) * ny, :].astype(jnp.float32)
            xn = win[s, p * ny:(p + 1) * ny, :].astype(jnp.float32)
            xs = win[s, (p + 2) * ny:(p + 3) * ny, :].astype(jnp.float32)
            ynorth = jnp.where(rows == 0, 0.0, pltpu.roll(c, 1, 0))
            ysouth = jnp.where(rows == ny - 1, 0.0,
                               pltpu.roll(c, ny - 1, 0))
            ys = diag * c + off * (
                xn + xs + ynorth + ysouth + lane_shift_sum(c, nz)
            )
            ybuf[s, p * ny:(p + 1) * ny, :] = ys.astype(ydt)
            cbuf[s, p * ny:(p + 1) * ny, :] = c.astype(cdt2)

    output_pipeline2([(y_hbm, ybuf, ysems, r), (c_hbm, cbuf, csems, r)],
                     i, nprog, fill)


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "diag", "off",
                                   "tile_m", "out_dtype"))
def stencil3d_mv_cast_pallas(
    x: jax.Array, *, nx: int, ny: int, nz: int,
    diag: float = 6.0, off: float = -1.0, tile_m: int = 0,
    out_dtype=jnp.bfloat16,
):
    """``(A @ x, x)`` both written at ``out_dtype`` in one pass over
    ``x`` — the fused cast-in of a reduced-precision MG cycle."""
    gran = sublane_granularity(x.dtype)
    if ny % gran or ny % sublane_granularity(out_dtype):
        raise ValueError(
            f"stencil3d_mv_cast_pallas needs ny aligned for both "
            f"{x.dtype} and {out_dtype}, got ny={ny}")
    odt = jnp.dtype(out_dtype)
    shape = x.shape
    if not tile_m:
        tile_m = 8
    tile_m = min(tile_m, nx)
    while nx % tile_m:
        tile_m //= 2
    grid = nx // tile_m
    xg = x.reshape(nx * ny, nz)
    scratch = window_scratch((tile_m + 2) * ny, nz, x.dtype)
    scratch += output_scratch(tile_m * ny, nz, odt)
    scratch += output_scratch(tile_m * ny, nz, odt)
    y, c = pl.pallas_call(
        partial(_kernel3d_mvc, tile_m=tile_m, ny=ny, nz=nz, diag=diag,
                off=off),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nx * ny, nz), odt)] * 2,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xg)
    oshape = shape if x.ndim == 3 else (nx, ny, nz)
    return y.reshape(oshape), c.reshape(oshape)


def _kernel3d_amvd(z_hbm, p_hbm, beta_hbm, pn_hbm, ap_hbm, acc_ref,
                   zwin, zsems, pwin, psems, pnbuf, pnsems, apbuf,
                   apsems, *, tile_m, ny, nz, diag, off):
    """PCG's direction update + matvec + direction dot in ONE pass:
    ``p' = z + beta p``, ``ap = A p'``, ``acc = p' · ap``.

    The classical order runs these as an axpy pass (read z+p, write p:
    ~2 ms at 512^3) followed by the mv_dot kernel (read p, write ap) —
    but p' is a cheap elementwise function of z and p, so the stencil
    can consume it straight out of registers: halo planes of p' are
    recomputed from the two input windows (the same rolling 3-plane
    working set as the prolong_jacobi kernel).  Four HBM streams
    (read z, p; write p', ap) instead of six.  ``beta`` arrives as a
    (1, 1) VMEM value — it is a traced per-iteration scalar, not a
    compile-time constant."""
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    r = tile_m * ny

    @pl.when(i == 0)
    def _():
        issue_window(z_hbm, zwin, zsems, 0, r, ny, nprog)
        issue_window(p_hbm, pwin, psems, 0, r, ny, nprog)

    @pl.when(i + 1 < nprog)
    def _():
        issue_window(z_hbm, zwin, zsems, i + 1, r, ny, nprog)
        issue_window(p_hbm, pwin, psems, i + 1, r, ny, nprog)

    wait_window(z_hbm, zwin, zsems, i, r, ny, nprog)
    wait_window(p_hbm, pwin, psems, i, r, ny, nprog)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros((1, 1), acc_ref.dtype)

    rows = lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    beta = beta_hbm[0, 0].astype(jnp.float32)
    pdt, adt = pnbuf.dtype, apbuf.dtype

    def fill(s):
        cache = {}

        def pn_of(q):
            # window plane q of p' = z + beta p (halo planes are
            # zero-filled by wait_window at the grid edges, so the
            # Dirichlet boundary falls out: z=0, p=0 => p'=0)
            if q not in cache:
                zc = zwin[s, q * ny:(q + 1) * ny, :].astype(jnp.float32)
                pc = pwin[s, q * ny:(q + 1) * ny, :].astype(jnp.float32)
                cache[q] = zc + beta * pc
            for k in [k for k in cache if k < q - 2]:
                del cache[k]
            return cache[q]

        parts = []
        for p in range(tile_m):
            prev, cur, nxt = pn_of(p), pn_of(p + 1), pn_of(p + 2)
            ynorth = jnp.where(rows == 0, 0.0, pltpu.roll(cur, 1, 0))
            ysouth = jnp.where(rows == ny - 1, 0.0,
                               pltpu.roll(cur, ny - 1, 0))
            ys = diag * cur + off * (
                prev + nxt + ynorth + ysouth + lane_shift_sum(cur, nz)
            )
            parts.append(jnp.sum(cur * ys, keepdims=True))
            pnbuf[s, p * ny:(p + 1) * ny, :] = cur.astype(pdt)
            apbuf[s, p * ny:(p + 1) * ny, :] = ys.astype(adt)
        acc_ref[...] += sum(parts)

    output_pipeline2([(pn_hbm, pnbuf, pnsems, r),
                      (ap_hbm, apbuf, apsems, r)], i, nprog, fill)


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "diag", "off",
                                   "tile_m"))
def stencil3d_axpy_mv_dot_pallas(
    z: jax.Array, p: jax.Array, beta: jax.Array, *, nx: int, ny: int,
    nz: int, diag: float = 6.0, off: float = -1.0, tile_m: int = 0,
):
    """``(p', A p', p' · A p')`` with ``p' = z + beta p`` — PCG's
    direction update fused into the stencil matvec (see
    ``_kernel3d_amvd``).  ``beta`` is a traced scalar."""
    gran = sublane_granularity(z.dtype)
    if ny % gran:
        raise ValueError(
            f"axpy_mv_dot needs ny % {gran} == 0 for {z.dtype}, "
            f"got ny={ny}")
    shape = z.shape
    if not tile_m:
        tile_m = 8
    tile_m = min(tile_m, nx)
    while nx % tile_m:
        tile_m //= 2
    grid = nx // tile_m
    zg = z.reshape(nx * ny, nz)
    pg = p.reshape(nx * ny, nz).astype(z.dtype)
    bg = jnp.asarray(beta, jnp.float32).reshape(1, 1)
    scratch = window_scratch((tile_m + 2) * ny, nz, z.dtype)
    scratch += window_scratch((tile_m + 2) * ny, nz, z.dtype)
    scratch += output_scratch(tile_m * ny, nz, z.dtype)
    scratch += output_scratch(tile_m * ny, nz, z.dtype)
    pn, ap, acc = pl.pallas_call(
        partial(_kernel3d_amvd, tile_m=tile_m, ny=ny, nz=nz, diag=diag,
                off=off),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                   pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                   pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((nx * ny, nz), z.dtype),
                   jax.ShapeDtypeStruct((nx * ny, nz), z.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(zg, pg, bg)
    return pn.reshape(shape), ap.reshape(shape), acc[0, 0]


def _kernel3d_dfr(xh_hbm, xl_hbm, bh_hbm, bl_hbm, rh_hbm, rl_hbm,
                  winh, semsh, winl, semsl, bhbuf, bhsems, blbuf, blsems,
                  ohbuf, ohsems, olbuf, olsems, *, tile_m, ny, nz,
                  diag, off):
    """Double-float (two-f32 EFT) residual ``b - A x`` in one streaming
    pass — the hand-scheduled form of ``solvers.df64``'s
    ``_df_residual_core_3d`` (same operation tree, so same ~2^-48
    accuracy class).  Four HBM-scale operands in, two out; the XLA slab
    form re-reads windows across its pad/concat fusions (~2x the
    traffic floor at 512^3)."""
    from medane_tchakorom_ufc_thesis_repository_tpu.solvers.df64 import (
        _int_coeff_mul,
        df_add,
        df_add_f32,
        df_neg,
        two_sum,
    )

    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    r = tile_m * ny

    @pl.when(i == 0)
    def _():
        issue_window(xh_hbm, winh, semsh, 0, r, ny, nprog)
        issue_window(xl_hbm, winl, semsl, 0, r, ny, nprog)
        extra_copy(bh_hbm, bhbuf, bhsems, 0, r, ny).start()
        extra_copy(bl_hbm, blbuf, blsems, 0, r, ny).start()

    @pl.when(i + 1 < nprog)
    def _():
        issue_window(xh_hbm, winh, semsh, i + 1, r, ny, nprog)
        issue_window(xl_hbm, winl, semsl, i + 1, r, ny, nprog)
        extra_copy(bh_hbm, bhbuf, bhsems, i + 1, r, ny).start()
        extra_copy(bl_hbm, blbuf, blsems, i + 1, r, ny).start()

    wait_window(xh_hbm, winh, semsh, i, r, ny, nprog)
    wait_window(xl_hbm, winl, semsl, i, r, ny, nprog)
    extra_copy(bh_hbm, bhbuf, bhsems, i, r, ny).wait()
    extra_copy(bl_hbm, blbuf, blsems, i, r, ny).wait()

    rows = lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (ny, nz), 1)

    def shifts(c):
        """Masked neighbor values of one plane (y-north/south via
        sublane rolls, z-west/east via lane rolls — the Mosaic
        equivalent of the padded-window taps)."""
        yn = jnp.where(rows == 0, 0.0, pltpu.roll(c, 1, 0))
        ys = jnp.where(rows == ny - 1, 0.0, pltpu.roll(c, ny - 1, 0))
        zw = jnp.where(lanes == 0, 0.0, pltpu.roll(c, 1, 1))
        ze = jnp.where(lanes == nz - 1, 0.0, pltpu.roll(c, nz - 1, 1))
        return yn, ys, zw, ze

    def fill(s):
        for p in range(tile_m):
            chi = winh[s, (p + 1) * ny:(p + 2) * ny, :]
            xnh = winh[s, p * ny:(p + 1) * ny, :]
            xsh = winh[s, (p + 2) * ny:(p + 3) * ny, :]
            ynh, ysh, zwh, zeh = shifts(chi)
            # EFT neighbor-sum tree — operation-for-operation the
            # _df_residual_core_3d order (results match to reduction
            # order, ~2^-48)
            s1, e1 = two_sum(xnh, xsh)
            s2, e2 = two_sum(ynh, ysh)
            s3, e3 = two_sum(zwh, zeh)
            t1, e4 = two_sum(s1, s2)
            nh, e5 = two_sum(t1, s3)
            cl = winl[s, (p + 1) * ny:(p + 2) * ny, :]
            xnl = winl[s, p * ny:(p + 1) * ny, :]
            xsl = winl[s, (p + 2) * ny:(p + 3) * ny, :]
            ynl, ysl, zwl, zel = shifts(cl)
            # left-associated like df64's taps() so the lo-component
            # rounding matches the XLA form bit-for-bit
            tlo = xnl + xsl + ynl + ysl + zwl + zel
            nl = (((e1 + e2) + (e3 + e4)) + e5) + tlo
            # ndf = off * (nh, nl): off = -1 for the Poisson family —
            # exact either way via _int_coeff_mul-style scaling
            if abs(off) in (1.0, 2.0, 4.0, 0.5, 0.25):
                ndf = (nh * off, nl * off)
            else:
                ndf = df_add_f32(_int_coeff_mul(nh, off),
                                 jnp.float32(off) * nl)
            ddf = _int_coeff_mul(chi, diag)
            ddf = df_add_f32(ddf, jnp.float32(diag) * cl)
            ax = df_add(ddf, ndf)
            bh = bhbuf[s, p * ny:(p + 1) * ny, :]
            bl = blbuf[s, p * ny:(p + 1) * ny, :]
            rhi, rlo = df_add((bh, bl), df_neg(ax))
            ohbuf[s, p * ny:(p + 1) * ny, :] = rhi
            olbuf[s, p * ny:(p + 1) * ny, :] = rlo

    output_pipeline2([(rh_hbm, ohbuf, ohsems, r),
                      (rl_hbm, olbuf, olsems, r)], i, nprog, fill)


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "diag", "off",
                                   "tile_m"))
def stencil3d_df_residual_pallas(
    xhi: jax.Array, xlo: jax.Array, bhi: jax.Array, blo: jax.Array,
    *, nx: int, ny: int, nz: int, diag: float = 6.0, off: float = -1.0,
    tile_m: int = 4,
):
    """``b - A x`` in double-float (two-f32) arithmetic, one streaming
    pass (see ``_kernel3d_dfr``).  Returns ``(rhi, rlo)`` grid-shaped.
    f32 components only; ``ny % 8 == 0`` (DMA alignment)."""
    if ny % 8:
        raise ValueError(f"df residual kernel needs ny % 8 == 0, got {ny}")
    tile_m = min(tile_m, nx)
    while nx % tile_m:
        tile_m //= 2
    grid = nx // tile_m
    gs = [a.reshape(nx * ny, nz) for a in (xhi, xlo, bhi, blo)]
    dt = xhi.dtype
    scratch = window_scratch((tile_m + 2) * ny, nz, dt)
    scratch += window_scratch((tile_m + 2) * ny, nz, dt)
    scratch += [pltpu.VMEM((2, tile_m * ny, nz), dt),
                pltpu.SemaphoreType.DMA((2,))]
    scratch += [pltpu.VMEM((2, tile_m * ny, nz), dt),
                pltpu.SemaphoreType.DMA((2,))]
    scratch += output_scratch(tile_m * ny, nz, dt)
    scratch += output_scratch(tile_m * ny, nz, dt)
    rh, rl = pl.pallas_call(
        partial(_kernel3d_dfr, tile_m=tile_m, ny=ny, nz=nz, diag=diag,
                off=off),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nx * ny, nz), dt)] * 2,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*gs)
    shape = xhi.shape if xhi.ndim == 3 else (nx, ny, nz)
    return rh.reshape(shape), rl.reshape(shape)


# ---------------------------------------------------------------------------
# 3D fused residual + restriction (the MG V-cycle's coarsening step)
# ---------------------------------------------------------------------------

def _pair_select(np_, k, dt):
    """(np_//2, np_) 0/1 matrix summing adjacent row pairs when applied
    from the left (k=0) / (np_, np_//2) from the right (k=1) — the
    Mosaic-compilable form of stride-2 compaction (strided slices and
    lane addressing don't lower; one small MXU matmul does).  Each
    orientation is built directly with iota compares (no transpose — a
    vector-value transpose needn't lower)."""
    shape = (np_ // 2, np_) if k == 0 else (np_, np_ // 2)
    rows = lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = lax.broadcasted_iota(jnp.int32, shape, 1)
    hit = (cols // 2 == rows) if k == 0 else (rows // 2 == cols)
    return jnp.where(hit, 1.0, 0.0).astype(dt)


def _kernel3d_rr(x_hbm, b_hbm, rc_hbm, win, sems, bbuf, bsems, obuf,
                 osems, *, tile_m, ny, nz, diag, off, scale):
    """Residual + full-weighting restriction in ONE pass: reads x and b
    (fine), writes ONLY the coarse ``rc = scale * mean_{2x2x2}(b - A x)``
    — the fine residual never exists in HBM.  The V-cycle uses r for
    nothing but restriction (``solvers/multigrid.py``), so this replaces
    a fused-residual write (268 MB at 512^3 bf16) plus a
    relayout-penalized strided restriction read with zero extra traffic:
    x + b in, rc (1/8 size) out.

    Restriction compaction runs on the MXU: per fine-plane pair,
    ``Y @ (r_2q + r_2q+1) @ Z`` with 0/1 pairing matrices (~26 GMAC at
    512^3 — sub-ms at bf16 operand width; products with 0/1 matrices are
    exact, accumulation in f32)."""
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    r = tile_m * ny

    @pl.when(i == 0)
    def _():
        issue_window(x_hbm, win, sems, 0, r, ny, nprog)
        extra_copy(b_hbm, bbuf, bsems, 0, r, ny).start()

    @pl.when(i + 1 < nprog)
    def _():
        issue_window(x_hbm, win, sems, i + 1, r, ny, nprog)
        extra_copy(b_hbm, bbuf, bsems, i + 1, r, ny).start()

    wait_window(x_hbm, win, sems, i, r, ny, nprog)
    extra_copy(b_hbm, bbuf, bsems, i, r, ny).wait()

    rows = lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    dt = obuf.dtype
    cdt = x_hbm.dtype  # matmul operand width == storage width
    ymat = _pair_select(ny, 0, cdt)          # (ny/2, ny)
    zmat = _pair_select(nz, 1, cdt)          # (nz, nz/2)
    s8 = jnp.float32(scale / 8.0)
    # f32 operands: HIGHEST, or the MXU silently truncates them to bf16
    # (the CLAUDE.md precision trap — measured 6e-3 relerr without);
    # bf16 operands are already exact through the 0/1 matrices
    prec = (lax.Precision.HIGHEST if cdt == jnp.dtype(jnp.float32)
            else lax.Precision.DEFAULT)

    def resid_plane(s, p):
        c = win[s, (p + 1) * ny:(p + 2) * ny, :].astype(jnp.float32)
        xn = win[s, p * ny:(p + 1) * ny, :].astype(jnp.float32)
        xs = win[s, (p + 2) * ny:(p + 3) * ny, :].astype(jnp.float32)
        ynorth = jnp.where(rows == 0, 0.0, pltpu.roll(c, 1, 0))
        ysouth = jnp.where(rows == ny - 1, 0.0, pltpu.roll(c, ny - 1, 0))
        ys = diag * c + off * (
            xn + xs + ynorth + ysouth + lane_shift_sum(c, nz)
        )
        b = bbuf[s, p * ny:(p + 1) * ny, :].astype(jnp.float32)
        return b - ys

    def fill(s):
        for q in range(tile_m // 2):
            m = (s8 * (resid_plane(s, 2 * q)
                       + resid_plane(s, 2 * q + 1))).astype(cdt)
            yq = jax.lax.dot_general(
                ymat, m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(cdt)
            out = jax.lax.dot_general(
                yq, zmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            obuf[s, q * (ny // 2):(q + 1) * (ny // 2), :] = out.astype(dt)

    output_pipeline(rc_hbm, obuf, osems, i, tile_m // 2 * (ny // 2),
                    nprog, fill)


def _kernel3d_pj(x_hbm, b_hbm, e_hbm, o_hbm, win, sems, bbuf, bsems,
                 ewin, esems, obuf, osems, *, tile_m, ny, nz, diag, off,
                 omega):
    """Coarse-correction + first post-smooth sweep in ONE pass:
    ``x' = m + omega (b - A m)`` with ``m = x + P e`` (piecewise-constant
    prolongation of the coarse correction ``e``).  Replaces prolong +
    add + jacobi_sweep — one full fine-grid read/write pair of HBM
    traffic saved per V-cycle level visit.

    The PWC expansion is two 0/1 matmuls per COARSE plane
    (``Yexp @ e_q @ Zexp`` — exact products, f32 accumulate); each
    expansion is reused by its two fine planes, and only a rolling
    3-plane working set stays live (whole-window values spill the
    register allocator)."""
    i = pl.program_id(0)
    nprog = pl.num_programs(0)
    r = tile_m * ny
    rc = (tile_m // 2) * (ny // 2)

    @pl.when(i == 0)
    def _():
        issue_window(x_hbm, win, sems, 0, r, ny, nprog)
        issue_window(e_hbm, ewin, esems, 0, rc, ny // 2, nprog)
        extra_copy(b_hbm, bbuf, bsems, 0, r, ny).start()

    @pl.when(i + 1 < nprog)
    def _():
        issue_window(x_hbm, win, sems, i + 1, r, ny, nprog)
        issue_window(e_hbm, ewin, esems, i + 1, rc, ny // 2, nprog)
        extra_copy(b_hbm, bbuf, bsems, i + 1, r, ny).start()

    wait_window(x_hbm, win, sems, i, r, ny, nprog)
    wait_window(e_hbm, ewin, esems, i, rc, ny // 2, nprog)
    extra_copy(b_hbm, bbuf, bsems, i, r, ny).wait()

    rows = lax.broadcasted_iota(jnp.int32, (ny, nz), 0)
    dt = obuf.dtype
    cdt = x_hbm.dtype
    yexp = _pair_select(ny, 1, cdt)          # (ny, ny/2): rows//2 == col
    zexp = _pair_select(nz, 0, cdt)          # (nz/2, nz): cols//2 == row
    prec = (lax.Precision.HIGHEST if cdt == jnp.dtype(jnp.float32)
            else lax.Precision.DEFAULT)  # see _kernel3d_rr

    def fill(s):
        nyh = ny // 2

        def eplane(qw):
            # window-local coarse plane qw in [0, tile_m//2 + 2): slot 0
            # is the halo plane below, zero-filled by wait_window at the
            # grid edges exactly like the x window
            eq = ewin[s, qw * nyh:(qw + 1) * nyh, :]
            up = jax.lax.dot_general(
                yexp, eq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec).astype(cdt)
            return jax.lax.dot_general(
                up, zexp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        def mplane(p):
            # fine window plane p in [0, tile_m + 2); global fine index
            # g = i*tile_m + p - 1, coarse q = g // 2, window-local
            # qw = q - (i*tile_m//2 - 1) = (p - 1) // 2 + 1 for p >= 1;
            # p = 0 is the halo plane below: g odd when tile_m even, so
            # qw = 0 only at the very first plane of a tile — handled
            # uniformly by floor division
            qw = (p - 1) // 2 + 1
            xv = win[s, p * ny:(p + 1) * ny, :].astype(jnp.float32)
            return xv + eplane(qw)

        ecache = {}

        def m_of(p):
            if p not in ecache:
                ecache[p] = mplane(p)
            # evict planes that can no longer be referenced (keep the
            # SSA working set at 3 planes)
            for k in [k for k in ecache if k < p - 2]:
                del ecache[k]
            return ecache[p]

        for p in range(tile_m):
            prev, cur, nxt = m_of(p), m_of(p + 1), m_of(p + 2)
            ynorth = jnp.where(rows == 0, 0.0, pltpu.roll(cur, 1, 0))
            ysouth = jnp.where(rows == ny - 1, 0.0,
                               pltpu.roll(cur, ny - 1, 0))
            ys = diag * cur + off * (
                prev + nxt + ynorth + ysouth + lane_shift_sum(cur, nz)
            )
            b = bbuf[s, p * ny:(p + 1) * ny, :].astype(jnp.float32)
            out = cur + jnp.float32(omega) * (b - ys)
            obuf[s, p * ny:(p + 1) * ny, :] = out.astype(dt)

    output_pipeline(o_hbm, obuf, osems, i, r, nprog, fill)


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "diag", "off",
                                   "tile_m", "omega"))
def stencil3d_prolong_jacobi_pallas(
    x: jax.Array, b: jax.Array, e: jax.Array, *, nx: int, ny: int,
    nz: int, diag: float = 6.0, off: float = -1.0, tile_m: int = 0,
    omega: float = 1.0,
) -> jax.Array:
    """``m + omega (b - A m)`` with ``m = x + P e``: the V-cycle's
    coarse-grid correction fused with the first post-smoothing sweep.
    ``e`` is the coarse ``(nx//2, ny//2, nz//2)`` correction."""
    gran = sublane_granularity(x.dtype)
    if ny % (2 * gran) or nx % 2 or nz % 2:
        raise ValueError(
            f"prolong_jacobi needs even dims and ny % {2 * gran} == 0 "
            f"for {x.dtype}, got {(nx, ny, nz)}")
    if not tile_m:
        tile_m = 8
    tile_m = min(tile_m, nx)
    while nx % tile_m or tile_m % 2:
        tile_m //= 2
    if tile_m < 2:
        raise ValueError(f"nx={nx} not tileable into even plane tiles")
    grid = nx // tile_m
    xg = x.reshape(nx * ny, nz)
    bg = b.reshape(nx * ny, nz)
    eg = e.reshape(nx // 2 * (ny // 2), nz // 2).astype(x.dtype)
    scratch = window_scratch((tile_m + 2) * ny, nz, x.dtype)
    scratch += [pltpu.VMEM((2, tile_m * ny, nz), x.dtype),
                pltpu.SemaphoreType.DMA((2,))]
    scratch += window_scratch((tile_m // 2 + 2) * (ny // 2), nz // 2,
                              x.dtype)
    scratch += output_scratch(tile_m * ny, nz, x.dtype)
    out = pl.pallas_call(
        partial(_kernel3d_pj, tile_m=tile_m, ny=ny, nz=nz, diag=diag,
                off=off, omega=omega),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((nx * ny, nz), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xg, bg, eg)
    return out.reshape(x.shape if x.ndim == 3 else (nx, ny, nz))


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "diag", "off",
                                   "tile_m", "scale"))
def stencil3d_residual_restrict_pallas(
    x: jax.Array, b: jax.Array, *, nx: int, ny: int, nz: int,
    diag: float = 6.0, off: float = -1.0, tile_m: int = 0,
    scale: float = 1.0,
) -> jax.Array:
    """``scale * mean_{2x2x2 cells}(b - A x)`` — grid-shaped
    ``(nx//2, ny//2, nz//2)`` output.  Requires even dims, ``ny`` and
    ``ny//2`` aligned to the dtype's sublane granularity; callers route
    other shapes to the XLA composition."""
    gran = sublane_granularity(x.dtype)
    if ny % (2 * gran) or nx % 2 or nz % 2:
        raise ValueError(
            f"residual_restrict needs even dims and ny % {2 * gran} == 0"
            f" for {x.dtype}, got {(nx, ny, nz)}")
    if not tile_m:
        tile_m = 8
    tile_m = min(tile_m, nx)
    while nx % tile_m or tile_m % 2:
        tile_m //= 2
    if tile_m < 2:
        raise ValueError(f"nx={nx} not tileable into even plane tiles")
    grid = nx // tile_m
    xg = x.reshape(nx * ny, nz)
    bg = b.reshape(nx * ny, nz)
    scratch = window_scratch((tile_m + 2) * ny, nz, x.dtype)
    scratch += [pltpu.VMEM((2, tile_m * ny, nz), x.dtype),
                pltpu.SemaphoreType.DMA((2,))]
    scratch += output_scratch(tile_m // 2 * (ny // 2), nz // 2, x.dtype)
    out = pl.pallas_call(
        partial(_kernel3d_rr, tile_m=tile_m, ny=ny, nz=nz, diag=diag,
                off=off, scale=scale),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((nx // 2 * (ny // 2), nz // 2),
                                       x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xg, bg)
    return out.reshape(nx // 2, ny // 2, nz // 2)
