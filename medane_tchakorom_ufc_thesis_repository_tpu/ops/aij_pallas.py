"""Pallas TPU kernels for the Clos-routed AIJ SpMV (``ops/aij_pack.py``).

Three kernels around two XLA transposes:

* K1 ``_aij_k1``: per g-block, DMA the block's 1024-element x chunk
  (scalar-prefetched chunk id, double-buffered), gather each nonzero's
  x value into the block (sublane+lane dynamic_gather) and apply the
  first Clos stage (A∘B∘A) — 5 gather ops total.
* K2 ``_aij_k2``: the middle Clos stage — one in-block bijection per
  block (3 gather ops), pure VMEM streaming.
* K3 ``_aij_k3``: the final Clos stage fused with the ELL reduction:
  permute the block into row positions, multiply by the stored values,
  accumulate into the output tile (VMEM-resident y, dynamic-slice
  row-tile accumulation).

The whole per-matrix access pattern lives in static int32 maps streamed
alongside the blocks; x is the only dynamic input.  Capability match:
PETSc AIJ MatMult (``/root/reference/src/utils/utils.c:139-155``).
Interpreter-exact vs ``aij_pack.aij_mv_np`` (tests/test_aij.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024


def _aba(blk, cA1, cB, cA2):
    t = jnp.take_along_axis(blk, cA1, axis=0)
    u = jnp.take_along_axis(t, cB, axis=1)
    return jnp.take_along_axis(u, cA2, axis=0)


def _unpack_k1(idx):
    return (idx & 7, (idx >> 3) & 127, (idx >> 10) & 7,
            (idx >> 13) & 127, (idx >> 20) & 7)


def _unpack_aba(idx):
    return idx & 7, (idx >> 3) & 127, (idx >> 10) & 7


def _aij_k1(cids_ref, x_hbm, idx_ref, o_ref, xbuf, sems):
    b = pl.program_id(0)
    nprog = pl.num_programs(0)

    def copy(t):
        t = jnp.asarray(t, jnp.int32)
        s = lax.rem(t, jnp.int32(2))
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(cids_ref[t] * 8, 8), 8), :],
            xbuf.at[s], sems.at[s],
        )

    @pl.when(b == 0)
    def _():
        copy(0).start()

    @pl.when(b + 1 < nprog)
    def _():
        copy(b + 1).start()

    copy(b).wait()
    c1, c2, cA1, cB, cA2 = _unpack_k1(idx_ref[...])
    xb = xbuf[lax.rem(jnp.asarray(b, jnp.int32), jnp.int32(2))]
    t = jnp.take_along_axis(xb, c1, axis=0)
    g = jnp.take_along_axis(t, c2, axis=1)
    o_ref[...] = _aba(g, cA1, cB, cA2)


def _aij_k2(h_ref, idx_ref, o_ref):
    o_ref[...] = _aba(h_ref[...], *_unpack_aba(idx_ref[...]))


def _aij_k3(meta_ref, h_ref, idx_ref, val_ref, o_ref):
    e = pl.program_id(0)

    @pl.when(e == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o = _aba(h_ref[...], *_unpack_aba(idx_ref[...]))
    contrib = o * val_ref[...]
    r = pl.multiple_of(meta_ref[e] * 8, 8)
    o_ref[pl.ds(r, 8), :] += contrib


# ---------------------------------------------------------------------------
# Wide kernels: 8 blocks per grid step in the (8, 1024) layout
# (aij_pack.to_wide).  The sublane dynamic_gather accepts ANY lane
# width (probe-verified on-chip), so each A-stage serves all 8 blocks
# in ONE op; the lane gather is 128-lane-scoped, so B-stages run per
# 128-lane slice through a scratch staging buffer.  Cuts grid steps 8x
# and A-gather ops 8x vs the narrow kernels.
# ---------------------------------------------------------------------------

def _bstage(scr, t, idx):
    """Lane-gather stage on a (8, 1024) value: per 128-lane sub-block,
    gather within the slice; staged through ``scr`` because the lane
    gather needs exactly 128 lanes."""
    for j in range(8):
        sl = slice(j * 128, (j + 1) * 128)
        scr[:, sl] = jnp.take_along_axis(t[:, sl], idx[:, sl], axis=1)
    return scr[...]


def _aba_wide(scr, blk, cA1, cB, cA2):
    t = jnp.take_along_axis(blk, cA1, axis=0)
    u = _bstage(scr, t, cB)
    return jnp.take_along_axis(u, cA2, axis=0)


def _aij_k1w(cids_ref, x_hbm, idx_ref, o_ref, xbuf, sems, scr):
    s = pl.program_id(0)
    nprog = pl.num_programs(0)

    def copy(t, j):
        t = jnp.asarray(t, jnp.int32)
        slot = lax.rem(t, jnp.int32(2))
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(
                pl.multiple_of(cids_ref[t * 8 + j] * 8, 8), 8), :],
            xbuf.at[slot, :, pl.ds(j * 128, 128)],
            sems.at[slot, j],
        )

    @pl.when(s == 0)
    def _():
        for j in range(8):
            copy(0, j).start()

    @pl.when(s + 1 < nprog)
    def _():
        for j in range(8):
            copy(s + 1, j).start()

    for j in range(8):
        copy(s, j).wait()
    c1, c2, cA1, cB, cA2 = _unpack_k1(idx_ref[...])      # (8, 1024)
    xb = xbuf[lax.rem(jnp.asarray(s, jnp.int32), jnp.int32(2))]
    t = jnp.take_along_axis(xb, c1, axis=0)
    g = _bstage(scr, t, c2)
    o_ref[...] = _aba_wide(scr, g, cA1, cB, cA2)


def _aij_k2w(h_ref, idx_ref, o_ref, scr):
    o_ref[...] = _aba_wide(scr, h_ref[...], *_unpack_aba(idx_ref[...]))


def _aij_k3w(meta_ref, h_ref, idx_ref, val_ref, o_ref, scr):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o = _aba_wide(scr, h_ref[...], *_unpack_aba(idx_ref[...]))
    contrib = o * val_ref[...]
    for j in range(8):
        r = pl.multiple_of(meta_ref[s * 8 + j] * 8, 8)
        o_ref[pl.ds(r, 8), :] += contrib[:, j * 128:(j + 1) * 128]


def _perm_pass(v, idx, a: int, interpret: bool):
    """One in-block A∘B∘A permutation pass over ``a`` blocks (the K2
    kernel; reused by the y-unpermute stages)."""
    blk8 = pl.BlockSpec((8, 128), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _aij_k2,
        grid=(a,),
        in_specs=[blk8, blk8],
        out_specs=blk8,
        out_shape=jax.ShapeDtypeStruct((a * 8, 128), v.dtype),
        interpret=interpret,
    )(v, idx)


@partial(jax.jit, static_argnames=("a", "ntiles", "a_y", "interpret",
                                   "wide"))
def _aij_segment_mv(chunk_ids, k1_idx, k2_idx, k3_idx, vals, y_tile,
                    yp_r2, yp_mid, yp_r1, xc, *, a: int, ntiles: int,
                    a_y: int, interpret: bool, wide: bool = False):
    """One segment: K1 -> D -> K2 -> D^-1 -> K3 -> routed y-unpermute.
    ``xc`` is the padded x as (n_pad_cols // 128, 128).  Returns the
    segment's y rows (ntiles * 1024,).  ``wide``: 8-block super-steps
    (indices/vals in the ``aij_pack.to_wide`` layout)."""
    blk8 = pl.BlockSpec((8, 128), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    if wide:
        nsb = a // 8
        blkw = pl.BlockSpec((8, 1024), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

        def unwiden(w):
            # (a, 1024) wide <-> logical [block, offset] (involutive)
            return (w.reshape(nsb, 8, 8, 128).transpose(0, 2, 1, 3)
                    .reshape(a, BLOCK))

        g = pl.pallas_call(
            _aij_k1w,
            grid=(nsb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                blkw,
            ],
            out_specs=blkw,
            out_shape=jax.ShapeDtypeStruct((a, 1024), xc.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, 8, 1024), xc.dtype),
                pltpu.SemaphoreType.DMA((2, 8)),
                pltpu.VMEM((8, 1024), xc.dtype),
            ],
            interpret=interpret,
        )(chunk_ids, xc, k1_idx)

        h = unwiden(unwiden(g).T.reshape(a, BLOCK))       # D, to wide
        h = pl.pallas_call(
            _aij_k2w,
            grid=(nsb,),
            in_specs=[blkw, blkw],
            out_specs=blkw,
            out_shape=jax.ShapeDtypeStruct((a, 1024), xc.dtype),
            scratch_shapes=[pltpu.VMEM((8, 1024), xc.dtype)],
            interpret=interpret,
        )(h, k2_idx)
        h = unwiden(unwiden(h).reshape(BLOCK, a).T        # D^-1, wide
                    .reshape(a, BLOCK))

        y = pl.pallas_call(
            _aij_k3w,
            grid=(nsb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                blkw, blkw, blkw,
            ],
            out_specs=pl.BlockSpec(((ntiles + 1) * 8, 128),
                                   lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(((ntiles + 1) * 8, 128),
                                           xc.dtype),
            scratch_shapes=[pltpu.VMEM((8, 1024), xc.dtype)],
            interpret=interpret,
        )(y_tile, h, k3_idx, vals)
        return _y_unpermute(y, yp_r2, yp_mid, yp_r1, ntiles, a_y,
                            interpret)

    g = pl.pallas_call(
        _aij_k1,
        grid=(a,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # chunk ids
            pl.BlockSpec(memory_space=pl.ANY),       # x chunks in HBM
            blk8,                                    # packed k1 indices
        ],
        out_specs=blk8,
        out_shape=jax.ShapeDtypeStruct((a * 8, 128), xc.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 8, 128), xc.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(chunk_ids, xc, k1_idx)

    h = g.reshape(a, BLOCK).T.reshape(a * 8, 128)        # D
    h = _perm_pass(h, k2_idx, a, interpret)
    h = h.reshape(BLOCK, a).T.reshape(a * 8, 128)        # D^-1

    y = pl.pallas_call(
        _aij_k3,
        grid=(a,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # y tile per slot
            blk8, blk8, blk8,
        ],
        out_specs=pl.BlockSpec(((ntiles + 1) * 8, 128), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((ntiles + 1) * 8, 128), xc.dtype),
        interpret=interpret,
    )(y_tile, h, k3_idx, vals)

    return _y_unpermute(y, yp_r2, yp_mid, yp_r1, ntiles, a_y, interpret)


def _y_unpermute(y, yp_r2, yp_mid, yp_r1, ntiles: int, a_y: int,
                 interpret: bool):
    """Routed y-unpermute (undo the pack's degree-sort row
    permutation)."""
    yp = jnp.zeros((a_y * 8, 128), y.dtype).at[:ntiles * 8].set(
        y[:ntiles * 8])
    yp = _perm_pass(yp, yp_r2, a_y, interpret)
    yp = yp.reshape(a_y, BLOCK).T.reshape(a_y * 8, 128)
    yp = _perm_pass(yp, yp_mid, a_y, interpret)
    yp = yp.reshape(BLOCK, a_y).T.reshape(a_y * 8, 128)
    yp = _perm_pass(yp, yp_r1, a_y, interpret)
    return yp.reshape(-1)[:ntiles * BLOCK]


def aij_mv_pallas(segments, n_pad_cols: int, nrows: int, x, *,
                  interpret: bool = False):
    """Full routed SpMV over all segments (``operators.AIJSegment``
    pytrees from ``operators.AIJ``)."""
    xp = jnp.zeros(n_pad_cols, x.dtype).at[:x.shape[0]].set(x)
    xc = xp.reshape(-1, 128)
    parts = []
    for seg in segments:
        parts.append(_aij_segment_mv(
            seg.chunk_ids, seg.k1_idx, seg.k2_idx,
            seg.k3_idx, seg.vals, seg.y_tile,
            seg.yp_r2, seg.yp_mid, seg.yp_r1, xc,
            a=int(seg.a), ntiles=int(seg.ntiles), a_y=int(seg.a_y),
            interpret=interpret, wide=bool(getattr(seg, "wide", False)),
        ))
    return jnp.concatenate(parts)[:nrows]
