"""Pallas TPU kernel: BSR (block-ELL) SpMV with scalar-prefetched
block indices.

The XLA path (``core.operators.BSR.mv``) is a `jnp.take` block-row
gather + one batched contraction — measured 187 Gnnz/s at bs=128 (91%
of the values-read roofline, BENCHMARKS.md), so this kernel is parity
for the kernel library (SURVEY §7.2: "Pallas SpMV ... BSR-tiled")
rather than a rescue.  What it adds over XLA: the gather DMAs are
issued per slot and can overlap the previous slot's FMA, and the
accumulator never leaves VMEM.

Layout matches the shipped pack: ``values[r, w]`` holds the TRANSPOSED
``(bs, bs)`` sub-block (sublane-dim contraction).  Grid = one program
per block-row; the block-column ids ride the scalar-prefetch channel
(SMEM) so each slot's x-block DMA address is known at program start.

Status: interpreter-exact vs the XLA path (``tests/test_pallas.py``);
compiles on-chip since round 4 (see ``fused_pallas.mosaic_available``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bsr_kernel(idx_ref, x_hbm, val_ref, out_ref, xblk, sems, *, width, bs):
    i = pl.program_id(0)

    acc = jnp.zeros((bs,), out_ref.dtype)
    for w in range(width):
        c = idx_ref[i * width + w]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(c, 1), :],
            xblk.at[pl.ds(w % 2, 1), :],
            sems.at[w % 2],
        )
        cp.start()
        cp.wait()
        g = xblk[w % 2, :]
        # values stored transposed: y_i += sum_j V[w, j, i] * g_j
        acc = acc + jnp.sum(val_ref[0, w] * g[:, None], axis=0)
    out_ref[0, :] = acc


@partial(jax.jit, static_argnames=("interpret",))
def bsr_mv_pallas(op, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """y = A @ x for a ``core.operators.BSR`` operator (square,
    bs-divisible shapes — the packed fast path)."""
    nbr, width = op.indices.shape
    bs = op.bs
    ncb = -(-op.ncols // bs)
    xp = (jnp.pad(x, (0, ncb * bs - op.ncols))
          if ncb * bs != op.ncols else x)
    out = pl.pallas_call(
        partial(_bsr_kernel, width=width, bs=bs),
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # flat indices
            pl.BlockSpec(memory_space=pl.ANY),       # x blocks in HBM
            pl.BlockSpec((1, width, bs, bs), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbr, bs), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bs), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(op.indices.reshape(-1), xp.reshape(ncb, bs), op.values)
    return out.reshape(-1)[: op.nrows]
