"""Distributed general-sparse operators: MPIAIJ across ranks, TPU-style.

The reference's ``create_matrix_sparse`` builds MPIAIJ matrices whose
row strips live on different ranks and whose matvec scatters the needed
x entries between them (``utils.c:139-155``; PETSc VecScatter).  Here
the same capability for ARBITRARY sparsity on a device mesh:

* rows are split into one strip per device; each strip is packed as
  block-ELL with **global** sub-block-column ids (the transposed-block
  layout measured fastest in ``core.operators.BSR``);
* the matvec ``all_gather``s x across the mesh and applies the local
  strip — the correct general-pattern baseline (an arbitrary pattern may
  read any entry; the banded/stencil paths in ``parallel/sharded.py``
  exploit structure to exchange only boundary planes instead);
* Krylov reductions ``psum`` over the mesh axes (``solvers/`` is
  distribution-agnostic via ``axis_name``).

Single-chip twin: ``core.operators.BSR`` / ``models.blockops.
StackedBSROperator``.  Use those when the matrix fits one chip; use
this to scale rows across a mesh.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from medane_tchakorom_ufc_thesis_repository_tpu.solvers import krylov


@dataclasses.dataclass(frozen=True)
class ShardedGeneralBSR:
    """Row-strip-sharded block-ELL operator (device d owns rows
    ``[d*strip, (d+1)*strip)``); ``idx`` holds GLOBAL sub-block-column
    ids, ``val`` the transposed ``(c, c)`` sub-blocks; strips share one
    padded width."""

    idx: jax.Array   # int32 (ndev, nbr, w)
    val: jax.Array   # (ndev, nbr, w, c, c)
    n: int           # true global dimension

    @property
    def ndev(self) -> int:
        return self.idx.shape[0]

    @property
    def c(self) -> int:
        return self.val.shape[-1]

    @property
    def strip(self) -> int:
        return self.idx.shape[1] * self.c

    @property
    def dtype(self):
        return self.val.dtype


jax.tree_util.register_dataclass(
    ShardedGeneralBSR, data_fields=["idx", "val"], meta_fields=["n"],
)


def shard_general_from_coo(rows, cols, vals, n: int, ndev: int,
                           c: int = 8, dtype=jnp.float32
                           ) -> ShardedGeneralBSR:
    """Host-side pack: COO -> one block-ELL strip per device (shared
    padded width).  ``n`` must be divisible by ``ndev`` and the strip by
    ``c`` (pad the matrix first otherwise)."""
    from medane_tchakorom_ufc_thesis_repository_tpu.core.operators import (
        _bsr_pack_np,
    )

    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    if n % ndev:
        raise ValueError(f"n={n} not divisible by ndev={ndev}")
    strip = n // ndev
    if strip % c:
        raise ValueError(f"strip={strip} not divisible by c={c}")
    packs = []
    for d in range(ndev):
        lo, hi = d * strip, (d + 1) * strip
        m = (rows >= lo) & (rows < hi)
        packs.append(_bsr_pack_np(
            rows[m] - lo, cols[m], vals[m], (strip, n), c,
        ))
    w = max(p[0].shape[1] for p in packs)
    nbr = strip // c
    idx = np.zeros((ndev, nbr, w), np.int32)
    val = np.zeros((ndev, nbr, w, c, c))
    for d, (i_, v_) in enumerate(packs):
        idx[d, :, : i_.shape[1]] = i_
        val[d, :, : v_.shape[1]] = v_
    return ShardedGeneralBSR(
        idx=jnp.asarray(idx), val=jnp.asarray(val, dtype), n=int(n),
    )


def _local_mv(idx, val, x_full):
    """One strip's y from the FULL x (global block-col ids)."""
    c = val.shape[-1]
    g = jnp.take(x_full.reshape(-1, c), idx, axis=0)   # (nbr, w, c)
    y = jnp.einsum("rwji,rwj->ri", val, g,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(-1)


def _solve_program(mesh: Mesh, op: ShardedGeneralBSR, method: str,
                   restart: int, maxiter: int, rtol: float):
    axes = tuple(mesh.axis_names)
    ndev = math.prod(mesh.shape[a] for a in axes)
    if ndev != op.ndev:
        raise ValueError(
            f"operator packed for {op.ndev} devices, mesh has {ndev}"
        )
    vec = P(axes)                       # dim 0 over all mesh axes
    idx_spec = P(axes, None, None)
    val_spec = P(axes, None, None, None, None)

    def body(b_loc, idx_loc, val_loc):
        idx0, val0 = idx_loc[0], val_loc[0]

        def mv(x_loc):
            x_full = lax.all_gather(x_loc, axes, tiled=True)
            return _local_mv(idx0, val0, x_full)

        if method == "cg":
            res = krylov.cg(mv, b_loc, maxiter=maxiter, rtol=rtol,
                            axis_name=axes)
        else:
            res = krylov.gmres(mv, b_loc, restart=restart,
                               maxiter=maxiter, rtol=rtol, axis_name=axes)
        return res.x, res.iters, res.resnorm, res.resnorm0, res.converged

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(vec, idx_spec, val_spec),
        out_specs=(vec, P(), P(), P(), P()),
        check_vma=False,
    ))


def sharded_general_solve(mesh: Mesh, op: ShardedGeneralBSR,
                          b: jax.Array, *, method: str = "gmres",
                          restart: int = 30, maxiter: int = 2000,
                          rtol: float = 1e-6) -> krylov.KrylovResult:
    """Solve ``A x = b`` for a row-sharded general-sparse operator with
    GMRES(restart) or CG (SPD), reductions psum'd over the mesh."""
    if method not in ("gmres", "cg"):
        raise ValueError(f"method must be 'gmres' or 'cg', got {method!r}")
    run = _solve_program(mesh, op, method, int(restart), int(maxiter),
                         float(rtol))
    x, iters, rnorm, rnorm0, conv = run(
        jnp.asarray(b, op.dtype), op.idx, op.val,
    )
    return krylov.KrylovResult(x=x, iters=iters, resnorm=rnorm,
                               resnorm0=rnorm0, converged=conv)
