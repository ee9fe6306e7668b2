"""Linear-operator pytrees: the framework's replacement for PETSc Mat.

The reference manipulates PETSc ``Mat`` objects (MPIAIJ sparse, MPIDENSE) —
see ``create_matrix_sparse`` / ``create_matrix_dense``
(reference ``src/utils/utils.c:123-168``).  Here an operator is an immutable
dataclass registered as a JAX pytree, so it can be closed over by jitted
solvers, vmapped over a leading "block" axis, and sharded with
``shard_map``.  Matrix-vector products are pure functions of (operator, x).

Representations
---------------
``Stencil2D`` / ``Stencil3D``
    Matrix-free constant-coefficient 5/7-point Poisson stencils — the
    fastest TPU path (no index gathers; XLA fuses the shifted adds).
``ELL``
    ELLPACK padded sparse: row-major ``(n, width)`` column-index and value
    planes.  The general path; Poisson rows have <= 5 (2D) / 7 (3D)
    nonzeros so padding waste is tiny.  SpMV is a gather + small reduction.
``DIA``
    Diagonal format for banded matrices: SpMV is shifted slices, no
    gathers — the TPU-fast general path (``as_tpu_operator`` routes
    banded ELL here).
``BSR``
    Block-sparse rows (block-ELL): dense ``(bs, bs)`` sub-blocks, SpMV is
    block-row gathers + batched sub-block matvecs, ``rmv`` via a
    transpose pack — the TPU path for genuinely unstructured sparsity
    with block structure (2-5x off DIA per stored value vs gather-ELL's
    ~2000x steady-state; BENCHMARKS.md round-3 re-measurement).
``DenseOp``
    Thin wrapper over a dense matrix, for tests and tall-skinny blocks.

All operators expose ``mv`` (matvec) and ``rmv`` (transpose matvec, needed
by LSQR/CGNE), plus ``shape`` / ``dtype`` / ``nnz`` metadata.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


@dataclasses.dataclass(frozen=True)
class ELL:
    """ELLPACK sparse matrix.

    ``indices``/``values`` have shape ``(nrows, width)``; padded slots carry
    ``values == 0`` and an arbitrary valid index (0), so the padded products
    vanish.  ``ncols`` is static metadata (the matvec output/input widths).
    """

    indices: jax.Array  # int32 (nrows, width)
    values: jax.Array   # (nrows, width)
    ncols: int

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.indices.shape[0], self.ncols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def nnz(self) -> int:
        # padded count; exact nnz tracked by callers when it matters
        return int(self.indices.shape[0] * self.indices.shape[1])

    def mv(self, x: jax.Array) -> jax.Array:
        """y = A @ x.  Gather + small fixed-width reduction (VPU-friendly)."""
        gathered = jnp.take(x, self.indices, axis=0)  # (nrows, width)
        return jnp.sum(self.values * gathered, axis=1)

    def rmv(self, y: jax.Array) -> jax.Array:
        """x = A.T @ y via scatter-add (segment sum over column indices)."""
        contrib = (self.values * y[:, None]).reshape(-1)
        return jnp.zeros((self.ncols,), self.values.dtype).at[
            self.indices.reshape(-1)
        ].add(contrib)

    def to_dense(self) -> jax.Array:
        n, w = self.indices.shape
        dense = jnp.zeros((n, self.ncols), self.values.dtype)
        rows = jnp.repeat(jnp.arange(n), w)
        return dense.at[rows, self.indices.reshape(-1)].add(
            self.values.reshape(-1)
        )

    def to_coo_np(self):
        """Nonzero entries as numpy COO (rows, cols, vals)."""
        n, w = self.indices.shape
        rows = np.repeat(np.arange(n), w)
        cols = np.asarray(self.indices).reshape(-1)
        vals = np.asarray(self.values).reshape(-1)
        keep = vals != 0
        return rows[keep], cols[keep], vals[keep]

    def to_dia(self) -> "DIA":
        """Convert to DIA.  On TPU the gather-based ELL matvec is ~100x
        slower than DIA's shifted adds (measured 39 ms vs 0.4 ms at
        1024^2 on v5e) — any matrix whose distinct-diagonal count is
        modest should run as DIA."""
        if self.shape[0] != self.ncols:
            raise ValueError("DIA requires a square matrix")
        rows, cols, vals = self.to_coo_np()
        offs = cols - rows
        uniq = np.unique(offs)
        n = self.ncols
        data = np.zeros((len(uniq), n))
        for d, off in enumerate(uniq):
            mask = offs == off
            data[d, rows[mask]] = vals[mask]
        return DIA(
            data=jnp.asarray(data, self.values.dtype),
            offsets=tuple(int(o) for o in uniq),
        )

    def ndiags(self) -> int:
        """Number of distinct diagonals (host-side; DIA suitability)."""
        rows, cols, _ = self.to_coo_np()
        return len(np.unique(cols - rows))


_register(ELL, ["indices", "values"], ["ncols"])


@dataclasses.dataclass(frozen=True)
class DenseOp:
    """Dense matrix operator (small unstructured/rectangular route,
    tall-skinny R blocks).

    The matvecs pin ``precision=HIGHEST`` as a guard: TPU default
    matmul precision truncates f32 OPERANDS to bf16 (~1e-2) wherever a
    contraction lands on the MXU — the CLAUDE.md-documented trap that
    stalls Krylov solves, invisible to the CPU (f64) suite.  Measured
    on v5e the matVEC results are bit-identical either way (XLA lowers
    (n,n)@(n,) to VPU reductions at these sizes), and the op is
    bandwidth-bound, so HIGHEST costs nothing and keeps the operator
    safe if XLA ever re-tiles it onto the MXU (batched/vmapped uses)."""

    a: jax.Array

    @property
    def shape(self):
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    @property
    def nnz(self) -> int:
        return int(np.prod(self.a.shape))

    def mv(self, x):
        return jnp.matmul(self.a, x, precision=jax.lax.Precision.HIGHEST)

    def rmv(self, y):
        return jnp.matmul(self.a.T, y, precision=jax.lax.Precision.HIGHEST)

    def to_dense(self):
        return self.a


_register(DenseOp, ["a"], [])


@dataclasses.dataclass(frozen=True)
class Stencil2D:
    """Matrix-free 2D 5-point Poisson operator on an ``m x n`` grid.

    Row ``i*n + j`` is ``diag*x[i,j] + off*(x[i-1,j]+x[i+1,j]+x[i,j-1]+x[i,j+1])``
    with Dirichlet truncation at the boundary — exactly the rows assembled by
    the reference's ``poisson2DMatrix`` (``src/utils/utils.c:247-293``,
    diag 4, off -1).  ``x`` is the flattened grid of length ``m*n``.
    """

    m: int
    n: int
    diag: float = 4.0
    off: float = -1.0

    @property
    def shape(self):
        return (self.m * self.n, self.m * self.n)

    @property
    def nnz(self) -> int:
        m, n = self.m, self.n
        return 5 * m * n - 2 * m - 2 * n

    def mv(self, x):
        # pad+slice formulation: XLA/TPU fuses this into one bandwidth-
        # bound pass (measured 5.5x faster than the .at[].add form, which
        # lowers to poorly-fused dynamic-update-slices on TPU).
        # Shape-polymorphic: flat (m*n,) or grid (m, n) in -> same shape
        # out; grid-shaped callers skip the flat<->tiled relayout copy.
        # HBM-scale grids (>100 MB, e.g. the reference's 8192^2 sweep
        # envelope) route to the windowed-DMA Pallas kernel when Mosaic
        # is available (see Stencil3D.mv).
        m, n = self.m, self.n
        g = x if x.ndim == 2 else x.reshape(m, n)
        if g.size * jnp.dtype(g.dtype).itemsize > _VMEM_RESIDENT_BYTES:
            y = self._pallas_mv(g)
            if y is not None:
                return y if x.ndim == 2 else y.reshape(-1)
        p = jnp.pad(g, 1)
        y = self.diag * g + self.off * (
            p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
        )
        return y if x.ndim == 2 else y.reshape(-1)

    def _pallas_mv(self, g):
        if jnp.dtype(g.dtype) != jnp.dtype(jnp.float32):
            return None
        from medane_tchakorom_ufc_thesis_repository_tpu.ops import (
            fused_pallas,
            stencil_pallas,
        )

        if self.m % 8:  # 8-row halo-block DMA alignment
            return None
        if self.n % 128:  # lane dim must be whole 128-lane tiles (see
            return None   # Stencil3D._pallas_route_ok)
        if not fused_pallas.pallas_enabled():
            return None
        return stencil_pallas.stencil2d_mv_pallas(
            g, m=self.m, n=self.n, diag=self.diag, off=self.off)

    rmv = mv  # symmetric

    def to_dense(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson

        return jnp.asarray(
            poisson.poisson2d_dense_np(self.m, self.n, self.diag, self.off)
        )


_register(Stencil2D, [], ["m", "n", "diag", "off"])


# VMEM-residency cutoff for the whole-array pad+slice stencil form (v5e
# has 128 MiB VMEM; past this the slab loop wins — see Stencil3D.mv)
_VMEM_RESIDENT_BYTES = 100 * 2**20


def _slab_planes(nx: int, plane_bytes: int, target_bytes: int = 32 * 2**20):
    """Largest divisor of ``nx`` whose slab stays under ~32 MB (the
    empirically fastest slab size at 512^3: big enough to amortize the
    per-slab pad, small enough for VMEM-scoped partial sums)."""
    target = max(1, target_bytes // max(plane_bytes, 1))
    best = 1
    for d in range(1, nx + 1):
        if nx % d == 0 and d <= target:
            best = d
    return best


@dataclasses.dataclass(frozen=True)
class Stencil3D:
    """Matrix-free 3D 7-point Poisson operator (diag 6, off -1) — the
    TPU-native analog of ``poisson3DMatrix`` (reference ``utils.c:30-121``).
    Unknown order: ``x[ix, iy, iz]`` flattened C-style."""

    nx: int
    ny: int
    nz: int
    diag: float = 6.0
    off: float = -1.0

    @property
    def shape(self):
        size = self.nx * self.ny * self.nz
        return (size, size)

    @property
    def nnz(self) -> int:
        nx, ny, nz = self.nx, self.ny, self.nz
        size = nx * ny * nz
        return 7 * size - 2 * (nx * ny + ny * nz + nx * nz)

    def mv(self, x, in_place: bool = False):
        """Shape-polymorphic apply: accepts the flat ``(nx*ny*nz,)`` vector
        or the grid-shaped ``(nx, ny, nz)`` array and returns the same
        shape.  Grid-shaped callers avoid a real flat<->tiled relayout
        copy that XLA inserts for the 1D view (measured 2x the whole
        apply cost at 256^3 on TPU v5e — keep solver state grid-shaped
        in hot loops).

        HBM-scale grids (> ~100 MB, beyond VMEM residency) route to the
        Pallas kernel when Mosaic is available (round 4:
        ``ops/stencil_pallas.py`` windowed-DMA kernel — 1.76 ms at
        512^3 f32, 533 Gnnz/s, ~89% of the measured 687 GB/s streaming
        roofline), else through an x-slab loop: the whole-array
        pad+slice form costs ~10 memory passes under XLA's fusion split
        (pad materializes, the 6-tap sum splits into 4 sibling fusions
        re-reading it) — cheap at VMEM speed, 7.6 ms at 512^3 f32 from
        HBM.  Slabbing keeps the pad+fusion traffic slab-sized:
        measured 4.67 ms at 512^3 (1.63x)."""
        nx, ny, nz = self.nx, self.ny, self.nz
        g = x if x.ndim == 3 else x.reshape(nx, ny, nz)
        itemsize = jnp.dtype(g.dtype).itemsize
        if g.size * itemsize > _VMEM_RESIDENT_BYTES:
            y = self._pallas_apply(g, (), "mv", in_place=in_place)
            if y is not None:
                return y if x.ndim == 3 else y.reshape(-1)
            sl = _slab_planes(nx, ny * nz * itemsize)
            if sl < nx:
                y = self._slab_mv(g, sl)
                return y if x.ndim == 3 else y.reshape(-1)
        p = jnp.pad(g, 1)
        y = self.diag * g + self.off * (
            p[:-2, 1:-1, 1:-1] + p[2:, 1:-1, 1:-1]
            + p[1:-1, :-2, 1:-1] + p[1:-1, 2:, 1:-1]
            + p[1:-1, 1:-1, :-2] + p[1:-1, 1:-1, 2:]
        )
        return y if x.ndim == 3 else y.reshape(-1)

    def _slab_mv(self, g, sl: int, epilogue=None, extras=()):
        """x-slab stencil pass: per-slab pad+slice with one-plane halo
        fixups — each slab's padded copy and partial-sum fusions stay
        slab-sized (VMEM-scoped) instead of array-sized.

        ``epilogue(s, ys, *extra_slabs) -> out``: optional per-slab
        elementwise combine applied INSIDE the loop (``s`` = this slab
        of ``g``, ``ys`` = its stencil apply, ``extra_slabs`` = matching
        slabs of ``extras``).  A combine outside the loop would re-read
        the materialized whole-array y plus its operands from HBM —
        ~2 extra memory passes per call at HBM scale (the smoother /
        residual fusion, ``solvers/multigrid.py``)."""
        from jax import lax

        nx, ny, nz = self.nx, self.ny, self.nz
        diag = jnp.asarray(self.diag, g.dtype)
        off = jnp.asarray(self.off, g.dtype)
        zero = jnp.asarray(0, g.dtype)

        def body(i, y):
            start = i * sl
            s = lax.dynamic_slice(g, (start, 0, 0), (sl, ny, nz))
            p = jnp.pad(s, 1)
            ys = diag * s + off * (
                p[:-2, 1:-1, 1:-1] + p[2:, 1:-1, 1:-1]
                + p[1:-1, :-2, 1:-1] + p[1:-1, 2:, 1:-1]
                + p[1:-1, 1:-1, :-2] + p[1:-1, 1:-1, 2:]
            )
            up = lax.dynamic_slice(
                g, (jnp.maximum(start - 1, 0), 0, 0), (1, ny, nz)
            )
            up = jnp.where(start == 0, zero, up)
            dn = lax.dynamic_slice(
                g, (jnp.minimum(start + sl, nx - 1), 0, 0), (1, ny, nz)
            )
            dn = jnp.where(start + sl >= nx, zero, dn)
            ys = ys.at[0].add(off * up[0])
            ys = ys.at[-1].add(off * dn[0])
            if epilogue is not None:
                ex = [
                    lax.dynamic_slice(e, (start, 0, 0), (sl, ny, nz))
                    for e in extras
                ]
                ys = epilogue(s, ys, *ex)
            return lax.dynamic_update_slice(y, ys, (start, 0, 0))

        return lax.fori_loop(0, nx // sl, body, jnp.empty_like(g))

    rmv = mv  # symmetric

    def mv_dot(self, x):
        """``(A @ x, x · A x)`` — CG's MatMult+VecTDot pair.  At HBM
        scale the Pallas 'mv_dot' kind accumulates the dot on-core
        while the apply streams (ZERO extra HBM traffic); elsewhere the
        separate dot is VMEM-resident and XLA's fusion is already fine.
        The dot accumulates in f32 regardless of storage dtype."""
        nx, ny, nz = self.nx, self.ny, self.nz
        g = x if x.ndim == 3 else x.reshape(nx, ny, nz)
        if g.size * jnp.dtype(g.dtype).itemsize > _VMEM_RESIDENT_BYTES:
            out = self._pallas_apply(g, (), "mv_dot")
            if out is not None:
                y, dot = out
                return (y if x.ndim == 3 else y.reshape(-1),
                        dot.astype(x.dtype))
        y = self.mv(g)
        dot = jnp.sum(g.astype(jnp.float32) * y.astype(jnp.float32))
        return (y if x.ndim == 3 else y.reshape(-1), dot.astype(x.dtype))

    def _pallas_route_ok(self, dtype):
        """Single Mosaic route-eligibility gate shared by every Pallas
        route (``_pallas_apply`` and ``axpy_mv_dot``), so a new guard
        added here applies to all of them: supported dtype (f32/bf16),
        ``ny`` on the dtype's DMA sublane granularity, and an
        environment that compiles Mosaic."""
        if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                    jnp.dtype(jnp.bfloat16)):
            return False
        from medane_tchakorom_ufc_thesis_repository_tpu.ops import (
            fused_pallas,
            stencil_pallas,
        )

        if self.ny % stencil_pallas.sublane_granularity(dtype):
            return False
        # The kernels view the grid as (nx*ny, nz): the lane dim nz must
        # be a whole number of 128-lane tiles or the HBM DMA slices fail
        # to lower (Mosaic memref_slice on a padded-lane memref; 320^3
        # failed this way — the (102400, 320) view tiles to 384 lanes).
        if self.nz % 128:
            return False
        return fused_pallas.pallas_enabled()

    def _pallas_apply(self, g, extras, kind, omega=None,
                      out_dtype=None, in_place=False):
        """Route an HBM-scale GRID-SHAPED apply through the Mosaic
        stencil kernel when the environment compiles it and the shape
        meets the DMA alignment (``ny`` divisible by the dtype's
        sublane granularity).  Returns ``None`` to fall back to the
        XLA slab formulations.  Callers check the >100 MB cutoff: below
        it the whole-pad form stays VMEM-resident across solver loops
        and beats any HBM round-trip by construction."""
        if not self._pallas_route_ok(g.dtype):
            return None
        from medane_tchakorom_ufc_thesis_repository_tpu.ops import (
            stencil_pallas,
        )

        return stencil_pallas.stencil3d_apply_pallas(
            g, *extras, nx=self.nx, ny=self.ny, nz=self.nz,
            diag=self.diag, off=self.off, kind=kind, omega=omega,
            out_dtype=out_dtype, in_place=in_place,
        )

    def _fused_apply(self, x, extras, epilogue):
        """Stencil apply with an elementwise epilogue, slab-fused at HBM
        scale (identical values either way — the epilogue sees the same
        ``ys``; below the slab cutoff XLA fuses the composition itself)."""
        nx, ny, nz = self.nx, self.ny, self.nz
        g = x if x.ndim == 3 else x.reshape(nx, ny, nz)
        ex = tuple(
            e if e.ndim == 3 else e.reshape(nx, ny, nz) for e in extras
        )
        itemsize = jnp.dtype(g.dtype).itemsize
        if g.size * itemsize > _VMEM_RESIDENT_BYTES:
            sl = _slab_planes(nx, ny * nz * itemsize)
            if sl < nx:
                y = self._slab_mv(g, sl, epilogue=epilogue, extras=ex)
                return y if x.ndim == 3 else y.reshape(-1)
        y = epilogue(g, self.mv(g), *ex)
        return y if x.ndim == 3 else y.reshape(-1)

    def jacobi_sweep(self, x, b, omega, out_dtype=None,
                     in_place: bool = False):
        """One damped-Jacobi smoothing sweep ``x + omega * (b - A x)``
        with the update fused into the stencil pass (Pallas kernel or
        slab epilogue — saves ~2 full memory passes per sweep at HBM
        scale; the MG level-0 smoother hot path,
        ``solvers/multigrid.py``).

        ``out_dtype``: storage dtype of the result (default
        ``x.dtype``) — the Pallas kernel writes it directly, removing
        the separate cast pass at the bf16-cycle/f32-solver boundary;
        the fallbacks cast after (XLA fuses the cast into its epilogue
        pass, so values match either way)."""
        y = self._pallas_fused(x, (b,), "jacobi", omega,
                               out_dtype=out_dtype, in_place=in_place)
        if y is not None:
            return y
        w = jnp.asarray(omega, x.dtype)
        y = self._fused_apply(
            x, (b,), lambda s, ys, bb: s + w * (bb - ys)
        )
        return y if out_dtype is None else y.astype(out_dtype)

    def axpy_mv_dot(self, z, p, beta):
        """``(p', A p', p' · A p')`` with ``p' = z + beta p`` — PCG's
        direction update + matvec + direction dot in one streaming pass
        (four HBM streams instead of six; ``ops/stencil_pallas.py``
        '_kernel3d_amvd').  ``beta`` is a traced per-iteration scalar.

        MEASURED NEGATIVE on v5e at 512^3: 7.4 ms vs ~5.4 for
        axpy + ``mv_dot`` (the two halo-windowed input streams don't
        overlap as well as one; north-star 0.308 vs 0.292 s) — so the
        fused north-star does NOT route here; kept for meshes/chips
        where the stream trade differs.
        Fallback composes the axpy with ``mv_dot`` (identical values up
        to f32 rounding of the fused form's recomputed halo planes —
        the same p' expression evaluated in f32 either way)."""
        nx, ny, nz = self.nx, self.ny, self.nz
        g = z if z.ndim == 3 else z.reshape(nx, ny, nz)
        gp = p if p.ndim == 3 else p.reshape(nx, ny, nz)
        if (g.size * jnp.dtype(g.dtype).itemsize > _VMEM_RESIDENT_BYTES
                and jnp.dtype(g.dtype) == jnp.dtype(jnp.float32)):
            if self._pallas_route_ok(g.dtype):
                from medane_tchakorom_ufc_thesis_repository_tpu.ops import (  # noqa: E501
                    stencil_pallas,
                )

                pn, ap, dot = stencil_pallas.stencil3d_axpy_mv_dot_pallas(
                    g, gp, beta, nx=nx, ny=ny, nz=nz, diag=self.diag,
                    off=self.off)
                if z.ndim != 3:
                    pn, ap = pn.reshape(z.shape), ap.reshape(z.shape)
                return pn, ap, dot
        pn = g + jnp.asarray(beta, g.dtype) * gp.astype(g.dtype)
        ap, dot = self.mv_dot(pn)
        if z.ndim != 3:
            pn, ap = pn.reshape(z.shape), ap.reshape(z.shape)
        return pn, ap, dot

    def jacobi_sweep_dot(self, x, b, omega, out_dtype=None,
                         in_place: bool = False):
        """``(x', b · x')`` with ``x' = x + omega (b - A x)`` — the
        damped-Jacobi sweep plus the dot of the result against the RHS,
        accumulated on-core by the Pallas 'jacobi_dot' kind.  This is
        PCG's ``vdot(r, z)`` immediately after the MG cycle: the
        cycle's final smoothing kernel already holds both operands in
        VMEM, so the dot costs ZERO extra HBM traffic (vs a separate
        two-array reduction pass, ~1.3 ms at 512^3).  The dot
        accumulates in f32; the fallback computes the sweep then an
        explicit f32 dot (free at VMEM-resident sizes)."""
        nx, ny, nz = self.nx, self.ny, self.nz
        g = x if x.ndim == 3 else x.reshape(nx, ny, nz)
        gb = b if b.ndim == 3 else b.reshape(nx, ny, nz)
        if g.size * jnp.dtype(g.dtype).itemsize > _VMEM_RESIDENT_BYTES:
            try:
                w = float(omega)
            except Exception:   # traced omega — not compile-time static
                w = None
            if w is not None:
                out = self._pallas_apply(g, (gb,), "jacobi_dot", w,
                                         out_dtype=out_dtype,
                                         in_place=in_place)
                if out is not None:
                    y, dot = out
                    return (y if x.ndim == 3 else y.reshape(x.shape),
                            dot)
        y = self.jacobi_sweep(g, gb, omega, out_dtype=out_dtype)
        dot = jnp.sum(gb.astype(jnp.float32) * y.astype(jnp.float32))
        return (y if x.ndim == 3 else y.reshape(x.shape), dot)

    def residual(self, x, b):
        """``b - A x`` with the subtraction fused into the stencil pass."""
        y = self._pallas_fused(x, (b,), "residual")
        if y is not None:
            return y
        return self._fused_apply(x, (b,), lambda s, ys, bb: bb - ys)

    def mv_cast(self, x, dtype):
        """``(A @ x, x)`` both rounded to ``dtype`` in one streaming
        pass, or ``None`` when the fused Mosaic kernel is not routable
        (callers cast then apply).  The entry of a reduced-precision MG
        cycle: the f32 residual is read ONCE; the pre-smoothed iterate
        and the RHS copy leave at cycle precision with no separate cast
        pass (``solvers/multigrid.py``)."""
        nx, ny, nz = self.nx, self.ny, self.nz
        g = x if x.ndim == 3 else x.reshape(nx, ny, nz)
        if g.size * jnp.dtype(g.dtype).itemsize <= _VMEM_RESIDENT_BYTES:
            return None
        if jnp.dtype(g.dtype) not in (jnp.dtype(jnp.float32),
                                      jnp.dtype(jnp.bfloat16)):
            return None
        from medane_tchakorom_ufc_thesis_repository_tpu.ops import (
            fused_pallas,
            stencil_pallas,
        )

        gran = max(stencil_pallas.sublane_granularity(g.dtype),
                   stencil_pallas.sublane_granularity(dtype))
        if ny % gran or nx % 8:
            return None
        if not fused_pallas.pallas_enabled():
            return None
        return stencil_pallas.stencil3d_mv_cast_pallas(
            g, nx=nx, ny=ny, nz=nz, diag=self.diag, off=self.off,
            out_dtype=dtype,
        )

    def prolong_jacobi(self, x, b, e, omega):
        """``m + omega (b - A m)`` with ``m = x + P e`` (PWC
        prolongation of the coarse correction ``e``) — the V-cycle's
        correction step fused with the first post-smoothing sweep, or
        ``None`` when the Mosaic kernel is not routable (callers fall
        back to prolong + add + ``jacobi_sweep``)."""
        nx, ny, nz = self.nx, self.ny, self.nz
        g = x if x.ndim == 3 else x.reshape(nx, ny, nz)
        if g.size * jnp.dtype(g.dtype).itemsize <= _VMEM_RESIDENT_BYTES:
            return None
        if jnp.dtype(g.dtype) not in (jnp.dtype(jnp.float32),
                                      jnp.dtype(jnp.bfloat16)):
            return None
        from medane_tchakorom_ufc_thesis_repository_tpu.ops import (
            fused_pallas,
            stencil_pallas,
        )

        gran = stencil_pallas.sublane_granularity(g.dtype)
        # the coarse plane's LANE dim (nz//2) must be a whole number of
        # 128-lane tiles: Mosaic rejects VMEM slices whose minor dim
        # is not 128-aligned (measured at 384^3: nz//2 = 192 fails)
        if ny % (2 * gran) or nx % 2 or (nz // 2) % 128 or nx % 8:
            return None
        if not fused_pallas.pallas_enabled():
            return None
        try:
            omega = float(omega)
        except (TypeError, jax.errors.TracerArrayConversionError):
            return None
        bg = b if b.ndim == 3 else b.reshape(nx, ny, nz)
        return stencil_pallas.stencil3d_prolong_jacobi_pallas(
            g, bg, e, nx=nx, ny=ny, nz=nz, diag=self.diag, off=self.off,
            omega=omega,
        )

    def residual_restrict(self, x, b, scale=1.0):
        """``scale * mean_{2x2x2}(b - A x)`` on the factor-2-coarsened
        grid, or ``None`` when the fused Mosaic kernel is not routable
        (CPU, unaligned shape, or below the HBM cutoff — callers fall
        back to ``residual`` + the XLA restriction).  At HBM scale the
        fine residual never touches HBM: x and b stream in, only the
        1/8-size coarse residual streams out (the MG coarsening step,
        ``solvers/multigrid.py``)."""
        nx, ny, nz = self.nx, self.ny, self.nz
        g = x if x.ndim == 3 else x.reshape(nx, ny, nz)
        if g.size * jnp.dtype(g.dtype).itemsize <= _VMEM_RESIDENT_BYTES:
            return None
        if jnp.dtype(g.dtype) not in (jnp.dtype(jnp.float32),
                                      jnp.dtype(jnp.bfloat16)):
            return None
        from medane_tchakorom_ufc_thesis_repository_tpu.ops import (
            fused_pallas,
            stencil_pallas,
        )

        gran = stencil_pallas.sublane_granularity(g.dtype)
        # nz//2 must be 128-lane aligned (see prolong_jacobi)
        if ny % (2 * gran) or nx % 2 or (nz // 2) % 128 or nx % 8:
            return None
        if not fused_pallas.pallas_enabled():
            return None
        bg = b if b.ndim == 3 else b.reshape(nx, ny, nz)
        return stencil_pallas.stencil3d_residual_restrict_pallas(
            g, bg, nx=nx, ny=ny, nz=nz, diag=self.diag, off=self.off,
            scale=float(scale),
        )

    def _pallas_fused(self, x, extras, kind, omega=None,
                      out_dtype=None, in_place=False):
        """Pallas route for the fused epilogues; the STATIC-omega
        requirement (it compiles into the kernel) falls back to the
        slab epilogue when omega arrives as a traced value."""
        nx, ny, nz = self.nx, self.ny, self.nz
        g = x if x.ndim == 3 else x.reshape(nx, ny, nz)
        if g.size * jnp.dtype(g.dtype).itemsize <= _VMEM_RESIDENT_BYTES:
            return None
        if omega is not None:
            try:
                omega = float(omega)
            except Exception:  # traced omega — not compile-time static
                return None
        ex = tuple(e if e.ndim == 3 else e.reshape(nx, ny, nz)
                   for e in extras)
        y = self._pallas_apply(g, ex, kind, omega, out_dtype=out_dtype,
                               in_place=in_place)
        if y is None:
            return None
        return y if x.ndim == 3 else y.reshape(x.shape)

    def to_dense(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson

        return jnp.asarray(
            poisson.poisson3d_dense_np(self.nx, self.ny, self.nz, self.diag, self.off)
        )


_register(Stencil3D, [], ["nx", "ny", "nz", "diag", "off"])


@dataclasses.dataclass(frozen=True)
class StencilStrip2D:
    """One block's row strip of a 2D Poisson operator, matrix-free.

    The reference splits the global matrix into 2 horizontal strips (one per
    Jacobi block) and each strip by columns into the inner operator ``A_ii``
    and the coupling operator ``A_ij`` (``divideSubDomainIntoBlockMatrices``,
    reference ``src/utils/utils.c:450-478``).  For a 5-point stencil split on
    grid-row boundaries the coupling is exactly one halo grid-row on each cut
    side, so ``A_ij @ x_j`` only needs ``n`` peer values — this is what rides
    ``ppermute`` in the sharded path instead of the reference's full-block
    ``MPI_Sendrecv`` (``comm.c:126-141``).

    ``rows``: number of grid rows owned by this strip (``m / nblocks``).
    """

    rows: int
    n: int
    diag: float = 4.0
    off: float = -1.0

    @property
    def shape(self):
        return (self.rows * self.n, self.rows * self.n)

    @property
    def nnz(self) -> int:
        r, n = self.rows, self.n
        return 5 * r * n - 2 * r - 2 * n

    def mv(self, x):
        """A_ii @ x — the strip's diagonal block (zero halo)."""
        g = x.reshape(self.rows, self.n)
        p = jnp.pad(g, 1)
        y = self.diag * g + self.off * (
            p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
        )
        return y.reshape(-1)

    rmv = mv  # A_ii is symmetric

    def coupling(self, halo_top: jax.Array, halo_bottom: jax.Array):
        """A_ij @ x_j given the peer grid rows adjacent to this strip.

        ``halo_top`` is the grid row above the strip (zeros when this is the
        topmost block), ``halo_bottom`` the row below; each has length ``n``.
        """
        c = jnp.zeros((self.rows, self.n), halo_top.dtype)
        c = c.at[0, :].add(self.off * halo_top)
        c = c.at[-1, :].add(self.off * halo_bottom)
        return c.reshape(-1)

    def mv_full(self, x, halo_top, halo_bottom):
        """Full strip product ``A_i @ x_global`` = A_ii x_i + A_ij x_j."""
        return self.mv(x) + self.coupling(halo_top, halo_bottom)


_register(StencilStrip2D, [], ["rows", "n", "diag", "off"])


@dataclasses.dataclass(frozen=True)
class StencilStrip3D:
    """One block's strip of a 3D 7-point Poisson operator, split on the
    leading (x) grid axis.  Halos are full (ny, nz) planes."""

    rows: int  # grid planes owned along x
    ny: int
    nz: int
    diag: float = 6.0
    off: float = -1.0

    @property
    def shape(self):
        size = self.rows * self.ny * self.nz
        return (size, size)

    @property
    def nnz(self) -> int:
        r, ny, nz = self.rows, self.ny, self.nz
        return 7 * r * ny * nz - 2 * (r * ny + r * nz + ny * nz)

    def mv(self, x):
        g = x.reshape(self.rows, self.ny, self.nz)
        p = jnp.pad(g, 1)
        y = self.diag * g + self.off * (
            p[:-2, 1:-1, 1:-1] + p[2:, 1:-1, 1:-1]
            + p[1:-1, :-2, 1:-1] + p[1:-1, 2:, 1:-1]
            + p[1:-1, 1:-1, :-2] + p[1:-1, 1:-1, 2:]
        )
        return y.reshape(-1)

    rmv = mv

    def coupling(self, halo_top, halo_bottom):
        c = jnp.zeros((self.rows, self.ny, self.nz), halo_top.dtype)
        c = c.at[0].add(self.off * halo_top.reshape(self.ny, self.nz))
        c = c.at[-1].add(self.off * halo_bottom.reshape(self.ny, self.nz))
        return c.reshape(-1)

    def mv_full(self, x, halo_top, halo_bottom):
        return self.mv(x) + self.coupling(halo_top, halo_bottom)


_register(StencilStrip3D, [], ["rows", "ny", "nz", "diag", "off"])


@dataclasses.dataclass(frozen=True)
class DIA:
    """Diagonal (DIA) sparse format — the TPU-native general path for
    banded matrices (every constant-stencil PDE discretization).

    ``offsets`` is a static tuple of diagonal offsets; ``data`` has shape
    ``(ndiag, n)`` with ``data[d, i] = A[i, i + offsets[d]]`` (row-aligned;
    out-of-range slots are 0).  SpMV is a sum of shifted elementwise
    products — contiguous slices only, no gathers, so XLA fuses it into
    one bandwidth-bound pass like the matrix-free stencils.  This is the
    capability-parity replacement for the reference's AIJ matrices
    (``create_matrix_sparse``, ``src/utils/utils.c:139-155``) on banded
    problems; use ``ELL`` for genuinely unstructured sparsity.
    """

    data: jax.Array              # (ndiag, n)
    offsets: Tuple[int, ...]     # static

    @property
    def shape(self):
        n = self.data.shape[1]
        return (n, n)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self) -> int:
        n = self.data.shape[1]
        return sum(n - abs(o) for o in self.offsets)

    def mv(self, x: jax.Array) -> jax.Array:
        # pad+slice formulation (NOT .at[].add slice chains, which lower
        # to poorly-fused dynamic-update-slices on TPU — measured 5.5x
        # slower for the stencils): one padded copy, then every diagonal
        # is a contiguous slice * elementwise multiply, all fused by XLA
        # into one bandwidth-bound pass.  Out-of-range x reads hit the
        # zero padding, so padded data slots need no masking.
        n = self.data.shape[1]
        maxo = max((abs(o) for o in self.offsets), default=0)
        xp = jnp.pad(x, (maxo, maxo))
        y = jnp.zeros_like(x)
        for d, off in enumerate(self.offsets):
            y = y + self.data[d] * xp[maxo + off: maxo + off + n]
        return y

    def rmv(self, x: jax.Array) -> jax.Array:
        """A.T @ x: each stored diagonal contributes ``data[d] * x``
        shifted by ``+off`` — realized as slices of one padded product
        (same no-scatter rationale as ``mv``)."""
        n = self.data.shape[1]
        maxo = max((abs(o) for o in self.offsets), default=0)
        y = jnp.zeros_like(x)
        for d, off in enumerate(self.offsets):
            zp = jnp.pad(self.data[d] * x, (maxo, maxo))
            y = y + zp[maxo - off: maxo - off + n]
        return y

    def to_dense(self) -> jax.Array:
        n = self.data.shape[1]
        dense = jnp.zeros((n, n), self.dtype)
        for d, off in enumerate(self.offsets):
            if off >= 0:
                rows = jnp.arange(n - off)
                dense = dense.at[rows, rows + off].add(self.data[d, : n - off])
            else:
                rows = jnp.arange(-off, n)
                dense = dense.at[rows, rows + off].add(self.data[d, -off:])
        return dense


_register(DIA, ["data"], ["offsets"])


@dataclasses.dataclass(frozen=True)
class BSR:
    """Block-sparse row operator (block-ELL layout) — the TPU path for
    genuinely unstructured sparsity with block structure.

    This is the capability-parity answer to the reference's AIJ matrices
    (``create_matrix_sparse``, ``src/utils/utils.c:139-155``) when the
    pattern is neither banded (→ ``DIA``) nor a constant stencil
    (→ ``Stencil2D/3D``): nonzeros are stored as dense ``(bs, bs)``
    sub-blocks, so SpMV is a block-row gather (contiguous ``bs``-sized
    rows of the reshaped ``x`` — the embedding-style lookup TPUs handle,
    not elementwise gathers) followed by batched sub-block matvecs
    (MXU-shaped ``dot_general``).  ``rmv`` runs the same kernel on a
    transpose pack built at construction time — no scatter-adds anywhere
    (scatter-add is the construct this repo measured as pathological on
    TPU).

    ``indices``/``values``: ``(nbr, width)`` block-column ids and
    ``(nbr, width, bs, bs)`` blocks for A; ``indices_t``/``values_t``:
    the same for A^T.  Padded slots carry index 0 and all-zero blocks.
    ``nrows``/``ncols`` are the TRUE (pre-padding) dimensions; ``mv``
    pads/unpads at the boundary.
    """

    indices: jax.Array    # int32 (nbr, width)
    values: jax.Array     # (nbr, width, bs, bs)
    indices_t: jax.Array  # int32 (ncb, width_t)
    values_t: jax.Array   # (ncb, width_t, bs, bs)
    nrows: int
    ncols: int

    @property
    def bs(self) -> int:
        return self.values.shape[-1]

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nrows, self.ncols)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def nnz(self) -> int:
        # stored (padded) count, like ELL.nnz; true nnz via host count
        return int(np.prod(self.values.shape))

    @property
    def fill(self) -> float:
        """Stored values per true nonzero (host-side; 1.0 = no waste)."""
        true_nnz = int(np.count_nonzero(np.asarray(self.values)))
        return float(self.nnz) / max(true_nnz, 1)

    @staticmethod
    def _blockmv(indices, values, x, n_out, n_in):
        bs = values.shape[-1]
        ncb = -(-n_in // bs)
        xp = jnp.pad(x, (0, ncb * bs - n_in)) if ncb * bs != n_in else x
        xb = xp.reshape(ncb, bs)
        g = jnp.take(xb, indices, axis=0)          # (nbr, width, bs) rows
        # blocks are stored TRANSPOSED (values[r, w, j, i] = A_blk[i, j])
        # so the contraction runs over the SUBLANE dim: measured 140 vs
        # 95 Gnnz/s for the untransposed 'rwij,rwj->ri' form at bs=128
        # (86% of the values-read roofline; the gather itself is 35 us
        # of the 239 us pass — BENCHMARKS.md BSR table)
        y = jnp.einsum(
            "rwji,rwj->ri", values, g,
            precision=jax.lax.Precision.HIGHEST,   # values matter: avoid
        )                                          # bf16 operand truncation
        return y.reshape(-1)[:n_out]

    def mv(self, x: jax.Array) -> jax.Array:
        return self._blockmv(self.indices, self.values, x,
                             self.nrows, self.ncols)

    def rmv(self, y: jax.Array) -> jax.Array:
        return self._blockmv(self.indices_t, self.values_t, y,
                             self.ncols, self.nrows)

    def to_dense(self) -> jax.Array:
        nbr, width = self.indices.shape
        bs = self.bs
        ncb = -(-self.ncols // bs)
        dense = jnp.zeros((nbr * bs, ncb * bs), self.dtype)
        for r in range(nbr):
            for w in range(width):
                c = int(self.indices[r, w])
                blk = self.values[r, w].T   # stored transposed
                dense = dense.at[
                    r * bs:(r + 1) * bs, c * bs:(c + 1) * bs
                ].add(blk)
        return dense[: self.nrows, : self.ncols]

    @staticmethod
    def from_coo(rows, cols, vals, shape, bs: int = 128,
                 dtype=jnp.float32) -> "BSR":
        """Host-side (numpy) COO -> block-ELL pack, both A and A^T.
        Symmetric matrices (detected exactly) reuse the forward pack for
        the transpose — zero extra memory."""
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        vals = np.asarray(vals)
        i, v = _bsr_pack_np(rows, cols, vals, shape, bs)
        iv, vv = jnp.asarray(i), jnp.asarray(v, dtype)
        if shape[0] == shape[1] and _coo_symmetric(rows, cols, vals):
            it, vt = iv, vv          # A^T = A: same buffers
        else:
            it_, vt_ = _bsr_pack_np(cols, rows, vals,
                                    (shape[1], shape[0]), bs)
            it, vt = jnp.asarray(it_), jnp.asarray(vt_, dtype)
        return BSR(
            indices=iv, values=vv, indices_t=it, values_t=vt,
            nrows=int(shape[0]), ncols=int(shape[1]),
        )


_register(BSR, ["indices", "values", "indices_t", "values_t"],
          ["nrows", "ncols"])


def _bsr_pack_np(rows, cols, vals, shape, bs: int):
    """One-sided block-ELL pack: (indices (nbr,width) int32,
    values (nbr,width,bs,bs) f64-precision numpy).

    Routes through the native OpenMP packer when available (the
    sort-based np.unique below costs ~24 s at 42M nnz; the native
    counting-sort ~1 s — ``native/src/assembly.cpp:bsr_pack_*``); this
    numpy form is the always-available reference implementation."""
    from medane_tchakorom_ufc_thesis_repository_tpu import native

    packed = native.bsr_pack(rows, cols, vals, shape, bs)
    if packed is not None:
        return packed
    nrows, ncols = int(shape[0]), int(shape[1])
    nbr, ncb = -(-nrows // bs), -(-ncols // bs)
    br, bc = rows // bs, cols // bs
    key = br.astype(np.int64) * ncb + bc
    uniq, inv = np.unique(key, return_inverse=True)
    ubr, ubc = (uniq // ncb).astype(np.int64), (uniq % ncb).astype(np.int64)
    counts = np.bincount(ubr, minlength=nbr)
    width = max(int(counts.max()) if counts.size else 0, 1)
    starts = np.zeros(nbr, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    slot = np.arange(len(uniq)) - starts[ubr]   # uniq sorted => row-grouped
    blocks = np.zeros((len(uniq), bs, bs))
    # stored transposed: blocks[b, j, i] = A_blk[i, j] (sublane-dim
    # contraction in BSR._blockmv — see the measurement note there)
    np.add.at(blocks, (inv, cols % bs, rows % bs), vals)
    indices = np.zeros((nbr, width), np.int32)
    values = np.zeros((nbr, width, bs, bs))
    indices[ubr, slot] = ubc.astype(np.int32)
    values[ubr, slot] = blocks
    return indices, values


def _coo_symmetric(rows, cols, vals) -> bool:
    """Exact (structural + numeric) symmetry check, host-side: the
    canonically-sorted (r, c, v) triples of A and A^T coincide.
    Duplicate COO entries are coalesced first (packs sum them)."""
    def canon(r, c, v):
        key = r.astype(np.int64) * (c.max() + 1 if c.size else 1) + c
        order = np.argsort(key, kind="stable")
        k, r2, c2, v2 = key[order], r[order], c[order], v[order]
        uniq, inv = np.unique(k, return_inverse=True)
        vs = np.zeros(len(uniq), np.float64)
        np.add.at(vs, inv, v2.astype(np.float64))
        first = np.searchsorted(k, uniq)
        return r2[first], c2[first], vs

    ra, ca, va = canon(rows, cols, vals)
    rb, cb, vb = canon(cols, rows, vals)
    return (len(ra) == len(rb)
            and bool(np.array_equal(ra, rb))
            and bool(np.array_equal(ca, cb))
            and bool(np.array_equal(va, vb)))


@dataclasses.dataclass(frozen=True)
class AIJSegment:
    """One routed row segment of an ``AIJ`` operator (device arrays are
    the static gather/permutation maps; see ``ops/aij_pack.py``)."""

    chunk_ids: jax.Array   # (a,) int32
    k1_idx: jax.Array      # (a*8, 128) int32 (packed 5-field)
    k2_idx: jax.Array      # (a*8, 128) int32 (packed 3-field)
    k3_idx: jax.Array      # (a*8, 128) int32 (packed 3-field)
    vals: jax.Array        # (a*8, 128)
    y_tile: jax.Array      # (a,) int32
    yp_r2: jax.Array       # (a_y*8, 128) int32 — y-unpermute stages
    yp_mid: jax.Array
    yp_r1: jax.Array
    a: int
    tile0: int
    ntiles: int
    a_y: int
    wide: bool = False


_register(AIJSegment,
          ["chunk_ids", "k1_idx", "k2_idx", "k3_idx", "vals", "y_tile",
           "yp_r2", "yp_mid", "yp_r1"],
          ["a", "tile0", "ntiles", "a_y", "wide"])


@dataclasses.dataclass(frozen=True)
class AIJ:
    """General unstructured sparse operator — the PETSc MatAIJ analog
    (reference ``create_matrix_sparse``, ``src/utils/utils.c:139-155``).

    ANY sparsity pattern, square or rectangular, at any size: the pack
    compiles the access pattern into a Clos-routed gather program over
    the Mosaic ``dynamic_gather`` primitives (``ops/aij_pack.py`` has
    the construction; ``ops/aij_pallas.py`` the kernels).  Per-apply
    traffic is pattern-independent, ~7x the values-read roofline — vs
    the raw gather-ELL path's ~2000x (or failure to compile past
    n=4096) that made large structureless matrices the one capability
    hole against PETSc through round 4.

    ``rmv`` (LSQR/CGNE's transpose matvec) runs a second plan packed
    from the transpose — a gather like any other, where ELL's rmv was a
    TPU-pathological scatter-add.

    On backends without Mosaic the same routing runs as pure-XLA
    ``take_along_axis`` over the (8, 128) block axes (reach ≤ 8 / ≤ 128
    keeps the lowered selects small, unlike the whole-x gather).
    """

    segments: Tuple[AIJSegment, ...]
    t_segments: Tuple[AIJSegment, ...]
    nrows: int
    ncols: int
    n_pad_cols: int
    n_pad_rows: int
    nnz_count: int
    fill: float

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nrows, self.ncols)

    @property
    def dtype(self):
        return self.segments[0].vals.dtype

    @property
    def nnz(self) -> int:
        return self.nnz_count

    @staticmethod
    def from_coo(rows, cols, vals, shape, dtype=jnp.float32,
                 with_rmv: bool = True, target_nnz: int = 900_000):
        """``with_rmv`` packs a second plan for the transpose (LSQR/
        CGNE's rmv).  SYMMETRIC matrices share the forward plan instead
        (auto-detected: sorted (row, col, val) triples equal their
        swapped sort) — halving pack time for the common SPD case.  A
        false negative in the detector (duplicate entries sorting
        differently) only costs the extra pack, never correctness."""
        from medane_tchakorom_ufc_thesis_repository_tpu.ops import aij_pack

        def to_segs(plan):
            return tuple(
                AIJSegment(
                    chunk_ids=jnp.asarray(s.chunk_ids),
                    k1_idx=jnp.asarray(s.k1_idx),
                    k2_idx=jnp.asarray(s.k2_idx),
                    k3_idx=jnp.asarray(s.k3_idx),
                    vals=jnp.asarray(s.vals),
                    y_tile=jnp.asarray(s.y_tile),
                    yp_r2=jnp.asarray(s.yp_r2),
                    yp_mid=jnp.asarray(s.yp_mid),
                    yp_r1=jnp.asarray(s.yp_r1),
                    a=s.a, tile0=s.tile0, ntiles=s.ntiles, a_y=s.a_y,
                    wide=s.wide,
                ) for s in plan.segments
            )

        np_dtype = np.dtype(jnp.zeros((), dtype).dtype)
        plan = aij_pack.pack_aij(rows, cols, vals, shape, dtype=np_dtype,
                                 target_nnz=target_nnz)
        t_plan = None
        symmetric = False
        if with_rmv and shape[0] == shape[1]:
            r_ = np.asarray(rows, np.int64)
            c_ = np.asarray(cols, np.int64)
            v_ = np.asarray(vals)
            k1 = r_ * shape[1] + c_
            k2 = c_ * shape[1] + r_
            o1 = np.argsort(k1, kind="stable")
            o2 = np.argsort(k2, kind="stable")
            symmetric = bool(
                np.array_equal(k1[o1], k2[o2])
                and np.allclose(v_[o1], v_[o2], rtol=0, atol=0)
            )
        if with_rmv and not symmetric:
            t_plan = aij_pack.pack_aij(cols, rows, vals,
                                       (shape[1], shape[0]),
                                       dtype=np_dtype,
                                       target_nnz=target_nnz)
        fwd = to_segs(plan)
        return AIJ(
            segments=fwd,
            t_segments=(fwd if (with_rmv and symmetric)
                        else to_segs(t_plan) if t_plan is not None
                        else ()),
            nrows=int(shape[0]), ncols=int(shape[1]),
            n_pad_cols=plan.n_pad_cols,
            n_pad_rows=(t_plan.n_pad_cols if t_plan is not None
                        else 1024 * max(1, -(-int(shape[0]) // 1024))),
            nnz_count=plan.nnz, fill=plan.fill,
        )

    def _apply(self, segments, n_pad, nout, x):
        from medane_tchakorom_ufc_thesis_repository_tpu.ops import (
            aij_pack,
            aij_pallas,
            fused_pallas,
        )

        if fused_pallas.pallas_enabled():
            interpret = jax.default_backend() != "tpu"
            return aij_pallas.aij_mv_pallas(
                segments, n_pad, nout, x, interpret=interpret)
        return aij_pack.aij_mv_jnp(segments, n_pad, nout, x)

    def mv(self, x: jax.Array) -> jax.Array:
        return self._apply(self.segments, self.n_pad_cols, self.nrows, x)

    def rmv(self, y: jax.Array) -> jax.Array:
        if not self.t_segments:
            raise ValueError("AIJ packed with with_rmv=False")
        return self._apply(self.t_segments, self.n_pad_rows, self.ncols, y)


_register(AIJ, ["segments", "t_segments"],
          ["nrows", "ncols", "n_pad_cols", "n_pad_rows", "nnz_count",
           "fill"])


def operator_from_coo(rows, cols, vals, shape, dtype=jnp.float32,
                      max_diags: int = 64, max_bsr_cost: float = 16.0,
                      bsr_block_sizes: Tuple[int, ...] = (8, 16, 32, 64,
                                                          128),
                      max_dense_n: Optional[int] = None,
                      max_bsr_bytes: int = 2 << 30):
    """The ``create_matrix_sparse`` entry point (reference
    ``src/utils/utils.c:139-155``): accept ANY sparsity pattern as COO
    and return the TPU-efficient operator directly — banded → ``DIA``,
    blockable → ``BSR``, small unstructured → ``DenseOp`` (the MXU
    eats an n ≤ ``max_dense_n`` dense matvec for breakfast: measured
    0.092 ms dense vs 1.15 ms gather-ELL at n=4096, 13×; essentially
    free at n=1024), rectangular or large residual → ``ELL`` (with the
    gather-path warning from ``as_tpu_operator``'s policy).

    ``max_dense_n`` defaults to the calibrated value for the current
    chip (``core.calibration``; shipped v5e: 4096)."""
    from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
    from medane_tchakorom_ufc_thesis_repository_tpu.core.calibration import (
        default_max_dense_n,
    )

    if max_dense_n is None:
        max_dense_n = default_max_dense_n()
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    if shape[0] == shape[1]:
        if len(np.unique(cols - rows)) <= max_diags:
            return poisson.coo_to_dia(rows, cols, vals, shape, dtype=dtype)
        routed = _route_unbanded_square_coo(
            rows, cols, vals, shape, dtype, max_bsr_cost,
            bsr_block_sizes, max_dense_n, max_bsr_bytes=max_bsr_bytes,
            caller="operator_from_coo",
        )
        if routed is not None:
            return routed
    elif max(shape) <= max_dense_n:
        # small rectangular → dense: ELL's rectangular rmv is a
        # scatter-add (TPU-pathological), and rmv is exactly what the
        # least-squares KSPs (lsqr/cgne) drive
        return _dense_from_coo(rows, cols, vals, shape, dtype)
    else:
        # large rectangular → AIJ (Clos-routed gather; rmv is a second
        # routed gather, not a scatter-add)
        return AIJ.from_coo(rows, cols, vals, shape, dtype=dtype)
    return poisson.coo_to_ell(rows, cols, vals, shape, dtype=dtype)


def _dense_from_coo(rows, cols, vals, shape, dtype):
    """Host-side COO -> DenseOp (duplicates coalesced by sum)."""
    dense = np.zeros(shape, np.float64)
    np.add.at(dense, (rows, cols), vals)
    return DenseOp(a=jnp.asarray(dense, dtype))


# Routing constants (gather-ELL cost bar, BSR block-size penalties,
# dense cutoff) live in core.calibration: shipped v5e measurements,
# overridable by a per-chip file produced by ``utils.calibrate``.


# Is there a density below which a small matrix is better left as
# gather-ELL than densified?  NO — measured (v5e, barriered-slope):
# random square at density 0.1% / 0.5% / 2%, dense wins 6.2/44/~inf x
# at n=1024 and 4.6/11.5/37 x at n=4096.  The per-nonzero value-count
# model (m*n vs 139*nnz) predicts ELL wins below ~0.7% density, but
# ELL's gather throughput collapses at small row counts while the dense
# matvec is near the dispatch floor — so the dense route applies
# unconditionally below max_dense_n.


def _route_unbanded_square_coo(rows, cols, vals, shape, dtype,
                               max_bsr_cost, bsr_block_sizes, max_dense_n,
                               max_bsr_bytes: int = 2 << 30, caller=""):
    """Shared routing tail for square non-banded patterns: BSR if the
    estimated cost clears ``max_bsr_cost``; dense if small; then a
    last-resort comparison — a HIGH-fill BSR whose estimated per-nonzero
    cost still undercuts the measured Clos-AIJ cost wins as long as the
    pack fits in ``max_bsr_bytes``; otherwise AIJ (the routed gather —
    pattern-independent, compiles at any n).  Never returns None since
    round 5: the "stay on gather-ELL and warn" branch is retired."""
    import warnings

    from medane_tchakorom_ufc_thesis_repository_tpu.core.calibration import (
        bsr_bs_penalty,
        ell_relative_cost,
    )

    _ELL_RELATIVE_COST = ell_relative_cost()
    penalty = bsr_bs_penalty()
    best = None
    for bs in bsr_block_sizes:
        fill = bsr_block_fill_from_coo(rows, cols, shape, bs)
        cost = fill * penalty.get(bs, 1.0)
        if best is None or cost < best[1]:
            best = (bs, cost, fill)
    if best is not None and best[1] <= max_bsr_cost:
        return BSR.from_coo(rows, cols, vals, shape, bs=best[0],
                            dtype=dtype)
    if shape[0] <= max_dense_n:
        return _dense_from_coo(rows, cols, vals, shape, dtype)
    # AIJ: Clos-routed gather SpMV — pattern-independent cost, compiles
    # at any n (the gather-ELL path OOM'd past ~2048² and ran ~2000x
    # off slice speed; the round-4 "stay on gather-ELL and warn" branch
    # is retired).  A HIGH-fill BSR only wins when its estimated cost
    # undercuts the measured AIJ cost.
    from medane_tchakorom_ufc_thesis_repository_tpu.core.calibration import (
        aij_relative_cost,
    )

    _AIJ_COST = aij_relative_cost()
    if best is not None and best[1] < _AIJ_COST:
        bs, cost, fill = best
        # values + transpose pack + indices ≈ 2.5x the stored values
        pack_bytes = 2.5 * fill * len(rows) * np.dtype(dtype).itemsize
        if pack_bytes <= max_bsr_bytes:
            warnings.warn(
                f"{caller}: matrix is neither banded nor cleanly "
                f"blockable; using HIGH-fill BSR(bs={bs}) at an "
                f"estimated {cost:.0f}x per-nonzero cost — still "
                f"~{_AIJ_COST / max(cost, 1e-9):.1f}x faster "
                "than the routed-gather AIJ (pass max_bsr_cost=inf to "
                "silence, or max_dense_n/max_bsr_cost to reroute)",
                UserWarning, stacklevel=3,
            )
            return BSR.from_coo(rows, cols, vals, shape, bs=bs,
                                dtype=dtype)
    return AIJ.from_coo(rows, cols, vals, shape, dtype=dtype)


def from_scipy(A, dtype=jnp.float32, **route_kw):
    """``operator_from_coo`` over a ``scipy.sparse`` matrix — the
    drop-in for users arriving from the reference's AIJ assembly."""
    coo = A.tocoo()
    return operator_from_coo(coo.row, coo.col, coo.data, coo.shape,
                             dtype=dtype, **route_kw)


def bsr_block_fill_from_coo(rows, cols, shape, bs: int) -> float:
    """Stored-values-per-nonzero if packed as BSR(bs) (cheap, index-only).

    Counts the PADDED pack: block-ELL pads every block row to the widest
    row's block count, and the kernel processes padding like real blocks
    — so a pattern with one dense row (FEM constraint/Lagrange rows)
    costs ``nbr * ncb`` blocks, not just its unique blocks.  Using the
    padded count keeps the routing cost model honest and makes the
    high-fill memory cap match what ``BSR.from_coo`` actually allocates."""
    nbr = -(-int(shape[0]) // bs)
    ncb = -(-int(shape[1]) // bs)
    key = (np.asarray(rows) // bs).astype(np.int64) * ncb \
        + np.asarray(cols) // bs
    ub = np.unique(key)
    width = int(np.bincount(ub // ncb, minlength=nbr).max()) if len(ub) \
        else 0
    return nbr * width * bs * bs / max(len(np.asarray(rows)), 1)


def _BSR_BS_PENALTY():
    """Per-stored-value SpMV cost by block size, relative to the best
    (shipped: v5e barriered-slope, BENCHMARKS.md BSR table — bs=8 pads
    the (8,128) lane tiling 16x; the bs=64 dip reproduced across runs).
    Now an accessor over ``core.calibration`` so a per-chip file from
    ``utils.calibrate`` overrides the shipped table."""
    from medane_tchakorom_ufc_thesis_repository_tpu.core.calibration import (
        bsr_bs_penalty,
    )

    return bsr_bs_penalty()


def as_tpu_operator(op, max_diags: int = 64, max_bsr_cost: float = 16.0,
                    bsr_block_sizes: Tuple[int, ...] = (8, 16, 32, 64, 128),
                    max_dense_n: Optional[int] = None,
                    max_bsr_bytes: int = 2 << 30):
    """Pick the TPU-efficient representation for ``op``.

    ELL matvecs are elementwise-gather-bound (two orders of magnitude off
    the DIA / stencil paths on TPU).  Routing for a square ELL matrix:

    1. at most ``max_diags`` distinct diagonals → ``DIA`` (slice speed);
    2. blockable → ``BSR`` (block-row gathers + batched sub-block
       matvecs): pick the ``bs`` minimizing
       ``fill(bs) * _BSR_BS_PENALTY[bs]`` (estimated per-nonzero cost
       relative to the slice paths), accept if that cost is at most
       ``max_bsr_cost``;
    3. small unstructured (n ≤ ``max_dense_n``) → ``DenseOp``: the MXU
       dense matvec measured 13× the gather-ELL at n=4096 and is
       essentially free at n ≤ 1024 (64 MB of operator storage at the
       cutoff);
    4. last resort, a HIGH-fill BSR whose estimated cost still beats
       the measured gather-ELL cost (~1950x off slice speed steady
       state — see ``core.calibration``) wins if the pack fits in
       ``max_bsr_bytes``; otherwise stays gather-ELL with a
       ``UserWarning`` — that path also has a TPU-pathological
       scatter-add ``rmv``, and above ~2048² the gather's lane-padded
       select OOMs at compile time.

    ``max_dense_n`` defaults to the calibrated value for the current
    chip (``core.calibration``; shipped v5e: 4096).
    """
    from medane_tchakorom_ufc_thesis_repository_tpu.core.calibration import (
        default_max_dense_n,
    )

    if max_dense_n is None:
        max_dense_n = default_max_dense_n()
    if isinstance(op, ELL) and op.shape[0] == op.ncols:
        if op.ndiags() <= max_diags:
            return op.to_dia()
        rows, cols, vals = op.to_coo_np()
        routed = _route_unbanded_square_coo(
            rows, cols, vals, op.shape, op.dtype, max_bsr_cost,
            bsr_block_sizes, max_dense_n, max_bsr_bytes=max_bsr_bytes,
            caller="as_tpu_operator",
        )
        if routed is not None:
            return routed
    return op


def as_matvec(op):
    """Return a pure ``x -> A@x`` closure for any operator."""
    return op.mv


def as_rmatvec(op):
    return op.rmv
