"""Mixed-precision iterative refinement.

TPU compute is f32 (bf16/f32 MXU); a single f32 solve bottoms out near
1e-6..1e-7 relative residual — short of the north-star's 1e-8 target on
3D Poisson (BASELINE.json).  Classic iterative refinement fixes this
without giving up f32 device speed:

    repeat:  r = b - A x          (f64, host/numpy — exact to ~1e-16)
             d = solve(A, r)      (f32, on-TPU, loose tolerance)
             x = x + d            (f64 accumulation)

Each pass multiplies the residual by roughly the f32 solve's relative
tolerance, so 2-3 passes reach 1e-8..1e-12 while all heavy compute stays
on the chip.  The reference needs no such machinery because PETSc runs
f64 end-to-end on CPU; this module is the TPU-native equivalent of
"just run to 1e-8".
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class RefineResult:
    x: np.ndarray            # f64 solution
    passes: int
    rel_history: List[float]
    rnorm: float
    rnorm0: float
    converged: bool


def iterative_refinement(
    solve_f32: Callable,      # (b_f32: jax.Array) -> x_f32 approximate solve
    mv_f64: Callable,         # (x: np.ndarray f64) -> A @ x in f64 (host)
    b: np.ndarray,            # f64 RHS
    *,
    rtol: float = 1e-8,
    max_passes: int = 6,
) -> RefineResult:
    """Drive ``solve_f32`` to f64 accuracy by refinement.

    ``solve_f32`` may be any jitted device solve (GMRES, a multisplitting
    driver, ...) taking and returning flat f32 arrays; ``mv_f64`` is the
    exact operator in f64 (numpy; the stencil/DIA operators evaluate
    exactly in numpy via their ``to_dense``-free formulas).
    """
    b = np.asarray(b, np.float64)
    rnorm0 = float(np.linalg.norm(b))
    if rnorm0 == 0.0:
        return RefineResult(np.zeros_like(b), 0, [], 0.0, 0.0, True)
    x = np.zeros_like(b)
    history: List[float] = []
    for p in range(max_passes):
        r = b - mv_f64(x)
        rnorm = float(np.linalg.norm(r))
        rel = rnorm / rnorm0
        history.append(rel)
        if rel <= rtol:
            return RefineResult(x, p, history, rnorm, rnorm0, True)
        # scale the correction problem to O(1) so f32 dynamic range is
        # fully available to the inner solve
        scale = rnorm
        d32 = solve_f32(jnp.asarray(r / scale, jnp.float32))
        x = x + scale * np.asarray(d32, np.float64)
    r = b - mv_f64(x)
    rnorm = float(np.linalg.norm(r))
    history.append(rnorm / rnorm0)
    return RefineResult(
        x, max_passes, history, rnorm, rnorm0, rnorm / rnorm0 <= rtol
    )


@functools.lru_cache(maxsize=32)
def _device_refine_helpers(matvec_key):
    """Jitted refinement helpers, cached per operator.

    ``matvec`` arrives as a hashable key (the operator's bound ``mv`` —
    frozen-dataclass operators hash/compare by value) so that REPEATED
    refinement calls on the same operator reuse the compiled programs.
    The original per-call closures re-jitted every call, which on the
    axon tunnel's sometimes-degraded compile service cost 15-20 s per
    call — 10x the actual compute of a 256^3 refinement.
    """
    import jax

    @jax.jit
    def residual_pass(b64, x64):
        r = b64 - matvec_key(x64)
        return r, jnp.sqrt(jnp.sum(r * r))

    @jax.jit
    def apply_correction(x64, d32, scale):
        return x64 + scale * d32.astype(jnp.float64)

    return residual_pass, apply_correction


def device_iterative_refinement(
    matvec: Callable,         # dtype-generic operator apply (f32 AND f64)
    b64,                      # f64 RHS (any shape the matvec accepts)
    solve_f32: Callable,      # (r32) -> d32 approximate device solve
    *,
    rtol: float = 1e-8,
    max_passes: int = 6,
) -> RefineResult:
    """Refinement with the f64 residual computed ON DEVICE.

    TPU f64 is emulated but the residual is one bandwidth-bound pass
    (~0.86 s at 256^3 on v5e), so keeping it on-chip beats shipping 2x
    the state over the tunnel each pass; only scalars cross the host
    boundary.  Requires a ``matvec`` that evaluates in the dtype of its
    argument — true for the matrix-free stencil operators.  Pass a
    hashable ``matvec`` (e.g. an operator's bound ``mv``) to reuse the
    compiled residual pass across calls.
    """
    b64 = jnp.asarray(b64, jnp.float64)
    try:
        residual_pass, apply_correction = _device_refine_helpers(matvec)
    except TypeError:  # unhashable closure — fall back to per-call jits
        _device_refine_helpers.cache_clear()
        residual_pass, apply_correction = _device_refine_helpers.__wrapped__(
            matvec
        )

    rnorm0 = float(jnp.sqrt(jnp.sum(b64 * b64)))
    if rnorm0 == 0.0:
        z = np.zeros(np.shape(b64))
        return RefineResult(z, 0, [], 0.0, 0.0, True)
    x64 = jnp.zeros_like(b64)
    history: List[float] = []
    for p in range(max_passes):
        if p == 0:
            # x = 0 => r = b exactly; skip the f64 matvec pass
            r64, rnorm = b64, rnorm0
        else:
            r64, rn = residual_pass(b64, x64)
            rnorm = float(rn)
        rel = rnorm / rnorm0
        history.append(rel)
        if rel <= rtol:
            return RefineResult(np.asarray(x64), p, history, rnorm,
                                rnorm0, True)
        d32 = solve_f32((r64 / rnorm).astype(jnp.float32))
        x64 = apply_correction(x64, d32, rnorm)
    r64, rn = residual_pass(b64, x64)
    rnorm = float(rn)
    history.append(rnorm / rnorm0)
    return RefineResult(
        np.asarray(x64), max_passes, history, rnorm, rnorm0,
        rnorm / rnorm0 <= rtol,
    )


def stencil2d_mv_np(m: int, n: int, diag: float = 4.0, off: float = -1.0):
    """Exact f64 host matvec for the 2D 5-point operator (refinement use)."""

    def mv(x):
        g = np.asarray(x, np.float64).reshape(m, n)
        y = diag * g
        y[1:, :] += off * g[:-1, :]
        y[:-1, :] += off * g[1:, :]
        y[:, 1:] += off * g[:, :-1]
        y[:, :-1] += off * g[:, 1:]
        return y.reshape(-1)

    return mv


def stencil3d_mv_np(nx: int, ny: int, nz: int, diag: float = 6.0,
                    off: float = -1.0):
    """Exact f64 host matvec for the 3D 7-point operator."""

    def mv(x):
        g = np.asarray(x, np.float64).reshape(nx, ny, nz)
        y = diag * g
        y[1:] += off * g[:-1]
        y[:-1] += off * g[1:]
        y[:, 1:, :] += off * g[:, :-1, :]
        y[:, :-1, :] += off * g[:, 1:, :]
        y[:, :, 1:] += off * g[:, :, :-1]
        y[:, :, :-1] += off * g[:, :, 1:]
        return y.reshape(-1)

    return mv
