"""External iteration anchors: our Krylov counts vs scipy.sparse.linalg.

The golden pins (tests/test_golden.py) are self-referential — stable, but
never checked against an independent implementation.  SURVEY §7.3's
acceptance criterion is "iteration counts match PETSc's UIRNorm-converged
GMRES"; PETSc is not installable in this image, so scipy.sparse.linalg is
the independent anchor (same convergence convention: unpreconditioned
``||r_k|| <= rtol * ||b||`` from a zero initial guess).

Configs mirror the reference's canonical smoke runs
(``/root/reference/tmp/commands:8-50``: 2D Poisson 128x128, rtol 1e-3,
GMRES restart/maxit 30-40) plus a tight-tolerance CG/LSQR pair.  Bands
are ±10% (different Gram-Schmidt variants and rounding accumulate small
divergences near the tolerance; an algorithmic drift shows up as far
more than 10%).
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
from medane_tchakorom_ufc_thesis_repository_tpu.solvers import cg, gmres, lsqr


def _poisson2d_csr(m, n):
    rows, cols, vals, shape = poisson.poisson2d_coo(m, n)
    return sp.csr_matrix((vals, (rows, cols)), shape=shape)


def _band(ours: int, theirs: int, frac: float = 0.10):
    assert theirs > 0
    lo, hi = theirs * (1 - frac), theirs * (1 + frac)
    assert lo <= ours <= hi, (
        f"iteration count {ours} outside ±{frac:.0%} of scipy's {theirs}"
    )


class TestGmresVsScipy:
    @pytest.mark.parametrize("rtol", [1e-3, 1e-6])
    def test_poisson2d_128_restart30(self, rtol):
        m = n = 128
        A = _poisson2d_csr(m, n)
        b = np.asarray(A @ np.ones(A.shape[0]))

        inner_calls = []
        x, info = spla.gmres(
            A, b, rtol=rtol, atol=0.0, restart=30, maxiter=400,
            callback=lambda pr: inner_calls.append(pr),
            callback_type="pr_norm",
        )
        assert info == 0
        scipy_iters = len(inner_calls)

        op = poisson.poisson2d(m, n)
        res = gmres(op.mv, jnp.asarray(b), restart=30,
                    maxiter=30 * 400, rtol=rtol)
        assert bool(res.converged)
        # both count inner (matvec) iterations
        _band(int(res.iters), scipy_iters)

    def test_true_residual_meets_rtol(self):
        # the count comparison is only meaningful if both solvers enforce
        # the same invariant — pin it explicitly for ours
        m = n = 128
        rtol = 1e-3
        A = _poisson2d_csr(m, n)
        b = np.asarray(A @ np.ones(A.shape[0]))
        op = poisson.poisson2d(m, n)
        res = gmres(op.mv, jnp.asarray(b), restart=30, maxiter=12000,
                    rtol=rtol)
        rel = float(np.linalg.norm(b - np.asarray(op.mv(res.x)))
                    / np.linalg.norm(b))
        assert rel <= 1.05 * rtol


class TestCgVsScipy:
    @pytest.mark.parametrize("rtol", [1e-6, 1e-10])
    def test_poisson2d_128(self, rtol):
        m = n = 128
        A = _poisson2d_csr(m, n)
        b = np.asarray(A @ np.ones(A.shape[0]))

        count = []
        x, info = spla.cg(A, b, rtol=rtol, atol=0.0, maxiter=4000,
                          callback=lambda xk: count.append(1))
        assert info == 0
        scipy_iters = len(count)

        op = poisson.poisson2d(m, n)
        res = cg(op.mv, jnp.asarray(b), rtol=rtol, maxiter=4000)
        assert bool(res.converged)
        _band(int(res.iters), scipy_iters)


class TestLsqrVsScipy:
    def test_tall_skinny_panel(self):
        # the outer-minimization shape: R = A @ S, (n, s) with s = 8
        # (outer_solver_lsqr, reference utils.c:998-1020); consistent
        # rhs so both stop on the residual criterion (btol <-> rtol)
        m = n = 64
        s = 8
        rtol = 1e-8
        A = _poisson2d_csr(m, n)
        rng = np.random.default_rng(7)
        S = rng.standard_normal((A.shape[0], s))
        R = np.asarray(A @ S)
        a_true = rng.standard_normal(s)
        rhs = R @ a_true

        r = spla.lsqr(R, rhs, atol=0.0, btol=rtol, iter_lim=400)
        scipy_iters = r[2]

        Rj = jnp.asarray(R)
        res = lsqr(lambda v: Rj @ v, lambda u: Rj.T @ u,
                   jnp.asarray(rhs), n=s, rtol=rtol, maxiter=400)
        assert bool(res.converged)
        _band(int(res.iters), scipy_iters, frac=0.15)
