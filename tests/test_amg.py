"""Smoothed-aggregation AMG (solvers/amg.py, the PCGAMG analog):
hierarchy construction, SPD cycle symmetry, iteration quality on
genuinely unstructured SPD systems, and the solve(pc='amg') surface."""

import warnings

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from medane_tchakorom_ufc_thesis_repository_tpu import solve
from medane_tchakorom_ufc_thesis_repository_tpu.core.operators import (
    from_scipy,
)
from medane_tchakorom_ufc_thesis_repository_tpu.core.poisson import (
    poisson2d_coo,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers import (
    amg_setup,
    cg,
    minres,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.amg import (
    _aggregate,
    _strength_csr,
)


def _permuted_poisson(g, seed=5):
    """2D Poisson under a random symmetric permutation: SPD and
    spectrally identical to the grid operator, but unstructured to the
    routing/aggregation (no bands, no blocks, no grid)."""
    rows, cols, vals, shape = poisson2d_coo(g, g)
    n = shape[0]
    perm = np.random.default_rng(seed).permutation(n)
    return sp.coo_matrix((vals, (perm[rows], perm[cols])),
                         shape=shape).tocsr()


def _setup_quiet(A, **kw):
    with warnings.catch_warnings():
        # level operators on permuted patterns legitimately warn
        # (gather-ELL fallback) — not under test here
        warnings.simplefilter("ignore", UserWarning)
        return amg_setup(A, **kw)


class TestHierarchy:
    def test_aggregation_covers_and_shrinks(self):
        A = _permuted_poisson(24)
        S = _strength_csr(A, 0.0)
        agg = _aggregate(S)
        n = A.shape[0]
        nc = agg.max() + 1
        assert agg.min() == 0
        assert set(np.unique(agg)) == set(range(nc))   # no empty ids
        assert nc < n / 3                              # real coarsening

    def test_levels_and_coarse_size(self):
        A = _permuted_poisson(48)
        M = _setup_quiet(A, dtype=jnp.float64, coarse_n=100)
        assert len(M.levels) >= 1
        assert M.coarse_inv.shape[0] <= max(100 * 9, A.shape[0])
        sizes = [lvl.op.shape[0] for lvl in M.levels]
        assert sizes == sorted(sizes, reverse=True)

    def test_validation_non_square(self):
        with pytest.raises(ValueError, match="square"):
            amg_setup(sp.random(8, 12, density=0.5))

    def test_near_diagonal_stalls_to_dense_coarse(self):
        # no strong connections: aggregation cannot shrink -> the
        # hierarchy stops and the dense coarse inverse IS the solver
        A = sp.diags(np.linspace(1.0, 5.0, 300)).tocsr()
        M = _setup_quiet(A, dtype=jnp.float64, coarse_n=50)
        assert len(M.levels) == 0
        r = np.random.default_rng(0).standard_normal(300)
        z = np.asarray(M.apply(jnp.asarray(r)))
        np.testing.assert_allclose(z, r / np.linspace(1.0, 5.0, 300),
                                   rtol=1e-10)

    def test_stall_above_dense_cap_raises(self):
        A = sp.diags(np.ones(6000)).tocsr()
        with pytest.raises(ValueError, match="stalled"):
            amg_setup(A, coarse_n=50, max_coarse_dense=4096)


class TestCycleQuality:
    def test_spd_symmetry_of_cycle(self):
        A = _permuted_poisson(24)
        M = _setup_quiet(A, dtype=jnp.float64, nu=2)
        rng = np.random.default_rng(3)
        r1 = jnp.asarray(rng.standard_normal(A.shape[0]))
        r2 = jnp.asarray(rng.standard_normal(A.shape[0]))
        # matched pre/post damped-Jacobi makes the V-cycle symmetric:
        # <M r1, r2> == <r1, M r2> (required for cg/minres composition)
        lhs = float(jnp.vdot(M.apply(r1), r2))
        rhs = float(jnp.vdot(r1, M.apply(r2)))
        assert abs(lhs - rhs) <= 1e-12 * max(abs(lhs), abs(rhs))

    def test_beats_jacobi_and_near_grid_independent(self):
        iters = {}
        for g in (64, 128):
            A = _permuted_poisson(g)
            b = jnp.asarray(np.asarray(A @ np.ones(A.shape[0])))
            M = _setup_quiet(A, dtype=jnp.float64)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", UserWarning)
                op = from_scipy(A, dtype=jnp.float64)
            r = cg(op.mv, b, rtol=1e-8, maxiter=2000, precond=M.apply)
            assert bool(r.converged)
            np.testing.assert_allclose(np.asarray(r.x), 1.0, rtol=1e-6)
            iters[g] = int(r.iters)
            if g == 64:
                d = jnp.asarray(1.0 / A.diagonal())
                rj = cg(op.mv, b, rtol=1e-8, maxiter=2000,
                        precond=lambda v: d * v)
                assert iters[g] * 3 <= int(rj.iters)
        # 4x the unknowns, near-constant iterations (O(n) solver)
        assert iters[128] <= 1.6 * iters[64]

    def test_minres_composition(self):
        A = _permuted_poisson(32, seed=7)
        b = jnp.asarray(np.asarray(A @ np.ones(A.shape[0])))
        M = _setup_quiet(A, dtype=jnp.float64)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            op = from_scipy(A, dtype=jnp.float64)
        r = minres(op.mv, b, rtol=1e-9, maxiter=500, precond=M.apply)
        assert bool(r.converged)
        np.testing.assert_allclose(np.asarray(r.x), 1.0, rtol=1e-6)


class TestSolveSurface:
    def test_solve_pc_amg_end_to_end(self):
        A = _permuted_poisson(48, seed=11)
        b = np.asarray(A @ np.ones(A.shape[0]))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            x, info = solve(A, b, method="cg", pc="amg", rtol=1e-8,
                            dtype=jnp.float64)
        assert info["converged"]
        assert info["pc"] == "amg"
        assert info["rel_residual"] <= 1.1e-8
        np.testing.assert_allclose(x, 1.0, rtol=1e-5)

    def test_pc_validation_mentions_amg(self):
        A = sp.eye(8).tocsr()
        with pytest.raises(ValueError, match="amg"):
            solve(A, np.ones(8), pc="ilu")
