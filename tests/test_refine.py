"""Tests for mixed-precision iterative refinement and GMRES stagnation."""

import jax
import jax.numpy as jnp
import numpy as np

from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
from medane_tchakorom_ufc_thesis_repository_tpu.solvers import gmres
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.refine import (
    iterative_refinement,
    stencil2d_mv_np,
    stencil3d_mv_np,
)


class TestIterativeRefinement:
    def test_f32_solver_reaches_1e10(self):
        m = n = 32
        op = poisson.poisson2d(m, n)
        mv64 = stencil2d_mv_np(m, n)
        b = mv64(np.ones(m * n))
        solve32 = jax.jit(
            lambda bb: gmres(op.mv, bb.astype(jnp.float32), restart=30,
                             maxiter=1000, rtol=1e-5).x
        )
        res = iterative_refinement(solve32, mv64, b, rtol=1e-10)
        assert res.converged
        assert res.rnorm / res.rnorm0 <= 1e-10
        assert res.passes <= 4
        np.testing.assert_allclose(res.x, np.ones(m * n), atol=1e-8)

    def test_3d_north_star_tolerance(self):
        # the BASELINE.json target: 3D Poisson to 1e-8 relative residual
        # with f32 device compute
        nx = ny = nz = 12
        op = poisson.poisson3d(nx, ny, nz)
        mv64 = stencil3d_mv_np(nx, ny, nz)
        b = mv64(np.ones(nx * ny * nz))
        solve32 = jax.jit(
            lambda bb: gmres(op.mv, bb.astype(jnp.float32), restart=30,
                             maxiter=1000, rtol=1e-5).x
        )
        res = iterative_refinement(solve32, mv64, b, rtol=1e-8)
        assert res.converged
        assert res.rnorm / res.rnorm0 <= 1e-8

    def test_history_monotone(self):
        m = n = 16
        op = poisson.poisson2d(m, n)
        mv64 = stencil2d_mv_np(m, n)
        b = mv64(np.linspace(0, 1, m * n))
        solve32 = jax.jit(
            lambda bb: gmres(op.mv, bb.astype(jnp.float32), restart=30,
                             maxiter=500, rtol=1e-4).x
        )
        res = iterative_refinement(solve32, mv64, b, rtol=1e-12,
                                   max_passes=5)
        assert all(
            b < a for a, b in zip(res.rel_history, res.rel_history[1:])
        )

    def test_zero_rhs(self):
        mv64 = stencil2d_mv_np(8, 8)
        res = iterative_refinement(lambda b: b, mv64, np.zeros(64))
        assert res.converged and res.passes == 0


class TestFusedNorthstar:
    def test_single_dispatch_program_reaches_1e8(self):
        """df_northstar_fused: the whole MG-PCG + df refinement in ONE
        jitted while_loop — must match the host-loop driver's result,
        host-f64-verified."""
        import numpy as np

        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers import df64
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.refine import (
            df_northstar_fused,
            stencil3d_mv_np,
        )

        op = poisson.poisson3d(32, 32, 32)
        res = df_northstar_fused(op, rtol=1e-8)
        assert res.converged
        assert res.passes <= 3
        x64 = df64.df_to_f64(res.x)
        mv64 = stencil3d_mv_np(32, 32, 32)
        b64 = mv64(np.ones(32 ** 3))
        rel = (np.linalg.norm(b64 - mv64(x64.reshape(-1)))
               / np.linalg.norm(b64))
        assert rel <= 1e-8, rel
        np.testing.assert_allclose(x64, 1.0, atol=1e-7)

    def test_2d(self):
        import numpy as np

        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers import df64
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.refine import (
            df_northstar_fused,
        )

        op = poisson.poisson2d(64, 64)
        res = df_northstar_fused(op, rtol=1e-8)
        assert res.converged
        x64 = df64.df_to_f64(res.x)
        np.testing.assert_allclose(x64, 1.0, atol=1e-7)


class TestStagnation:
    def test_stagnation_stops_at_floor(self):
        op = poisson.poisson2d(16, 16)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        res = gmres(op.mv, b, restart=30, maxiter=100000, rtol=1e-30,
                    stag_tol=1e-6)
        assert bool(res.converged)      # reference semantics: stagnated
        assert int(res.iters) < 1000    # stopped promptly, not at budget
        # at the f64 floor
        r = b - op.mv(res.x)
        assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-14

    def test_stagnation_does_not_fire_early(self):
        op = poisson.poisson2d(16, 16)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        with_stag = gmres(op.mv, b, restart=30, maxiter=500, rtol=1e-10,
                          stag_tol=1e-6)
        without = gmres(op.mv, b, restart=30, maxiter=500, rtol=1e-10)
        assert int(with_stag.iters) == int(without.iters)
