"""Geometric multigrid (solvers/multigrid.py) — PCMG-analog tests.

The reference never preconditions (``pc none`` throughout
``config/default_run_variables``), so there is no reference behavior to
pin; these tests assert the mathematical contracts that make the V-cycle
a valid, grid-independent CG preconditioner.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
from medane_tchakorom_ufc_thesis_repository_tpu.solvers import cg, mg_preconditioner
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.multigrid import plan, vcycle


class TestHierarchy:
    def test_plan_halves_until_min_size(self):
        lv = plan(poisson.poisson2d(64, 64), min_size=4)
        assert lv.dims == ((64, 64), (32, 32), (16, 16), (8, 8), (4, 4))

    def test_plan_stops_at_odd_dims(self):
        lv = plan(poisson.poisson2d(48, 48), min_size=4)
        # 48 -> 24 -> 12 -> 6; 6/2=3 < 4 stops
        assert lv.dims == ((48, 48), (24, 24), (12, 12), (6, 6))

    def test_plan_rectangular(self):
        lv = plan(poisson.poisson3d(32, 16, 8), min_size=4)
        assert lv.dims == ((32, 16, 8), (16, 8, 4))

    def test_single_level_odd_grid(self):
        # nothing to coarsen: the "V-cycle" degenerates to the Chebyshev
        # coarse solve and must still act as a reasonable A^{-1}
        op = poisson.poisson2d(5, 5)
        M = mg_preconditioner(op)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        res = cg(op.mv, b, rtol=1e-10, maxiter=50, precond=M)
        assert bool(res.converged)

    def test_unsupported_operator_raises(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.core.operators import DenseOp

        with pytest.raises(TypeError):
            plan(DenseOp(jnp.eye(4)))


class TestVCycle:
    @pytest.mark.parametrize("dims", [(32, 32), (16, 16, 16)])
    def test_contracts_error(self, dims):
        """One V(2,2) cycle must beat the PWC-transfer worst case (~0.7)."""
        maker = poisson.poisson2d if len(dims) == 2 else poisson.poisson3d
        op = maker(*dims)
        lv = plan(op)
        rng = np.random.default_rng(0)
        xstar = jnp.asarray(rng.standard_normal(dims))
        b = op.mv(xstar)
        x = vcycle(lv, b)  # one cycle from zero guess
        r0 = float(jnp.linalg.norm(b))
        r1 = float(jnp.linalg.norm(b - op.mv(x)))
        assert r1 < 0.7 * r0

    def test_symmetric(self):
        """<M u, v> == <u, M v> — required for PCG validity (equal
        pre/post Jacobi sweeps, P ∝ Rᵀ, Chebyshev = polynomial in A)."""
        op = poisson.poisson2d(16, 16)
        M = mg_preconditioner(op)
        rng = np.random.default_rng(1)
        u = jnp.asarray(rng.standard_normal(16 * 16))
        v = jnp.asarray(rng.standard_normal(16 * 16))
        a = float(jnp.vdot(M(u), v))
        b = float(jnp.vdot(u, M(v)))
        assert abs(a - b) < 1e-10 * max(abs(a), 1.0)

    def test_shape_polymorphic(self):
        op = poisson.poisson3d(8, 8, 8)
        M = mg_preconditioner(op)
        r = jnp.arange(512, dtype=jnp.float64)
        flat = M(r)
        grid = M(r.reshape(8, 8, 8))
        assert flat.shape == (512,)
        assert grid.shape == (8, 8, 8)
        np.testing.assert_allclose(np.asarray(flat), np.asarray(grid).ravel())


class TestPCG:
    @pytest.mark.parametrize(
        "dims", [(64, 64), (128, 128), (256, 256), (32, 32, 32)]
    )
    def test_grid_independent_iterations(self, dims):
        """MG-PCG to 1e-8 in <= 20 iterations at every size (plain CG
        needs O(n) — 135 at 64^2, ~550 at 256^2)."""
        maker = poisson.poisson2d if len(dims) == 2 else poisson.poisson3d
        op = maker(*dims)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        res = cg(op.mv, b, rtol=1e-8, maxiter=50, precond=mg_preconditioner(op))
        assert bool(res.converged)
        assert int(res.iters) <= 20
        rel = float(jnp.linalg.norm(b - op.mv(res.x)) / jnp.linalg.norm(b))
        assert rel <= 1e-7
        # known exact solution u = 1
        assert float(jnp.max(jnp.abs(res.x - 1.0))) < 1e-6

    def test_w_cycle(self):
        """W-cycle (PCMG -pc_mg_cycle_type w parity): symmetric — PCG
        converges — and contracts at least as well per cycle as V."""
        op = poisson.poisson2d(64, 64)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        res_w = cg(op.mv, b, rtol=1e-8, maxiter=50,
                   precond=mg_preconditioner(op, cycle="w"))
        res_v = cg(op.mv, b, rtol=1e-8, maxiter=50,
                   precond=mg_preconditioner(op, cycle="v"))
        assert bool(res_w.converged)
        assert int(res_w.iters) <= int(res_v.iters)
        assert float(jnp.max(jnp.abs(res_w.x - 1.0))) < 1e-6

    def test_unknown_cycle_rejected(self):
        import pytest as _pytest
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers import (
            multigrid as _mg,
        )

        with _pytest.raises(ValueError, match="cycle"):
            _mg.plan(poisson.poisson2d(16, 16), cycle="f")

    def test_matches_dense_solution(self):
        op = poisson.poisson2d(8, 8)
        rng = np.random.default_rng(2)
        b = jnp.asarray(rng.standard_normal(64))
        res = cg(op.mv, b, rtol=1e-12, maxiter=100, precond=mg_preconditioner(op))
        xd = np.linalg.solve(np.asarray(op.to_dense()), np.asarray(b))
        np.testing.assert_allclose(np.asarray(res.x), xd, rtol=1e-8, atol=1e-10)

    def test_f32(self):
        op = poisson.poisson3d(16, 16, 16)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float32)
        res = cg(op.mv, b, rtol=1e-5, maxiter=50, precond=mg_preconditioner(op))
        assert bool(res.converged)
        assert int(res.iters) <= 20

    def test_return_rdot_parity(self):
        """mg_preconditioner(return_rdot=True) returns the SAME cycle
        output plus r·z, and cg(precond_dot=...) converges identically
        (same iteration count; the dot rides the fused kernel at HBM
        scale, an explicit vdot here)."""
        op = poisson.poisson3d(32, 32, 32)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float32)
        M = mg_preconditioner(op)
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.multigrid import (  # noqa: E501
            mg_preconditioner as _mgp,
        )
        Md = _mgp(op, return_rdot=True)
        z, d = Md(b)
        z2 = M(b)
        np.testing.assert_allclose(np.asarray(z), np.asarray(z2),
                                   rtol=1e-7, atol=0)
        np.testing.assert_allclose(
            float(d), float(jnp.vdot(b, z2)), rtol=1e-5)
        r1 = cg(op.mv, b, rtol=1e-6, maxiter=50, precond=M)
        r2 = cg(op.mv, b, rtol=1e-6, maxiter=50, precond_dot=Md)
        assert bool(r2.converged)
        # rz via jnp.vdot vs jnp.sum(g*z) are different reduction
        # expressions; allow one-iteration slack at the tolerance boundary
        assert abs(int(r1.iters) - int(r2.iters)) <= 1
        np.testing.assert_allclose(
            np.asarray(r1.x), np.asarray(r2.x), rtol=1e-4, atol=1e-6)

    def test_identity_precond_matches_plain(self):
        op = poisson.poisson2d(16, 16)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        plain = cg(op.mv, b, rtol=1e-10, maxiter=500)
        ident = cg(op.mv, b, rtol=1e-10, maxiter=500, precond=lambda v: v)
        assert int(plain.iters) == int(ident.iters)
        np.testing.assert_allclose(
            np.asarray(plain.x), np.asarray(ident.x), rtol=1e-12
        )


class TestCyclePrecision:
    """bf16 cycle arithmetic (auto at bandwidth-bound sizes; measured
    512^3 north-star 0.87 -> 0.63 s on v5e at identical 2-pass
    convergence — BENCHMARKS.md)."""

    def test_explicit_bf16_cycle_preconditions_cg(self):
        import jax.numpy as jnp

        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers import cg
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.multigrid import (
            mg_preconditioner,
        )

        op = poisson.poisson2d(32, 32)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float32)
        M = mg_preconditioner(op, dtype=jnp.bfloat16)
        z = M(b)
        assert z.dtype == jnp.float32   # cast back to the input dtype
        res = cg(op.mv, b, rtol=1e-6, maxiter=60, precond=M)
        assert bool(res.converged)
        # a bf16 cycle is a weaker (but still SPD) preconditioner:
        # iteration count stays in the grid-independent regime
        assert int(res.iters) <= 20

    def test_auto_threshold_selects_by_size(self, monkeypatch):
        import jax.numpy as jnp

        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers import (
            multigrid as mgm,
        )

        op = poisson.poisson2d(16, 16)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float32)
        # tiny threshold -> bf16 cycle; result dtype still follows input
        monkeypatch.setattr(mgm, "_BF16_CYCLE_BYTES", 1)
        z = mgm.mg_preconditioner(op)(b)
        assert z.dtype == jnp.float32
        # huge threshold -> input-dtype cycle, exact same as explicit f32
        monkeypatch.setattr(mgm, "_BF16_CYCLE_BYTES", 10**15)
        z32 = mgm.mg_preconditioner(op)(b)
        zexp = mgm.mg_preconditioner(op, dtype=jnp.float32)(b)
        import numpy as np

        np.testing.assert_array_equal(np.asarray(z32), np.asarray(zexp))


class TestLinearTransfers:
    """transfers='linear' (trilinear P + matched full weighting — the
    PCMG interpolation-type analog).  Round-5 measured result: no
    iteration win over pwc (the smoother limits the cycle), kept for
    capability parity; these tests pin symmetry + convergence."""

    def test_prolong_restrict_adjoint(self):
        import numpy as np

        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.multigrid import (  # noqa: E501
            _prolong_lin,
            _restrict_lin,
        )

        rng = np.random.default_rng(0)
        dims = (16, 8, 16)
        cdims = tuple(d // 2 for d in dims)
        e = jnp.asarray(rng.standard_normal(cdims))
        f = jnp.asarray(rng.standard_normal(dims))
        lhs = float(jnp.vdot(_prolong_lin(e, cdims), f))
        rhs = float(jnp.vdot(e, 8.0 * _restrict_lin(f, dims)))
        assert abs(lhs - rhs) <= 1e-10 * max(1.0, abs(lhs))

    def test_cycle_preconditions_cg(self):
        op = poisson.poisson3d(32, 32, 32)
        b = poisson.rhs_for_exact_ones(op)
        M = mg_preconditioner(op, transfers="linear", dtype=jnp.float64)
        r = cg(op.mv, b, rtol=1e-8, maxiter=40, precond=M)
        assert bool(r.converged)
        rel = float(jnp.linalg.norm(b - op.mv(r.x)) / jnp.linalg.norm(b))
        assert rel <= 2e-8
