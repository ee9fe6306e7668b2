"""Tests for the sharded (shard_map) multisplitting path.

Runs on the virtual 8-device CPU mesh (conftest sets
``--xla_force_host_platform_device_count=8``), mirroring how the reference
tests multi-process behavior with 4 local MPI ranks (``makefile:185-188``).
The key property: the sharded solver must reproduce the stacked
single-device solver *exactly* (same sweep counts, same iterates up to fp
roundoff) — it is the same math, different layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medane_tchakorom_ufc_thesis_repository_tpu.models import (
    blockops,
    multisplitting as ms,
)
from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
    ShardedPoisson2D,
    ShardedPoisson3D,
    make_mesh,
    sharded_multisplit_solve,
)


@pytest.fixture(scope="module")
def mesh24():
    return make_mesh(nblocks=2, intra=4)


def _setup2d(m=32, n=32):
    sop = blockops.block_poisson2d(m, n)
    b_grid = blockops.rhs_ones(sop, jnp.float64).reshape(m, n)
    return sop, ShardedPoisson2D(m, n), b_grid


def _true_rel(sop, b_grid, x_grid):
    r = b_grid.reshape(-1) - sop.global_mv(x_grid.reshape(-1))
    return float(jnp.linalg.norm(r) / jnp.linalg.norm(b_grid.reshape(-1)))


class TestShardedSM:
    def test_matches_stacked_exactly(self, mesh24):
        sop, cfg, b = _setup2d()
        res_sh = sharded_multisplit_solve(mesh24, cfg, b, rtol=1e-3, maxiter=2000)
        res_st = ms.sm(sop, blockops.rhs_ones(sop, jnp.float64),
                       rtol=1e-3, maxiter=2000)
        assert int(res_sh.sweeps) == int(res_st.sweeps)
        # psum reduction order differs from single-device sums; identical
        # math drifts by ~1e-7 over ~40 sweeps
        np.testing.assert_allclose(
            np.asarray(res_sh.x.reshape(-1)),
            np.asarray(res_st.x.reshape(-1)),
            rtol=1e-5, atol=1e-5,
        )

    def test_invariant(self, mesh24):
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(mesh24, cfg, b, rtol=1e-3, maxiter=2000)
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1e-3

    def test_3d(self, mesh24):
        sop = blockops.block_poisson3d(16, 8, 8)
        b = blockops.rhs_ones(sop, jnp.float64).reshape(16, 8, 8)
        cfg = ShardedPoisson3D(16, 8, 8)
        res = sharded_multisplit_solve(mesh24, cfg, b, rtol=1e-3, maxiter=2000)
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1e-3


class TestShardedVariants:
    @pytest.mark.parametrize("scope", ["local", "semi_local", "global"])
    def test_smsm(self, mesh24, scope):
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(
            mesh24, cfg, b, minimization=scope, s=4, rtol=1e-3, maxiter=2000
        )
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1.5e-3

    def test_smsm_matches_stacked_sweeps(self, mesh24):
        sop, cfg, b = _setup2d()
        res_sh = sharded_multisplit_solve(
            mesh24, cfg, b, minimization="global", s=4, rtol=1e-3, maxiter=2000
        )
        res_st = ms.smsm(sop, blockops.rhs_ones(sop, jnp.float64),
                         scope="global", s=4, rtol=1e-3, maxiter=2000)
        assert int(res_sh.sweeps) == int(res_st.sweeps)

    def test_async(self, mesh24):
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(
            mesh24, cfg, b, schedule="async", staleness=2, rtol=1e-3,
            maxiter=4000,
        )
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1.5e-3

    def test_amam_global(self, mesh24):
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(
            mesh24, cfg, b, schedule="async", staleness=2,
            minimization="global", s=4, rtol=1e-3, maxiter=4000,
        )
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1.5e-3

    def test_four_blocks(self):
        mesh = make_mesh(nblocks=4, intra=2)
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(
            mesh, cfg, b, minimization="global", s=4, rtol=1e-3, maxiter=3000
        )
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1.5e-3

    @pytest.mark.parametrize("method", ["normal", "qr", "lsqr"])
    def test_outer_methods_agree(self, mesh24, method):
        """All three SPMD outer LS solvers (Gram-Cholesky, distributed
        TSQR, sharded LSQR) produce the same global minimization — same
        sweep counts as the stacked f64 reference and the same solution
        (reference outer_solver_* family, utils.c:972-1043)."""
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(
            mesh24, cfg, b, minimization="global", s=4, rtol=1e-3,
            maxiter=2000, outer=ms.OuterConfig(method=method),
        )
        res_st = ms.smsm(sop, blockops.rhs_ones(sop, jnp.float64),
                         scope="global", s=4, rtol=1e-3, maxiter=2000)
        assert bool(res.converged)
        assert int(res.sweeps) == int(res_st.sweeps)
        np.testing.assert_allclose(
            np.asarray(res.x.reshape(-1)),
            np.asarray(res_st.x.reshape(-1)), rtol=1e-4, atol=1e-6,
        )

    @pytest.mark.parametrize("method", ["qr", "lsqr"])
    @pytest.mark.parametrize("scope", ["local", "semi_local"])
    def test_outer_methods_blockwise_scopes(self, mesh24, method, scope):
        """Per-block minimization scopes exercise the lockstep path:
        LSQR trip counts must agree across 'block' (lockstep_axis) and
        TSQR all_gathers run over 'intra' only."""
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(
            mesh24, cfg, b, minimization=scope, s=4, rtol=1e-3,
            maxiter=2000, outer=ms.OuterConfig(method=method),
        )
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1.5e-3

    @pytest.mark.parametrize("method", ["qr", "lsqr"])
    def test_f32_s20_g5k_config(self, mesh24, method):
        """The g5k production config (outer lsqr, s=20, f32 — reference
        running_bulk_test_g5k active block): the Gram normal equations
        lose ~half the f32 digits at s=20; TSQR/LSQR must stay accurate
        against the stacked f64 result."""
        sop, cfg, _ = _setup2d()
        b32 = blockops.rhs_ones(sop, jnp.float32).reshape(32, 32)
        res = sharded_multisplit_solve(
            mesh24, cfg, b32, minimization="global", s=20, rtol=1e-3,
            maxiter=2000, outer=ms.OuterConfig(method=method),
            inner=ms.InnerConfig(maxiter=30),
        )
        res64 = ms.smsm(
            sop, blockops.rhs_ones(sop, jnp.float64), scope="global",
            s=20, rtol=1e-3, maxiter=2000,
            inner=ms.InnerConfig(maxiter=30),
        )
        assert bool(res.converged)
        assert _true_rel(sop, b32.astype(jnp.float64), res.x) <= 1.5e-3
        np.testing.assert_allclose(
            np.asarray(res.x.reshape(-1), np.float64),
            np.asarray(res64.x.reshape(-1)), rtol=5e-3, atol=5e-4,
        )

    def test_publish_basis_collection(self, mesh24):
        """Staleness-robust async minimization (basis columns recorded at
        publish boundaries) in the SPMD engine: converges in fewer sweeps
        than per-sweep collection at staleness 4 and matches the stacked
        driver sweep-for-sweep."""
        sop, cfg, b = _setup2d()
        kw = dict(schedule="async", staleness=4, minimization="global",
                  s=4, rtol=1e-3, maxiter=8000)
        res_p = sharded_multisplit_solve(
            mesh24, cfg, b, basis_collection="publish", **kw
        )
        res_s = sharded_multisplit_solve(mesh24, cfg, b, **kw)
        assert bool(res_p.converged)
        assert _true_rel(sop, b, res_p.x) <= 1.5e-3
        assert int(res_p.sweeps) < int(res_s.sweeps)
        res_st = ms.amam(
            sop, blockops.rhs_ones(sop, jnp.float64), scope="global",
            s=4, staleness=4, rtol=1e-3, maxiter=8000,
            basis_collection="publish",
        )
        assert int(res_p.sweeps) == int(res_st.sweeps)

    def test_local_rnorms_shape(self, mesh24):
        _, cfg, b = _setup2d()
        res = sharded_multisplit_solve(mesh24, cfg, b, rtol=1e-3, maxiter=2000)
        assert res.local_rnorms.shape == (2,)


class TestShardedGMRES:
    def test_matches_single_device_iterations(self, mesh24):
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
            sharded_gmres_solve,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers import gmres

        m = n = 32
        op = poisson.poisson2d(m, n)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        ref = gmres(op.mv, b, restart=30, maxiter=2000, rtol=1e-6)
        res = sharded_gmres_solve(
            mesh24, ShardedPoisson2D(m, n), b.reshape(m, n),
            restart=30, maxiter=2000, rtol=1e-6,
        )
        assert int(res.iters) == int(ref.iters)
        assert bool(res.converged)
        r = b - op.mv(res.x.reshape(-1))
        assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) <= 1e-6

    def test_3d(self, mesh24):
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
            sharded_gmres_solve,
        )

        op = poisson.poisson3d(16, 8, 8)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        res = sharded_gmres_solve(
            mesh24, ShardedPoisson3D(16, 8, 8), b.reshape(16, 8, 8),
            restart=30, maxiter=2000, rtol=1e-6,
        )
        assert bool(res.converged)
        r = b - op.mv(res.x.reshape(-1))
        assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) <= 1e-6


class TestShardedCaGmres:
    def test_single_reduction_converges_whole_mesh(self, mesh24):
        """CA-GMRES over the full mesh with ONE Gram psum per s matvecs
        (its actual deployment target) hits the invariant."""
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
            sharded_ca_gmres_solve,
        )

        m = n = 32
        op = poisson.poisson2d(m, n)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        res = sharded_ca_gmres_solve(
            mesh24, ShardedPoisson2D(m, n), b.reshape(m, n),
            s=12, maxiter=4000, rtol=1e-6,
        )
        assert bool(res.converged)
        r = b - op.mv(res.x.reshape(-1))
        assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) <= 2e-6

    def test_matches_single_device_cycles(self, mesh24):
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
            sharded_ca_gmres_solve,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.castep import (
            ca_gmres,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.chebyshev import (
            poisson_strip_eig_bounds_2d,
        )

        m = n = 32
        op = poisson.poisson2d(m, n)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        lmin, lmax = poisson_strip_eig_bounds_2d(m, n, 4.0, -1.0)
        ref = ca_gmres(op.mv, b, s=12, maxiter=4000, rtol=1e-6,
                       lmin=lmin, lmax=lmax, reductions="single")
        res = sharded_ca_gmres_solve(
            mesh24, ShardedPoisson2D(m, n), b.reshape(m, n),
            s=12, maxiter=4000, rtol=1e-6,
        )
        assert int(res.iters) == int(ref.iters)

    def test_single_vs_column_reductions_agree(self):
        """The one-psum Gram cycle spans the same subspace as the
        per-column-norm cycle: same cycle counts, same solution (f64)."""
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.castep import (
            ca_gmres,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers.chebyshev import (
            poisson_strip_eig_bounds_2d,
        )

        m = n = 24
        op = poisson.poisson2d(m, n)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        lmin, lmax = poisson_strip_eig_bounds_2d(m, n, 4.0, -1.0)
        kw = dict(s=8, maxiter=2000, rtol=1e-8, lmin=lmin, lmax=lmax)
        a = ca_gmres(op.mv, b, reductions="column", **kw)
        c = ca_gmres(op.mv, b, reductions="single", **kw)
        assert bool(a.converged) and bool(c.converged)
        assert int(a.iters) == int(c.iters)
        np.testing.assert_allclose(
            np.asarray(a.x), np.asarray(c.x), rtol=1e-6, atol=1e-9
        )


class TestShardedOptionGuards:
    def test_cg_inner_rejected(self, mesh24):
        _, cfg, b = _setup2d()
        with pytest.raises(ValueError):
            sharded_multisplit_solve(
                mesh24, cfg, b, inner=ms.InnerConfig(method="cg")
            )

    def test_jacobi_pc_matches_stacked(self, mesh24):
        """SPMD Jacobi left-preconditioning (scalar D^-1 for the
        constant-diagonal stencil) matches the stacked pc='jacobi' path
        sweep-for-sweep."""
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(
            mesh24, cfg, b, rtol=1e-3, maxiter=2000,
            inner=ms.InnerConfig(pc="jacobi"),
        )
        res_st = ms.sm(sop, blockops.rhs_ones(sop, jnp.float64),
                       rtol=1e-3, maxiter=2000,
                       inner=ms.InnerConfig(pc="jacobi"))
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1e-3
        assert int(res.sweeps) == int(res_st.sweeps)

    def test_ilu_pc_rejected(self, mesh24):
        _, cfg, b = _setup2d()
        with pytest.raises(ValueError):
            sharded_multisplit_solve(
                mesh24, cfg, b, inner=ms.InnerConfig(pc="ilu")
            )

    def test_alpha_average_matches_stacked(self, mesh24):
        """The reference's *_modify alpha exchange in the SPMD engine:
        pmean over 'block' after the per-block LS solve — sweep parity
        with the stacked alpha_average path."""
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(
            mesh24, cfg, b, minimization="local", s=4, rtol=1e-3,
            maxiter=3000, outer=ms.OuterConfig(alpha_average=True),
        )
        res_st = ms.smsm(
            sop, blockops.rhs_ones(sop, jnp.float64), scope="local",
            s=4, rtol=1e-3, maxiter=3000,
            outer=ms.OuterConfig(alpha_average=True),
        )
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1.5e-3
        assert int(res.sweeps) == int(res_st.sweeps)

    def test_cgne_outer_rejected(self, mesh24):
        _, cfg, b = _setup2d()
        with pytest.raises(ValueError):
            sharded_multisplit_solve(
                mesh24, cfg, b, minimization="global",
                outer=ms.OuterConfig(method="cgne"),
            )

    def test_bf16_basis_works(self, mesh24):
        sop, cfg, _ = _setup2d()
        b32 = blockops.rhs_ones(sop, jnp.float32).reshape(32, 32)
        res = sharded_multisplit_solve(
            mesh24, cfg, b32, rtol=1e-3, maxiter=2000,
            inner=ms.InnerConfig(basis="bf16"),
        )
        assert bool(res.converged)


class TestShardedResume:
    def test_warm_restart_with_pinned_rnorm0(self, mesh24):
        """Checkpoint/resume on the SPMD path: solve to 1e-2, resume
        from the checkpointed iterate with the pinned reference norm to
        1e-5 — the resumed run continues instead of restarting, and the
        combined iterate hits the tight tolerance."""
        sop, cfg, b = _setup2d()
        res1 = sharded_multisplit_solve(
            mesh24, cfg, b, rtol=1e-2, maxiter=2000
        )
        assert bool(res1.converged)
        cold = sharded_multisplit_solve(
            mesh24, cfg, b, rtol=1e-5, maxiter=4000
        )
        warm = sharded_multisplit_solve(
            mesh24, cfg, b, x0=res1.x, rnorm0=float(res1.rnorm0),
            rtol=1e-5, maxiter=4000,
        )
        assert bool(warm.converged)
        assert _true_rel(sop, b, warm.x) <= 1e-5
        # resume does less work than a cold start to the same tolerance
        assert int(warm.sweeps) < int(cold.sweeps)
        # and the total work roughly matches one continuous run
        assert int(res1.sweeps) + int(warm.sweeps) <= int(cold.sweeps) + 4


class TestShardedCaGmresInner:
    def test_sm_with_ca_inner(self, mesh24):
        """SPMD per-block CA-GMRES inner: one 'intra' psum per s matvecs,
        fixed_cycles lockstep across 'block'."""
        sop, cfg, b = _setup2d()
        res = sharded_multisplit_solve(
            mesh24, cfg, b, rtol=1e-3, maxiter=2000,
            inner=ms.InnerConfig(method="ca_gmres", restart=8, maxiter=16),
        )
        assert bool(res.converged)
        assert _true_rel(sop, b, res.x) <= 1e-3
        # same math as the stacked ca_gmres inner: sweep parity
        res_st = ms.sm(
            sop, blockops.rhs_ones(sop, jnp.float64), rtol=1e-3,
            maxiter=2000,
            inner=ms.InnerConfig(method="ca_gmres", restart=8, maxiter=16),
        )
        assert int(res.sweeps) == int(res_st.sweeps)
