"""Golden iteration-count regression tests.

The reference validates algorithms by watching printed iteration counts
on canonical configs (SURVEY.md §4).  These pins catch silent numerical
regressions: a change that alters any of these counts either changed the
math (investigate!) or legitimately improved it (update the pin and say
why in the commit).

All runs: 2D Poisson 32x32, b = A@1, f64, default InnerConfig
(gmres restart 30 maxiter 20 rtol 1e-3 cgs2), rtol 1e-3.
"""

import jax.numpy as jnp

from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
from medane_tchakorom_ufc_thesis_repository_tpu.models import (
    blockops,
    multisplitting as ms,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers import gmres


def _setup():
    op = blockops.block_poisson2d(32, 32)
    return op, blockops.rhs_ones(op, jnp.float64)


class TestGoldenCounts:
    def test_sm_sweeps(self):
        op, b = _setup()
        assert int(ms.sm(op, b, rtol=1e-3, maxiter=2000).sweeps) == 42

    def test_am_stale2_sweeps(self):
        # 88 = 84 before the Alg-5.15 pseudo-period gate + 4 cycles of
        # publish-gated persistence counting
        op, b = _setup()
        assert int(ms.am(op, b, staleness=2, rtol=1e-3,
                         maxiter=4000).sweeps) == 88

    def test_smsm_local_sweeps(self):
        op, b = _setup()
        assert int(ms.smsm(op, b, scope="local", s=4, rtol=1e-3,
                           maxiter=2000).sweeps) == 36

    def test_smsm_semi_local_sweeps(self):
        op, b = _setup()
        assert int(ms.smsm(op, b, scope="semi_local", s=4, rtol=1e-3,
                           maxiter=2000).sweeps) == 12

    def test_smsm_global_sweeps(self):
        op, b = _setup()
        assert int(ms.smsm(op, b, scope="global", s=4, rtol=1e-3,
                           maxiter=2000).sweeps) == 12

    def test_gmres_baseline_iters(self):
        op = poisson.poisson2d(32, 32)
        b = poisson.rhs_for_exact_ones(op).astype(jnp.float64)
        res = gmres(op.mv, b, restart=30, maxiter=2000, rtol=1e-6)
        assert int(res.iters) == 103


class TestG5kConfigs:
    """The reference's ACTIVE Grid'5000 bulk configs
    (running_bulk_test_g5k, non-commented loops): 32^2 mesh, s=20,
    rtol 1e-4, inner gmres(maxit 20), outer lsqr(maxit 70), np=16/npb=8
    -> 2 Jacobi blocks x 4 intra devices here.  Pinned sweep counts."""

    def test_smsm_global_g5k(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.models import (
            blockops,
            multisplitting as ms,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
            ShardedPoisson2D,
            make_mesh,
            sharded_multisplit_solve,
        )

        mesh = make_mesh(nblocks=2, intra=4)
        sop = blockops.block_poisson2d(32, 32)
        b = blockops.rhs_ones(sop, jnp.float64).reshape(32, 32)
        res = sharded_multisplit_solve(
            mesh, ShardedPoisson2D(32, 32), b,
            minimization="global", s=20, rtol=1e-4, maxiter=2000,
            inner=ms.InnerConfig(maxiter=20),
            outer=ms.OuterConfig(method="lsqr", maxiter=70),
        )
        assert bool(res.converged)
        # s=20 basis resolves the 32^2 system in ONE outer cycle
        assert int(res.cycles) == 1
        assert int(res.sweeps) == 20
        r = b.reshape(-1) - sop.global_mv(res.x.reshape(-1))
        assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b.reshape(-1))) <= 1e-4

    def test_amam_global_g5k(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.models import (
            blockops,
            multisplitting as ms,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
            ShardedPoisson2D,
            make_mesh,
            sharded_multisplit_solve,
        )

        mesh = make_mesh(nblocks=2, intra=4)
        sop = blockops.block_poisson2d(32, 32)
        b = blockops.rhs_ones(sop, jnp.float64).reshape(32, 32)
        res = sharded_multisplit_solve(
            mesh, ShardedPoisson2D(32, 32), b,
            schedule="async", staleness=2, minimization="global",
            s=20, rtol=1e-4, maxiter=2000, min_convergence_count=2,
            inner=ms.InnerConfig(maxiter=20),
            outer=ms.OuterConfig(method="lsqr", maxiter=70),
        )
        assert bool(res.converged)
        assert int(res.sweeps) == 60
        r = b.reshape(-1) - sop.global_mv(res.x.reshape(-1))
        assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b.reshape(-1))) <= 1e-4
