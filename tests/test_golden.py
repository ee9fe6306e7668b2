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
