"""Tests for the host-driven genuinely-asynchronous backend.

This is the analog of the reference's real async execution
(``asynchronous-multisplitting_prime.c``) — threads racing, drain-to-
newest mailboxes, Alg-5.15 termination — so assertions are on
*invariants* (converged => residual under tolerance), not exact counts.
"""

import jax.numpy as jnp
import pytest

from medane_tchakorom_ufc_thesis_repository_tpu.models import blockops
from medane_tchakorom_ufc_thesis_repository_tpu.models.host_async import (
    host_async_solve,
)


def _problem(m=32, n=32, nblocks=2):
    op = blockops.block_poisson2d(m, n, nblocks)
    b = blockops.rhs_ones(op, jnp.float64)
    return op, b


def _check_residual(res, rtol, slack=2.0):
    """Certified runs satisfy the merged bound exactly; only an
    uncertified exit (tail hit max_rounds — not expected here) falls
    back to the async-slack bound."""
    rel = res.rnorm / res.rnorm0
    if res.certified:
        assert rel <= rtol * (1 + 1e-12)
    else:
        assert rel <= slack * rtol


class TestHostAsync:
    def test_am_converges(self):
        op, b = _problem()
        res = host_async_solve(op, b, rtol=1e-3, maxiter=3000)
        assert res.converged
        _check_residual(res, 1e-3)

    def test_heterogeneous_speeds(self):
        # one block 10x slower — the WAN-emulation scenario; the fast
        # block iterates with stale data yet the solve still converges
        op, b = _problem()
        res = host_async_solve(
            op, b, rtol=1e-3, maxiter=3000, sweep_delay_s=[0.0, 0.01]
        )
        assert res.converged
        _check_residual(res, 1e-3)

    def test_amam_local(self):
        op, b = _problem()
        res = host_async_solve(
            op, b, rtol=1e-3, maxiter=3000, minimization="local", s=4
        )
        assert res.converged
        _check_residual(res, 1e-3)

    def test_amam_semi_local(self):
        op, b = _problem()
        res = host_async_solve(
            op, b, rtol=1e-3, maxiter=3000, minimization="semi_local", s=4
        )
        assert res.converged
        _check_residual(res, 1e-3)

    def test_amam_global(self):
        # async Gram exchange through mailboxes (stale peer panels OK)
        op, b = _problem()
        res = host_async_solve(
            op, b, rtol=1e-3, maxiter=3000, minimization="global", s=4
        )
        assert res.converged
        _check_residual(res, 1e-3)

    def test_maxiter_budget_respected(self):
        op, b = _problem()
        res = host_async_solve(op, b, rtol=1e-14, maxiter=10)
        assert not res.converged
        assert all(c <= 10 for c in res.sweeps_per_block)

    def test_rejects_unknown_minimization(self):
        op, b = _problem()
        with pytest.raises(ValueError):
            host_async_solve(op, b, minimization="bogus")


class TestIntraBlockParallelism:
    """intra>1: each block's inner GMRES runs as a shard_map collective
    over its own device sub-mesh (the reference's npb ranks per block,
    iSolve --npb) while blocks stay async through mailboxes."""

    def test_am_2blocks_4intra(self):
        op = blockops.block_poisson2d(32, 32)
        b = blockops.rhs_ones(op, jnp.float64)
        res = host_async_solve(
            op, b, rtol=1e-4, maxiter=4000, intra=4,
        )
        assert bool(res.converged)
        _check_residual(res, 1e-4, slack=3.0)
        assert all(s > 0 for s in res.sweeps_per_block)

    def test_3d(self):
        op = blockops.block_poisson3d(16, 8, 8)
        b = blockops.rhs_ones(op, jnp.float64)
        res = host_async_solve(
            op, b, rtol=1e-3, maxiter=4000, intra=2,
        )
        assert bool(res.converged)
        _check_residual(res, 1e-3, slack=3.0)

    def test_minimization_rejected(self):
        op = blockops.block_poisson2d(16, 16)
        b = blockops.rhs_ones(op, jnp.float64)
        with pytest.raises(ValueError, match="minimization"):
            host_async_solve(op, b, intra=2, minimization="global")

    def test_too_few_devices_rejected(self):
        op = blockops.block_poisson2d(16, 16)
        b = blockops.rhs_ones(op, jnp.float64)
        with pytest.raises(ValueError, match="devices"):
            # 16x16, 2 blocks -> 8 rows/block (divisible by 8); but
            # 2*8 = 16 devices > the 8 available
            host_async_solve(op, b, intra=8)
