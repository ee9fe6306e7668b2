"""Row-sharded general-sparse solves (the MPIAIJ-across-ranks analog):
arbitrary patterns on the device mesh, scipy-verified."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from medane_tchakorom_ufc_thesis_repository_tpu.parallel import mesh as meshmod
from medane_tchakorom_ufc_thesis_repository_tpu.parallel.general import (
    ShardedGeneralBSR,
    shard_general_from_coo,
    sharded_general_solve,
    _local_mv,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers import gmres


def _random_spd(n=256, seed=3, density=0.02):
    A = sp.random(n, n, density=density, random_state=seed).tocsr()
    A = (A @ A.T) + sp.eye(n) * n
    return A.tocsr()


def _pack(A, ndev, c=8):
    coo = A.tocoo()
    return shard_general_from_coo(coo.row, coo.col, coo.data,
                                  A.shape[0], ndev, c=c, dtype=jnp.float64)


class TestShardedGeneral:
    def test_mv_matches_scipy(self):
        A = _random_spd()
        op = _pack(A, ndev=8)
        x = np.random.default_rng(5).standard_normal(A.shape[0])
        ys = []
        strip = op.strip
        for d in range(8):
            ys.append(np.asarray(_local_mv(
                op.idx[d], op.val[d], jnp.asarray(x)
            )))
        np.testing.assert_allclose(np.concatenate(ys), A @ x, rtol=1e-12)

    @pytest.mark.parametrize("method", ["gmres", "cg"])
    def test_solve_on_mesh_matches_scipy_solution(self, method):
        A = _random_spd()
        op = _pack(A, ndev=8)
        mesh = meshmod.make_mesh(nblocks=2, intra=4)
        xstar = np.ones(A.shape[0])
        b = jnp.asarray(A @ xstar)
        res = sharded_general_solve(mesh, op, b, method=method,
                                    rtol=1e-10, maxiter=3000)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), xstar, atol=1e-6)
        rel = float(np.linalg.norm(b - A @ np.asarray(res.x))
                    / np.linalg.norm(b))
        assert rel <= 1.05e-10

    def test_iteration_parity_with_single_device(self):
        """The sharded run is the SAME Krylov process (psum'd dots):
        iteration counts match the single-device gmres on the dense
        operator exactly."""
        A = _random_spd(n=128, seed=7)
        op = _pack(A, ndev=8)
        mesh = meshmod.make_mesh(nblocks=2, intra=4)
        b = jnp.asarray(A @ np.ones(A.shape[0]))
        res = sharded_general_solve(mesh, op, b, method="gmres",
                                    rtol=1e-8, maxiter=2000)
        Ad = jnp.asarray(A.todense())
        ref = gmres(lambda v: Ad @ v, b, restart=30, maxiter=2000,
                    rtol=1e-8)
        assert bool(res.converged) and bool(ref.converged)
        assert abs(int(res.iters) - int(ref.iters)) <= 2

    def test_device_count_mismatch_raises(self):
        A = _random_spd(n=64, seed=9)
        op = _pack(A, ndev=4)
        mesh = meshmod.make_mesh(nblocks=2, intra=4)
        with pytest.raises(ValueError, match="packed for 4"):
            sharded_general_solve(mesh, op, jnp.zeros(64))
