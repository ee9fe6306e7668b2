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


def _block_ill_conditioned(nb, bs, seed=0, coupling=1e-2):
    """blkdiag(cond-1e3 SPD blocks) + weak coupling (test_bjacobi.py)."""
    rng = np.random.default_rng(seed)
    n = nb * bs
    A = sp.lil_matrix((n, n))
    for k in range(nb):
        Q, _ = np.linalg.qr(rng.standard_normal((bs, bs)))
        lam = np.logspace(0, 3, bs)
        A[k * bs:(k + 1) * bs, k * bs:(k + 1) * bs] = (Q * lam) @ Q.T
    C = sp.random(n, n, density=0.02, random_state=seed + 1)
    return (A.tocsr() + coupling * (C + C.T)).tocsr()


class TestShardedBlockJacobi:
    """Row-sharded PCBJACOBI analog: device-local batched block-inverse
    applies (parallel/general.py ShardedBlockJacobi)."""

    @pytest.mark.parametrize("method", ["gmres", "cg"])
    def test_pc_accelerates_and_matches_scipy(self, method):
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel.general import (
            shard_bjacobi_from_coo,
        )

        A = _block_ill_conditioned(nb=16, bs=16, seed=21)
        op = _pack(A, ndev=8)
        mesh = meshmod.make_mesh(nblocks=2, intra=4)
        b = jnp.asarray(A @ np.ones(A.shape[0]))
        coo = A.tocoo()
        pc = shard_bjacobi_from_coo(coo.row, coo.col, coo.data,
                                    A.shape[0], ndev=8, bs=16,
                                    dtype=jnp.float64)
        plain = sharded_general_solve(mesh, op, b, method=method,
                                      rtol=1e-8, maxiter=2000)
        pre = sharded_general_solve(mesh, op, b, method=method,
                                    rtol=1e-8, maxiter=2000, pc=pc)
        assert bool(pre.converged)
        np.testing.assert_allclose(np.asarray(pre.x), 1.0, rtol=1e-5)
        assert int(pre.iters) < int(plain.iters) / 3

    def test_pc_block_must_fit_strip(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel.general import (
            shard_bjacobi_from_coo,
        )

        A = _block_ill_conditioned(nb=4, bs=16, seed=23)
        coo = A.tocoo()
        with pytest.raises(ValueError, match="straddle"):
            shard_bjacobi_from_coo(coo.row, coo.col, coo.data,
                                   A.shape[0], ndev=4, bs=12,
                                   dtype=jnp.float64)


class TestShardedAIJ:
    """Row-strip-sharded Clos-routed AIJ (round 5): MPIAIJ for
    STRUCTURELESS patterns — all_gather'd x, strip-local routed gather,
    psum reductions."""

    def _mesh(self, ndev=8):
        devs = np.array(jax.devices()[:ndev]).reshape(ndev)
        from jax.sharding import Mesh

        return Mesh(devs, ("d",))

    def test_mv_matches_scipy_on_mesh(self):
        from jax import lax, shard_map
        from jax.sharding import PartitionSpec as P

        from medane_tchakorom_ufc_thesis_repository_tpu.parallel.general import (  # noqa: E501
            _aij_local_mv,
            shard_aij_from_coo,
        )

        rng = np.random.default_rng(0)
        n, ndev, nnz = 8192, 8, 40000
        rows = rng.integers(0, n, nnz)
        cols = rng.integers(0, n, nnz)
        vals = rng.standard_normal(nnz)
        op = shard_aij_from_coo(rows, cols, vals, n, ndev,
                                dtype=jnp.float64)
        assert op.a >= 8 and op.wide
        mesh = self._mesh(ndev)
        axes = ("d",)
        vec = P(axes)
        fields = ("chunk_ids", "k1_idx", "k2_idx", "k3_idx", "vals",
                  "y_tile", "yp_r2", "yp_mid", "yp_r1")
        specs = tuple(
            P(axes, *([None] * (getattr(op, f).ndim - 1)))
            for f in fields
        )

        def body(x_loc, *plan_loc):
            x_full = lax.all_gather(x_loc, axes, tiled=True)
            return _aij_local_mv(op, plan_loc, x_full)

        mv = jax.jit(shard_map(body, mesh=mesh,
                               in_specs=(vec,) + specs,
                               out_specs=vec, check_vma=False))
        x = rng.standard_normal(n)
        y = np.asarray(mv(jnp.asarray(x),
                          *[getattr(op, f) for f in fields]))
        A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
        np.testing.assert_allclose(y, A @ x, rtol=1e-10, atol=1e-10)

    @pytest.mark.parametrize("method", ["cg", "gmres"])
    def test_solve_on_mesh(self, method):
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel.general import (  # noqa: E501
            shard_aij_from_coo,
            sharded_aij_solve,
        )

        rng = np.random.default_rng(1)
        n, ndev = 8192, 8
        B = sp.random(n, n, density=0.001, random_state=1)
        S = (B + B.T) * 0.5
        S = S + sp.eye(n) * (abs(S).sum(axis=1).max() + 1.0)
        coo = S.tocoo()
        op = shard_aij_from_coo(coo.row, coo.col, coo.data, n, ndev,
                                dtype=jnp.float64)
        mesh = self._mesh(ndev)
        b = jnp.asarray(np.ones(n))
        res = sharded_aij_solve(mesh, op, b, method=method, rtol=1e-8,
                                maxiter=500)
        x = np.asarray(res.x)
        rel = (np.linalg.norm(S.tocsr() @ x - 1.0)
               / np.linalg.norm(np.ones(n)))
        assert bool(res.converged) and rel <= 1e-7, (rel, method)

    def test_uniform_a_across_strips(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel.general import (  # noqa: E501
            shard_aij_from_coo,
        )

        rng = np.random.default_rng(2)
        n, ndev = 4096, 4
        # skew the nnz so natural per-strip block counts differ
        rows = np.concatenate([
            rng.integers(0, n // 4, 20000),
            rng.integers(n // 4, n, 3000),
        ])
        cols = rng.integers(0, n, rows.shape[0])
        vals = rng.standard_normal(rows.shape[0])
        op = shard_aij_from_coo(rows, cols, vals, n, ndev,
                                dtype=jnp.float64)
        # stacked plans share one block count (the min_blocks re-pack)
        assert op.chunk_ids.shape == (ndev, op.a)
