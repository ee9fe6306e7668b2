"""One-call ``solve`` API (api.py): the scipy-style entry point that
collapses the reference's assemble → configure-KSP → KSPSolve workflow
(``utils.c:139-155, 511-541``) into a single call."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from medane_tchakorom_ufc_thesis_repository_tpu import lstsq, solve


def _spd_blockable(nb=16, bs=16, seed=71):
    rng = np.random.default_rng(seed)
    n = nb * bs
    A = sp.lil_matrix((n, n))
    for k in range(nb):
        Q, _ = np.linalg.qr(rng.standard_normal((bs, bs)))
        lam = np.logspace(0, 2, bs)
        A[k * bs:(k + 1) * bs, k * bs:(k + 1) * bs] = (Q * lam) @ Q.T
    C = sp.random(n, n, density=0.02, random_state=seed + 1)
    return (A.tocsr() + 1e-2 * (C + C.T)).tocsr()


class TestSolve:
    @pytest.mark.parametrize("method", ["gmres", "cg", "bicgstab",
                                        "ca_gmres"])
    def test_methods_converge(self, method):
        A = _spd_blockable()
        b = np.asarray(A @ np.ones(A.shape[0]))
        x, info = solve(A, b, method=method, rtol=1e-8,
                        dtype=jnp.float64, s=6)
        assert info["converged"], info
        assert info["rel_residual"] <= 1.1e-8
        np.testing.assert_allclose(x, 1.0, rtol=1e-5)
        assert info["operator"] == "BSR"

    def test_bjacobi_pc_cuts_iterations(self):
        A = _spd_blockable(seed=73)
        b = np.asarray(A @ np.ones(A.shape[0]))
        _, plain = solve(A, b, rtol=1e-8, dtype=jnp.float64)
        x, pre = solve(A, b, rtol=1e-8, pc="bjacobi", pc_block_size=16,
                       dtype=jnp.float64)
        assert pre["converged"] and pre["rel_residual"] <= 1.1e-8
        assert pre["iters"] < plain["iters"] / 3

    def test_banded_routes_to_dia_f32_default(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson

        rows, cols, vals, shape = poisson.poisson2d_coo(24, 24)
        A = sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsr()
        b = np.asarray(A @ np.ones(A.shape[0]))
        x, info = solve(A, b, rtol=1e-5)   # default f32
        assert info["converged"]
        assert info["operator"] in ("DIA", "Stencil2D")
        assert info["rel_residual"] <= 2e-5   # f32 slack

    def test_validation(self):
        A = _spd_blockable(nb=2, bs=8)
        b = np.ones(A.shape[0])
        with pytest.raises(ValueError, match="method"):
            solve(A, b, method="sor")
        with pytest.raises(ValueError, match="pc"):
            solve(A, b, pc="ilu")
        with pytest.raises(ValueError, match="square"):
            solve(sp.random(8, 12, density=0.5), np.ones(8))
        with pytest.raises(ValueError, match="length"):
            solve(A, np.ones(3))
        with pytest.raises(ValueError, match="compose"):
            solve(A, b, method="ca_gmres", pc="bjacobi")


class TestLstsq:
    """One-call least-squares (api.lstsq): the reference's LSQR/CGNE
    outer stage (utils.c:998-1043) lifted to arbitrary user systems."""

    def _overdetermined(self, m=200, n=60, seed=81, inconsistent=True):
        rng = np.random.default_rng(seed)
        A = sp.random(m, n, density=0.15, random_state=seed).tocsr()
        A = A + sp.eye(m, n)  # full column rank
        xstar = rng.standard_normal(n)
        b = np.asarray(A @ xstar)
        if inconsistent:
            # add a residual component orthogonal to range(A)
            r = rng.standard_normal(m)
            Ad = A.toarray()
            r -= Ad @ np.linalg.lstsq(Ad, r, rcond=None)[0]
            b = b + r
        return A, b

    @pytest.mark.parametrize("method", ["lsqr", "cgne", "qr"])
    def test_matches_scipy_lstsq(self, method):
        A, b = self._overdetermined()
        x, info = lstsq(A, b, method=method, rtol=1e-10,
                        dtype=jnp.float64)
        assert info["converged"], info
        xref = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
        np.testing.assert_allclose(x, xref, atol=1e-6)
        # optimality certificate: A^T r ~ 0 even though ||r|| > 0
        assert info["rel_opt"] <= 1e-8
        assert info["rel_residual"] > 0.01  # genuinely inconsistent
        assert info["operator"] == "DenseOp"  # small rectangular route

    def test_consistent_system_hits_rtol(self):
        A, b = self._overdetermined(inconsistent=False)
        x, info = lstsq(A, b, rtol=1e-10, dtype=jnp.float64)
        assert info["converged"]
        assert info["rel_residual"] <= 1e-9

    def test_validation(self):
        A, b = self._overdetermined(m=40, n=10)
        with pytest.raises(ValueError, match="method"):
            lstsq(A, b, method="svd")
        with pytest.raises(ValueError, match="length"):
            lstsq(A, np.ones(3))
        # qr is tall-only (lstsq_qr's rank guard assumes m >= n)
        with pytest.raises(ValueError, match="m >= n"):
            lstsq(sp.random(10, 20, density=0.5, random_state=1),
                  np.ones(10), method="qr")

    def test_underdetermined_lsqr_min_norm(self):
        # m < n: LSQR converges to the minimum-norm solution
        rng = np.random.default_rng(91)
        A = sp.csr_matrix(rng.standard_normal((10, 24)))
        b = rng.standard_normal(10)
        x, info = lstsq(A, b, rtol=1e-12, dtype=jnp.float64)
        assert info["converged"]
        assert info["rel_residual"] <= 1e-10  # consistent (full row rank)
        xref, *_ = np.linalg.lstsq(A.toarray(), b, rcond=None)
        np.testing.assert_allclose(x, xref, atol=1e-8)

    def test_resnorm_scale_marker(self):
        A, b = self._overdetermined(m=40, n=10, inconsistent=False)
        _, i1 = lstsq(A, b, method="lsqr", dtype=jnp.float64)
        _, i2 = lstsq(A, b, method="cgne", dtype=jnp.float64)
        assert i1["resnorm_scale"] == "residual"
        assert i2["resnorm_scale"] == "normal_equation"


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
