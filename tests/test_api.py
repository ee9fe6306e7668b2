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
        with pytest.raises(ValueError, match="single RHS"):
            solve(A, np.ones((A.shape[0], 2)), method="ca_gmres")

    def test_minres_symmetric_indefinite(self):
        rng = np.random.default_rng(91)
        n = 128
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        d = np.concatenate([np.linspace(1, 8, n - 24),
                            -np.linspace(1, 4, 24)])
        A = sp.csr_matrix((Q * d) @ Q.T)
        b = np.asarray(A @ np.ones(n))
        x, info = solve(A, b, method="minres", rtol=1e-9,
                        dtype=jnp.float64)
        assert info["converged"]
        assert info["rel_residual"] <= 2e-9
        np.testing.assert_allclose(x, 1.0, rtol=1e-6)

    def test_auto_method_and_pc_selection(self):
        # symmetric -> minres; auto pc on a positive diagonal -> jacobi
        A = _spd_blockable(seed=77)
        b = np.asarray(A @ np.ones(A.shape[0]))
        x, info = solve(A, b, method="auto", pc="auto", rtol=1e-8,
                        dtype=jnp.float64)
        assert info["method"] == "minres"
        assert info["pc"] == "jacobi"   # minres auto never picks bjacobi
        assert info["converged"] and info["rel_residual"] <= 1.1e-8
        np.testing.assert_allclose(x, 1.0, rtol=1e-5)
        # nonsymmetric -> gmres; BSR-routed operator -> bjacobi at the
        # ROUTED block size
        An = (A + sp.random(A.shape[0], A.shape[0], density=0.01,
                            random_state=9) * 1e-2).tocsr()
        bn = np.asarray(An @ np.ones(An.shape[0]))
        xn, info_n = solve(An, bn, method="auto", pc="auto", rtol=1e-8,
                           dtype=jnp.float64)
        assert info_n["method"] == "gmres"
        assert info_n["operator"] == "BSR"
        assert info_n["pc"] == "bjacobi"
        assert info_n["converged"]
        np.testing.assert_allclose(xn, 1.0, rtol=1e-5)

    def test_assume_a_overrides_detection(self):
        A = _spd_blockable(seed=89)
        b = np.asarray(A @ np.ones(A.shape[0]))
        _, ip = solve(A, b, method="auto", assume_a="pos", rtol=1e-8,
                      dtype=jnp.float64)
        assert ip["method"] == "cg" and ip["converged"]
        _, ig = solve(A, b, method="auto", assume_a="gen", rtol=1e-8,
                      dtype=jnp.float64)
        assert ig["method"] == "gmres" and ig["converged"]
        with pytest.raises(ValueError, match="assume_a"):
            solve(A, b, assume_a="spd")

    def test_auto_pc_zero_diagonal_is_none(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.api import _auto_pc

        # saddle-point-style zero diagonal: auto must not build jacobi
        A = sp.csr_matrix(np.array([[0.0, 1.0], [1.0, 0.0]]))

        class _FakeOp:
            pass

        assert _auto_pc(A, _FakeOp(), "gmres") == "none"
        assert _auto_pc(A, _FakeOp(), "minres") == "none"

    def test_multi_rhs_matches_column_solves(self):
        A = _spd_blockable(seed=79)
        n = A.shape[0]
        rng = np.random.default_rng(7)
        B = rng.standard_normal((n, 4))
        X, info = solve(A, B, method="gmres", rtol=1e-9,
                        dtype=jnp.float64)
        assert X.shape == (n, 4)
        assert info["converged"]
        assert info["iters"].shape == (4,)
        assert info["converged_per_rhs"].all()
        assert (info["rel_residual"] <= 2e-9).all()
        for k in range(4):
            xk, ik = solve(A, B[:, k], method="gmres", rtol=1e-9,
                           dtype=jnp.float64)
            np.testing.assert_allclose(X[:, k], xk, rtol=1e-8, atol=1e-10)

    def test_prepare_reuses_setup_across_solves(self):
        from medane_tchakorom_ufc_thesis_repository_tpu import prepare

        A = _spd_blockable(seed=85)
        n = A.shape[0]
        prep = prepare(A, method="cg", pc="bjacobi", pc_block_size=16,
                       rtol=1e-10, dtype=jnp.float64)
        assert prep.operator == "BSR"
        for target in (np.ones(n), np.arange(n, dtype=np.float64)):
            b = np.asarray(A @ target)
            x, info = prep.solve(b)
            assert info["converged"]
            np.testing.assert_allclose(x, target, rtol=1e-6, atol=1e-7)
        # matches the one-shot solve exactly (same cached jitted program)
        b = np.asarray(A @ np.ones(n))
        x1, _ = prep.solve(b)
        x2, _ = solve(A, b, method="cg", pc="bjacobi", pc_block_size=16,
                      rtol=1e-10, dtype=jnp.float64)
        np.testing.assert_allclose(x1, x2, rtol=0, atol=0)
        # multi-RHS through the same handle
        B = np.stack([b, 2.0 * b], axis=1)
        X, info = prep.solve(B)
        assert info["converged"] and X.shape == (n, 2)
        with pytest.raises(ValueError, match="length"):
            prep.solve(np.ones(3))

    def test_prepare_ca_gmres_bounds_once(self):
        from medane_tchakorom_ufc_thesis_repository_tpu import prepare

        A = _spd_blockable(seed=87)
        prep = prepare(A, method="ca_gmres", rtol=1e-8, s=6,
                       dtype=jnp.float64)
        b = np.asarray(A @ np.ones(A.shape[0]))
        x, info = prep.solve(b)
        assert info["converged"]
        np.testing.assert_allclose(x, 1.0, rtol=1e-5)
        with pytest.raises(ValueError, match="single RHS"):
            prep.solve(np.ones((A.shape[0], 2)))

    def test_multi_rhs_cg_and_pc(self):
        A = _spd_blockable(seed=83)
        n = A.shape[0]
        B = np.stack([np.asarray(A @ np.ones(n)),
                      np.asarray(A @ np.arange(n, dtype=np.float64))],
                     axis=1)
        X, info = solve(A, B, method="cg", pc="bjacobi", pc_block_size=16,
                        rtol=1e-10, dtype=jnp.float64)
        assert info["converged"]
        np.testing.assert_allclose(X[:, 0], 1.0, rtol=1e-6)
        np.testing.assert_allclose(X[:, 1], np.arange(n), rtol=1e-6,
                                   atol=1e-7)


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
