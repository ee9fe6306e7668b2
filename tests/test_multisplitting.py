"""Tests for the multisplitting algorithm drivers (models layer).

Mirrors the reference's validation style (SURVEY.md §4): convergence
invariant ``||b - A x|| <= rtol * ||r0||`` end-to-end, error vs the exact
solution u = 1, and cross-variant sanity (minimization accelerates, async
converges under staleness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medane_tchakorom_ufc_thesis_repository_tpu.models import (
    blockops,
    multisplitting as ms,
)


def _problem2d(m=32, n=32, nblocks=2):
    op = blockops.block_poisson2d(m, n, nblocks)
    b = blockops.rhs_ones(op, jnp.float64)
    return op, b


def _true_rel(op, b, x):
    r = b.reshape(-1) - op.global_mv(x.reshape(-1))
    return float(jnp.linalg.norm(r) / jnp.linalg.norm(b.reshape(-1)))


class TestBlockOps:
    def test_stacked_stencil_matches_dense(self):
        op, _ = _problem2d(8, 6)
        dense = np.asarray(op.to_dense())
        rng = np.random.default_rng(0)
        x = rng.standard_normal(op.nblocks * op.block_size)
        want = dense @ x
        got = np.asarray(op.global_mv(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_diag_plus_coupling_is_full(self):
        op, _ = _problem2d(8, 6)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((op.nblocks, op.block_size)))
        np.testing.assert_allclose(
            np.asarray(op.diag_mv(x) + op.coupling_mv(x)),
            np.asarray(op.full_mv(x)),
            rtol=1e-12,
        )

    def test_stencil3d_matches_dense(self):
        op = blockops.block_poisson3d(4, 3, 3)
        dense = np.asarray(op.to_dense())
        rng = np.random.default_rng(2)
        x = rng.standard_normal(op.nblocks * op.block_size)
        np.testing.assert_allclose(
            np.asarray(op.global_mv(jnp.asarray(x))), dense @ x, rtol=1e-12
        )

    def test_ell_blockop_matches_stencil(self):
        sop, _ = _problem2d(8, 6)
        eop = blockops.block_poisson2d_ell(8, 6, dtype=jnp.float64)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, sop.block_size)))
        np.testing.assert_allclose(
            np.asarray(eop.diag_mv(x)), np.asarray(sop.diag_mv(x)), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(eop.coupling_mv(x)), np.asarray(sop.coupling_mv(x)),
            rtol=1e-12,
        )

    def test_four_blocks(self):
        op = blockops.block_poisson2d(16, 8, nblocks=4)
        dense = np.asarray(op.to_dense())
        rng = np.random.default_rng(4)
        x = rng.standard_normal(16 * 8)
        np.testing.assert_allclose(
            np.asarray(op.global_mv(jnp.asarray(x))), dense @ x, rtol=1e-12
        )


class TestStackedDIA:
    """Banded general-sparse routing: StackedELLOperator -> DIA planes
    (kills the 139x ELL gather penalty on TPU; the reference's
    create_matrix_sparse AIJ capability, utils.c:139-155)."""

    def _variable_coeff_ell(self, m=16, n=16, nblocks=2):
        from medane_tchakorom_ufc_thesis_repository_tpu.core import (
            poisson as pp,
        )

        rows, cols, vals, shape = pp.poisson2d_coo(m, n)
        scale = 1.0 + (np.arange(shape[0]) % 7) * 0.3
        vals = vals * scale[rows]
        a_ii, a_ic = pp.block_split_ell(
            rows, cols, vals, shape, nblocks=nblocks, dtype=jnp.float64
        )
        return blockops.StackedELLOperator(a_ii=a_ii, a_ic=a_ic)

    def test_dia_matches_ell_matvecs(self):
        eop = self._variable_coeff_ell()
        dop = blockops.as_stacked_tpu_operator(eop)
        assert isinstance(dop, blockops.StackedDIAOperator)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (eop.nblocks, eop.block_size)
            )
        )
        np.testing.assert_allclose(
            np.asarray(dop.diag_mv(x)), np.asarray(eop.diag_mv(x)),
            rtol=1e-12, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(dop.coupling_mv(x)), np.asarray(eop.coupling_mv(x)),
            rtol=1e-12, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(dop.to_dense()), np.asarray(eop.to_dense()),
            rtol=1e-12, atol=1e-12,
        )

    def test_single_diag_mv_matches(self):
        eop = self._variable_coeff_ell()
        dop = blockops.as_stacked_tpu_operator(eop)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (eop.nblocks, eop.block_size)
            )
        )
        args = dop.diag_mv_args
        per_block = jnp.stack([
            dop.single_diag_mv(args[i], x[i]) for i in range(dop.nblocks)
        ])
        np.testing.assert_allclose(
            np.asarray(per_block), np.asarray(dop.diag_mv(x)),
            rtol=1e-12, atol=1e-12,
        )
        # jacobi diagonal extraction agrees with the ELL path
        dvec = dop.single_diag_vector(args[0], dop.block_size)
        evec = eop.single_diag_vector(
            (eop.a_ii.indices[0], eop.a_ii.values[0]), eop.block_size
        )
        np.testing.assert_allclose(np.asarray(dvec), np.asarray(evec))

    def test_solve_agrees_with_ell(self):
        eop = self._variable_coeff_ell()
        dop = blockops.as_stacked_tpu_operator(eop)
        b = blockops.rhs_ones(eop, jnp.float64)
        res_e = ms.sm(eop, b, rtol=1e-4, maxiter=4000,
                      inner=ms.InnerConfig(maxiter=30))
        res_d = ms.sm(dop, b, rtol=1e-4, maxiter=4000,
                      inner=ms.InnerConfig(maxiter=30))
        assert bool(res_d.converged)
        assert int(res_d.sweeps) == int(res_e.sweeps)
        np.testing.assert_allclose(
            np.asarray(res_d.x), np.asarray(res_e.x), rtol=1e-8, atol=1e-10
        )

    def test_unstructured_stays_ell(self):
        # rule out BOTH fast routes (max_diags forces past DIA,
        # max_bsr_cost forces past StackedBSR): the residual gather-ELL
        # pass-through must warn and return the operator unchanged
        eop = self._variable_coeff_ell()
        with pytest.warns(UserWarning, match="gather-ELL"):
            out = blockops.as_stacked_tpu_operator(
                eop, max_diags=2, max_bsr_cost=0.5
            )
        assert out is eop

    def test_unstructured_routes_to_bsr_when_blockable(self):
        # a genuinely blockable split (dense 16x16 sub-blocks, too many
        # distinct diagonals for DIA) routes to StackedBSROperator under
        # the DEFAULT cost bar.  The banded _variable_coeff_ell fixture
        # no longer qualifies: the honest padded-width fill estimate
        # prices its 5-point pattern above 16x at every block size —
        # banded matrices belong on the DIA route.
        import scipy.sparse as sp

        from medane_tchakorom_ufc_thesis_repository_tpu.core import (
            poisson as pp,
        )

        rng = np.random.default_rng(41)
        nbr, c = 16, 16
        n = nbr * c
        A = sp.lil_matrix((n, n))
        for k in range(nbr):
            A[k * c:(k + 1) * c, k * c:(k + 1) * c] = (
                rng.standard_normal((c, c)) + np.eye(c) * 8.0
            )
            # PER-ROW-VARYING block offsets: every block row couples at a
            # different distance, so the pattern is genuinely unbanded
            # (> 64 distinct diagonals rules DIA out at defaults)
            j = (k + 1 + (k % 7)) % nbr
            A[k * c:(k + 1) * c, j * c:(j + 1) * c] = (
                0.1 * rng.standard_normal((c, c))
            )
        coo = A.tocsr().tocoo()
        a_ii, a_ic = pp.block_split_ell(
            coo.row, coo.col, coo.data, (n, n), nblocks=2,
            dtype=jnp.float64,
        )
        eop = blockops.StackedELLOperator(a_ii=a_ii, a_ic=a_ic)
        out = blockops.as_stacked_tpu_operator(eop)
        assert isinstance(out, blockops.StackedBSROperator)
        x = blockops.rhs_ones(eop, jnp.float64)
        np.testing.assert_allclose(
            np.asarray(out.full_mv(x)), np.asarray(eop.full_mv(x)),
            rtol=1e-12, atol=1e-12,
        )
        # the banded fixture warns and passes through at defaults
        with pytest.warns(UserWarning, match="gather-ELL"):
            banded = blockops.as_stacked_tpu_operator(
                self._variable_coeff_ell(), max_diags=2
            )
        assert isinstance(banded, blockops.StackedELLOperator)


class TestSM:
    def test_converges_to_invariant(self):
        op, b = _problem2d()
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000)
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-3
        assert float(jnp.max(jnp.abs(res.x - 1.0))) < 0.05

    def test_tighter_tolerance(self):
        op, b = _problem2d(16, 16)
        res = ms.sm(op, b, rtol=1e-8, maxiter=5000,
                    inner=ms.InnerConfig(maxiter=30, rtol=1e-10))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-8

    def test_jit_wrappable(self):
        op, b = _problem2d(16, 16)
        f = jax.jit(lambda bb: ms.sm(op, bb, rtol=1e-3, maxiter=1000))
        res = f(b)
        assert bool(res.converged)

    def test_ell_path_agrees_with_stencil(self):
        sop, b = _problem2d(16, 16)
        eop = blockops.block_poisson2d_ell(16, 16, dtype=jnp.float64)
        rs = ms.sm(sop, b, rtol=1e-4, maxiter=2000)
        re = ms.sm(eop, b, rtol=1e-4, maxiter=2000)
        assert int(rs.sweeps) == int(re.sweeps)
        # identical math; tiny fp reorderings amplify across ~36 sweeps
        np.testing.assert_allclose(
            np.asarray(rs.x), np.asarray(re.x), rtol=1e-6, atol=1e-6
        )

    def test_3d(self):
        op = blockops.block_poisson3d(8, 6, 6)
        b = blockops.rhs_ones(op, jnp.float64)
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000)
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-3


class TestAM:
    def test_staleness_converges(self):
        op, b = _problem2d()
        res = ms.am(op, b, staleness=2, rtol=1e-3, maxiter=4000)
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3  # local tests => small slack

    def test_asymmetric_staleness(self):
        op, b = _problem2d()
        res = ms.am(op, b, staleness=[1, 3], rtol=1e-3, maxiter=4000)
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3

    def test_staleness_slows_but_converges(self):
        op, b = _problem2d(16, 16)
        r1 = ms.am(op, b, staleness=1, rtol=1e-3, maxiter=4000)
        r4 = ms.am(op, b, staleness=4, rtol=1e-3, maxiter=4000)
        assert bool(r1.converged) and bool(r4.converged)
        assert int(r4.sweeps) >= int(r1.sweeps)

    def test_min_convergence_count_persistence(self):
        op, b = _problem2d(16, 16)
        r_lo = ms.am(op, b, staleness=2, rtol=1e-3, min_convergence_count=1,
                     maxiter=4000)
        r_hi = ms.am(op, b, staleness=2, rtol=1e-3, min_convergence_count=8,
                     maxiter=4000)
        assert int(r_hi.sweeps) >= int(r_lo.sweeps) + 7


class TestMinimization:
    @pytest.mark.parametrize("scope", ["local", "semi_local", "global"])
    def test_smsm_converges(self, scope):
        op, b = _problem2d()
        res = ms.smsm(op, b, scope=scope, s=4, rtol=1e-3, maxiter=2000)
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3

    @pytest.mark.parametrize("scope", ["local", "semi_local", "global"])
    def test_amam_converges(self, scope):
        op, b = _problem2d()
        res = ms.amam(op, b, scope=scope, s=4, staleness=2, rtol=1e-3,
                      maxiter=4000)
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3

    def test_minimization_accelerates(self):
        op, b = _problem2d()
        plain = ms.sm(op, b, rtol=1e-3, maxiter=2000)
        accel = ms.smsm(op, b, scope="global", s=4, rtol=1e-3, maxiter=2000)
        assert int(accel.sweeps) < int(plain.sweeps)

    @pytest.mark.parametrize("method", ["qr", "normal", "lsqr", "cgne"])
    def test_outer_methods_agree(self, method):
        op, b = _problem2d(16, 16)
        res = ms.smsm(
            op, b, scope="global", s=4, rtol=1e-3, maxiter=2000,
            outer=ms.OuterConfig(method=method, maxiter=200, rtol=1e-14),
        )
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3

    def test_global_outer_residual_is_true_residual(self):
        op, b = _problem2d(16, 16)
        res = ms.smsm(op, b, scope="global", s=4, rtol=1e-3, maxiter=2000)
        # outer LS residual at the last cycle bounds the true residual of
        # the minimized iterate (it IS ||b - A S a|| for x = S a)
        assert float(res.outer_rnorm) <= 1e-3 * float(res.rnorm0) + 1e-12

    def test_alpha_average_variant_runs(self):
        op, b = _problem2d(16, 16)
        res = ms.smsm(
            op, b, scope="semi_local", s=4, rtol=1e-3, maxiter=2000,
            outer=ms.OuterConfig(alpha_average=True),
        )
        assert bool(res.converged)

    def test_four_block_multisplitting(self):
        op = blockops.block_poisson2d(32, 16, nblocks=4)
        b = blockops.rhs_ones(op, jnp.float64)
        res = ms.smsm(op, b, scope="global", s=4, rtol=1e-3, maxiter=3000)
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3


class TestInnerOptions:
    def test_inner_cg_converges(self):
        op, b = _problem2d(16, 16)
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(method="cg", maxiter=20, rtol=1e-3))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-3

    def test_jacobi_pc_converges(self):
        op, b = _problem2d(16, 16)
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(pc="jacobi"))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-3

    def test_jacobi_pc_ell_variable_diag(self):
        # ELL path with a genuinely non-constant diagonal: scale rows
        import numpy as np
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson as pp

        rows, cols, vals, shape = pp.poisson2d_coo(16, 16)
        scale = 1.0 + (np.arange(shape[0]) % 7) * 0.3
        vals = vals * scale[rows]
        a_ii, a_ic = pp.block_split_ell(rows, cols, vals, shape, nblocks=2,
                                        dtype=jnp.float64)
        op = blockops.StackedELLOperator(a_ii=a_ii, a_ic=a_ic)
        b = blockops.rhs_ones(op, jnp.float64)
        res = ms.sm(op, b, rtol=1e-4, maxiter=4000,
                    inner=ms.InnerConfig(pc="jacobi", maxiter=30))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-4

    def test_unknown_method_rejected(self):
        op, b = _problem2d(16, 16)
        with pytest.raises(ValueError):
            ms.sm(op, b, inner=ms.InnerConfig(method="sor"))

    def test_bicgstab_inner_converges(self):
        # the round-3 KSPBCGS analog as an inner method
        op, b = _problem2d(16, 16)
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(method="bicgstab", maxiter=20))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-3

    def test_mg_pc_cg_converges_fewer_sweeps_of_inner_work(self):
        """pc='mg' + method='cg': each inner solve hits its tolerance in
        a handful of PCG iterations, and the outer sweep count matches
        the exact-inner-solve trajectory."""
        op, b = _problem2d(32, 32)
        base = ms.sm(op, b, rtol=1e-4, maxiter=2000,
                     inner=ms.InnerConfig(maxiter=60, rtol=1e-8))
        res = ms.sm(op, b, rtol=1e-4, maxiter=2000,
                    inner=ms.InnerConfig(method="cg", pc="mg",
                                         maxiter=15, rtol=1e-8))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-4
        # accurate inner solves => same outer trajectory
        assert abs(int(res.sweeps) - int(base.sweeps)) <= 1

    def test_mg_pc_gmres_converges(self):
        """pc='mg' + method='gmres': left-preconditioned inner GMRES."""
        op, b = _problem2d(32, 32)
        res = ms.sm(op, b, rtol=1e-4, maxiter=2000,
                    inner=ms.InnerConfig(method="gmres", pc="mg",
                                         restart=10, maxiter=10, rtol=1e-8))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-4

    def test_mg_pc_3d(self):
        op = blockops.block_poisson3d(16, 16, 16)
        b = blockops.rhs_ones(op, jnp.float64)
        res = ms.sm(op, b, rtol=1e-4, maxiter=2000,
                    inner=ms.InnerConfig(method="cg", pc="mg",
                                         maxiter=15, rtol=1e-8))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-4

    def test_mg_pc_rejected_for_ell(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson as pp

        rows, cols, vals, shape = pp.poisson2d_coo(16, 16)
        a_ii, a_ic = pp.block_split_ell(rows, cols, vals, shape, nblocks=2,
                                        dtype=jnp.float64)
        op = blockops.StackedELLOperator(a_ii=a_ii, a_ic=a_ic)
        b = blockops.rhs_ones(op, jnp.float64)
        with pytest.raises(ValueError, match="stencil-family"):
            ms.sm(op, b, inner=ms.InnerConfig(pc="mg"))


class TestPublishBasisCollection:
    """Staleness mitigation for async minimization: at staleness d the
    thesis-faithful per-sweep basis embeds s near-collinear frozen-RHS
    iterates (AMAM_GLOBAL d=4 needs ~6x AM's sweeps); collecting columns
    at publish boundaries restores — and beats — AM's sweep counts
    (measured d=4: 2824 -> 144 sweeps, BENCHMARKS.md)."""

    def test_publish_collection_converges_and_beats_sweep(self):
        op, b = _problem2d(32, 32)
        kw = dict(scope="global", s=4, staleness=4, rtol=1e-4,
                  maxiter=20000)
        res_s = ms.amam(op, b, **kw)
        res_p = ms.amam(op, b, basis_collection="publish", **kw)
        assert bool(res_p.converged)
        assert _true_rel(op, b, res_p.x) <= 1.5e-4
        assert int(res_p.sweeps) < int(res_s.sweeps)

    def test_sync_unaffected(self):
        op, b = _problem2d(16, 16)
        a = ms.smsm(op, b, scope="global", s=4, rtol=1e-3, maxiter=2000)
        c = ms.smsm(op, b, scope="global", s=4, rtol=1e-3, maxiter=2000,
                    basis_collection="publish")
        # sync schedule: 'publish' has no effect (publishes every sweep)
        assert int(a.sweeps) == int(c.sweeps)

    def test_unknown_collection_rejected(self):
        op, b = _problem2d(16, 16)
        with pytest.raises(ValueError, match="basis_collection"):
            ms.amam(op, b, scope="global", basis_collection="nope")


class TestPerBlockConfigs:
    """The reference's inner1_/inner2_/outer1_/outer2_ per-rank KSP
    prefixes (utils.c:512-541, iSolve:118-194): each block's inner and
    outer solver is configured independently."""

    def test_identical_per_block_equals_uniform(self):
        op, b = _problem2d(16, 16)
        uni = ms.sm(op, b, rtol=1e-3, maxiter=2000)
        per = ms.sm(op, b, rtol=1e-3, maxiter=2000,
                    inner=(ms.InnerConfig(), ms.InnerConfig()))
        assert int(per.sweeps) == int(uni.sweeps)
        np.testing.assert_array_equal(np.asarray(per.x), np.asarray(uni.x))

    def test_mixed_inner_methods_converge(self):
        # block 1: GMRES, block 2: CG with a different budget
        op, b = _problem2d(16, 16)
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000, inner=(
            ms.InnerConfig(method="gmres", maxiter=20),
            ms.InnerConfig(method="cg", maxiter=30),
        ))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-3

    def test_mixed_inner_budgets_differ_from_uniform(self):
        # a genuinely weaker block-2 inner solve must change the iterate
        op, b = _problem2d(16, 16)
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000, inner=(
            ms.InnerConfig(maxiter=20), ms.InnerConfig(maxiter=2),
        ))
        uni = ms.sm(op, b, rtol=1e-3, maxiter=2000)
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-3
        assert int(res.sweeps) != int(uni.sweeps) or not np.allclose(
            np.asarray(res.x), np.asarray(uni.x)
        )

    def test_per_block_outer_methods(self):
        op, b = _problem2d(16, 16)
        res = ms.smsm(op, b, scope="local", s=4, rtol=1e-3, maxiter=2000,
                      outer=(ms.OuterConfig(method="qr"),
                             ms.OuterConfig(method="lsqr")))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3

    def test_per_block_outer_rejected_for_global(self):
        op, b = _problem2d(16, 16)
        with pytest.raises(ValueError, match="global"):
            ms.smsm(op, b, scope="global", s=4,
                    outer=(ms.OuterConfig(), ms.OuterConfig(method="lsqr")))

    def test_wrong_length_rejected(self):
        op, b = _problem2d(16, 16)
        with pytest.raises(ValueError, match="entries"):
            ms.sm(op, b, inner=(ms.InnerConfig(),) * 3)

    def test_runconfig_overrides(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.utils.config import (
            default_config,
        )

        cfg = default_config(
            alg="SM", m=16, n=16,
            inner_overrides=({"maxiter": 25}, {"ksp": "cg"}),
        )
        inners = cfg.inner_config()
        assert inners[0].maxiter == 25 and inners[0].method == "gmres"
        assert inners[1].method == "cg" and inners[1].maxiter == 20

    def test_runconfig_overrides_bad_key(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.utils.config import (
            default_config,
        )

        with pytest.raises(ValueError, match="unknown"):
            default_config(alg="SM", inner_overrides=({"nope": 1}, {}))

    def test_runconfig_overrides_need_stacked(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.utils.config import (
            default_config,
        )

        with pytest.raises(ValueError, match="stacked"):
            default_config(
                alg="SM", backend="sharded", m=16, n=16,
                inner_overrides=({"maxiter": 25}, {}),
            )

    def test_cli_flags_build_overrides(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.utils.cli import (
            build_parser,
            config_from_args,
        )

        args = build_parser().parse_args([
            "--alg", "SM", "--m", "16", "--n", "16",
            "--inner1-maxiter", "25", "--inner2-ksp", "cg",
        ])
        cfg = config_from_args(args)
        inners = cfg.inner_config()
        assert inners[0].maxiter == 25
        assert inners[1].method == "cg"


class TestChebyshevInner:
    def test_sm_chebyshev_converges(self):
        op, b = _problem2d()
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(method="chebyshev", maxiter=20))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-3

    def test_same_sweeps_as_gmres(self):
        # with equal inner budgets both inner solvers resolve A_ii well
        # enough that the outer sweep count coincides on this problem
        op, b = _problem2d()
        cheb = ms.sm(op, b, rtol=1e-3, maxiter=2000,
                     inner=ms.InnerConfig(method="chebyshev", maxiter=20))
        gm = ms.sm(op, b, rtol=1e-3, maxiter=2000)
        assert int(cheb.sweeps) == int(gm.sweeps)

    def test_3d_analytic_bounds(self):
        op = blockops.block_poisson3d(8, 6, 6)
        b = blockops.rhs_ones(op, jnp.float64)
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(method="chebyshev", maxiter=20))
        assert bool(res.converged)

    def test_explicit_bounds(self):
        op, b = _problem2d(16, 16)
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(method="chebyshev", maxiter=25,
                                         eig_min=0.05, eig_max=8.0))
        assert bool(res.converged)

    def test_ell_without_analytic_bounds_estimates(self):
        # round 3: operators without analytic diag_eig_bounds no longer
        # reject chebyshev — the interval is Lanczos-estimated
        # (solvers/eigest.py, the -ksp_chebyshev_esteig analog)
        eop = blockops.block_poisson2d_ell(16, 16, dtype=jnp.float64)
        b = blockops.rhs_ones(eop, jnp.float64)
        res = ms.sm(eop, b, rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(method="chebyshev", maxiter=20))
        assert bool(res.converged)

    def test_smsm_chebyshev(self):
        op, b = _problem2d()
        res = ms.smsm(op, b, scope="global", s=4, rtol=1e-3, maxiter=2000,
                      inner=ms.InnerConfig(method="chebyshev", maxiter=20))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3


class TestStalenessScaling:
    def test_sweeps_grow_linearly_with_staleness(self):
        """Bounded-staleness theory: convergence rate degrades with the
        delay, roughly linearly for the stationary iteration."""
        op, b = _problem2d(64, 64)
        sweeps = {}
        for d in (1, 4, 8):
            res = ms.am(op, b, staleness=d, rtol=1e-4, maxiter=20000)
            assert bool(res.converged), d
            sweeps[d] = int(res.sweeps)
        assert sweeps[4] > 2 * sweeps[1]
        assert sweeps[8] > 1.5 * sweeps[4]
        # and bounded: not catastrophically worse than linear
        assert sweeps[8] < 16 * sweeps[1]


class TestOptionCombinations:
    def test_bf16_basis_sm(self):
        # f32 problem with bf16 basis storage: converges at rtol 1e-3
        op, _ = _problem2d()
        b32 = blockops.rhs_ones(op, jnp.float32)
        res = ms.sm(op, b32, rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(basis="bf16"))
        assert bool(res.converged)
        assert _true_rel(op, b32, res.x) <= 1.5e-3

    def test_bf16_basis_async_minimization(self):
        op, _ = _problem2d()
        b32 = blockops.rhs_ones(op, jnp.float32)
        res = ms.amam(op, b32, scope="global", s=4, staleness=2, rtol=1e-3,
                      maxiter=4000, inner=ms.InnerConfig(basis="bf16"))
        assert bool(res.converged)
        assert _true_rel(op, b32, res.x) <= 2e-3

    def test_chebyshev_async(self):
        op, b = _problem2d()
        res = ms.am(op, b, staleness=2, rtol=1e-3, maxiter=4000,
                    inner=ms.InnerConfig(method="chebyshev", maxiter=20))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3


class TestCaGmresInner:
    """CA-GMRES as the inner (per-block) solver: Newton basis over the
    block spectrum, one panel LS per s matvecs — the reduction-count
    profile that matters on device meshes."""

    def test_sm_converges(self):
        op, b = _problem2d()
        res = ms.sm(op, b, rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(method="ca_gmres", restart=8,
                                         maxiter=16))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1e-3

    def test_smsm_global_converges(self):
        op, b = _problem2d()
        res = ms.smsm(op, b, scope="global", s=4, rtol=1e-3, maxiter=2000,
                      inner=ms.InnerConfig(method="ca_gmres", restart=8,
                                           maxiter=16))
        assert bool(res.converged)
        assert _true_rel(op, b, res.x) <= 1.5e-3

    def test_needs_bounds(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.core import (
            poisson as pp,
        )

        rows, cols, vals, shape = pp.poisson2d_coo(8, 8)
        a_ii, a_ic = pp.block_split_ell(rows, cols, vals, shape,
                                        nblocks=2, dtype=jnp.float64)
        eop = blockops.StackedELLOperator(a_ii=a_ii, a_ic=a_ic)
        # round 3: no analytic bounds -> Lanczos estimation kicks in and
        # the ca_gmres inner solve runs (s<=8 applicability)
        res = ms.sm(eop, blockops.rhs_ones(eop, jnp.float64),
                    rtol=1e-3, maxiter=2000,
                    inner=ms.InnerConfig(method="ca_gmres", restart=4,
                                         maxiter=20))
        assert bool(res.converged)


class TestAsyncCertification:
    """Async drivers re-verify the returned stack on the TRUE coupling
    (staleness-free) before reporting convergence: converged => certified
    => ||b - A x|| <= rtol*||b|| exactly.  Sync paths measure the true
    residual every cycle already and carry no certificate."""

    def test_am_certified_exact_bound(self):
        op, b = _problem2d()
        rtol = 1e-6
        for d in (1, 4):
            res = ms.am(op, b, rtol=rtol, maxiter=4000, staleness=d)
            assert bool(res.converged)
            assert bool(res.certified)
            assert _true_rel(op, b, res.x) <= rtol * (1 + 1e-12)
            # reported rnorm is the true merged residual of the result
            r = b - op.full_mv(res.x)
            assert float(res.rnorm) == pytest.approx(
                float(jnp.linalg.norm(r.reshape(-1))), rel=1e-10)

    def test_amam_global_certified(self):
        op, b = _problem2d(nblocks=4)
        rtol = 1e-6
        res = ms.amam(op, b, rtol=rtol, maxiter=4000,
                      staleness=[1, 2, 4, 8], scope="global", s=4,
                      min_convergence_count=1)
        assert bool(res.converged)
        assert bool(res.certified)
        assert _true_rel(op, b, res.x) <= rtol * (1 + 1e-12)

    def test_sync_has_no_certificate(self):
        op, b = _problem2d()
        res = ms.sm(op, b, rtol=1e-4, maxiter=2000)
        assert res.certified is None
        assert res.tail_sweeps is None
