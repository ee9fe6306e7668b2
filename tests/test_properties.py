"""Cross-algorithm property tests.

All solution paths (GMRES baseline, every multisplitting variant, every
backend) solve the same linear system — so their converged solutions must
agree to within the tolerances, and random banded SPD systems must solve
as well as the Poisson fixtures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
from medane_tchakorom_ufc_thesis_repository_tpu.core.operators import DIA
from medane_tchakorom_ufc_thesis_repository_tpu.models import (
    blockops,
    multisplitting as ms,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers import gmres


class TestCrossAlgorithmAgreement:
    def test_all_variants_agree_with_gmres(self):
        m = n = 24
        op = blockops.block_poisson2d(m, n)
        b = blockops.rhs_ones(op, jnp.float64)
        gref = gmres(
            poisson.poisson2d(m, n).mv, b.reshape(-1),
            restart=30, maxiter=5000, rtol=1e-10,
        )
        x_ref = np.asarray(gref.x)
        tight = ms.InnerConfig(maxiter=30, rtol=1e-10)
        for name, res in [
            ("SM", ms.sm(op, b, rtol=1e-8, maxiter=8000, inner=tight)),
            ("AM", ms.am(op, b, staleness=2, rtol=1e-8, maxiter=8000,
                         inner=tight)),
            ("SMSM_LOCAL", ms.smsm(op, b, scope="local", s=4, rtol=1e-8,
                                   maxiter=8000, inner=tight)),
            ("SMSM_SEMI", ms.smsm(op, b, scope="semi_local", s=4, rtol=1e-8,
                                  maxiter=8000, inner=tight)),
            ("SMSM_G", ms.smsm(op, b, scope="global", s=4, rtol=1e-8,
                               maxiter=8000, inner=tight)),
            ("AMAM_G", ms.amam(op, b, scope="global", s=4, staleness=2,
                               rtol=1e-8, maxiter=8000, inner=tight)),
        ]:
            assert bool(res.converged), name
            err = np.max(np.abs(np.asarray(res.x.reshape(-1)) - x_ref))
            assert err < 1e-6, (name, err)


class TestRandomBandedSystems:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_dd_banded_solves(self, seed):
        """Random diagonally-dominant banded SPD system via stacked ELL."""
        rng = np.random.default_rng(seed)
        m = n = 16
        rows, cols, vals, shape = poisson.poisson2d_coo(m, n)
        # randomize off-diagonals in [-1.5, -0.5], reset diagonal to
        # dominance (symmetrically: value depends on min(row,col))
        off = rows != cols
        key = np.minimum(rows, cols) * shape[0] + np.maximum(rows, cols)
        rng_vals = {k: -0.5 - rng.random() for k in np.unique(key[off])}
        vals = vals.astype(float)
        vals[off] = [rng_vals[k] for k in key[off]]
        # diagonal = 1 + sum |offdiag| per row (strict dominance)
        abssum = np.zeros(shape[0])
        np.add.at(abssum, rows[off], np.abs(vals[off]))
        vals[~off] = 1.0 + abssum
        a_ii, a_ic = poisson.block_split_ell(rows, cols, vals, shape,
                                             nblocks=2, dtype=jnp.float64)
        op = blockops.StackedELLOperator(a_ii=a_ii, a_ic=a_ic)
        b = blockops.rhs_ones(op, jnp.float64)
        res = ms.sm(op, b, rtol=1e-6, maxiter=4000,
                    inner=ms.InnerConfig(maxiter=30, rtol=1e-8))
        assert bool(res.converged)
        r = b.reshape(-1) - op.global_mv(res.x.reshape(-1))
        rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b.reshape(-1)))
        assert rel <= 1e-6

    def test_dia_gmres_random_diagonals(self):
        rng = np.random.default_rng(3)
        n = 200
        offsets = (-20, -1, 0, 1, 20)
        data = np.zeros((5, n))
        for d, off in enumerate(offsets):
            if off == 0:
                continue
            data[d] = -rng.random(n)
            if off > 0:
                data[d, n - off:] = 0.0
            else:
                data[d, :-off] = 0.0
        # dominant diagonal (row sums of |offdiag| via matvec of ones)
        dia_off = DIA(data=jnp.asarray(np.abs(data)), offsets=offsets)
        rowsum = np.asarray(dia_off.mv(jnp.ones(n)))
        data[2] = rowsum + 1.0
        dia = DIA(data=jnp.asarray(data), offsets=offsets)
        b = dia.mv(jnp.ones(n))
        res = gmres(dia.mv, b, restart=30, maxiter=2000, rtol=1e-10)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), np.ones(n), atol=1e-8)


class TestEdgeCases:
    def test_indivisible_blocks_rejected(self):
        with pytest.raises(ValueError):
            blockops.block_poisson2d(10, 10, nblocks=4)

    def test_wrong_b_shape_rejected(self):
        op = blockops.block_poisson2d(8, 8)
        with pytest.raises(ValueError):
            ms.sm(op, jnp.zeros((3, 5)))

    def test_sync_with_staleness_rejected(self):
        op = blockops.block_poisson2d(8, 8)
        b = blockops.rhs_ones(op, jnp.float64)
        with pytest.raises(ValueError):
            ms.multisplit_solve(op, b, schedule="sync", staleness=3)

    def test_zero_rhs_converges_immediately(self):
        op = blockops.block_poisson2d(8, 8)
        res = ms.sm(op, jnp.zeros((2, op.block_size), jnp.float64))
        assert bool(res.converged)
        assert int(res.sweeps) == 0

    def test_maxiter_budget(self):
        op = blockops.block_poisson2d(16, 16)
        b = blockops.rhs_ones(op, jnp.float64)
        res = ms.sm(op, b, rtol=1e-14, maxiter=7)
        assert not bool(res.converged)
        assert int(res.sweeps) == 7
