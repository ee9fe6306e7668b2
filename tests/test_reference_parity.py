"""Reference-parity tests: the exact cases of the reference's MPI test
binary ``src/tests/utils_test.c`` re-expressed against this framework.

* hand-written 2D/3D Poisson stencil rows (``utils_test.c:66-221``)
* the golden residual-norm value 2.54567588 (``utils_test.c:225-228``)
* dimension bookkeeping (``test_computeDimensionRelatedVariables``,
  ``utils_test.c:38-64``)
"""

import jax.numpy as jnp
import numpy as np

from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
from medane_tchakorom_ufc_thesis_repository_tpu.models import blockops


class TestHandWrittenStencilRows:
    """Row-by-row checks against hand-computed 5/7-point stencil rows."""

    def test_2d_interior_row(self):
        # grid 4x4, row for unknown (1,1) = index 5:
        # diag 4 at 5; -1 at (0,1)=1, (2,1)=9, (1,0)=4, (1,2)=6
        dense = poisson.poisson2d_dense_np(4, 4)
        row = np.zeros(16)
        row[5] = 4.0
        for j in (1, 9, 4, 6):
            row[j] = -1.0
        np.testing.assert_array_equal(dense[5], row)

    def test_2d_corner_row(self):
        # corner (0,0) = index 0: diag 4, neighbors (0,1)=1 and (1,0)=4
        dense = poisson.poisson2d_dense_np(4, 4)
        row = np.zeros(16)
        row[0] = 4.0
        row[1] = row[4] = -1.0
        np.testing.assert_array_equal(dense[0], row)

    def test_2d_edge_row(self):
        # top edge (0,2) = index 2: diag 4, neighbors 1, 3, and (1,2)=6
        dense = poisson.poisson2d_dense_np(4, 4)
        row = np.zeros(16)
        row[2] = 4.0
        for j in (1, 3, 6):
            row[j] = -1.0
        np.testing.assert_array_equal(dense[2], row)

    def test_3d_interior_row(self):
        # grid 3x3x3, center unknown (1,1,1) = 13: diag 6, six neighbors
        dense = poisson.poisson3d_dense_np(3, 3, 3)
        row = np.zeros(27)
        row[13] = 6.0
        for j in (4, 22, 10, 16, 12, 14):
            row[j] = -1.0
        np.testing.assert_array_equal(dense[13], row)

    def test_3d_corner_row(self):
        dense = poisson.poisson3d_dense_np(3, 3, 3)
        row = np.zeros(27)
        row[0] = 6.0
        for j in (9, 3, 1):  # +x, +y, +z neighbors
            row[j] = -1.0
        np.testing.assert_array_equal(dense[0], row)

    def test_row_sums(self):
        # interior rows sum to 0; boundary rows to the count of truncated
        # neighbors — a global structural invariant of the Dirichlet stencil
        dense = poisson.poisson2d_dense_np(6, 5)
        sums = dense.sum(axis=1)
        m, n = 6, 5
        ii = np.arange(m * n)
        gi, gj = ii // n, ii % n
        truncated = (gi == 0).astype(int) + (gi == m - 1) + (gj == 0) + (gj == n - 1)
        np.testing.assert_array_equal(sums, truncated.astype(float))


class TestGoldenResidualNorm:
    """The reference pins ``computeFinalResidualNorm_new`` to 2.54567588
    for hardcoded per-block x/b on a 2x2 mesh with 2 blocks
    (``utils_test.c:225-228,285-325``): each block holds its OWN
    full-length x and computes r_i = b_i - A_i x^(i) with A the 2x2-grid
    Poisson matrix split into 2 row strips; the global norm is
    sqrt(||r_0||^2 + ||r_1||^2) (Allreduce over the block roots)."""

    def test_golden_value(self):
        # The exact reference fixture (utils_test.c:285-325): mesh 2x2
        # (4 unknowns), 2 blocks of 2 rows; block 0's merged iterate is
        # x^(0) = [0.1234, 0.5678, 0.9101, 0.1121] with b_0 =
        # [0.3141, 0.5926]; block 1's is x^(1) = [0.8765, 0.4321,
        # 0.5432, 0.6789] with b_1 = [0.2468, 0.1357].
        op = blockops.block_poisson2d(2, 2, nblocks=2)
        xs = jnp.asarray(
            [[0.1234, 0.5678, 0.9101, 0.1121],
             [0.8765, 0.4321, 0.5432, 0.6789]], jnp.float64
        )
        bs = jnp.asarray([[0.3141, 0.5926], [0.2468, 0.1357]], jnp.float64)
        norm = float(blockops.final_residual_norm(op, xs, bs))
        # TEST_ASSERT_EQUAL_FLOAT(2.54567588, ...) — utils_test.c:227
        np.testing.assert_allclose(norm, 2.54567588, rtol=1e-8)

    def test_shared_iterate_invariant(self):
        # When every block holds the SAME merged x, the per-block-x norm
        # collapses to the plain global residual norm ||b - A x||.
        op = blockops.block_poisson2d(2, 2, nblocks=2)
        x = jnp.full((2, 2), 0.5, jnp.float64)
        b = jnp.asarray([[1.0, 1.0], [2.0, 2.0]], jnp.float64)
        r = b - op.full_mv(x)
        norm = float(jnp.sqrt(jnp.sum(r * r)))
        xs = jnp.stack([x.reshape(-1), x.reshape(-1)])
        np.testing.assert_allclose(
            float(blockops.final_residual_norm(op, xs, b)), norm, rtol=1e-12
        )
        np.testing.assert_allclose(norm, np.sqrt(2.0), rtol=1e-12)

    def test_reference_formula_shape(self):
        # the two-level reduction (per-block ssq, then sum across blocks)
        # must equal the flat global norm — the invariant behind
        # computeFinalResidualNorm's Allreduce on comm_local_roots
        op = blockops.block_poisson2d(8, 8)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, op.block_size)))
        b = jnp.asarray(rng.standard_normal((2, op.block_size)))
        r = b - op.full_mv(x)
        per_block = jnp.sum(r * r, axis=1)
        np.testing.assert_allclose(
            float(jnp.sqrt(jnp.sum(per_block))),
            float(jnp.linalg.norm(np.asarray(r).reshape(-1))),
            rtol=1e-12,
        )


class TestDimensionBookkeeping:
    """Analog of test_computeDimensionRelatedVariables: block/rank math."""

    def test_block_sizes(self):
        op = blockops.block_poisson2d(16, 8, nblocks=4)
        assert op.nblocks == 4
        assert op.rows == 4            # 16 grid rows / 4 blocks
        assert op.block_size == 4 * 8  # rows * n

    def test_mesh_shape(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel import make_mesh

        mesh = make_mesh(nblocks=2, intra=4)
        assert mesh.shape["block"] == 2
        assert mesh.shape["intra"] == 4

    def test_rhs_exact_solution(self):
        # b = A @ 1 must make u = 1 the exact solution: direct dense solve
        op = blockops.block_poisson2d(6, 6)
        b = blockops.rhs_ones(op, jnp.float64)
        dense = np.asarray(op.to_dense())
        x = np.linalg.solve(dense, np.asarray(b).reshape(-1))
        np.testing.assert_allclose(x, np.ones(36), rtol=1e-10)
