"""Tests for the native C++ assembly library (and its numpy fallback)."""

import numpy as np
import pytest

from medane_tchakorom_ufc_thesis_repository_tpu import native
from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson


class TestNativeAssembly:
    def test_library_builds(self):
        assert native.available(), f"native build failed: {native.build_error()}"

    def test_poisson2d_ell_matches_numpy(self):
        idx_n, val_n = native.poisson2d_ell_np(13, 9)
        ell = poisson.coo_to_ell(*poisson.poisson2d_coo(13, 9), width=5,
                                 dtype=np.float64)
        np.testing.assert_array_equal(idx_n, np.asarray(ell.indices))
        np.testing.assert_array_equal(val_n, np.asarray(ell.values))

    def test_poisson3d_ell_matches_numpy(self):
        idx_n, val_n = native.poisson3d_ell_np(5, 4, 3)
        ell = poisson.coo_to_ell(*poisson.poisson3d_coo(5, 4, 3), width=7,
                                 dtype=np.float64)
        np.testing.assert_array_equal(idx_n, np.asarray(ell.indices))
        np.testing.assert_array_equal(val_n, np.asarray(ell.values))

    def test_poisson2d_dia_matches_numpy(self):
        data_n, offs_n = native.poisson2d_dia_np(7, 6)
        dia = poisson.poisson2d_dia(7, 6, dtype=np.float64)
        assert tuple(offs_n) == dia.offsets
        np.testing.assert_array_equal(data_n, np.asarray(dia.data))

    def test_poisson3d_dia_matches_numpy(self):
        data_n, offs_n = native.poisson3d_dia_np(4, 3, 5)
        dia = poisson.poisson3d_dia(4, 3, 5, dtype=np.float64)
        assert tuple(offs_n) == dia.offsets
        np.testing.assert_array_equal(data_n, np.asarray(dia.data))

    def test_coo_to_ell_general(self):
        rng = np.random.default_rng(0)
        n = 50
        rows = rng.integers(0, n, 200)
        cols = rng.integers(0, n, 200)
        # dedupe (row, col) pairs: ELL slots hold single entries
        pairs = np.unique(np.stack([rows, cols]), axis=1)
        rows, cols = pairs[0], pairs[1]
        vals = rng.standard_normal(len(rows))
        width = int(np.bincount(rows, minlength=n).max())
        idx, val = native.coo_to_ell_np(rows, cols, vals, n, width)
        dense = np.zeros((n, n))
        dense[rows, cols] = vals
        dense2 = np.zeros((n, n))
        np.add.at(dense2, (np.repeat(np.arange(n), width), idx.reshape(-1)),
                  val.reshape(-1))
        np.testing.assert_allclose(dense2, dense, rtol=1e-14)

    def test_coo_to_ell_width_overflow(self):
        rows = np.array([0, 0, 0])
        cols = np.array([0, 1, 2])
        vals = np.ones(3)
        if native.available():
            with pytest.raises(ValueError):
                native.coo_to_ell_np(rows, cols, vals, 2, 2)

    def test_large_grid_assembly(self):
        # production-scale smoke: 2048 x 2048 = 4.2M rows in one pass
        idx, val = native.poisson2d_ell_np(2048, 2048)
        assert idx.shape == (2048 * 2048, 5)
        # spot-check an interior row
        r = 1000 * 2048 + 1000
        assert set(idx[r]) == {r, r - 2048, r - 1, r + 1, r + 2048}
        assert val[r].sum() == 0.0  # 4 + 4*(-1)
