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

    def test_bsr_pack_matches_numpy(self):
        """Native BSR pack (counting-sort bucketing, OpenMP) vs the
        numpy np.unique reference — identical indices and values on
        ragged shapes, duplicate entries, and rectangular packs."""
        import unittest.mock as mock

        from medane_tchakorom_ufc_thesis_repository_tpu.core import (
            operators as om,
        )

        if not native.available():
            pytest.skip(f"no native lib: {native.build_error()}")
        rng = np.random.default_rng(11)
        cases = [(37, 53, 8, 500), (64, 64, 16, 2000), (10, 10, 4, 60),
                 (128, 96, 32, 5000), (16, 16, 8, 0)]
        for n_r, n_c, bs, nnz in cases:
            r = rng.integers(0, n_r, nnz)
            c = rng.integers(0, n_c, nnz)
            v = rng.standard_normal(nnz)
            if nnz:   # inject duplicates (packs must coalesce by sum)
                r = np.concatenate([r, r[:5]])
                c = np.concatenate([c, c[:5]])
                v = np.concatenate([v, v[:5]])
            got = native.bsr_pack(r, c, v, (n_r, n_c), bs)
            with mock.patch.object(native, "bsr_pack",
                                   lambda *a, **k: None):
                ref_i, ref_v = om._bsr_pack_np(r, c, v, (n_r, n_c), bs)
            np.testing.assert_array_equal(got[0], ref_i)
            np.testing.assert_allclose(got[1], ref_v, rtol=0, atol=1e-12)

    def test_bsr_pack_rejects_out_of_range(self):
        if not native.available():
            pytest.skip(f"no native lib: {native.build_error()}")
        with pytest.raises(ValueError, match="outside"):
            native.bsr_pack(np.array([99]), np.array([0]),
                            np.array([1.0]), (8, 8), 4)
        # negative columns would heap-write before the values buffer in
        # the fill phase ('% bs' is sign-preserving in C++) — must raise
        with pytest.raises(ValueError, match="outside"):
            native.bsr_pack(np.array([0]), np.array([-1]),
                            np.array([1.0]), (8, 8), 4)
        with pytest.raises(ValueError, match="outside"):
            native.bsr_pack(np.array([0]), np.array([100]),
                            np.array([1.0]), (8, 8), 4)
        with pytest.raises(ValueError, match="outside"):
            native.bsr_pack(np.array([-1]), np.array([0]),
                            np.array([1.0]), (8, 8), 4)

    def test_large_grid_assembly(self):
        # production-scale smoke: 2048 x 2048 = 4.2M rows in one pass
        idx, val = native.poisson2d_ell_np(2048, 2048)
        assert idx.shape == (2048 * 2048, 5)
        # spot-check an interior row
        r = 1000 * 2048 + 1000
        assert set(idx[r]) == {r, r - 2048, r - 1, r + 1, r + 2048}
        assert val[r].sum() == 0.0  # 4 + 4*(-1)
