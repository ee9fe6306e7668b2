"""Pallas kernels: interpreter-mode exactness vs the XLA paths.

Mosaic cannot compile through the axon tunnel (environment limitation;
``fused_pallas.mosaic_available`` logs why), so the kernels are pinned
EXACT against the XLA formulations in ``pltpu.force_tpu_interpret_mode``
— the same arithmetic the real-chip compile would execute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson
from medane_tchakorom_ufc_thesis_repository_tpu.ops import (
    fused_pallas as fp,
)
from medane_tchakorom_ufc_thesis_repository_tpu.ops.stencil_pallas import (
    stencil2d_mv_pallas,
    stencil3d_apply_pallas,
    stencil3d_mv_pallas,
)


@pytest.fixture()
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _x(n, seed=0, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(n), dtype
    )


@pytest.mark.usefixtures("_interpret")
class TestStencilKernels:
    def test_2d_mv_exact(self):
        m = n = 64
        op = poisson.poisson2d(m, n)
        x = _x(m * n)
        y = stencil2d_mv_pallas(x, m=m, n=n, tile_m=16)
        # tap-summation ORDER differs from the XLA formulation (the
        # rotate+mask shifts pair west+east before adding), so
        # agreement is to f32 rounding, not bitwise
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(op.mv(x)), rtol=1e-6, atol=1e-6
        )

    def test_3d_mv_exact(self):
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        x = _x(nx * ny * nz)
        y = stencil3d_mv_pallas(x, nx=nx, ny=ny, nz=nz, tile_m=4)
        # tap-summation ORDER differs from the XLA formulation in 3D,
        # so agreement is to f32 rounding, not bitwise
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(op.mv(x).reshape(-1)),
            rtol=1e-6, atol=1e-6,
        )

    def test_3d_grid_shaped(self):
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        g = _x(nx * ny * nz, 4).reshape(nx, ny, nz)
        y = stencil3d_mv_pallas(g, nx=nx, ny=ny, nz=nz, tile_m=4)
        assert y.shape == (nx, ny, nz)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(op.mv(g)), rtol=1e-6, atol=1e-6,
        )

    def test_3d_fused_residual(self):
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        x, b = _x(nx**3, 1), _x(nx**3, 2)
        r = stencil3d_apply_pallas(
            x, b, nx=nx, ny=ny, nz=nz, tile_m=4, kind="residual")
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(b - op.mv(x)), rtol=1e-6, atol=1e-6,
        )

    def test_3d_fused_jacobi(self):
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        x, b = _x(nx**3, 5), _x(nx**3, 6)
        w = 0.857 / 6.0
        y = stencil3d_apply_pallas(
            x, b, nx=nx, ny=ny, nz=nz, tile_m=4, kind="jacobi", omega=w)
        ref = x + w * (b - op.mv(x))
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-6,
        )

    def test_3d_jacobi_dot(self):
        # the sweep plus b·x' accumulated on-core (PCG's post-cycle
        # vdot(r, z) inside the MG final smoothing kernel)
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        x, b = _x(nx**3, 7), _x(nx**3, 8)
        w = 0.857 / 6.0
        y, dot = stencil3d_apply_pallas(
            x, b, nx=nx, ny=ny, nz=nz, tile_m=4, kind="jacobi_dot",
            omega=w)
        ref = x + w * (b - op.mv(x))
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            float(dot), float(jnp.vdot(b, ref)), rtol=1e-5,
        )

    def test_3d_axpy_mv_dot(self):
        # PCG direction-update + matvec + dot in one kernel (not wired
        # into the fused north-star — measured slower on v5e, see
        # Stencil3D.axpy_mv_dot — but kept exact and routable)
        from medane_tchakorom_ufc_thesis_repository_tpu.ops.stencil_pallas import (  # noqa: E501
            stencil3d_axpy_mv_dot_pallas,
        )
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        z, p = _x(nx**3, 9), _x(nx**3, 10)
        beta = jnp.float32(0.37)
        pn, ap, dot = stencil3d_axpy_mv_dot_pallas(
            z, p, beta, nx=nx, ny=ny, nz=nz, tile_m=4)
        pref = z + 0.37 * p
        apref = op.mv(pref)
        np.testing.assert_allclose(
            np.asarray(pn), np.asarray(pref), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ap), np.asarray(apref), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            float(dot), float(jnp.vdot(pref, apref)), rtol=1e-5)

    def test_3d_mv_dot(self):
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        x = _x(nx**3, 3)
        y, dot = stencil3d_apply_pallas(
            x, nx=nx, ny=ny, nz=nz, tile_m=4, kind="mv_dot")
        ref_y = op.mv(x).reshape(-1)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref_y), rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            float(dot), float(jnp.vdot(x, ref_y)), rtol=1e-5,
        )

    def test_3d_mv_cast(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.ops.stencil_pallas import (
            stencil3d_mv_cast_pallas,
        )
        nx = nz = 8
        ny = 16  # bf16 output needs 16-row alignment
        op = poisson.poisson3d(nx, ny, nz)
        x = _x(nx * ny * nz, 13).reshape(nx, ny, nz)
        y, c = stencil3d_mv_cast_pallas(
            x, nx=nx, ny=ny, nz=nz, out_dtype=jnp.bfloat16)
        assert y.dtype == jnp.bfloat16 and c.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(op.mv(x)),
            rtol=1e-2, atol=1e-2,
        )
        np.testing.assert_array_equal(
            np.asarray(c, np.float32),
            np.asarray(x.astype(jnp.bfloat16), np.float32),
        )

    def test_3d_df_residual(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.ops.stencil_pallas import (
            stencil3d_df_residual_pallas,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers import df64
        nx = ny = nz = 16
        rng = np.random.default_rng(21)
        x64 = rng.standard_normal((nx, ny, nz))
        b64 = rng.standard_normal((nx, ny, nz))
        xhi, xlo = df64.df_from_f64(x64)
        bhi, blo = df64.df_from_f64(b64)
        rh, rl = stencil3d_df_residual_pallas(
            xhi, xlo, bhi, blo, nx=nx, ny=ny, nz=nz)
        # whole-array XLA form: identical EFT operation tree
        import jax.numpy as jnp2
        phi, plo = jnp2.pad(xhi, 1), jnp2.pad(xlo, 1)
        eh, el = df64._df_residual_core_3d(phi, plo, bhi, blo, 6.0, -1.0)
        np.testing.assert_array_equal(np.asarray(rh), np.asarray(eh))
        np.testing.assert_allclose(
            np.asarray(rl), np.asarray(el), atol=1e-10)
        # and the df result equals the f64 residual to ~2^-48
        r64 = (np.asarray(rh, np.float64) + np.asarray(rl, np.float64))
        from medane_tchakorom_ufc_thesis_repository_tpu.core import poisson as pp
        A = pp.poisson3d_dense_np(nx, ny, nz, 6.0, -1.0)
        ref64 = b64.reshape(-1) - A @ x64.reshape(-1)
        np.testing.assert_allclose(
            r64.reshape(-1), ref64, rtol=1e-13, atol=1e-12)

    def test_3d_residual_restrict(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.ops.stencil_pallas import (
            stencil3d_residual_restrict_pallas,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers import (
            multigrid as mg,
        )
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        x = _x(nx**3, 8).reshape(nx, ny, nz)
        b = _x(nx**3, 9).reshape(nx, ny, nz)
        rc = stencil3d_residual_restrict_pallas(
            x, b, nx=nx, ny=ny, nz=nz, scale=4.0)
        ref = 4.0 * mg._restrict(b - op.mv(x), (nx, ny, nz))
        assert rc.shape == (nx // 2, ny // 2, nz // 2)
        np.testing.assert_allclose(
            np.asarray(rc), np.asarray(ref), rtol=1e-5, atol=1e-5,
        )

    def test_3d_prolong_jacobi(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.ops.stencil_pallas import (
            stencil3d_prolong_jacobi_pallas,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.solvers import (
            multigrid as mg,
        )
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        x = _x(nx**3, 10).reshape(nx, ny, nz)
        b = _x(nx**3, 11).reshape(nx, ny, nz)
        e = _x((nx // 2) ** 3, 12).reshape(nx // 2, ny // 2, nz // 2)
        w = 0.857 / 6.0
        y = stencil3d_prolong_jacobi_pallas(
            x, b, e, nx=nx, ny=ny, nz=nz, omega=w)
        m = x + mg._prolong(e, (nx // 2, ny // 2, nz // 2))
        ref = m + w * (b - op.mv(m))
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5,
        )

    def test_3d_bf16(self):
        nx = nz = 8
        ny = 16  # bf16 sublane granularity
        op = poisson.poisson3d(nx, ny, nz)
        x = _x(nx * ny * nz, 7, dtype=jnp.bfloat16)
        y = stencil3d_mv_pallas(x, nx=nx, ny=ny, nz=nz, tile_m=4)
        ref = op.mv(x.astype(jnp.float32))
        np.testing.assert_allclose(
            np.asarray(y, dtype=np.float32), np.asarray(ref).reshape(-1),
            rtol=3e-2, atol=3e-2,
        )

    def test_3d_alignment_guard(self):
        with pytest.raises(ValueError, match="ny"):
            stencil3d_apply_pallas(
                _x(4 * 12 * 8), nx=4, ny=12, nz=8, kind="mv")


@pytest.mark.usefixtures("_interpret")
class TestFusedKernels:
    def test_spmm_panel_exact(self):
        m = n = 32
        s = 5
        op = poisson.poisson2d(m, n)
        S = jnp.stack([_x(m * n, seed=i) for i in range(s)])
        R = fp.stencil2d_spmm_pallas(S, m=m, n=n, tile_m=8)
        np.testing.assert_array_equal(
            np.asarray(R), np.asarray(jax.vmap(op.mv)(S))
        )

    def test_mv_norm_fused_exact(self):
        m = n = 32
        op = poisson.poisson2d(m, n)
        x, b = _x(m * n, 1), _x(m * n, 2)
        y, sq = fp.stencil2d_mv_norm_pallas(x, b, m=m, n=n, tile_m=8)
        yx = op.mv(x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(yx))
        np.testing.assert_allclose(
            float(sq), float(jnp.sum((b - yx) ** 2)), rtol=1e-6
        )

    def test_mdot_exact(self):
        k, n = 7, 4096
        V = jnp.stack([_x(n, seed=i) for i in range(k)])
        w = _x(n, seed=99)
        d = fp.mdot_pallas(V, w, tile_n=512)
        # tiled accumulation order differs from the XLA dot
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(V @ w), rtol=1e-4, atol=1e-4
        )

    def test_maxpy_exact(self):
        k, n = 6, 2048
        V = jnp.stack([_x(n, seed=i) for i in range(k)])
        a = _x(k, seed=50)
        y0 = _x(n, seed=51)
        y = fp.maxpy_pallas(V, a, y0, tile_n=512)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y0 + a @ V), rtol=1e-5, atol=1e-6
        )


class TestProbeAndRouting:
    # NOTE: no interpreter fixture on the probe test — the probe must
    # see the real backend (where Mosaic is absent) to exercise the
    # logging path
    def test_probe_false_on_cpu_and_logs(self, caplog):
        fp.mosaic_available.cache_clear()
        import logging

        with caplog.at_level(logging.INFO, logger=fp.__name__):
            assert fp.mosaic_available() is False
        assert any("unavailable" in r.message for r in caplog.records)
        fp.mosaic_available.cache_clear()

    def test_env_switch(self, monkeypatch):
        monkeypatch.setenv("MEDANE_TPU_PALLAS", "0")
        assert fp.pallas_enabled() is False
        monkeypatch.setenv("MEDANE_TPU_PALLAS", "1")
        assert fp.pallas_enabled() is True

    @pytest.mark.usefixtures("_interpret")
    def test_auto_route_forced_on_interpreter(self, monkeypatch):
        # force-enable under the interpreter: the routed results match
        # the XLA path bit-for-bit
        monkeypatch.setenv("MEDANE_TPU_PALLAS", "1")
        m = n = 32
        op = poisson.poisson2d(m, n)
        S = jnp.stack([_x(m * n, seed=i) for i in range(4)])
        np.testing.assert_array_equal(
            np.asarray(fp.spmm_panel(op, S)),
            np.asarray(jax.vmap(op.mv)(S)),
        )
        x, b = _x(m * n, 5), _x(m * n, 6)
        y, sq = fp.residual_norm_sq(op, x, b)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(op.mv(x)))

    def test_auto_route_xla_fallback(self, monkeypatch):
        monkeypatch.setenv("MEDANE_TPU_PALLAS", "0")
        m = n = 16
        op = poisson.poisson2d(m, n)
        x, b = _x(m * n, 7), _x(m * n, 8)
        y, sq = fp.residual_norm_sq(op, x, b)
        np.testing.assert_allclose(
            float(sq), float(jnp.sum((b - op.mv(x)) ** 2)), rtol=1e-6
        )


@pytest.mark.usefixtures("_interpret")
class TestBsrKernel:
    def test_bsr_mv_exact(self):
        import scipy.sparse as sp

        from medane_tchakorom_ufc_thesis_repository_tpu.core.operators import (
            BSR,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.ops.bsr_pallas import (
            bsr_mv_pallas,
        )

        rng = np.random.default_rng(3)
        A = sp.random(96, 96, density=0.1, random_state=3).tocsr()
        A = A + sp.eye(96)
        coo = A.tocoo()
        op = BSR.from_coo(coo.row, coo.col, coo.data, A.shape, bs=8,
                          dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal(96), jnp.float32)
        y = bsr_mv_pallas(op, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(op.mv(x)), rtol=2e-5, atol=1e-5,
        )


@pytest.mark.usefixtures("_interpret")
class TestFused3D:
    def test_mv_norm_3d_fused(self):
        nx = ny = nz = 16
        op = poisson.poisson3d(nx, ny, nz)
        x, b = _x(nx * ny * nz, 1), _x(nx * ny * nz, 2)
        y, sq = fp.stencil3d_mv_norm_pallas(x, b, nx=nx, ny=ny, nz=nz,
                                            tile_m=4)
        yx = op.mv(x).reshape(-1)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(yx), rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            float(sq), float(jnp.sum((b - yx) ** 2)), rtol=1e-5,
        )

    def test_auto_route_3d(self, monkeypatch):
        monkeypatch.setenv("MEDANE_TPU_PALLAS", "1")
        nx = ny = nz = 8
        op = poisson.poisson3d(nx, ny, nz)
        x, b = _x(nx * ny * nz, 3), _x(nx * ny * nz, 4)
        y, sq = fp.residual_norm_sq(op, x, b)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(op.mv(x).reshape(-1)),
            rtol=1e-6, atol=1e-6,
        )
