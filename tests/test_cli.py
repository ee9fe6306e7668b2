"""Tests for the L6 harness: config layering and the isolve-equivalent CLI.

The reference's launcher couples defaults, CLI parsing, and per-block
solver options (``iSolve:118-194``, ``config/default_run_variables``);
these tests pin the same layering and drive real (small) solves through
``cli.main`` for every algorithm family.
"""

import json
import os

import numpy as np

import pytest

from medane_tchakorom_ufc_thesis_repository_tpu.utils import cli
from medane_tchakorom_ufc_thesis_repository_tpu.utils.config import (
    ALGORITHMS,
    RunConfig,
    default_config,
    load_config,
)


class TestConfig:
    def test_defaults_mirror_reference(self):
        cfg = RunConfig()
        assert cfg.alg == "AM"
        assert cfg.m == cfg.n == 1024
        assert cfg.s == 4
        assert cfg.rtol == 1e-3
        assert cfg.min_convergence_count == 4
        assert cfg.inner_maxiter == 20
        assert cfg.inner_rtol == 1e-3

    def test_schedule_and_scope_derivation(self):
        assert default_config(alg="SM", m=8, n=8).schedule == "sync"
        assert default_config(alg="AMAM_GLOBAL", m=8, n=8).schedule == "async"
        assert default_config(alg="SMSM_LOCAL", m=8, n=8).minimization == "local"
        assert (default_config(alg="SMSM_SEMI_LOCAL", m=8, n=8).minimization
                == "semi_local")
        assert default_config(alg="AMAM_GLOBAL", m=8, n=8).minimization == "global"
        assert default_config(alg="AM", m=8, n=8).minimization is None

    def test_unknown_algorithm_rejected(self):
        with pytest.raises(ValueError):
            default_config(alg="NOPE")

    def test_file_layering(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"alg": "SM", "m": 64, "n": 32}))
        cfg = load_config(str(p), n=16)   # CLI override wins over file
        assert cfg.alg == "SM" and cfg.m == 64 and cfg.n == 16

    def test_all_algorithms_enumerated(self):
        assert len(ALGORITHMS) == 11  # 9 reference algs + CA_GMRES + MGPCG

    def test_pc_fields_layer_through_config_file(self, tmp_path):
        # round-3 fields flow through the JSON config layer like any other
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({
            "alg": "GMRES", "matrix": "dummy.npz",
            "pc_type": "bjacobi", "pc_block_size": 32,
            "inner_pc": "bjacobi", "inner_pc_block_size": 16,
        }))
        cfg = load_config(str(p), pc_block_size=8)   # CLI wins
        assert cfg.pc_type == "bjacobi" and cfg.pc_block_size == 8
        assert cfg.inner_pc == "bjacobi" and cfg.inner_pc_block_size == 16
        assert cfg.inner_config().pc_block_size == 16

    def test_pc_type_validated(self):
        with pytest.raises(ValueError, match="pc_type"):
            default_config(alg="GMRES", matrix="x.npz", pc_type="ilu")


class TestCLI:
    def _run(self, *args):
        import io
        import contextlib

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([*args, "--json"])
        line = buf.getvalue().strip().splitlines()[-1]
        return rc, json.loads(line)

    @pytest.mark.parametrize("alg", ["SM", "AM", "SMSM_GLOBAL", "AMAM_LOCAL"])
    def test_algorithms_solve(self, alg):
        rc, rec = self._run(
            "--alg", alg, "--m", "16", "--n", "16",
            "--rtol", "1e-3", "--maxiter", "2000", "--dtype", "float64",
        )
        assert rc == 0
        assert rec["converged"]
        assert rec["rel_rnorm"] <= 1.5e-3

    def test_gmres_baseline(self):
        rc, rec = self._run(
            "--alg", "GMRES", "--m", "16", "--n", "16",
            "--rtol", "1e-4", "--maxiter", "2000", "--dtype", "float64",
        )
        assert rc == 0 and rec["converged"]

    def test_mgpcg(self):
        # f64 -> plain MG-PCG path
        rc, rec = self._run(
            "--alg", "MGPCG", "--m", "32", "--n", "32",
            "--rtol", "1e-6", "--dtype", "float64",
        )
        assert rc == 0 and rec["converged"]
        assert rec["rel_rnorm"] <= 2e-6

    def test_mgpcg_df_refined(self):
        # f32 below the floor -> double-float refinement path
        rc, rec = self._run(
            "--alg", "MGPCG", "--dim", "3", "--m", "16", "--n", "16",
            "--nz", "16", "--rtol", "1e-8", "--dtype", "float32",
        )
        assert rc == 0 and rec["converged"]
        assert rec["rel_rnorm"] <= 1e-8
        assert rec["refine_passes"] <= 3
        assert rec["error_vs_ones"] < 1e-5

    def test_mgpcg_sharded_df(self):
        rc, rec = self._run(
            "--alg", "MGPCG", "--backend", "sharded", "--nblocks", "2",
            "--intra", "4", "--dim", "3", "--m", "16", "--n", "16",
            "--nz", "16", "--rtol", "1e-8", "--dtype", "float32",
        )
        assert rc == 0 and rec["converged"]
        assert rec["rel_rnorm"] <= 1e-8

    def test_sharded_backend(self):
        rc, rec = self._run(
            "--alg", "SM", "--backend", "sharded", "--nblocks", "2",
            "--intra", "4", "--m", "16", "--n", "16",
            "--rtol", "1e-3", "--maxiter", "1000", "--dtype", "float64",
        )
        assert rc == 0 and rec["converged"]

    def test_3d(self):
        rc, rec = self._run(
            "--alg", "SM", "--dim", "3", "--m", "8", "--n", "8", "--nz", "8",
            "--rtol", "1e-3", "--maxiter", "1000", "--dtype", "float64",
        )
        assert rc == 0 and rec["converged"]

    def test_nonconvergence_exit_code(self):
        rc, rec = self._run(
            "--alg", "SM", "--m", "16", "--n", "16",
            "--rtol", "1e-14", "--maxiter", "3", "--dtype", "float64",
        )
        assert rc == 2 and not rec["converged"]


class TestCheckpoint:
    def test_roundtrip_and_resume(self, tmp_path):
        import jax.numpy as jnp
        import numpy as np

        from medane_tchakorom_ufc_thesis_repository_tpu.models import (
            blockops,
            multisplitting as ms,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.utils.checkpoint import (
            load_state,
            save_state,
        )

        op = blockops.block_poisson2d(16, 16)
        b = blockops.rhs_ones(op, jnp.float64)
        partial = ms.sm(op, b, rtol=1e-14, maxiter=10)   # stop mid-solve
        p = str(tmp_path / "ckpt.npz")
        save_state(p, partial.x, sweeps=int(partial.sweeps))
        x0, meta = load_state(p)
        assert meta["sweeps"] == 10
        # pin the reference norm to ||b|| so the resumed solve targets
        # the same absolute tolerance as a fresh one
        rn0 = jnp.linalg.norm(b.reshape(-1))
        resumed = ms.sm(op, b, x0=jnp.asarray(x0), rtol=1e-3, maxiter=2000,
                        rnorm0=rn0)
        fresh = ms.sm(op, b, rtol=1e-3, maxiter=2000)
        assert bool(resumed.converged)
        # warm start must cost fewer sweeps than from scratch
        assert int(resumed.sweeps) < int(fresh.sweeps)


class TestMatrixFlag:
    """--matrix: solve a user-supplied sparse matrix (AIJ entry point)."""

    def _save_blocky(self, tmp_path, n=64, seed=61):
        import scipy.sparse as sp

        rng = np.random.default_rng(seed)
        nbk, c = n // 8, 8
        A = sp.lil_matrix((n, n))
        for r in range(nbk):
            for cc in rng.choice(nbk, size=2, replace=False):
                A[r*c:(r+1)*c, cc*c:(cc+1)*c] = rng.standard_normal((c, c))
        A = (A.tocsr() @ A.tocsr().T) + sp.eye(n) * n
        path = tmp_path / "mat.npz"
        sp.save_npz(path, A.tocsr())
        return str(path), A

    def test_smsm_global_on_user_matrix(self, tmp_path, capsys):
        path, A = self._save_blocky(tmp_path)
        rc = cli.main([
            "--alg", "SMSM_GLOBAL", "--matrix", path, "--dtype", "float64",
            "--rtol", "1e-8", "--maxiter", "400", "--s", "4",
            "--inner-maxiter", "20", "--inner-rtol", "1e-10",
            "--inner-pc-type", "jacobi", "--json",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["converged"]
        assert out["rel_rnorm"] <= 1.05e-8
        assert out["error_vs_ones"] < 1e-4
        assert "mat.npz" in out["grid"]

    def test_gmres_on_user_matrix(self, tmp_path, capsys):
        path, A = self._save_blocky(tmp_path, seed=62)
        rc = cli.main([
            "--alg", "GMRES", "--matrix", path, "--dtype", "float64",
            "--rtol", "1e-8", "--maxiter", "4000", "--json",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["converged"]
        assert out["rel_rnorm"] <= 1.05e-8

    def test_matrix_rejects_unsupported(self, tmp_path):
        path, _ = self._save_blocky(tmp_path, seed=63)
        with pytest.raises(SystemExit):
            cli.main(["--alg", "MGPCG", "--matrix", path, "--json"])
        with pytest.raises(SystemExit):
            cli.main(["--alg", "SM", "--matrix", path,
                      "--backend", "sharded", "--json"])

    def test_sm_inner_bjacobi_on_user_matrix(self, tmp_path, capsys):
        # inner PCBJACOBI on the multisplitting drivers
        path, A = self._save_blocky(tmp_path, seed=67)
        rc = cli.main([
            "--alg", "SM", "--matrix", path, "--dtype", "float64",
            "--rtol", "1e-8", "--maxiter", "400",
            "--inner-maxiter", "20", "--inner-rtol", "1e-10",
            "--inner-pc-type", "bjacobi", "--inner-pc-block-size", "8",
            "--json",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["converged"]
        assert out["rel_rnorm"] <= 1.05e-8
        assert out["error_vs_ones"] < 1e-4

    def test_gmres_pc_bjacobi_on_user_matrix(self, tmp_path, capsys):
        # whole-system PC on the GMRES baseline (outer -pc_type analog)
        path, A = self._save_blocky(tmp_path, seed=65)
        rc = cli.main([
            "--alg", "GMRES", "--matrix", path, "--dtype", "float64",
            "--rtol", "1e-8", "--maxiter", "4000",
            "--pc-type", "bjacobi", "--pc-block-size", "8", "--json",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["converged"]
        # RIGHT PC: the convergence test sees the true residual, so the
        # reported true relative residual meets rtol (f64, small slack)
        assert out["final_true_rnorm"] / out["rnorm0"] <= 1.1e-8
        assert out["error_vs_ones"] < 1e-6

    def test_gmres_pc_amg_on_user_matrix(self, tmp_path, capsys):
        # whole-system smoothed-aggregation AMG (PCGAMG analog) on an
        # SPD unstructured matrix (randomly permuted Poisson)
        import scipy.sparse as sp

        from medane_tchakorom_ufc_thesis_repository_tpu.core.poisson import (
            poisson2d_coo,
        )

        rows, cols, vals, shape = poisson2d_coo(24, 24)
        perm = np.random.default_rng(13).permutation(shape[0])
        A = sp.coo_matrix((vals, (perm[rows], perm[cols])),
                          shape=shape).tocsr()
        path = str(tmp_path / "perm.npz")
        sp.save_npz(path, A)
        rc = cli.main([
            "--alg", "GMRES", "--matrix", path, "--dtype", "float64",
            "--rtol", "1e-8", "--maxiter", "4000",
            "--pc-type", "amg", "--json",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["converged"]
        assert out["final_true_rnorm"] / out["rnorm0"] <= 1.1e-8
        assert out["error_vs_ones"] < 1e-6

    def test_pc_amg_sharded_rejected(self, tmp_path):
        path, _ = self._save_blocky(tmp_path, seed=68)
        with pytest.raises(SystemExit, match="stacked"):
            cli.main([
                "--alg", "GMRES", "--matrix", path, "--backend",
                "sharded", "--pc-type", "amg", "--json",
            ])

    def test_gmres_pc_jacobi_sharded_on_user_matrix(self, tmp_path, capsys):
        path, A = self._save_blocky(tmp_path, seed=66)
        rc = cli.main([
            "--alg", "GMRES", "--matrix", path, "--backend", "sharded",
            "--nblocks", "2", "--intra", "4", "--dtype", "float64",
            "--rtol", "1e-8", "--maxiter", "3000",
            "--pc-type", "bjacobi", "--pc-block-size", "8", "--json",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["converged"]
        assert out["error_vs_ones"] < 1e-4

    def test_ca_gmres_on_user_matrix_estimated_bounds(self, tmp_path,
                                                      capsys):
        # whole-system CA-GMRES with the Lanczos-estimated interval
        path, A = self._save_blocky(tmp_path, seed=68)
        rc = cli.main([
            "--alg", "CA_GMRES", "--matrix", path, "--dtype", "float64",
            "--rtol", "1e-6", "--maxiter", "2000", "--s", "8", "--json",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["converged"]
        assert out["rel_rnorm"] <= 1.1e-6

    def test_pc_type_requires_matrix(self):
        with pytest.raises(ValueError, match="pc-type"):
            cli.main(["--alg", "GMRES", "--m", "32", "--n", "32",
                      "--pc-type", "bjacobi", "--json"])

    def test_gmres_sharded_on_user_matrix(self, tmp_path, capsys):
        # row-sharded general-sparse GMRES over the 8-device mesh
        path, A = self._save_blocky(tmp_path, seed=64)
        rc = cli.main([
            "--alg", "GMRES", "--matrix", path, "--backend", "sharded",
            "--nblocks", "2", "--intra", "4", "--dtype", "float64",
            "--rtol", "1e-8", "--maxiter", "3000", "--json",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["converged"]
        assert out["rel_rnorm"] <= 1.05e-8
        assert out["error_vs_ones"] < 1e-4
