"""Staged (host-stepped) profiling driver + SPMD observability parity.

The staged driver must reproduce ``multisplit_solve`` exactly (same
sweeps, same iterates) while attributing wall time to the reference's
PetscLog stages; the SPMD engine must record per-cycle residual history
(reference per-iteration printouts, asynchronous-multisplitting_prime.c:345).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from medane_tchakorom_ufc_thesis_repository_tpu.models import (
    blockops,
    multisplitting as ms,
)
from medane_tchakorom_ufc_thesis_repository_tpu.models.staged import (
    staged_multisplit_solve,
)
from medane_tchakorom_ufc_thesis_repository_tpu.utils.profiling import (
    PhaseTimer,
)


def _problem2d(m=32, n=32, nblocks=2):
    op = blockops.block_poisson2d(m, n, nblocks)
    return op, blockops.rhs_ones(op, jnp.float64)


class TestStagedParity:
    @pytest.mark.parametrize("alg", ["sm", "smsm_global", "am"])
    def test_matches_one_jit_driver(self, alg):
        op, b = _problem2d()
        kw = dict(rtol=1e-3, maxiter=2000)
        if alg == "sm":
            ref = ms.sm(op, b, **kw)
            res = staged_multisplit_solve(op, b, **kw)
        elif alg == "smsm_global":
            ref = ms.smsm(op, b, scope="global", s=4, **kw)
            res = staged_multisplit_solve(
                op, b, minimization="global", s=4, **kw
            )
        else:
            ref = ms.am(op, b, staleness=2, **kw)
            res = staged_multisplit_solve(
                op, b, schedule="async", staleness=2, **kw
            )
        assert int(res.sweeps) == int(ref.sweeps)
        assert bool(res.converged) == bool(ref.converged)
        np.testing.assert_allclose(
            np.asarray(res.x), np.asarray(ref.x), rtol=1e-10, atol=1e-12
        )

    def test_stage_timers_populated(self):
        op, b = _problem2d(16, 16)
        pt = PhaseTimer()
        res = staged_multisplit_solve(
            op, b, minimization="global", s=4, rtol=1e-3, maxiter=2000,
            timer=pt,
        )
        stages = {name for name, _, _ in pt.items()}
        assert {"I_Solver", "Exchange", "O_Solver", "Convergence"} <= stages
        assert bool(res.converged)
        # every stage accumulated real time over multiple calls
        for name, t, calls in pt.items():
            assert t > 0 and calls >= 1

    def test_history_recorded(self):
        op, b = _problem2d(16, 16)
        res = staged_multisplit_solve(op, b, rtol=1e-3, maxiter=2000)
        assert res.history is not None
        h = np.asarray(res.history)
        assert h.shape[0] == int(res.cycles)
        assert h[-1] <= 1e-3 * float(res.rnorm0)
        # monotone-ish decrease for plain SM on Poisson
        assert h[-1] < h[0]


class TestSpmdHistory:
    def test_sharded_history(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel import (
            ShardedPoisson2D,
            make_mesh,
            sharded_multisplit_solve,
        )

        mesh = make_mesh(nblocks=2, intra=4)
        op, b = _problem2d()
        res = sharded_multisplit_solve(
            mesh, ShardedPoisson2D(32, 32), b.reshape(32, 32),
            rtol=1e-3, maxiter=2000, record_history=True,
        )
        ref = ms.sm(op, b, rtol=1e-3, maxiter=2000, record_history=True)
        nc = int(res.cycles)
        assert int(ref.cycles) == nc
        np.testing.assert_allclose(
            np.asarray(res.history[:nc]), np.asarray(ref.history[:nc]),
            rtol=1e-4, atol=1e-8,
        )
        # unreached entries stay inf
        assert np.isinf(np.asarray(res.history[nc:])).all()

    def test_tiled_history(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.parallel.tiled import (
            make_tiled_mesh,
            tiled_multisplit_solve,
        )

        mesh = make_tiled_mesh(nblocks=2, ir=2, ic=2)
        op, b = _problem2d()
        res = tiled_multisplit_solve(
            mesh, 32, 32, b.reshape(32, 32), rtol=1e-3, maxiter=2000,
            record_history=True,
        )
        ref = ms.sm(op, b, rtol=1e-3, maxiter=2000, record_history=True)
        nc = int(res.cycles)
        np.testing.assert_allclose(
            np.asarray(res.history[:nc]), np.asarray(ref.history[:nc]),
            rtol=1e-4, atol=1e-8,
        )


class TestCliObservability:
    def test_record_history_json(self, capsys):
        from medane_tchakorom_ufc_thesis_repository_tpu.utils import cli

        rc = cli.main([
            "--alg", "SM", "--m", "16", "--n", "16", "--dtype", "float64",
            "--record-history", "--json",
        ])
        assert rc == 0
        import json as _json

        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        hist = out["residual_history"]
        assert len(hist) == out["cycles"]
        assert hist[-1] <= 1e-3 * out["rnorm0"]

    def test_stage_timers_cli(self, capsys):
        from medane_tchakorom_ufc_thesis_repository_tpu.utils import cli

        rc = cli.main([
            "--alg", "SMSM_GLOBAL", "--m", "16", "--n", "16",
            "--dtype", "float64", "--stage-timers",
        ])
        assert rc == 0
        text = capsys.readouterr().out
        assert "O_Solver" in text and "I_Solver" in text
        assert "Residual norms" in text

    def test_stage_timers_rejected_off_stacked(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.utils import cli

        with pytest.raises(SystemExit):
            cli.main([
                "--alg", "SM", "--m", "16", "--n", "16",
                "--backend", "sharded", "--stage-timers",
            ])
