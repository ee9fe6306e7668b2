"""SLCV legacy termination protocol (``models.convergence.SlcvNode``).

Capability match: the reference's first decentralized termination
scheme — spanning-tree sPartialCV/CancelCV with per-neighbor iteration
counters, globalCV gossip, traversal-time hold
(``/root/reference/src/utils/conv_detection.c:6-196``,
``include/constants.h:24-39``, guard
``asynchronous-multisplitting.c.save:307-329``).
"""

import threading

import numpy as np
import pytest

import jax.numpy as jnp

from medane_tchakorom_ufc_thesis_repository_tpu.models.convergence import (
    LocalTransport,
    Msg,
    MsgKind,
    SlcvNode,
    slcv_tree,
)


class TestTree:
    def test_two_blocks_reduces_to_reference_pair(self):
        assert slcv_tree(0, 2) == (None, [1])
        assert slcv_tree(1, 2) == (0, [])

    def test_binary_shape(self):
        assert slcv_tree(0, 5) == (None, [1, 2])
        assert slcv_tree(1, 5) == (0, [3, 4])
        assert slcv_tree(2, 5) == (0, [])
        assert slcv_tree(4, 5) == (1, [])


def _mk(n, threshold=2):
    tr = LocalTransport(n)
    return tr, [SlcvNode(r, n, tr, threshold_slcv=threshold)
                for r in range(n)]


def _pump_all(nodes, rounds=4):
    for _ in range(rounds):
        for nd in nodes:
            nd.pump()


class TestSlcvProtocol:
    def test_counter_gates_local_cv(self):
        tr, nodes = _mk(2, threshold=3)
        nd = nodes[1]
        nd.step(True)
        nd.step(True)
        assert not nd.s_local_cv        # only 2 of 3
        nd.step(False)
        nd.step(True)
        nd.step(True)
        nd.step(True)                   # 3 consecutive
        assert nd.s_local_cv

    def test_global_cv_via_tree_and_gossip(self):
        tr, nodes = _mk(3, threshold=1)
        # leaves claim up; root combines; gossip reaches everyone
        for _ in range(2):
            for nd in nodes:
                nd.step(True)
        _pump_all(nodes)
        assert all(nd.global_cv for nd in nodes)
        assert all(nd.held_for() >= 0.0 for nd in nodes)

    def test_rebound_retracts_and_clears_global(self):
        tr, nodes = _mk(3, threshold=1)
        for _ in range(2):
            for nd in nodes:
                nd.step(True)
        _pump_all(nodes)
        assert all(nd.global_cv for nd in nodes)
        # leaf 2 rebounds: cancel flows up, root gossips negative
        nodes[2].step(False)
        _pump_all(nodes)
        assert not nodes[0].global_cv
        assert not nodes[1].global_cv
        # hold restarts after re-convergence
        nodes[2].step(True)
        _pump_all(nodes)
        for nd in nodes:
            nd.pump()
        assert all(nd.global_cv for nd in nodes)

    def test_stale_cancel_cannot_retract_newer_claim(self):
        tr, nodes = _mk(2, threshold=1)
        root, leaf = nodes
        # genuine claim at iteration 5 (4 over-threshold iters first)
        for _ in range(4):
            leaf.step(False)
        leaf.step(True)
        root.pump()
        assert root.child_partial[1] == 5
        # stale cancel from iteration 3 (delayed on the wire): must NOT
        # retract the newer claim (prevIterNumS filtering)
        tr.send(0, Msg(kind=MsgKind.S_CANCEL_CV, src=1, phase_tag=0,
                       iteration=3))
        root.pump()
        assert root.child_partial[1] == 5
        root.step(True)
        assert root.global_cv

    def test_stale_partial_cannot_resurrect_cancel(self):
        tr, nodes = _mk(2, threshold=1)
        root, leaf = nodes
        for _ in range(4):
            leaf.step(False)
        leaf.step(True)           # claim at iteration 5
        leaf.step(False)          # cancel at iteration 6
        root.pump()
        assert root.child_partial[1] is None
        # a delayed duplicate of the old claim (iteration 5) arrives
        # after the cancel: dropped (prevIterNumC filtering)
        tr.send(0, Msg(kind=MsgKind.S_PARTIAL_CV, src=1, phase_tag=0,
                       iteration=5))
        root.pump()
        assert root.child_partial[1] is None
        root.step(True)
        assert not root.global_cv

    def test_cancel_race_reclaim_wins(self):
        """Cancel then a NEWER re-claim delivered out of order: the
        newer claim must stand (iteration comparison, not arrival
        order)."""
        tr, nodes = _mk(2, threshold=1)
        root, leaf = nodes
        # deliver re-claim (iter 9) BEFORE the cancel (iter 6)
        tr.send(0, Msg(kind=MsgKind.S_PARTIAL_CV, src=1, phase_tag=0,
                       iteration=9))
        tr.send(0, Msg(kind=MsgKind.S_CANCEL_CV, src=1, phase_tag=0,
                       iteration=6))
        root.pump()
        assert root.child_partial[1] == 9

    def test_deep_tree_cancellation_propagates_to_root(self):
        tr, nodes = _mk(7, threshold=1)   # 3 levels
        for _ in range(2):
            for nd in nodes:
                nd.step(True)
        _pump_all(nodes, rounds=6)
        assert nodes[0].global_cv
        # deepest leaf rebounds -> root must clear within gossip rounds
        nodes[6].step(False)
        _pump_all(nodes, rounds=6)
        assert not nodes[0].global_cv
        assert not nodes[3].global_cv


class TestSlcvEndToEnd:
    def test_two_thread_solve_over_tcp(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.models import (
            blockops,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.models.multisplitting import (  # noqa: E501
            InnerConfig,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.models.net import (
            TcpTransport,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.models.net_async import (  # noqa: E501
            net_async_block_solve,
        )
        from medane_tchakorom_ufc_thesis_repository_tpu.utils.multihost import (  # noqa: E501
            free_port,
        )

        op = blockops.block_poisson2d(24, 24, nblocks=2)
        b = blockops.rhs_ones(op, jnp.float64)
        addrs = [("localhost", free_port()), ("localhost", free_port())]
        tr = [TcpTransport(r, addrs) for r in range(2)]
        out = [None, None]

        def work(r):
            out[r] = net_async_block_solve(
                op, b, r, tr[r], rtol=1e-4, maxiter=4000,
                inner=InnerConfig(maxiter=20), termination="slcv")

        th = [threading.Thread(target=work, args=(r,)) for r in range(2)]
        for t in th:
            t.start()
        for t in th:
            t.join(timeout=240)
        for t_ in tr:
            t_.close()
        assert out[0] is not None and out[1] is not None
        assert all(o["converged"] for o in out)
        x = np.concatenate(
            [np.asarray(out[r]["x_block"]) for r in range(2)])
        res = np.asarray(b).reshape(-1) - np.asarray(
            op.global_mv(jnp.asarray(x)))
        rel = np.linalg.norm(res) / out[0]["rnorm0"]
        # legacy protocol: async slack permitted (no certificate) —
        # same bound class as the traversal guard
        assert rel <= 30 * 1e-4, rel


@pytest.mark.slow
class TestSlcvProcesses:
    def test_two_process_run(self):
        from medane_tchakorom_ufc_thesis_repository_tpu.models.net_async import (  # noqa: E501
            launch_net_async,
        )

        res = launch_net_async(nblocks=2, m=24, n=24, rtol=1e-4,
                               termination="slcv", timeout_s=240.0)
        assert all(r["converged"] for r in res)
