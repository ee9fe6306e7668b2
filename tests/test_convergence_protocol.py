"""Unit tests for the Alg-5.15 decentralized convergence protocol.

The reference leaves its convergence-detection code untested (SURVEY.md
§4 coverage gaps); these tests exercise the protocol state machine
directly with scripted residual trajectories and message schedules.
"""

from medane_tchakorom_ufc_thesis_repository_tpu.models.convergence import (
    Alg515Node,
    LocalTransport,
    Msg,
    MsgKind,
    State,
)


def make_ring(n, persistence=1):
    t = LocalTransport(n)
    all_ranks = list(range(n))
    nodes = [
        Alg515Node(r, [x for x in all_ranks if x != r], t, persistence)
        for r in all_ranks
    ]
    return t, nodes


def run_rounds(nodes, under, rounds=20):
    """Step all nodes with given under-threshold flags until all FINISHED
    or round budget exhausted.  Fresh data from all peers every round."""
    for _ in range(rounds):
        for node in nodes:
            node.step(
                under_threshold=under[node.rank],
                fresh_from=node.neighbors,
            )
        if all(n.state is State.FINISHED for n in nodes):
            return True
    # a few extra pumps for in-flight verdicts
    for _ in range(5):
        for n in nodes:
            n.pump()
    return all(n.state is State.FINISHED for n in nodes)


class TestBasicTermination:
    def test_two_nodes_converge(self):
        _, nodes = make_ring(2)
        assert run_rounds(nodes, under=[True, True])

    def test_four_nodes_converge(self):
        _, nodes = make_ring(4)
        assert run_rounds(nodes, under=[True] * 4)

    def test_no_termination_while_one_above(self):
        _, nodes = make_ring(2)
        assert not run_rounds(nodes, under=[True, False], rounds=30)
        assert all(n.state is not State.FINISHED for n in nodes)

    def test_no_termination_without_fresh_data(self):
        # pseudo-period guard: under threshold but no fresh dependencies
        t, nodes = make_ring(2)
        for _ in range(30):
            for n in nodes:
                n.step(under_threshold=True, fresh_from=[])
        assert all(not n.local_cv for n in nodes)
        assert all(n.state is not State.FINISHED for n in nodes)


class TestPersistence:
    def test_requires_persistent_under_threshold(self):
        _, nodes = make_ring(2, persistence=5)
        # alternate under/over: counter resets, never reaches 5
        for i in range(30):
            under = (i % 3) != 0
            for n in nodes:
                n.step(under_threshold=under, fresh_from=n.neighbors)
        assert all(n.state is not State.FINISHED for n in nodes)
        # now hold under threshold: terminates
        assert run_rounds(nodes, under=[True, True], rounds=30)


class TestReboundCancellation:
    def test_cancel_retracts_claim(self):
        t, nodes = make_ring(2)
        # node 0 goes under and claims CV; node 1 stays above
        for _ in range(3):
            nodes[0].step(True, fresh_from=[1])
            nodes[1].step(False, fresh_from=[0])
        assert nodes[0].local_cv
        assert nodes[1].partial_cv[0] is not None
        # node 0 rebounds -> cancel
        nodes[0].step(False, fresh_from=[1])
        nodes[1].step(False, fresh_from=[0])
        assert not nodes[0].local_cv
        assert nodes[1].partial_cv[0] is None
        # later both converge
        assert run_rounds(nodes, under=[True, True], rounds=30)

    def test_negative_verification_restarts(self):
        t, nodes = make_ring(2)
        # both go under -> verification begins
        nodes[0].step(True, fresh_from=[1])
        nodes[1].step(True, fresh_from=[0])
        # node 0 rebounds exactly while leader (rank 1) verifies
        nodes[0].step(False, fresh_from=[1])
        nodes[1].step(True, fresh_from=[0])
        for _ in range(5):
            nodes[0].step(False, fresh_from=[1])
            nodes[1].step(True, fresh_from=[0])
        assert all(n.state is not State.FINISHED for n in nodes)
        # recovery after the rebound settles
        assert run_rounds(nodes, under=[True, True], rounds=30)


class TestStaleness:
    def test_stale_cancel_does_not_kill_newer_claim(self):
        t, nodes = make_ring(2)
        # hand-deliver: old cancel (iter 3) after a newer partial (iter 5)
        nodes[1].partial_cv[0] = 5
        nodes[1]._handle(Msg(MsgKind.CANCEL_CV, src=0, phase_tag=0, iteration=3))
        assert nodes[1].partial_cv[0] == 5

    def test_newer_cancel_kills_claim(self):
        t, nodes = make_ring(2)
        nodes[1].partial_cv[0] = 5
        nodes[1]._handle(Msg(MsgKind.CANCEL_CV, src=0, phase_tag=0, iteration=7))
        assert nodes[1].partial_cv[0] is None

    def test_phase_tag_monotone_across_reset(self):
        _, nodes = make_ring(2)
        leader = nodes[1]
        leader.phase_tag = 3
        leader._reset_after_negative()
        assert leader.phase_tag == 3


class TestLeaderElection:
    def test_leader_is_max_rank(self):
        _, nodes = make_ring(3)
        assert all(n.leader == 2 for n in nodes)

    def test_only_leader_starts_verification(self):
        t, nodes = make_ring(2)
        nodes[0].step(True, fresh_from=[1])   # non-leader converges first
        assert nodes[0].state is State.NORMAL
        nodes[1].step(True, fresh_from=[0])   # leader sees both CVs
        # leader enters VERIFICATION (or finishes if responses were instant)
        assert nodes[1].state in (State.VERIFICATION, State.FINISHED)
