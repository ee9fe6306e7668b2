"""Decentralized convergence detection — "Algorithm 5.15" protocol.

Host-side rebuild of the reference's L4 layer
(``src/utils/conv_detection_prime.c``, SURVEY.md §2.3): the *practical
version of convergence detection* for totally-asynchronous iterations
(Bahi, Contassot-Vivier, Couturier — "Parallel Iterative Algorithms: from
Sequential to Grid Computing", the book the reference cites at
``conv_detection_prime.c:5-9``).  Re-derived from the protocol's
published description; no reference code was copied.

Protocol summary (per node = block root):

* **pseudo-period** — a window in which fresh data from *every*
  dependency has arrived.  ``local_cv`` requires the residual to stay
  under threshold across one full pseudo-period (stale-data guard).
* **partial CV** — on ``local_cv``, broadcast PartialCV(iteration) to
  neighbors; if the residual rebounds, send CancelCV retracting it
  (neighbors match on iteration numbers to drop stale claims).
* **verification phase** — when a node holds ``local_cv`` and has
  unretracted PartialCVs from all neighbors, the *leader* (max rank, as
  in the reference's ``choose_leader``) increments ``phase_tag`` and
  sends Verification to everyone; each replies positive/negative
  depending on whether its ``local_cv`` still holds for that phase.
* **verdict** — all-positive responses: leader broadcasts
  Verdict(POSITIVE), every node moves to FINISHED; any negative:
  Verdict(NEGATIVE) resets the protocol (``initialize_state``).
* **staleness filtering** — every message carries ``phase_tag`` and the
  sender's iteration; receivers drop anything older than what they have
  (the reference's ``receive_data_dependency`` guard).

The transport is abstract (``send(dst, msg)``); ``LocalTransport`` wires
nodes through in-process queues for the threaded host-async driver and
for deterministic protocol tests with injected delay/reorder.
"""

from __future__ import annotations

import dataclasses
import enum
import queue
from typing import Dict, List, Optional


class State(enum.Enum):
    NORMAL = "normal"
    WAIT4VERIFICATION = "wait4verification"  # sent responses, awaiting verdict
    VERIFICATION = "verification"            # leader collecting responses
    FINISHED = "finished"


class MsgKind(enum.Enum):
    PARTIAL_CV = "partial_cv"
    CANCEL_CV = "cancel_cv"
    VERIFICATION = "verification"
    RESPONSE = "response"
    VERDICT = "verdict"
    # post-verdict lockstep certification tail (models.net_async): acks
    # a certification-round DATA frame so latest-wins mailboxes can never
    # skip a round.  Not part of Alg-5.15; `_handle` ignores it.
    TAIL_ACK = "tail_ack"


@dataclasses.dataclass(frozen=True)
class Msg:
    kind: MsgKind
    src: int
    phase_tag: int
    iteration: int
    positive: bool = True


class Transport:
    """Abstract message transport between protocol nodes."""

    def send(self, dst: int, msg: Msg) -> None:
        raise NotImplementedError

    def drain(self, rank: int) -> List[Msg]:
        raise NotImplementedError


class LocalTransport(Transport):
    """In-process queues; thread-safe; optional reorder hook for tests."""

    def __init__(self, nranks: int):
        self.queues = [queue.SimpleQueue() for _ in range(nranks)]

    def send(self, dst: int, msg: Msg) -> None:
        self.queues[dst].put(msg)

    def drain(self, rank: int) -> List[Msg]:
        out = []
        q = self.queues[rank]
        while True:
            try:
                out.append(q.get_nowait())
            except queue.Empty:
                return out


class Alg515Node:
    """One protocol participant (a block root).

    Drive it from the solver loop:

    >>> node = Alg515Node(rank, neighbors, transport, persistence=4)
    >>> node.step(under_threshold=..., fresh_from=[...])  # each iteration
    >>> node.state is State.FINISHED  # global convergence detected
    """

    def __init__(
        self,
        rank: int,
        neighbors: List[int],
        transport: Transport,
        persistence: int = 1,
    ):
        self.rank = rank
        self.neighbors = list(neighbors)
        self.transport = transport
        self.persistence = max(1, persistence)
        self.leader = max([rank] + self.neighbors)
        self.iteration = 0
        self._init_state()

    # -- state management (the reference's initialize_state) ------------
    def _init_state(self) -> None:
        self.state = State.NORMAL
        # phase_tag survives resets (monotone) so stale verification
        # rounds can never be confused with the current one
        if not hasattr(self, "phase_tag"):
            self.phase_tag = 0
        self.local_cv = False
        self.under_count = 0
        self.fresh = {n: False for n in self.neighbors}  # pseudo-period bookkeeping
        self.partial_cv: Dict[int, Optional[int]] = {n: None for n in self.neighbors}
        self.sent_partial: Optional[int] = None
        self.responses: Dict[int, Optional[bool]] = {}

    def _reset_after_negative(self) -> None:
        # verdict NEGATIVE: full restart of the detection state, keep iterating
        self._init_state()

    # -- pseudo-period ---------------------------------------------------
    def _pseudo_period_complete(self) -> bool:
        return all(self.fresh.values()) if self.fresh else True

    def _reset_pseudo_period(self) -> None:
        for k in self.fresh:
            self.fresh[k] = False

    # -- main per-iteration hook ----------------------------------------
    def step(self, under_threshold: bool, fresh_from: List[int]) -> State:
        """Advance one solver iteration.

        ``under_threshold``: this block's residual test this iteration.
        ``fresh_from``: neighbor ranks whose data arrived since last step.
        """
        if self.state is State.FINISHED:
            return self.state
        self.iteration += 1
        for n in fresh_from:
            if n in self.fresh:
                self.fresh[n] = True

        # local CV: under threshold persistently across a full pseudo-period
        if under_threshold:
            self.under_count += 1
            if (
                not self.local_cv
                and self.under_count >= self.persistence
                and self._pseudo_period_complete()
            ):
                self.local_cv = True
                self.sent_partial = self.iteration
                self._broadcast(MsgKind.PARTIAL_CV)
                self._reset_pseudo_period()
        else:
            self.under_count = 0
            if self.local_cv:
                # residual rebound: retract our claim
                self.local_cv = False
                self._broadcast(MsgKind.CANCEL_CV)
                self.sent_partial = None
            self._reset_pseudo_period()

        self._process_messages()
        self._maybe_start_verification()
        return self.state

    # -- messaging -------------------------------------------------------
    def _broadcast(self, kind: MsgKind, positive: bool = True) -> None:
        for n in self.neighbors:
            self.transport.send(
                n,
                Msg(kind=kind, src=self.rank, phase_tag=self.phase_tag,
                    iteration=self.iteration, positive=positive),
            )

    def _process_messages(self) -> None:
        for msg in self.transport.drain(self.rank):
            self._handle(msg)

    def _handle(self, msg: Msg) -> None:
        if self.state is State.FINISHED:
            return
        if msg.kind is MsgKind.PARTIAL_CV:
            prev = self.partial_cv.get(msg.src)
            if prev is None or msg.iteration >= prev:
                self.partial_cv[msg.src] = msg.iteration
        elif msg.kind is MsgKind.CANCEL_CV:
            prev = self.partial_cv.get(msg.src)
            # cancellation retracts only same-or-older claims (stale-msg guard)
            if prev is not None and msg.iteration >= prev:
                self.partial_cv[msg.src] = None
        elif msg.kind is MsgKind.VERIFICATION:
            if msg.phase_tag <= self.phase_tag:
                return  # stale verification round (phase tags are monotone
                        # across resets, so a delayed message from an
                        # aborted round can never regress our tag)
            self.phase_tag = msg.phase_tag
            self.state = State.WAIT4VERIFICATION
            self.transport.send(
                msg.src,
                Msg(kind=MsgKind.RESPONSE, src=self.rank,
                    phase_tag=msg.phase_tag, iteration=self.iteration,
                    positive=self.local_cv),
            )
        elif msg.kind is MsgKind.RESPONSE:
            if self.state is State.VERIFICATION and msg.phase_tag == self.phase_tag:
                self.responses[msg.src] = msg.positive
                self._maybe_conclude()
        elif msg.kind is MsgKind.VERDICT:
            if msg.positive:
                self.state = State.FINISHED
            else:
                self._reset_after_negative()

    # -- verification round (leader) ------------------------------------
    def _maybe_start_verification(self) -> None:
        if self.state is not State.NORMAL:
            return
        if not self.local_cv:
            return
        if any(v is None for v in self.partial_cv.values()):
            return
        if self.rank != self.leader:
            return  # non-leaders wait for the leader's Verification
        self.phase_tag += 1
        self.state = State.VERIFICATION
        self.responses = {n: None for n in self.neighbors}
        self._broadcast(MsgKind.VERIFICATION)
        self._maybe_conclude()

    def _maybe_conclude(self) -> None:
        if self.state is not State.VERIFICATION:
            return
        if any(v is None for v in self.responses.values()):
            return
        positive = all(self.responses.values()) and self.local_cv
        self._broadcast(MsgKind.VERDICT, positive=positive)
        if positive:
            self.state = State.FINISHED
        else:
            self._reset_after_negative()

    def pump(self) -> State:
        """Process pending messages outside a solver iteration (used while
        blocked or after local termination)."""
        if self.state is not State.FINISHED:
            self._process_messages()
            self._maybe_start_verification()
        return self.state
