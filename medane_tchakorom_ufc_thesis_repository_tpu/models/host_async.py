"""Host-driven genuinely-asynchronous multisplitting (AM / AMAM_*).

The SPMD drivers emulate asynchrony with bounded-staleness schedules
(deterministic, compilable).  This backend reproduces the reference's
*actual* execution model (``asynchronous-multisplitting_prime.c``,
SURVEY.md §3.4): each Jacobi block advances at its own pace on its own
host thread, exchanging iterates through drain-to-newest mailboxes
(the analog of ``comm_async_probe_and_receive``'s Iprobe/drain loop,
``comm.c:6-55``) and detecting termination with the decentralized
Alg-5.15 protocol (``models.convergence``).  Interleavings are genuinely
nondeterministic; convergence is guaranteed by the theory of totally
asynchronous iterations (contraction of the block Jacobi operator).

Each block's sweep is one jitted device computation; on a multi-device
backend each block is pinned to its own device so sweeps overlap for
real.  On a single chip the device queue serializes compute but the
schedule (which iterate a block sees from its peer) remains
message-driven, not lockstep.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medane_tchakorom_ufc_thesis_repository_tpu.models.blockops import BlockOperator
from medane_tchakorom_ufc_thesis_repository_tpu.models.convergence import (
    Alg515Node,
    LocalTransport,
    State,
)
from medane_tchakorom_ufc_thesis_repository_tpu.models.multisplitting import (
    InnerConfig,
    OuterConfig,
)
from medane_tchakorom_ufc_thesis_repository_tpu.solvers import krylov
from medane_tchakorom_ufc_thesis_repository_tpu.solvers.lstsq import lstsq_qr


@dataclasses.dataclass
class HostAsyncResult:
    x: jax.Array               # (nblocks, block_size)
    sweeps_per_block: List[int]
    rnorm: float
    rnorm0: float
    converged: bool
    elapsed_s: float


class _Mailbox:
    """Latest-value-wins slot: publish overwrites, read drains the newest
    (exactly the reference's drain-to-newest receive semantics)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._value = None
        self._version = 0

    def publish(self, value) -> None:
        with self._lock:
            self._value = value
            self._version += 1

    def read(self):
        with self._lock:
            return self._value, self._version


def host_async_solve(
    op: BlockOperator,
    b: jax.Array,
    *,
    rtol: float = 1e-3,
    atol: float = 1e-100,
    maxiter: int = 10000,
    min_convergence_count: int = 4,
    inner: InnerConfig = InnerConfig(),
    minimization: Optional[str] = None,   # None | 'local' | 'semi_local' | 'global'
    s: int = 4,
    outer: OuterConfig = OuterConfig(),
    devices: Optional[list] = None,
    sweep_delay_s: Optional[List[float]] = None,
    join_timeout_s: float = 600.0,
) -> HostAsyncResult:
    """Solve ``A x = b`` with one independent host thread per block.

    ``sweep_delay_s``: optional per-block artificial delay injected after
    each sweep — the analog of the reference's ``tc``-throttled WAN
    experiments (``running_bulk_test_local:322-330``) for testing
    convergence under heterogeneous block speeds.
    """
    if minimization not in (None, "local", "semi_local", "global"):
        raise ValueError(f"unknown minimization {minimization!r}")
    nb, bs = op.nblocks, op.block_size
    dtype = b.dtype
    if devices is None:
        devs = jax.devices()
        devices = [devs[i % len(devs)] for i in range(nb)]
    if sweep_delay_s is None:
        sweep_delay_s = [0.0] * nb

    rnorm0 = float(jnp.linalg.norm(b.reshape(-1)))
    tol_local = max(rtol / np.sqrt(nb) * rnorm0, atol)

    # per-block jitted kernels ------------------------------------------
    args = getattr(op, "diag_mv_args", None)

    def block_args(k):
        return None if args is None else jax.tree_util.tree_map(
            lambda a: a[k], args
        )

    def make_sweep(k):
        a_k = block_args(k)
        mv = lambda v: op.single_diag_mv(a_k, v)

        @jax.jit
        def sweep(rhs_b, x_b):
            # residual of the *current* iterate against the *fresh* rhs —
            # this is the block's rows of the true global residual given
            # the latest received peer data, and is what the under-
            # threshold test must use (measuring post-solve against the
            # same rhs would always look converged once the inner solver
            # hits its tolerance, regardless of global error)
            r_pre = rhs_b - mv(x_b)
            pre_norm = jnp.sqrt(jnp.sum(r_pre * r_pre))
            res = krylov.gmres(
                mv, rhs_b, x_b,
                restart=inner.restart, maxiter=inner.maxiter,
                rtol=inner.rtol, atol=inner.atol, orthog=inner.orthog,
            )
            return res.x, pre_norm

        @jax.jit
        def minimize_local(S_cols, rhs_b):
            # R = A_ii @ S per column; direct tall-skinny LS (the TPU
            # analog of outer_solver_lsqr on the local basis)
            R = jax.vmap(mv)(S_cols).T          # (bs, s)
            alpha = lstsq_qr(R, rhs_b)
            return S_cols.T @ alpha

        @jax.jit
        def gram_contrib(S_full):
            # S_full: (s, nb, bs) full-length snapshots (own x + latest
            # peer x at record time).  This block's rows of R = A S and
            # their Gram contribution — the payload the reference ships
            # in its async dense-R exchange (comm_async_*_min,
            # comm.c:288-351); here the s x s Gram is exchanged instead.
            R_rows = jax.vmap(op.full_mv)(S_full)[:, k, :]   # (s, bs)
            G = R_rows @ R_rows.T                            # (s, s)
            c = R_rows @ b[k]
            return G, c

        @jax.jit
        def combine(S_own, alpha):
            return S_own.T @ alpha

        return sweep, minimize_local, gram_contrib, combine

    kernels = [make_sweep(k) for k in range(nb)]

    # full coupling uses the stacked op on host-merged state -------------
    def local_rhs(k, x_stack):
        coup = op.coupling_mv(x_stack)
        return b[k] - coup[k]

    # shared state -------------------------------------------------------
    mailboxes = [_Mailbox() for _ in range(nb)]   # published block iterates
    gram_boxes = [_Mailbox() for _ in range(nb)]  # published (G, c) panels
    transport = LocalTransport(nb)
    all_ranks = list(range(nb))
    nodes = [
        Alg515Node(r, [x for x in all_ranks if x != r], transport,
                   persistence=min_convergence_count)
        for r in all_ranks
    ]
    x_final = [None] * nb
    sweeps_done = [0] * nb
    zeros = jnp.zeros((bs,), dtype)
    for k in range(nb):
        mailboxes[k].publish(np.zeros((bs,), dtype))

    stop = threading.Event()
    errors: List[BaseException] = []

    def _solve_gram_np(G, c):
        # minimum-norm LS solve: early bases can be rank-deficient (near-
        # parallel iterates, zero peer parts at startup)
        G = np.asarray(G, np.float64)
        c = np.asarray(c, np.float64)
        return np.linalg.lstsq(G, c, rcond=None)[0]

    def block_worker(k: int):
        try:
            sweep, minimize_local, gram_contrib, combine = kernels[k]
            x = zeros
            node = nodes[k]
            peer_versions = {j: 0 for j in all_ranks if j != k}
            S_buf = []
            while node.state is not State.FINISHED and not stop.is_set():
                if sweeps_done[k] >= maxiter:
                    break
                # drain-to-newest: read every peer's latest published value
                stack_np = np.empty((nb, bs), dtype)
                fresh = []
                for j in range(nb):
                    if j == k:
                        stack_np[j] = 0.0
                        continue
                    val, ver = mailboxes[j].read()
                    stack_np[j] = val
                    if ver > peer_versions[j]:
                        fresh.append(j)
                        peer_versions[j] = ver
                x_stack = jnp.asarray(stack_np)
                rhs = local_rhs(k, x_stack)
                x, pre_norm = sweep(rhs, x)
                sweeps_done[k] += 1

                if minimization == "local":
                    S_buf.append(x)
                    if len(S_buf) == s:
                        x = minimize_local(jnp.stack(S_buf), rhs)
                        S_buf = []
                elif minimization in ("semi_local", "global"):
                    # full-length snapshot: own part + latest peer parts
                    snap = stack_np.copy()
                    snap[k] = np.asarray(x)
                    S_buf.append(snap)
                    if len(S_buf) == s:
                        S_full = jnp.asarray(np.stack(S_buf))  # (s, nb, bs)
                        G, c = gram_contrib(S_full)
                        if minimization == "global":
                            # async Gram exchange: publish own panel, use
                            # the newest peer panels available (stale OK —
                            # the reference's comm_async_*_min semantics)
                            gram_boxes[k].publish(
                                (np.asarray(G), np.asarray(c))
                            )
                            Gt = np.asarray(G, np.float64).copy()
                            ct = np.asarray(c, np.float64).copy()
                            for j in all_ranks:
                                if j == k:
                                    continue
                                val, _ = gram_boxes[j].read()
                                if val is not None:
                                    Gt += val[0]
                                    ct += val[1]
                            alpha = _solve_gram_np(Gt, ct)
                        else:
                            alpha = _solve_gram_np(G, c)
                        x = combine(
                            S_full[:, k, :], jnp.asarray(alpha, dtype)
                        )
                        S_buf = []

                mailboxes[k].publish(np.asarray(x))
                under = bool(pre_norm <= tol_local)
                node.step(under_threshold=under, fresh_from=fresh)
                if sweep_delay_s[k]:
                    time.sleep(sweep_delay_s[k])
            # pump remaining protocol traffic so peers can finish
            deadline = time.time() + 5.0
            while node.state is not State.FINISHED and time.time() < deadline:
                if all(
                    nodes[j].state is State.FINISHED or sweeps_done[j] >= maxiter
                    for j in all_ranks
                ):
                    break
                node.pump()
                time.sleep(0.001)
            x_final[k] = x
        except BaseException as e:  # surface worker failures to the caller
            errors.append(e)
            stop.set()

    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=block_worker, args=(k,), daemon=True)
        for k in range(nb)
    ]
    for t in threads:
        t.start()
    deadline = time.monotonic() + join_timeout_s
    for t in threads:
        t.join(timeout=max(0.1, deadline - time.monotonic()))
    hung = [i for i, t in enumerate(threads) if t.is_alive()]
    elapsed = time.perf_counter() - t0
    if hung:
        stop.set()
        raise TimeoutError(
            f"host_async block workers {hung} still running after "
            f"join_timeout_s={join_timeout_s}"
        )
    if errors:
        raise errors[0]

    x = jnp.stack([
        x_final[k] if x_final[k] is not None else zeros for k in range(nb)
    ])
    r = b - op.full_mv(x)
    rnorm = float(jnp.linalg.norm(r.reshape(-1)))
    converged = all(n.state is State.FINISHED for n in nodes)
    return HostAsyncResult(
        x=x, sweeps_per_block=list(sweeps_done), rnorm=rnorm,
        rnorm0=rnorm0, converged=converged, elapsed_s=elapsed,
    )
