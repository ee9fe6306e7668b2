"""TCP transport for the Alg-5.15 protocol + async iterate exchange.

The reference's convergence-detection protocol runs over MPI between
hosts (``conv_detection_prime.c:11-249``); its data path drains
``MPI_Iprobe``/``MPI_Recv`` to the newest message (``comm.c:6-77``).
This module is the socket equivalent for OS-process deployments:

* protocol messages (PartialCV/CancelCV/Verification/Response/Verdict)
  are 24-byte packed headers delivered into a drain queue — the
  ``models.convergence.Transport`` interface, so ``Alg515Node`` runs
  unchanged over the wire;
* iterate payloads ride the same sockets as DATA frames into per-sender
  latest-wins mailboxes (drain-to-newest: a slow reader skips straight
  to the freshest iterate, exactly the reference's receive semantics).

Wire format per frame: ``!6i`` header
``(kind, src, phase_tag, iteration, positive, payload_len)`` followed by
``payload_len`` raw bytes.  Protocol frames use ``kind = MsgKind`` index;
DATA frames use ``kind = 255``.

Topology: rank ``i`` listens on ``addrs[i]``; every send opens (and
caches) one outgoing connection per destination — 2 simplex connections
per pair, no handshake ordering constraints (connects retry until the
peer's listener is up).
"""

from __future__ import annotations

import dataclasses
import heapq
import queue
import random
import socket
import struct
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from medane_tchakorom_ufc_thesis_repository_tpu.models.convergence import (
    Msg,
    MsgKind,
    Transport,
)

_HDR = struct.Struct("!6i")
_KINDS = list(MsgKind)
_KIND_INDEX = {k: i for i, k in enumerate(_KINDS)}
_DATA_KIND = 255
_PING_KIND = 254
_PONG_KIND = 253

# Startup-race symptoms matched (as substrings of captured worker
# stderr) by net_async.run_blocks' one-shot retry.  Defined here, next
# to the raise sites, so a rewording cannot silently disable the retry:
# BIND_RACE_MARKER is the OS EADDRINUSE errno text surfaced by
# ``socket.create_server`` in ``TcpTransport.__init__``;
# STOLEN_PORT_MARKER is raised by ``NativeTransport._checked_send`` when
# a first-ever send fails (the probed port was re-bound by a stranger).
BIND_RACE_MARKER = "address already in use"
STOLEN_PORT_MARKER = "send_data to rank"


@dataclasses.dataclass(frozen=True)
class WanConfig:
    """WAN link emulation — the transport-level analog of the
    reference's ``tc qdisc`` bridge shaping (50 mbit / 100 ms,
    ``running_bulk_test_local:322-330``), which its async-vs-sync study
    depends on.  Applied on the SEND side of every link:

    * ``latency_s`` one-way propagation delay, plus uniform
      ``[0, jitter_s)`` jitter;
    * ``bandwidth_bps`` serialization rate (0 = unlimited): frames to
      one destination queue behind each other at ``8·len/bw``;
    * ``drop`` probability per DATA frame (protocol frames keep TCP
      reliability, matching tc's rate/latency-only recipe; latest-wins
      mailboxes absorb data loss as extra staleness).

    Delivery is per-link FIFO (netem without reorder): jitter stretches
    gaps but never reorders, so latest-wins mailboxes cannot regress to
    an older iterate."""

    latency_s: float = 0.0
    jitter_s: float = 0.0
    drop: float = 0.0
    bandwidth_bps: float = 0.0
    seed: int = 0

    @property
    def active(self) -> bool:
        return (self.latency_s > 0 or self.jitter_s > 0
                or self.drop > 0 or self.bandwidth_bps > 0)


class _WanQueue:
    """Send-side delay queue (python twin of the native router's
    ``WanState``): a heap of (due, seq, dst, frame, droppable) serviced
    by one sender thread."""

    def __init__(self, cfg: WanConfig, deliver):
        self.cfg = cfg
        self.deliver = deliver
        self.rng = random.Random(cfg.seed)
        self.heap: list = []
        self.link_free: Dict[int, float] = {}
        self.last_due: Dict[int, float] = {}
        self.seq = 0
        self.lock = threading.Lock()
        self.cv = threading.Condition(self.lock)
        self.stop = False
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def push(self, dst: int, frame: bytes, droppable: bool) -> None:
        with self.lock:
            if droppable and self.cfg.drop > 0 \
                    and self.rng.random() < self.cfg.drop:
                return
            now = time.monotonic()
            free = max(self.link_free.get(dst, 0.0), now)
            if self.cfg.bandwidth_bps > 0:
                free += len(frame) * 8.0 / self.cfg.bandwidth_bps
            self.link_free[dst] = free
            due = free + self.cfg.latency_s
            if self.cfg.jitter_s > 0:
                due += self.rng.uniform(0.0, self.cfg.jitter_s)
            due = max(due, self.last_due.get(dst, 0.0))
            self.last_due[dst] = due
            heapq.heappush(self.heap, (due, self.seq, dst, frame))
            self.seq += 1
            self.cv.notify()

    def _run(self) -> None:
        with self.lock:
            while not self.stop:
                if not self.heap:
                    self.cv.wait(0.05)
                    continue
                due = self.heap[0][0]
                now = time.monotonic()
                if due > now:
                    self.cv.wait(due - now)
                    continue
                _, _, dst, frame = heapq.heappop(self.heap)
                self.lock.release()
                try:
                    self.deliver(dst, frame)
                except OSError:
                    pass   # peer left: emulated-link frames drop silently
                finally:
                    self.lock.acquire()

    def drain_and_stop(self, timeout_s: float = 5.0) -> None:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self.lock:
                if not self.heap:
                    break
            time.sleep(0.005)
        with self.lock:
            self.stop = True
            self.cv.notify_all()


def _recvall(conn: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


class TcpTransport(Transport):
    """Socket-backed ``Transport`` + latest-wins DATA mailboxes.

    ``addrs``: one ``(host, port)`` per rank; this rank listens on
    ``addrs[rank]``.  Thread-safe; call ``close()`` when done.
    """

    def __init__(self, rank: int, addrs: Sequence[Tuple[str, int]],
                 connect_timeout: float = 60.0,
                 wan: Optional[WanConfig] = None):
        self.rank = rank
        self.addrs = [tuple(a) for a in addrs]
        self.connect_timeout = connect_timeout
        self._wan = None
        if wan is not None and wan.active:
            self._wan = _WanQueue(
                wan, lambda dst, frame: self._sendall_now(
                    dst, frame, connect_timeout=5.0))
        self._q: "queue.SimpleQueue[Msg]" = queue.SimpleQueue()
        self._pongs: set = set()
        self._ping_token = 0
        self._data: Dict[int, Tuple[bytes, int, int]] = {}
        self._dlock = threading.Lock()
        self._out: Dict[int, socket.socket] = {}
        self._olocks: Dict[int, threading.Lock] = {}
        self._olock = threading.Lock()
        self._ok_sends: set = set()   # ranks reached at least once
        self._departed: set = set()   # ranks that closed on us since
        self._stop = threading.Event()
        self._server = socket.create_server(
            self.addrs[rank], reuse_port=False
        )
        self._server.settimeout(0.2)
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True
        )
        self._accept_thread.start()

    # -- receive side ----------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._server.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            threading.Thread(
                target=self._reader, args=(conn,), daemon=True
            ).start()

    def _reader(self, conn: socket.socket) -> None:
        try:
            while not self._stop.is_set():
                hdr = _recvall(conn, _HDR.size)
                if hdr is None:
                    return
                kind, src, tag, it, pos, plen = _HDR.unpack(hdr)
                payload = _recvall(conn, plen) if plen else b""
                if plen and payload is None:
                    return
                if kind == _DATA_KIND:
                    with self._dlock:
                        _, _, ver = self._data.get(src, (b"", 0, 0))
                        self._data[src] = (payload, it, ver + 1)
                elif kind == _PING_KIND:
                    # echo back for RTT measurement (comm.c:390-424).
                    # Replies run ON this reader thread: cap the lazy
                    # connect budget (a 60 s retry to an unreachable
                    # pinger would stall all inbound frames on this
                    # connection) and survive failure (a dropped pong
                    # just reads as no-reply to the pinger's probe).
                    try:
                        self._sendall(src, _HDR.pack(
                            _PONG_KIND, self.rank, 0, it, 0, 0,
                        ), connect_timeout=2.0)
                    except OSError:
                        pass
                elif kind == _PONG_KIND:
                    with self._dlock:
                        self._pongs.add(it)
                else:
                    self._q.put(Msg(
                        kind=_KINDS[kind], src=src, phase_tag=tag,
                        iteration=it, positive=bool(pos),
                    ))
        except OSError:
            return
        finally:
            conn.close()

    # -- send side -------------------------------------------------------
    def _conn(self, dst: int,
              connect_timeout: Optional[float] = None) -> socket.socket:
        with self._olock:
            sock = self._out.get(dst)
            lock = self._olocks.setdefault(dst, threading.Lock())
        if sock is not None:
            return sock
        budget = (self.connect_timeout if connect_timeout is None
                  else connect_timeout)
        deadline = time.monotonic() + budget
        last_err: Optional[Exception] = None
        while time.monotonic() < deadline and not self._stop.is_set():
            try:
                sock = socket.create_connection(self.addrs[dst], timeout=5.0)
                sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                with self._olock:
                    self._out[dst] = sock
                return sock
            except OSError as e:   # peer listener not up yet: retry
                last_err = e
                time.sleep(0.05)
        raise ConnectionError(
            f"rank {self.rank} could not reach rank {dst} at "
            f"{self.addrs[dst]}: {last_err}"
        )

    def _sendall(self, dst: int, frame: bytes,
                 connect_timeout: Optional[float] = None,
                 droppable: bool = False) -> None:
        """WAN-aware send: under emulation, frames enter the delay queue
        (fire-and-forget, per-link FIFO); otherwise direct."""
        if self._wan is not None:
            self._wan.push(dst, frame, droppable)
            return
        self._sendall_now(dst, frame, connect_timeout)

    def _sendall_now(self, dst: int, frame: bytes,
                     connect_timeout: Optional[float] = None) -> None:
        """Best-effort once established: a peer that terminates after a
        positive verdict closes its listener while we may still be
        publishing — those sends must drop silently, matching the
        reference's shutdown drain (``comm_discard_pending_messages``,
        ``comm.c:426-453``).  A rank we have NEVER reached still raises
        (startup misconfiguration must not be masked)."""
        if dst in self._departed:
            return
        try:
            sock = self._conn(dst, connect_timeout)
            with self._olocks[dst]:
                sock.sendall(frame)
            self._ok_sends.add(dst)
        except OSError:
            if dst not in self._ok_sends:
                raise
            self._departed.add(dst)
            with self._olock:
                sock = self._out.pop(dst, None)
            if sock is not None:
                try:
                    sock.close()
                except OSError:
                    pass

    def send(self, dst: int, msg: Msg) -> None:
        self._sendall(dst, _HDR.pack(
            _KIND_INDEX[msg.kind], msg.src, msg.phase_tag,
            msg.iteration, int(msg.positive), 0,
        ))

    def send_data(self, dst: int, iteration: int, arr: np.ndarray) -> None:
        """Publish an iterate to ``dst`` (latest-wins on the receiver)."""
        payload = np.ascontiguousarray(arr).tobytes()
        self._sendall(dst, _HDR.pack(
            _DATA_KIND, self.rank, 0, iteration, 0, len(payload),
        ) + payload, droppable=True)

    def read_data(self, src: int, dtype, shape):
        """Newest iterate published by ``src``: ``(array|None, version)``."""
        arr, _it, ver = self.read_data_tagged(src, dtype, shape)
        return arr, ver

    def read_data_tagged(self, src: int, dtype, shape):
        """Like ``read_data`` but also returns the sender's iteration tag
        (``(array|None, iteration, version)``) — the certification tail
        uses the tag as a round number."""
        with self._dlock:
            entry = self._data.get(src)
        if entry is None:
            return None, 0, 0
        payload, it, ver = entry
        arr = np.frombuffer(payload, dtype=dtype).reshape(shape).copy()
        return arr, it, ver

    def rtt(self, dst: int, timeout: float = 5.0) -> float:
        """Ping-pong round-trip time to ``dst`` in seconds — the analog
        of the reference's startup latency probe
        (``comm_sync_measure_latency_between_two_nodes``,
        ``comm.c:390-424``), which feeds the legacy traversal-time
        termination guard."""
        with self._dlock:
            self._ping_token += 1
            token = self._ping_token * 1000 + self.rank
        t0 = time.monotonic()
        self._sendall(dst, _HDR.pack(
            _PING_KIND, self.rank, 0, token, 0, 0,
        ))
        deadline = t0 + timeout
        while time.monotonic() < deadline:
            with self._dlock:
                if token in self._pongs:
                    self._pongs.discard(token)
                    return time.monotonic() - t0
            time.sleep(0.0005)
        raise TimeoutError(f"no pong from rank {dst} within {timeout}s")

    def drain(self, rank: Optional[int] = None) -> List[Msg]:
        out = []
        while True:
            try:
                out.append(self._q.get_nowait())
            except queue.Empty:
                return out

    def close(self) -> None:
        if self._wan is not None:
            self._wan.drain_and_stop()
        self._stop.set()
        try:
            self._server.close()
        except OSError:
            pass
        with self._olock:
            for sock in self._out.values():
                try:
                    sock.close()
                except OSError:
                    pass
            self._out.clear()


class NativeTcpTransport(Transport):
    """C++ epoll router backend (``native/src/comm.cpp``) — the native
    runtime counterpart of the reference's C comm layer.  Same interface
    and the same wire format as ``TcpTransport``; native and Python
    endpoints interoperate."""

    def __init__(self, rank: int, addrs: Sequence[Tuple[str, int]],
                 connect_timeout: float = 60.0,
                 wan: Optional[WanConfig] = None):
        import ctypes

        from medane_tchakorom_ufc_thesis_repository_tpu import native

        lib = native.load_comm()
        if lib is None:
            raise RuntimeError(
                f"native comm router unavailable: {native.comm_build_error()}"
            )
        self._lib = lib
        self._ct = ctypes
        self.rank = rank
        self.addrs = [tuple(a) for a in addrs]
        csv = ",".join(f"{h}:{p}" for h, p in self.addrs).encode()
        self._h = lib.comm_create(rank, csv)
        if self._h < 0:
            raise OSError(f"comm_create failed for rank {rank}")
        if wan is not None and wan.active:
            # delay queue lives in the router (comm.cpp WanState)
            rc = lib.comm_set_wan(
                self._h, float(wan.latency_s), float(wan.jitter_s),
                float(wan.drop), float(wan.bandwidth_bps),
                int(wan.seed),
            )
            if rc != 0:
                raise OSError("comm_set_wan failed")
        self._ok_sends: set = set()   # ranks reached at least once
        self._departed: set = set()   # ranks that closed on us since

    def _checked_send(self, dst: int, rc: int, what: str) -> None:
        """Same best-effort-once-established semantics as
        ``TcpTransport._sendall``: failures to a previously-reached rank
        mean the peer terminated (post-verdict shutdown window) and the
        frame is dropped, per the reference's shutdown drain
        (``comm_discard_pending_messages``, ``comm.c:426-453``)."""
        if rc == 0:
            self._ok_sends.add(dst)
            return
        if dst not in self._ok_sends:
            # for what='send_data' the text contains STOLEN_PORT_MARKER —
            # net_async.run_blocks' port-race retry matches on it
            raise OSError(f"native {what} to rank {dst} failed")
        self._departed.add(dst)

    def send(self, dst: int, msg: Msg) -> None:
        if dst in self._departed:
            return
        rc = self._lib.comm_send(
            self._h, dst, _KIND_INDEX[msg.kind], msg.phase_tag,
            msg.iteration, int(msg.positive), None, 0,
        )
        self._checked_send(dst, rc, "send")

    def send_data(self, dst: int, iteration: int, arr: np.ndarray) -> None:
        if dst in self._departed:
            return
        payload = np.ascontiguousarray(arr).tobytes()
        buf = (self._ct.c_uint8 * len(payload)).from_buffer_copy(payload)
        rc = self._lib.comm_send(
            self._h, dst, _DATA_KIND, 0, iteration, 0, buf, len(payload),
        )
        self._checked_send(dst, rc, "send_data")

    def read_data(self, src: int, dtype, shape):
        arr, _it, ver = self.read_data_tagged(src, dtype, shape)
        return arr, ver

    def read_data_tagged(self, src: int, dtype, shape):
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        buf = np.empty((nbytes,), np.uint8)
        it = self._ct.c_int32(0)
        ver = self._lib.comm_read_data(
            self._h, src, buf, nbytes, self._ct.byref(it)
        )
        if ver == 0:
            return None, 0, 0
        if ver < 0:
            raise OSError(f"native read_data error {ver}")
        arr = buf.view(np.dtype(dtype)).reshape(shape).copy()
        return arr, int(it.value), int(ver)

    def drain(self, rank: Optional[int] = None) -> List[Msg]:
        out = np.empty((64, 5), np.int32)
        msgs: List[Msg] = []
        while True:
            n = self._lib.comm_drain(self._h, out.reshape(-1), 64)
            for i in range(max(n, 0)):
                kind, src, tag, it, pos = (int(v) for v in out[i])
                msgs.append(Msg(
                    kind=_KINDS[kind], src=src, phase_tag=tag,
                    iteration=it, positive=bool(pos),
                ))
            if n < 64:
                return msgs

    def rtt(self, dst: int, timeout: float = 5.0) -> float:
        r = self._lib.comm_rtt(self._h, dst, timeout)
        if r < 0:
            raise TimeoutError(f"no pong from rank {dst} within {timeout}s")
        return float(r)

    def close(self) -> None:
        if getattr(self, "_h", -1) >= 0:
            self._lib.comm_close(self._h)
            self._h = -1


def make_tcp_transport(rank: int, addrs, backend: str = "auto",
                       wan: Optional[WanConfig] = None):
    """Transport factory: ``'native'`` (C++ epoll router), ``'python'``
    (thread-per-connection), or ``'auto'`` (native when the toolchain
    is available, else Python — both speak the same wire format).
    ``wan`` enables link emulation on either backend (``WanConfig``)."""
    if backend == "python":
        return TcpTransport(rank, addrs, wan=wan)
    if backend == "native":
        return NativeTcpTransport(rank, addrs, wan=wan)
    if backend == "auto":
        from medane_tchakorom_ufc_thesis_repository_tpu import native

        if native.comm_available():
            return NativeTcpTransport(rank, addrs, wan=wan)
        return TcpTransport(rank, addrs, wan=wan)
    raise ValueError(f"unknown transport backend {backend!r}")
