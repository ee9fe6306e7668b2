"""WAN link emulation + the sync-over-TCP schedule.

Capability match: the reference's ``tc qdisc`` bridge shaping
(50 mbit / 100 ms, ``running_bulk_test_local:322-330``) that its
async-vs-sync study depends on, reproduced at the transport level
(``models.net.WanConfig``: python delay queue AND the native router's
``WanState``), plus the bulk-synchronous lockstep schedule
(``net_async_block_solve(schedule='sync')`` = SM/SMSM over TCP — the
sync baseline of the study, ``utils/wan_study.py``).
"""

import threading
import time

import numpy as np
import pytest

import jax.numpy as jnp

from medane_tchakorom_ufc_thesis_repository_tpu.models import blockops
from medane_tchakorom_ufc_thesis_repository_tpu.models.multisplitting import (
    InnerConfig,
)
from medane_tchakorom_ufc_thesis_repository_tpu.models.net import (
    NativeTcpTransport,
    TcpTransport,
    WanConfig,
)
from medane_tchakorom_ufc_thesis_repository_tpu.models.net_async import (
    net_async_block_solve,
)
from medane_tchakorom_ufc_thesis_repository_tpu.utils.multihost import (
    free_port,
)


def _pair(cls, wan):
    addrs = [("localhost", free_port()), ("localhost", free_port())]
    a = cls(0, addrs, wan=wan)
    b = cls(1, addrs, wan=wan)
    return a, b


def _native_or_skip():
    from medane_tchakorom_ufc_thesis_repository_tpu import native

    if not native.comm_available():
        pytest.skip(f"no native router: {native.comm_build_error()}")
    return NativeTcpTransport


class TestWanTransport:
    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_latency_shows_in_rtt_and_data(self, backend):
        cls = TcpTransport if backend == "python" else _native_or_skip()
        a, b = _pair(cls, WanConfig(latency_s=0.04))
        try:
            r = a.rtt(1, timeout=10.0)
            assert 0.07 < r < 0.5, r   # ~2 x 40 ms one-way
            t0 = time.monotonic()
            a.send_data(1, 1, np.arange(4, dtype=np.float64))
            while time.monotonic() - t0 < 5.0:
                arr, _ = b.read_data(0, np.float64, (4,))
                if arr is not None:
                    break
                time.sleep(0.001)
            dt = time.monotonic() - t0
            assert arr is not None and 0.03 < dt < 1.0, dt
        finally:
            a.close()
            b.close()

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_fifo_no_reorder_under_jitter(self, backend):
        cls = TcpTransport if backend == "python" else _native_or_skip()
        a, b = _pair(cls, WanConfig(latency_s=0.002, jitter_s=0.02,
                                    seed=3))
        try:
            for it in range(20):
                a.send_data(1, it + 1, np.full(2, float(it)))
            deadline = time.monotonic() + 5.0
            while time.monotonic() < deadline:
                arr, ver = b.read_data(0, np.float64, (2,))
                if ver >= 20:
                    break
                time.sleep(0.005)
            # per-link FIFO: the newest delivery is the newest payload
            assert ver == 20 and arr[0] == 19.0, (ver, arr)
        finally:
            a.close()
            b.close()

    def test_drop_applies_to_data_only(self):
        a, b = _pair(TcpTransport,
                     WanConfig(latency_s=0.001, drop=0.6, seed=1))
        try:
            for it in range(60):
                a.send_data(1, it + 1, np.full(2, float(it)))
            time.sleep(0.6)
            _, ver = b.read_data(0, np.float64, (2,))
            assert 5 < ver < 50, ver   # ~40% delivered
            # protocol frames keep TCP reliability (rtt pings are
            # non-droppable kinds)
            r = a.rtt(1, timeout=5.0)
            assert r < 1.0
        finally:
            a.close()
            b.close()

    def test_bandwidth_serializes(self):
        # 80 KB at 1 Mbit/s ≈ 0.64 s serialization
        a, b = _pair(TcpTransport, WanConfig(bandwidth_bps=1e6))
        try:
            t0 = time.monotonic()
            a.send_data(1, 1, np.zeros(10000, np.float64))
            while time.monotonic() - t0 < 5.0:
                arr, _ = b.read_data(0, np.float64, (10000,))
                if arr is not None:
                    break
                time.sleep(0.005)
            dt = time.monotonic() - t0
            assert arr is not None and dt > 0.4, dt
        finally:
            a.close()
            b.close()


def _run_threads(schedule, minimization, wan=None, m=24, rtol=1e-5,
                 **kw):
    op = blockops.block_poisson2d(m, m, nblocks=2)
    b = blockops.rhs_ones(op, jnp.float64)
    addrs = [("localhost", free_port()), ("localhost", free_port())]
    tr = [TcpTransport(r, addrs, wan=wan) for r in range(2)]
    out = [None, None]

    def work(r):
        out[r] = net_async_block_solve(
            op, b, r, tr[r], rtol=rtol, maxiter=3000,
            inner=InnerConfig(maxiter=20), minimization=minimization,
            s=4, schedule=schedule, **kw)

    th = [threading.Thread(target=work, args=(r,)) for r in range(2)]
    for t in th:
        t.start()
    for t in th:
        t.join(timeout=240)
    for t_ in tr:
        t_.close()
    assert out[0] is not None and out[1] is not None
    x = np.concatenate([np.asarray(out[r]["x_block"]) for r in range(2)])
    res = np.asarray(b).reshape(-1) - np.asarray(
        op.global_mv(jnp.asarray(x)))
    rel = np.linalg.norm(res) / out[0]["rnorm0"]
    return out, rel


class TestSyncSchedule:
    def test_sm_converges_and_certifies(self):
        out, rel = _run_threads("sync", None)
        assert all(o["converged"] and o["certified"] for o in out)
        assert out[0]["sweeps"] == out[1]["sweeps"]   # lockstep
        assert rel <= 1.3e-5, rel

    @pytest.mark.parametrize("scope", ["local", "semi_local", "global"])
    def test_smsm_scopes(self, scope):
        out, rel = _run_threads("sync", scope)
        assert all(o["converged"] for o in out)
        assert rel <= 1.3e-5, rel

    def test_minimization_accelerates(self):
        out_sm, _ = _run_threads("sync", None)
        out_g, _ = _run_threads("sync", "global")
        assert out_g[0]["sweeps"] < out_sm[0]["sweeps"]

    def test_sync_under_wan_latency(self):
        out, rel = _run_threads(
            "sync", None, wan=WanConfig(latency_s=0.005))
        assert all(o["converged"] for o in out)
        assert rel <= 1.3e-5, rel

    def test_async_under_wan_latency(self):
        out, rel = _run_threads(
            "async", None, wan=WanConfig(latency_s=0.005), rtol=1e-4)
        assert all(o["converged"] for o in out)
        assert rel <= 1.3e-4, rel
