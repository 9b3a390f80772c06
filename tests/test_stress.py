"""Concurrency and stress tests.

Analogs of the reference's tests/integration/server tier: stress_test.cpp
(concurrent mixed load), thread_pool_saturation_test.cpp (backpressure),
reactor_starvation_regression (per-connection fairness),
index_concurrent_test / optimize_concurrency_test (mutation during reads),
plus the Unix-domain-socket listener.
"""

import asyncio
import threading
import time

import numpy as np
import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.server.tcp_server import TcpServer

CFG = {
    "tables": [{"name": "t", "text_source": {"column": "content"},
                "filters": [{"name": "status", "type": "int"}]}],
    "memory": {"verify_text": "all"},
    "api": {"tcp": {"bind": "127.0.0.1", "port": 0}},
    "network": {"allow_cidrs": ["127.0.0.0/8"]},
    "cache": {"enabled": False},
}


def seed_ctx(cat, n=500):
    ctx = cat.resolve("t")
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "sigma"]
    for i in range(1, n + 1):
        ctx.add_row(str(i), " ".join(rng.choice(words, size=5)),
                    {"status": int(rng.integers(0, 2))})
    return ctx


class TestConcurrentIndex:
    def test_reads_during_mutation(self):
        """Search continuously while another thread mutates + optimizes
        (reference optimize_concurrency_test)."""
        cfg = load_config_from_dict(CFG)
        cat = TableCatalog(cfg)
        ctx = seed_ctx(cat)
        stop = threading.Event()
        errors = []

        def mutator():
            i = 1000
            while not stop.is_set():
                ctx.add_row(str(i), "alpha mutated", {"status": 1})
                if i % 7 == 0:
                    ctx.remove_row(str(i - 3))
                if i % 25 == 0:
                    ctx.optimize()
                i += 1

        def reader():
            while not stop.is_set():
                try:
                    total, ids = ctx.index.search_and(["al"], limit=10)
                    assert total >= 0
                    if ids.size:
                        assert ids[0] >= 1
                except Exception as e:  # noqa: BLE001 — collect
                    errors.append(repr(e))
                    return

        threads = [threading.Thread(target=mutator)] + \
            [threading.Thread(target=reader) for _ in range(4)]
        for t in threads:
            t.start()
        time.sleep(2.0)
        stop.set()
        for t in threads:
            t.join(10)
        assert not errors, errors[:3]

    def test_monotonic_counts_under_inserts(self):
        cfg = load_config_from_dict(CFG)
        cat = TableCatalog(cfg)
        ctx = cat.resolve("t")
        prev = 0
        for i in range(1, 300):
            ctx.add_row(str(i), "needle haystack", {})
            total, _ = ctx.index.search_and(["ne", "ee"])
            assert total >= prev
            prev = total
        assert prev == 299


class TestServerStress:
    def _run_server(self, cfg_extra=None):
        cfg_d = dict(CFG)
        if cfg_extra:
            cfg_d.update(cfg_extra)
        holder = {}
        started = threading.Event()

        async def main():
            cfg = load_config_from_dict(cfg_d)
            cat = TableCatalog(cfg)
            seed_ctx(cat, 200)
            core = ServerCore(cfg, cat)
            srv = TcpServer(core, cfg)
            await srv.start()
            holder["port"] = srv.port
            holder["core"] = core
            holder["srv"] = srv
            holder["stop"] = asyncio.get_running_loop().create_future()
            started.set()
            await holder["stop"]
            await srv.stop()

        t = threading.Thread(target=lambda: asyncio.run(main()), daemon=True)
        t.start()
        started.wait(30)
        holder["thread"] = t
        return holder

    def _stop(self, holder):
        holder["stop"].get_loop().call_soon_threadsafe(
            holder["stop"].set_result, None)
        holder["thread"].join(10)

    def test_mixed_concurrent_load(self):
        import socket
        holder = self._run_server()
        port = holder["port"]
        errors = []

        def worker(i):
            try:
                s = socket.create_connection(("127.0.0.1", port), timeout=30)
                f = s.makefile("rwb")
                cmds = ["SEARCH t alpha LIMIT 5", "COUNT t beta",
                        "GET t 5", "INFO", "FACET t status alpha"]
                for j in range(10):
                    cmd = cmds[(i + j) % len(cmds)]
                    f.write(cmd.encode() + b"\r\n")
                    f.flush()
                    first = f.readline().decode()
                    if first.startswith("ERROR"):
                        errors.append((cmd, first))
                        return
                    # drain multi-line responses
                    if first.startswith("OK INFO"):
                        while True:
                            line = f.readline().decode()
                            if not line or line.rstrip("\r\n").endswith("END"):
                                break
                    elif first.startswith("OK FACET"):
                        while True:
                            line = f.readline().decode()
                            if not line or line.rstrip("\r\n") == "":
                                break
                s.close()
            except Exception as e:  # noqa: BLE001 — collect
                errors.append(repr(e))

        try:
            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(20)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(60)
            assert not errors, errors[:3]
        finally:
            self._stop(holder)

    def test_slow_frames_dont_starve_others(self):
        """A connection sending bytes slowly must not block others
        (reactor starvation regression analog)."""
        import socket
        holder = self._run_server()
        port = holder["port"]
        try:
            slow = socket.create_connection(("127.0.0.1", port), timeout=10)
            slow.sendall(b"SEARCH t alp")  # incomplete frame, never finished

            fast = socket.create_connection(("127.0.0.1", port), timeout=10)
            f = fast.makefile("rwb")
            t0 = time.time()
            f.write(b"COUNT t alpha\r\n")
            f.flush()
            resp = f.readline().decode()
            assert resp.startswith("OK COUNT")
            assert time.time() - t0 < 10
            slow.close()
            fast.close()
        finally:
            self._stop(holder)

    def test_server_busy_backpressure(self):
        """When the in-flight command budget is exhausted, further
        requests get SERVER_BUSY instead of queueing unboundedly
        (reference thread-pool bounded queue, config.h:334-337)."""
        import socket
        holder = self._run_server()
        port = holder["port"]
        core = holder["core"]
        orig = core.handle_line

        def slow_handle(line, conn=None):
            time.sleep(1.0)
            return orig(line, conn)

        try:
            core.handle_line = slow_handle
            # shrink the in-flight budget to 1 (loop-thread-safe enough
            # here: set before any request is in flight)
            import asyncio as aio
            holder["stop"].get_loop().call_soon_threadsafe(
                lambda: setattr(holder["srv"], "_inflight",
                                aio.Semaphore(1)))
            time.sleep(0.2)
            s1 = socket.create_connection(("127.0.0.1", port), timeout=10)
            s2 = socket.create_connection(("127.0.0.1", port), timeout=10)
            f1 = s1.makefile("rwb")
            f2 = s2.makefile("rwb")
            f1.write(b"COUNT t alpha\r\n"); f1.flush()
            time.sleep(0.3)  # let conn 1 occupy the slot
            f2.write(b"COUNT t alpha\r\n"); f2.flush()
            r2 = f2.readline().decode()
            assert "SERVER_BUSY" in r2, r2
            r1 = f1.readline().decode()
            assert r1.startswith("OK COUNT"), r1
            s1.close(); s2.close()
        finally:
            core.handle_line = orig
            self._stop(holder)

    def test_first_frame_timeout_reaps_connection(self, monkeypatch):
        """A connection that never sends a frame is reaped (reference
        io_reactor first-frame timeout, io_reactor.h:66-80)."""
        import socket
        from mygramdb_tpu.server import tcp_server as mod
        monkeypatch.setattr(mod, "FIRST_FRAME_TIMEOUT", 0.5)
        holder = self._run_server()
        port = holder["port"]
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            s.settimeout(10)
            t0 = time.time()
            data = s.recv(64)  # server closes -> EOF
            assert data == b""
            assert time.time() - t0 < 8
            s.close()
        finally:
            self._stop(holder)

    def test_rate_limit_enforced(self):
        import socket
        holder = self._run_server(
            {"api": {"tcp": {"bind": "127.0.0.1", "port": 0},
                     "rate_limiting": {"enable": True, "capacity": 3,
                                       "refill_rate": 1}}})
        port = holder["port"]
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            f = s.makefile("rwb")
            seen_limited = False
            for _ in range(8):
                f.write(b"COUNT t alpha\r\n"); f.flush()
                r = f.readline().decode()
                if "rate limit" in r:
                    seen_limited = True
                    break
            assert seen_limited
            s.close()
        finally:
            self._stop(holder)

    def test_unix_socket(self, tmp_path):
        import socket
        path = str(tmp_path / "mg.sock")
        holder = self._run_server(
            {"api": {"tcp": {"bind": "127.0.0.1", "port": 0},
                     "unix_socket": {"path": path}}})
        try:
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            s.settimeout(20)
            s.connect(path)
            f = s.makefile("rwb")
            f.write(b"COUNT t alpha\r\n")
            f.flush()
            assert f.readline().decode().startswith("OK COUNT")
            s.close()
        finally:
            self._stop(holder)

    def test_max_connections_rejected(self):
        import socket
        holder = self._run_server(
            {"api": {"tcp": {"bind": "127.0.0.1", "port": 0,
                             "max_connections": 3}}})
        port = holder["port"]
        try:
            socks = []
            # fill the connection slots with active commands
            for _ in range(3):
                s = socket.create_connection(("127.0.0.1", port), timeout=10)
                f = s.makefile("rwb")
                f.write(b"INFO\r\n")
                f.flush()
                f.readline()
                socks.append((s, f))
            # 4th connection should be closed immediately
            s4 = socket.create_connection(("127.0.0.1", port), timeout=10)
            s4.settimeout(5)
            try:
                data = s4.recv(64)
                assert data == b""  # closed without response
            except (ConnectionResetError, socket.timeout):
                pass
            for s, _ in socks:
                s.close()
            s4.close()
        finally:
            self._stop(holder)
