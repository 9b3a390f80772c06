"""In-process TCP integration tests over a real socket
(reference tests/integration/server/end_to_end_test.cpp analog)."""

import asyncio
import json

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.server.tcp_server import TcpServer

CFG = {
    "tables": [{"name": "articles", "text_source": {"column": "content"},
                "filters": [{"name": "status", "type": "int"}]}],
    "memory": {"verify_text": "all"},
    "api": {"tcp": {"bind": "127.0.0.1", "port": 0}},
    "network": {"allow_cidrs": ["127.0.0.0/8"]},
}


async def start_server():
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    for pk, text, st in [("1", "hello world", 1), ("2", "hello there", 2),
                         ("3", "goodbye world", 1)]:
        ctx.add_row(pk, text, {"status": st})
    core = ServerCore(cfg, cat)
    srv = TcpServer(core, cfg)
    await srv.start()
    return srv


async def send(port, *lines):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    out = []
    for line in lines:
        writer.write(line.encode() + b"\r\n")
        await writer.drain()
        resp = await asyncio.wait_for(reader.readline(), 10)
        out.append(resp.decode().rstrip("\r\n"))
    writer.close()
    return out


def test_tcp_end_to_end():
    async def main():
        srv = await start_server()
        try:
            resps = await send(srv.port,
                               "SEARCH articles hello",
                               "COUNT articles world",
                               "GET articles 2",
                               "SEARCH articles hello FILTER status = 1",
                               "NOTACOMMAND x")
            assert resps[0] == "OK RESULTS 2 2 1"
            assert resps[1] == "OK COUNT 2"
            assert resps[2].startswith("OK DOC 2")
            assert resps[3] == "OK RESULTS 1 1"
            assert resps[4].startswith("ERROR")
        finally:
            await srv.stop()

    asyncio.run(main())


def test_tcp_concurrent_connections():
    async def main():
        srv = await start_server()
        try:
            async def one(i):
                r = await send(srv.port, "SEARCH articles hello")
                return r[0]

            results = await asyncio.gather(*[one(i) for i in range(32)])
            assert all(r == "OK RESULTS 2 2 1" for r in results)
        finally:
            await srv.stop()

    asyncio.run(main())


def test_tcp_per_connection_debug_state():
    async def main():
        srv = await start_server()
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", srv.port)

            async def cmd(line):
                writer.write(line.encode() + b"\r\n")
                await writer.drain()
                # debug responses are multi-line; read until the cache line
                first = (await reader.readline()).decode().rstrip("\r\n")
                return first

            assert await cmd("DEBUG ON") == "OK DEBUG_ON"
            resp = await cmd("COUNT articles hello")
            assert resp.startswith("OK COUNT 2")
            writer.close()
        finally:
            await srv.stop()

    asyncio.run(main())


def test_tcp_stop_with_active_connections():
    """stop() must return promptly with connections open and leave no
    task running (reference tcp_server_lifecycle_test +
    thread_pool_shutdown_test analogs)."""
    async def main():
        srv = await start_server()
        # open 5 idle connections and one mid-protocol connection
        conns = []
        for _ in range(5):
            conns.append(await asyncio.open_connection("127.0.0.1",
                                                       srv.port))
        r, w = await asyncio.open_connection("127.0.0.1", srv.port)
        w.write(b"SEARCH articles hel")  # partial line, never completed
        await w.drain()
        t0 = asyncio.get_event_loop().time()
        await asyncio.wait_for(srv.stop(), 10)
        assert asyncio.get_event_loop().time() - t0 < 5.0
        # all connection tasks wound down
        for _ in range(50):
            if not srv._conn_tasks:
                break
            await asyncio.sleep(0.05)
        assert not srv._conn_tasks
        for rr, ww in conns + [(r, w)]:
            ww.close()

    asyncio.run(main())


def test_tcp_restart_same_port():
    """A stopped server's port must be immediately rebindable."""
    async def main():
        srv = await start_server()
        port = srv.port
        assert (await send(port, "COUNT articles hello"))[0] == \
            "OK COUNT 2"
        await srv.stop()
        cfg = load_config_from_dict({**CFG,
                                     "api": {"tcp": {"bind": "127.0.0.1",
                                                     "port": port}}})
        cat = TableCatalog(cfg)
        cat.resolve("articles").add_row("9", "hello again", {"status": 1})
        srv2 = TcpServer(ServerCore(cfg, cat), cfg)
        await srv2.start()
        try:
            assert srv2.port == port
            assert (await send(port, "COUNT articles hello"))[0] == \
                "OK COUNT 1"
        finally:
            await srv2.stop()

    asyncio.run(main())


def test_tcp_max_connections_cap():
    """Connections past api.tcp.max_connections are rejected, and slots
    free when a connection closes (reference connection_limit_test)."""
    async def main():
        cfg_d = {**CFG, "api": {"tcp": {"bind": "127.0.0.1", "port": 0,
                                        "max_connections": 3}}}
        cfg = load_config_from_dict(cfg_d)
        cat = TableCatalog(cfg)
        cat.resolve("articles").add_row("1", "hello", {"status": 1})
        srv = TcpServer(ServerCore(cfg, cat), cfg)
        await srv.start()
        try:
            keep = []
            for _ in range(3):
                r, w = await asyncio.open_connection("127.0.0.1",
                                                     srv.port)
                w.write(b"COUNT articles hello\r\n")
                await w.drain()
                assert (await asyncio.wait_for(
                    r.readline(), 10)).startswith(b"OK")
                keep.append((r, w))
            # 4th connection: rejected — server closes immediately, so
            # the client sees EOF or a reset (reference
            # connection_limit_test expects recv() <= 0)
            r4, w4 = await asyncio.open_connection("127.0.0.1", srv.port)
            try:
                w4.write(b"COUNT articles hello\r\n")
                await w4.drain()
                line = await asyncio.wait_for(r4.readline(), 10)
                assert line == b"" or line.startswith(b"ERROR")
            except (ConnectionResetError, BrokenPipeError):
                pass  # abrupt close also counts as rejection
            w4.close()
            # free one slot -> next connection succeeds
            keep[0][1].close()
            await asyncio.sleep(0.2)
            r5, w5 = await asyncio.open_connection("127.0.0.1", srv.port)
            w5.write(b"COUNT articles hello\r\n")
            await w5.drain()
            assert (await asyncio.wait_for(
                r5.readline(), 10)).startswith(b"OK")
            w5.close()
            for rr, ww in keep[1:]:
                ww.close()
        finally:
            await srv.stop()

    asyncio.run(main())


def test_flooding_connection_does_not_starve_others():
    """One connection pipelining a large burst must not starve a
    concurrent connection's single query (reference
    reactor_starvation_regression_test analog: one drain per connection
    per reactor turn)."""
    async def main():
        srv = await start_server()
        try:
            flood_r, flood_w = await asyncio.open_connection(
                "127.0.0.1", srv.port)
            # pipeline a large burst without reading
            burst = b"SEARCH articles hello\r\n" * 500
            flood_w.write(burst)
            await flood_w.drain()

            async def victim():
                r, w = await asyncio.open_connection("127.0.0.1",
                                                     srv.port)
                w.write(b"COUNT articles world\r\n")
                await w.drain()
                line = await r.readline()
                w.close()
                return line

            line = await asyncio.wait_for(victim(), 15)
            assert line.startswith(b"OK COUNT")
            # the flooder still gets all 500 responses
            got = 0
            while got < 500:
                resp = await asyncio.wait_for(flood_r.readline(), 30)
                assert resp.startswith(b"OK")
                got += 1
            flood_w.close()
        finally:
            await srv.stop()

    asyncio.run(main())


class TestCidrAclSecurity:
    """Fail-closed CIDR allow-list semantics (reference
    tests/utils/network_acl_security_test.cpp)."""

    def _acl(self, cidrs):
        from mygramdb_tpu.server.tcp_server import CidrAcl
        return CidrAcl(cidrs)

    def test_empty_acl_denies_all(self):
        acl = self._acl([])
        for ip in ("127.0.0.1", "10.0.0.1", "8.8.8.8", "::1"):
            assert not acl.allowed(ip)

    def test_localhost_only(self):
        acl = self._acl(["127.0.0.0/8"])
        assert acl.allowed("127.0.0.1")
        assert acl.allowed("127.255.255.254")
        assert not acl.allowed("128.0.0.1")
        assert not acl.allowed("10.0.0.1")

    def test_private_network(self):
        acl = self._acl(["10.0.0.0/8", "192.168.0.0/16",
                         "172.16.0.0/12"])
        assert acl.allowed("10.255.1.2")
        assert acl.allowed("192.168.44.7")
        assert acl.allowed("172.16.0.1")
        assert acl.allowed("172.31.255.255")
        assert not acl.allowed("172.32.0.1")   # class-B boundary
        assert not acl.allowed("11.0.0.1")     # class-A boundary
        assert not acl.allowed("192.169.0.1")

    def test_allow_all(self):
        acl = self._acl(["0.0.0.0/0"])
        assert acl.allowed("8.8.8.8")
        assert acl.allowed("127.0.0.1")

    def test_single_ip(self):
        acl = self._acl(["203.0.113.7/32"])
        assert acl.allowed("203.0.113.7")
        assert not acl.allowed("203.0.113.8")

    def test_invalid_ip_denied(self):
        acl = self._acl(["0.0.0.0/0"])
        assert not acl.allowed("not-an-ip")
        assert not acl.allowed("")
        assert not acl.allowed("999.999.999.999")

    def test_ipv6(self):
        acl = self._acl(["::1/128"])
        assert acl.allowed("::1")
        assert not acl.allowed("::2")
        assert not acl.allowed("127.0.0.1")  # v4 not implied by v6 entry

    def test_non_strict_host_bits(self):
        # host bits set in the config entry must not crash (strict=False)
        acl = self._acl(["192.168.1.55/24"])
        assert acl.allowed("192.168.1.200")
        assert not acl.allowed("192.168.2.1")
