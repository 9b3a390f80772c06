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
