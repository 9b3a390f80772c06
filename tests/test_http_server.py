"""HTTP/JSON API tests (reference http API parity; in-process aiohttp)."""

import asyncio
import json

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.server.http_server import HttpServer

CFG = {
    "tables": [{"name": "articles", "text_source": {"column": "content"},
                "filters": [{"name": "status", "type": "int"},
                            {"name": "category", "type": "string"}]}],
    "memory": {"verify_text": "all"},
    "api": {"http": {"enable": True, "bind": "127.0.0.1", "port": 0}},
    "network": {"allow_cidrs": ["127.0.0.0/8"]},
}


async def make_server():
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    docs = [("1", "hello world", {"status": 1, "category": "a"}),
            ("2", "hello there", {"status": 2, "category": "b"}),
            ("3", "goodbye world", {"status": 1, "category": "a"})]
    for pk, text, f in docs:
        ctx.add_row(pk, text, f)
    core = ServerCore(cfg, cat)
    srv = HttpServer(core, cfg)
    await srv.start()
    return srv


async def req(port, method, path, body=None):
    import aiohttp
    async with aiohttp.ClientSession() as s:
        async with s.request(method, f"http://127.0.0.1:{port}{path}",
                             json=body) as resp:
            return resp.status, await resp.json(content_type=None)


def run(coro):
    return asyncio.run(coro)


def test_http_search_count_get_facet():
    async def main():
        srv = await make_server()
        try:
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "hello"})
            assert st == 200
            assert body["total"] == 2
            assert body["results"] == ["2", "1"]

            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "hello",
                                  "filters": {"status": 1}})
            assert body["results"] == ["1"]

            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "world",
                                  "filters": {"status": {"op": "NE",
                                                         "value": 1}}})
            assert body["total"] == 0

            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "hello",
                                  "sort": {"column": "id", "order": "ASC"},
                                  "limit": 1})
            assert body["results"] == ["1"]

            st, body = await req(srv.port, "POST", "/tables/articles/count",
                                 {"q": "world"})
            assert body == {"count": 2}

            st, body = await req(srv.port, "GET", "/tables/articles/2")
            assert st == 200
            assert body["id"] == "2" and body["filters"]["status"] == 2

            st, body = await req(srv.port, "GET", "/tables/articles/99")
            assert st == 404

            st, body = await req(srv.port, "POST", "/tables/articles/facet",
                                 {"column": "category", "q": "world"})
            assert body["facets"] == {"a": 2}

            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "hello",
                                  "highlight": {"open_tag": "<b>",
                                                "close_tag": "</b>"}})
            assert "<b>hello</b>" in body["hits"][0]["snippet"]
        finally:
            await srv.stop()
    run(main())


def test_http_errors_and_health():
    async def main():
        srv = await make_server()
        try:
            st, body = await req(srv.port, "POST", "/tables/nope/search",
                                 {"q": "x"})
            assert st == 404

            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {})
            assert st == 400 and "q is required" in body["error"]

            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "x", "limit": "lots"})
            assert st == 400

            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "x", "filters": {"status": {
                                     "op": "~~", "value": 1}}})
            assert st == 400

            st, body = await req(srv.port, "GET", "/health")
            assert body["status"] == "ok"
            st, body = await req(srv.port, "GET", "/health/ready")
            assert st == 200
            st, body = await req(srv.port, "GET", "/info")
            assert body["engine"] == "mygramdb-tpu"
            assert body["tables"]["articles"]["documents"] == 3
            st, body = await req(srv.port, "GET", "/replication/status")
            assert body["state"] == "disabled"
            st, body = await req(srv.port, "GET", "/config")
            assert body["api"]["http"]["enable"] is True
        finally:
            await srv.stop()
    run(main())


def test_http_metrics():
    async def main():
        srv = await make_server()
        try:
            await req(srv.port, "POST", "/tables/articles/search",
                      {"q": "hello"})
            import aiohttp
            async with aiohttp.ClientSession() as s:
                async with s.get(
                        f"http://127.0.0.1:{srv.port}/metrics") as resp:
                    text = await resp.text()
            assert 'mygramdb_documents{table="articles"} 3' in text
            assert "mygramdb_uptime_seconds" in text
            assert 'mygramdb_command_total{command="search"} 1' in text
        finally:
            await srv.stop()
    run(main())
