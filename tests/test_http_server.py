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


def test_http_fuzzy_and_not_sort_offset():
    async def main():
        srv = await make_server()
        try:
            # fuzzy: int form
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "helo", "fuzzy": 1})
            assert st == 200 and body["total"] == 2
            # fuzzy: object form
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "helo",
                                  "fuzzy": {"max_distance": 1}})
            assert body["total"] == 2
            # fuzzy: invalid distance
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "helo", "fuzzy": 3})
            assert st == 400
            # AND terms narrow, NOT terms exclude
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "hello", "and": ["world"]})
            assert body["results"] == ["1"]
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "world", "not": ["hello"]})
            assert body["results"] == ["3"]
            # sort by filter column ASC with offset pagination
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "world",
                                  "sort": {"column": "status",
                                           "order": "ASC"},
                                  "limit": 1, "offset": 1})
            assert body["results"] == ["3"]
            # BM25 sort via JSON
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "hello",
                                  "sort": {"column": "_score",
                                           "order": "DESC"}})
            assert st == 200 and body["total"] == 2
            # bad sort order rejected
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "x", "sort": {"column": "id",
                                                     "order": "SIDEWAYS"}})
            assert st == 400
        finally:
            await srv.stop()
    run(main())


def test_http_cors_acl_and_body_cap():
    async def main():
        import aiohttp
        # CORS enabled: preflight must answer 204 on REGISTERED paths too
        # (aiohttp resource matching otherwise 405s OPTIONS there)
        cors_cfg = load_config_from_dict({
            **CFG, "api": {"http": {"enable": True, "bind": "127.0.0.1",
                                    "port": 0, "enable_cors": True}}})
        cat = TableCatalog(cors_cfg)
        cat.resolve("articles").add_row("1", "hello world",
                                        {"status": 1, "category": "a"})
        srv = HttpServer(ServerCore(cors_cfg, cat), cors_cfg)
        await srv.start()
        try:
            async with aiohttp.ClientSession() as s:
                async with s.options(
                        f"http://127.0.0.1:{srv.port}"
                        "/tables/articles/search") as r:
                    assert r.status == 204
                    assert r.headers[
                        "Access-Control-Allow-Methods"] == \
                        "GET, POST, OPTIONS"
                async with s.get(
                        f"http://127.0.0.1:{srv.port}/health") as r:
                    assert r.headers["Access-Control-Allow-Origin"] == "*"
                # oversized body -> 413
                big = "x" * (2 << 20)
                async with s.post(
                        f"http://127.0.0.1:{srv.port}"
                        "/tables/articles/search",
                        json={"q": big}) as r:
                    assert r.status == 413
        finally:
            await srv.stop()

        # fail-closed ACL: loopback NOT in the allow list -> 403
        cfg = load_config_from_dict({**CFG,
                                     "network": {"allow_cidrs":
                                                 ["10.0.0.0/8"]}})
        cat = TableCatalog(cfg)
        core = ServerCore(cfg, cat)
        srv2 = HttpServer(core, cfg)
        await srv2.start()
        try:
            st, body = await req(srv2.port, "GET", "/health")
            assert st == 403
        finally:
            await srv2.stop()
    run(main())


def test_http_rate_limit_429():
    async def main():
        cfg = load_config_from_dict({
            **CFG,
            "api": {**CFG["api"],
                    "rate_limiting": {"enable": True, "capacity": 2,
                                      "refill_rate": 1}}})
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        ctx.add_row("1", "hello world", {"status": 1, "category": "a"})
        core = ServerCore(cfg, cat)
        srv = HttpServer(core, cfg)
        await srv.start()
        try:
            seen = []
            for _ in range(6):
                st, _b = await req(srv.port, "POST",
                                   "/tables/articles/search", {"q": "x"})
                seen.append(st)
            assert 429 in seen
            # GETs are not rate limited (read-only health must stay up)
            st, _b = await req(srv.port, "GET", "/health")
            assert st == 200
        finally:
            await srv.stop()
    run(main())


def test_http_health_states_and_detail():
    async def main():
        srv = await make_server()
        try:
            st, body = await req(srv.port, "GET", "/health/live")
            assert st == 200
            st, body = await req(srv.port, "GET", "/health/detail")
            assert st == 200
            assert "tables" in body or "status" in body
            # facet with a filter applied
            st, body = await req(srv.port, "POST", "/tables/articles/facet",
                                 {"column": "category", "q": "world",
                                  "filters": {"status": 1}})
            assert st == 200 and body["facets"] == {"a": 2}
            # facet without column -> 400
            st, body = await req(srv.port, "POST", "/tables/articles/facet",
                                 {"q": "world"})
            assert st == 400
            # limit clamp: non-bool int enforced
            st, body = await req(srv.port, "POST", "/tables/articles/search",
                                 {"q": "hello", "limit": True})
            assert st == 400
        finally:
            await srv.stop()
    run(main())
