"""HTTP and TCP planes must return identical results for the same
logical query (reference tests/server/http_tcp_consistency_test.cpp).

Both planes share one ServerCore/pipeline here, but each has its own
request parsing, filter coercion, and response formatting — this suite
pins the agreement of those surfaces."""

import asyncio

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.server.http_server import HttpServer

CFG = {
    "tables": [{"name": "articles", "text_source": {"column": "content"},
                "filters": [
                    {"name": "status", "type": "int",
                     "bitmap_index": True},
                    {"name": "category", "type": "string"}]}],
    "memory": {"verify_text": "all"},
    "api": {"http": {"enable": True, "bind": "127.0.0.1", "port": 0}},
    "network": {"allow_cidrs": ["127.0.0.0/8"]},
    "cache": {"min_query_cost_ms": 0.0},
}

DOCS = [
    ("1", "hello world alpha", {"status": 1, "category": "news"}),
    ("2", "hello there beta", {"status": 2, "category": "blog"}),
    ("3", "goodbye world gamma", {"status": 1, "category": "news"}),
    ("4", "東京タワーから hello", {"status": 3, "category": "wiki"}),
    ("5", "世界の東京 world", {"status": 1, "category": "wiki"}),
    ("6", "hello hello world repeat", {"status": 2, "category": "blog"}),
]


def make_env():
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    for pk, text, f in DOCS:
        ctx.add_row(pk, text, f)
    return ServerCore(cfg, cat)


async def http(port, method, path, body=None):
    import aiohttp
    async with aiohttp.ClientSession() as s:
        async with s.request(method, f"http://127.0.0.1:{port}{path}",
                             json=body) as resp:
            return resp.status, await resp.json(content_type=None)


def tcp_results(core, line):
    """'OK RESULTS <total> <pk>...' -> (total, [pks])"""
    parts = core.handle_line(line).split()
    assert parts[:2] == ["OK", "RESULTS"], parts
    return int(parts[2]), parts[3:]


def tcp_facet(core, line):
    resp = core.handle_line(line)
    lines = resp.split("\r\n")
    assert lines[0].startswith("OK FACET")
    out = {}
    for row in lines[1:]:
        if not row:
            continue
        v, c = row.split("\t")
        out[v] = int(c)
    return out


def test_http_tcp_consistency():
    core = make_env()

    async def main():
        srv = HttpServer(core, core.config)
        await srv.start()
        try:
            # ---- plain search, explicit sort ----
            t_total, t_pks = tcp_results(
                core, "SEARCH articles hello SORT id ASC LIMIT 10")
            _, body = await http(srv.port, "POST",
                                 "/tables/articles/search",
                                 {"q": "hello",
                                  "sort": {"column": "id",
                                           "order": "ASC"},
                                  "limit": 10})
            assert body["total"] == t_total
            assert body["results"] == t_pks

            # ---- filtered search ----
            t_total, t_pks = tcp_results(
                core,
                "SEARCH articles world FILTER status = 1 SORT id ASC")
            _, body = await http(srv.port, "POST",
                                 "/tables/articles/search",
                                 {"q": "world",
                                  "sort": {"column": "id",
                                           "order": "ASC"},
                                  "filters": {"status": 1}})
            assert (body["total"], body["results"]) == (t_total, t_pks)

            # ---- CJK term ----
            t_total, t_pks = tcp_results(
                core, "SEARCH articles 東京 SORT id ASC")
            _, body = await http(srv.port, "POST",
                                 "/tables/articles/search",
                                 {"q": "東京", "sort": {"column": "id",
                                                     "order": "ASC"}})
            assert (body["total"], body["results"]) == (t_total, t_pks)

            # ---- quoted phrase (verify_text path) ----
            t_total, t_pks = tcp_results(
                core, 'SEARCH articles "hello world" SORT id ASC')
            _, body = await http(srv.port, "POST",
                                 "/tables/articles/search",
                                 {"q": '"hello world"',
                                  "sort": {"column": "id",
                                           "order": "ASC"}})
            assert (body["total"], body["results"]) == (t_total, t_pks)

            # ---- count, plain + filtered ----
            t_count = int(core.handle_line(
                "COUNT articles hello").split()[2])
            _, body = await http(srv.port, "POST",
                                 "/tables/articles/count", {"q": "hello"})
            assert body["count"] == t_count

            t_count = int(core.handle_line(
                "COUNT articles world FILTER status = 1").split()[2])
            _, body = await http(srv.port, "POST",
                                 "/tables/articles/count",
                                 {"q": "world", "filters": {"status": 1}})
            assert body["count"] == t_count

            # ---- facet ----
            t_facets = tcp_facet(core,
                                 "FACET articles category hello")
            _, body = await http(srv.port, "POST",
                                 "/tables/articles/facet",
                                 {"column": "category", "q": "hello"})
            assert body["facets"] == t_facets

            # ---- get by pk ----
            t_doc = core.handle_line("GET articles 4")
            assert t_doc.startswith("OK DOC 4")
            _, body = await http(srv.port, "GET", "/tables/articles/4")
            assert body["id"] == "4"
            # every filter value shown by TCP must appear in the HTTP doc
            for kv in t_doc.split()[3:]:
                k, v = kv.split("=", 1)
                assert str(body["filters"].get(k)) == v
        finally:
            await srv.stop()

    asyncio.run(main())


def test_http_tcp_consistency_bm25_sort():
    core = make_env()

    async def main():
        srv = HttpServer(core, core.config)
        await srv.start()
        try:
            t_total, t_pks = tcp_results(
                core,
                "SEARCH articles hello SORT _score DESC LIMIT 3")
            _, body = await http(srv.port, "POST",
                                 "/tables/articles/search",
                                 {"q": "hello",
                                  "sort": {"column": "_score",
                                           "order": "DESC"},
                                  "limit": 3})
            assert (body["total"], body["results"]) == (t_total, t_pks)
        finally:
            await srv.stop()

    asyncio.run(main())
