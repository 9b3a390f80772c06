"""Query fuzzing + empty/small/large edge cases over the TCP plane.

Port of the reference's e2e/tests/edge_cases tier
(test_query_fuzzing.py, test_empty_and_small.py, test_large_content.py):
malformed, deeply nested, boundary-length queries and degenerate
documents must produce a clean reply (ERROR where the reference demands
one) and leave the server responsive — never a crash or a wedge."""

import asyncio

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.server.tcp_server import TcpServer

CFG = {
    "tables": [{"name": "articles", "text_source": {"column": "content"},
                "filters": [{"name": "status", "type": "int",
                             "bitmap_index": True}]}],
    "memory": {"verify_text": "all"},
    "api": {"tcp": {"bind": "127.0.0.1", "port": 0}},
    "network": {"allow_cidrs": ["127.0.0.0/8"]},
    "cache": {"enabled": True, "min_query_cost_ms": 0.0},
}


async def start_server(n_docs=40):
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    for i in range(1, n_docs + 1):
        ctx.add_row(str(i), f"test article body number {i} 検索",
                    {"status": i % 3})
    core = ServerCore(cfg, cat)
    srv = TcpServer(core, cfg)
    await srv.start()
    return srv, ctx, core


async def send(port, *lines, timeout=10.0):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    out = []
    for line in lines:
        writer.write(line.encode() + b"\r\n")
        await writer.drain()
        resp = await asyncio.wait_for(reader.readline(), timeout)
        out.append(resp.decode(errors="replace").rstrip("\r\n"))
    writer.close()
    return out


async def alive(port) -> bool:
    try:
        r = await send(port, "COUNT articles test", timeout=10.0)
        return r[0].startswith("OK COUNT")
    except Exception:
        return False


def run_queries(cases):
    """cases: list of (command, expect) with expect in
    {"error", "any"} — every case must reply and the server must still
    answer a normal COUNT afterwards."""
    async def main():
        srv, ctx, core = await start_server()
        try:
            for cmd, expect in cases:
                r = (await send(srv.port, cmd))[0]
                assert r, cmd
                if expect == "error":
                    assert r.upper().startswith("ERROR"), (cmd, r[:120])
                assert await alive(srv.port), cmd
        finally:
            await srv.stop()
    asyncio.run(main())


class TestQueryFuzzing:
    def test_nested_parentheses_at_and_past_limit(self):
        run_queries([
            ("SEARCH articles " + "(" * 32 + "test" + ")" * 32, "any"),
            ("SEARCH articles " + "(" * 33 + "test" + ")" * 33, "any"),
            ("SEARCH articles " + "(" * 500 + "test" + ")" * 500, "any"),
        ])

    def test_unmatched_parens_error(self):
        run_queries([
            ("SEARCH articles (((test", "error"),
            ("SEARCH articles test)))", "error"),
        ])

    def test_empty_parens_and_operator_soup(self):
        run_queries([
            ("SEARCH articles ()", "any"),
            ("SEARCH articles AND OR NOT", "any"),
            ("SEARCH articles NOT NOT NOT test", "any"),
        ])

    def test_long_and_chain(self):
        chain = " AND ".join(f"term{i}" for i in range(100))
        run_queries([(f"SEARCH articles {chain}", "any")])

    def test_unclosed_quotes(self):
        run_queries([
            ('SEARCH articles "unclosed', "error"),
            ("SEARCH articles 'unclosed", "any"),
        ])

    def test_filter_injection_is_inert(self):
        async def main():
            srv, ctx, core = await start_server()
            try:
                r = (await send(
                    srv.port,
                    "SEARCH articles test FILTER status 1; DROP TABLE",
                ))[0]
                assert r
                assert await alive(srv.port)
                # table still serves and INFO still lists it
                info = (await send(srv.port, "INFO"))[0]
                assert info.startswith("OK")
            finally:
                await srv.stop()
        asyncio.run(main())

    def test_limit_boundaries(self):
        run_queries([
            ("SEARCH articles test LIMIT -1", "error"),
            ("SEARCH articles test LIMIT 0", "any"),
            ("SEARCH articles test LIMIT 999999999999", "any"),
            ("SEARCH articles test LIMIT 10 OFFSET 999999", "any"),
        ])

    def test_huge_offset_returns_empty(self):
        async def main():
            srv, ctx, core = await start_server()
            try:
                r = (await send(
                    srv.port,
                    "SEARCH articles test LIMIT 10 OFFSET 999999"))[0]
                # OK RESULTS <total> — with ids absent past the corpus
                if r.startswith("OK"):
                    parts = r.split()
                    assert len(parts) <= 3, r  # no ids page
            finally:
                await srv.stop()
        asyncio.run(main())

    def test_unknown_command_and_table(self):
        run_queries([
            ("FOOBAR articles test", "error"),
            ("SEARCH nonexistent_table_xyz test", "error"),
        ])

    def test_keywords_as_terms(self):
        run_queries([(f"SEARCH articles {k}", "any")
                     for k in ["AND", "OR", "NOT", "FILTER", "LIMIT",
                               "SORT"]])

    def test_boundary_length_terms(self):
        run_queries([
            ("SEARCH articles " + "a" * 1000, "any"),
            ("SEARCH articles " + "a" * 10000, "any"),
        ])


class TestEmptySmallLarge:
    def test_degenerate_documents_index_and_serve(self):
        async def main():
            srv, ctx, core = await start_server()
            try:
                ctx.add_row("e1", "", {"status": 1})          # empty
                ctx.add_row("s1", "a", {"status": 1})         # single char
                ctx.add_row("b1", "zq", {"status": 1})        # min bigram
                assert await alive(srv.port)
                r = (await send(srv.port, "COUNT articles zq"))[0]
                assert r == "OK COUNT 1", r
                # single char: shorter than the ascii bigram floor — must
                # not crash; reply shape is engine-defined
                r = (await send(srv.port, "SEARCH articles a LIMIT 5"))[0]
                assert r, "no reply for single-char term"
            finally:
                await srv.stop()
        asyncio.run(main())

    def test_large_document_and_result_set(self):
        async def main():
            srv, ctx, core = await start_server()
            try:
                # ~100 KB doc with a unique marker at the end (reference
                # test_large_content.py: large docs must index fully)
                big = ("lorem ipsum dolor sit amet " * 4000
                       + " uniquemarkerxyz")
                ctx.add_row("big1", big, {"status": 1})
                r = (await send(srv.port,
                                "COUNT articles uniquemarkerxyz"))[0]
                assert r == "OK COUNT 1", r
                # large result set: every seeded doc matches 'test'
                r = (await send(srv.port,
                                "SEARCH articles test LIMIT 1000"))[0]
                assert r.startswith("OK"), r
                total = int(r.split()[2])
                assert total >= 40, r
            finally:
                await srv.stop()
        asyncio.run(main())

    def test_whitespace_only_and_sparse_grams(self):
        async def main():
            srv, ctx, core = await start_server()
            try:
                ctx.add_row("w1", "   \t  ", {"status": 0})
                ctx.add_row("w2", "a b c d e f", {"status": 0})
                assert await alive(srv.port)
                r = (await send(srv.port, "SEARCH articles '   '"))[0]
                assert r, "no reply for whitespace term"
                assert await alive(srv.port)
            finally:
                await srv.stop()
        asyncio.run(main())
