"""Client library + CLI tests against an in-process TCP server."""

import asyncio
import threading
import time

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.client import MygramClient, MygramClientError, \
    SearchExpression
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.server.tcp_server import TcpServer

CFG = {
    "tables": [{"name": "articles", "text_source": {"column": "content"},
                "filters": [{"name": "status", "type": "int"},
                            {"name": "category", "type": "string"}]}],
    "memory": {"verify_text": "all"},
    "api": {"tcp": {"bind": "127.0.0.1", "port": 0}},
    "network": {"allow_cidrs": ["127.0.0.0/8"]},
}


@pytest.fixture(scope="module")
def server():
    """Run the asyncio TCP server on a background thread for sync clients."""
    holder = {}
    started = threading.Event()
    stop = asyncio.Event

    async def main():
        cfg = load_config_from_dict(CFG)
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        for pk, text, f in [
                ("1", "hello world", {"status": 1, "category": "a"}),
                ("2", "hello there", {"status": 2, "category": "b"}),
                ("3", "goodbye world", {"status": 1, "category": "a"})]:
            ctx.add_row(pk, text, f)
        core = ServerCore(cfg, cat)
        srv = TcpServer(core, cfg)
        await srv.start()
        holder["port"] = srv.port
        holder["stop"] = asyncio.get_running_loop().create_future()
        started.set()
        await holder["stop"]
        await srv.stop()

    def runner():
        asyncio.run(main())

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    assert started.wait(30)
    yield holder
    try:
        holder["stop"].get_loop().call_soon_threadsafe(
            holder["stop"].set_result, None)
    except Exception:
        pass
    t.join(timeout=10)


class TestClient:
    def test_search(self, server):
        with MygramClient(port=server["port"]) as c:
            r = c.search("articles", "hello")
            assert r.total == 2 and r.ids == ["2", "1"]

    def test_search_filters_sort(self, server):
        with MygramClient(port=server["port"]) as c:
            r = c.search("articles", "world", filters=["status = 1"],
                         sort="id ASC")
            assert r.ids == ["1", "3"]

    def test_count_get(self, server):
        with MygramClient(port=server["port"]) as c:
            assert c.count("articles", "world") == 2
            doc = c.get("articles", "2")
            assert doc["_pk"] == "2" and doc["status"] == "2"

    def test_error(self, server):
        with MygramClient(port=server["port"]) as c:
            with pytest.raises(MygramClientError, match="Table not found"):
                c.search("nope", "x")

    def test_facet(self, server):
        with MygramClient(port=server["port"]) as c:
            assert c.facet("articles", "category", "world") == {"a": 2}

    def test_info(self, server):
        with MygramClient(port=server["port"]) as c:
            info = c.info()
            assert info["engine"] == "mygramdb-tpu"

    def test_highlights(self, server):
        with MygramClient(port=server["port"]) as c:
            r = c.search_with_highlights("articles", "hello",
                                         open_tag="<b>", close_tag="</b>")
            assert r.total == 2
            assert "<b>hello</b>" in r.snippets[r.ids[0]]

    def test_show_variables(self, server):
        with MygramClient(port=server["port"]) as c:
            v = c.show_variables("cache.enabled")
            assert v.get("cache.enabled") in ("ON", "OFF")

    def test_multiple_commands_one_connection(self, server):
        with MygramClient(port=server["port"]) as c:
            for _ in range(5):
                assert c.count("articles", "hello") == 2


class TestSearchExpression:
    def test_build(self):
        line = (SearchExpression("articles").query("hello world")
                .and_term("fast").not_term("slow")
                .filter("status", "=", 1).sort("_score")
                .limit(10).offset(5).build())
        assert line == ('SEARCH articles "hello world" AND fast NOT slow '
                        'FILTER status = 1 SORT _score DESC LIMIT 10 '
                        'OFFSET 5')

    def test_count_mode(self):
        line = SearchExpression("t").query("x").limit(5).as_count().build()
        assert line == "COUNT t x"

    def test_roundtrip(self, server):
        with MygramClient(port=server["port"]) as c:
            expr = (SearchExpression("articles").query("hello")
                    .filter("status", "=", 1))
            resp = c.command(expr.build())
            assert resp == "OK RESULTS 1 1"


class TestCliOneShot:
    def test_execute_flag(self, server, capsys):
        from mygramdb_tpu.cli.repl import main
        rc = main(["-p", str(server["port"]), "-e",
                   "SEARCH articles hello"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "OK RESULTS 2 2 1" in out

    def test_execute_error(self, server, capsys):
        from mygramdb_tpu.cli.repl import main
        rc = main(["-p", str(server["port"]), "-e", "SEARCH nope x"])
        assert rc == 1

    def test_connect_failure(self, capsys):
        from mygramdb_tpu.cli.repl import main
        rc = main(["-p", "1", "-e", "INFO"])
        assert rc == 2
