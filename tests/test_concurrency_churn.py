"""Mutation-churn concurrency over the TCP plane.

Port of the reference's e2e/tests/concurrency tier
(test_rapid_mutations.py, test_ddl_during_queries.py,
test_search_during_writes.py): rapid same-row updates must converge to
the final text, insert/delete churn must return counts to baseline, and
searches racing TRUNCATE / bulk deletes / bulk inserts must always see a
consistent snapshot (never crash, never a stale-mixed state)."""

import asyncio
import threading

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


async def start_server(n_docs=60):
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    for i in range(1, n_docs + 1):
        ctx.add_row(str(i), f"seed article body number {i}",
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


def count_of(resp: str) -> int:
    assert resp.startswith("OK COUNT"), resp
    return int(resp.split()[2])


class TestRapidMutations:
    def test_rapid_updates_same_row_converge(self):
        """50 updates to one PK back-to-back: the index must serve the
        FINAL text only (reference test_rapid_updates_same_row)."""
        async def main():
            srv, ctx, core = await start_server()
            try:
                for v in range(50):
                    ctx.update_row("7", raw_text=f"versioned payload v{v}")
                ctx.update_row("7", raw_text="final payload zzmarker")
                r = (await send(srv.port,
                                "COUNT articles zzmarker"))[0]
                assert count_of(r) == 1
                # no intermediate version remains searchable
                r = (await send(srv.port, "COUNT articles v48"))[0]
                assert count_of(r) == 0
                # exact-text check through the full verify pipeline
                r = (await send(
                    srv.port,
                    "SEARCH articles \"final payload zzmarker\""))[0]
                assert r.startswith("OK"), r
                assert int(r.split()[2]) == 1, r
            finally:
                await srv.stop()
        asyncio.run(main())

    def test_insert_delete_churn_returns_to_baseline(self):
        """200 insert+delete cycles: live count and search results end at
        baseline; tombstones must not leak matches (reference
        test_insert_delete_churn)."""
        async def main():
            srv, ctx, core = await start_server()
            try:
                base = count_of((await send(srv.port,
                                            "COUNT articles seed"))[0])
                for i in range(200):
                    pk = f"churn{i}"
                    ctx.add_row(pk, f"churn payload {i} churnmarker",
                                {"status": 0})
                    if i % 3 == 0:
                        # interleave a read mid-churn
                        r = (await send(
                            srv.port, "COUNT articles churnmarker"))[0]
                        assert count_of(r) >= 1
                    ctx.remove_row(pk)
                r = (await send(srv.port, "COUNT articles churnmarker"))[0]
                assert count_of(r) == 0
                r = (await send(srv.port, "COUNT articles seed"))[0]
                assert count_of(r) == base
                # compaction folds the churn tombstones in; still baseline
                ctx.optimize()
                r = (await send(srv.port, "COUNT articles seed"))[0]
                assert count_of(r) == base
            finally:
                await srv.stop()
        asyncio.run(main())


class TestSearchDuringStructuralChanges:
    def _race(self, mutate, n_readers=4, reads=30, ok_counts=None):
        """Run `mutate(ctx)` in a thread while reader coroutines hammer
        COUNT; every reply must be a well-formed OK with a count the
        caller accepts."""
        async def main():
            srv, ctx, core = await start_server()
            errors = []
            done = threading.Event()

            def run_mutation():
                try:
                    mutate(ctx)
                except Exception as e:  # pragma: no cover
                    errors.append(e)
                finally:
                    done.set()

            async def reader():
                while not done.is_set():
                    r = (await send(srv.port, "COUNT articles seed"))[0]
                    c = count_of(r)
                    if ok_counts is not None:
                        assert c in ok_counts, c
                    await asyncio.sleep(0)
                # one read after the mutation settles
                count_of((await send(srv.port, "COUNT articles seed"))[0])

            t = threading.Thread(target=run_mutation)
            try:
                t.start()
                await asyncio.gather(*[reader() for _ in range(n_readers)])
            finally:
                t.join()
                await srv.stop()
            assert not errors, errors
        asyncio.run(main())

    def test_search_during_truncate(self):
        """Readers racing TRUNCATE see either the full table or the empty
        one — never a crash or partial state (reference
        test_search_during_truncate)."""
        self._race(lambda ctx: ctx.truncate(), ok_counts={0, 60})

    def test_search_during_bulk_delete(self):
        """Readers racing a 30-row delete sweep observe monotonically
        shrinking counts in [30, 60] (reference
        test_bulk_delete_during_search)."""
        def wipe(ctx):
            for i in range(1, 31):
                ctx.remove_row(str(i))
        self._race(wipe, ok_counts=set(range(30, 61)))

    def test_search_during_bulk_insert(self):
        """Readers racing a 150-row insert burst observe counts in
        [60, 210] and the final state serves all rows (reference
        test_search_during_bulk_insert)."""
        def grow(ctx):
            for i in range(1, 151):
                ctx.add_row(f"new{i}", f"seed burst row {i}",
                            {"status": 1})
        self._race(grow, ok_counts=set(range(60, 211)))
