"""End-to-end loader + binlog replication over REAL sockets.

The reference proves this loop against dockerized MySQL
(e2e/tests/replication/test_replication.py); here the counterpart is the
wire-faithful ``FakeMysqlServer`` — ``MysqlConnection``, ``InitialLoader``
and ``BinlogReader`` run their production socket code paths end to end
(handshake, auth, text-protocol result sets, COM_REGISTER_SLAVE,
COM_BINLOG_DUMP_GTID event stream), no scripted connection object.
"""

import time

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.query.pipeline import SearchPipeline
from mygramdb_tpu.query.parser import QueryParser
from mygramdb_tpu.replication import rows as rowmod
from mygramdb_tpu.replication.connection import MysqlConnection
from mygramdb_tpu.replication.initial_loader import InitialLoader
from mygramdb_tpu.replication.processor import BinlogEventProcessor
from mygramdb_tpu.replication.reader import BinlogReader

from binlog_builder import EventBuilder
from fake_mysql import FakeMysqlServer

SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
COLS = [rowmod.T_LONG, rowmod.T_VARCHAR, rowmod.T_TINY, rowmod.T_TINY]
METAS = [0, 255, 0, 0]
NAMES = ["id", "content", "status", "enabled"]


def make_cfg():
    return load_config_from_dict({
        "mysql": {"host": "127.0.0.1", "port": 1, "user": "repl",
                  "password": "secret", "database": "testdb"},
        "tables": [{
            "name": "articles",
            "text_source": {"column": "content"},
            "filters": [{"name": "status", "type": "int"}],
            "required_filters": [{"name": "enabled", "type": "int",
                                  "op": "=", "value": 1}],
        }],
        "memory": {"verify_text": "all"},
    })


def make_server():
    rows = {
        1: {"content": "hello tpu world", "status": "1", "enabled": "1"},
        2: {"content": "quick brown fox", "status": "2", "enabled": "1"},
        3: {"content": "filtered out row", "status": "1", "enabled": "0"},
        4: {"content": "日本語の検索", "status": "3", "enabled": "1"},
    }
    return FakeMysqlServer(columns=NAMES, rows=rows,
                           schema_types={"id": ("int", "int"),
                                         "content": ("text", "text"),
                                         "status": ("tinyint", "tinyint(4)"),
                                         "enabled": ("tinyint",
                                                     "tinyint(1)")})


def connect(server, cfg):
    conn = MysqlConnection("127.0.0.1", server.port, cfg.mysql.user,
                           cfg.mysql.password, cfg.mysql.database)
    conn.connect()
    return conn


def search_total(ctx, cfg, text):
    pipe = SearchPipeline(ctx, cfg)
    q = QueryParser().parse(f"SEARCH articles {text}")
    return pipe.execute(q).total


class TestConnectionOverSocket:
    def test_connect_auth_ping_and_vars(self):
        cfg = make_cfg()
        with make_server() as srv:
            conn = connect(srv, cfg)
            assert conn.connected and conn.ping()
            assert conn.fetch_server_uuid() == SID
            assert conn.validate_replication_prereqs() == []
            assert conn.fetch_executed_gtid() == f"{SID}:1-5"
            cols = conn.fetch_table_columns("testdb", "articles")
            assert [c["name"] for c in cols] == NAMES
            assert cols[0]["key"] == "PRI"
            conn.close()

    def test_prereq_problems_reported(self):
        cfg = make_cfg()
        with FakeMysqlServer(columns=NAMES,
                             variables={"binlog_format": "STATEMENT",
                                        "gtid_mode": "OFF"}) as srv:
            conn = connect(srv, cfg)
            problems = conn.validate_replication_prereqs()
            assert any("gtid_mode" in p for p in problems)
            assert any("binlog_format" in p for p in problems)
            conn.close()


class TestInitialLoaderOverSocket:
    def test_load_snapshot(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        with make_server() as srv:
            conn = connect(srv, cfg)
            loader = InitialLoader(ctx, conn, batch_size=2)  # force paging
            total = loader.load()
            conn.close()
        assert total == 4                     # rows fetched
        assert ctx.doc_count == 3             # enabled=0 filtered out
        assert loader.snapshot_gtid == f"{SID}:1-5"
        assert search_total(ctx, cfg, "hello") == 1
        assert search_total(ctx, cfg, "日本語") == 1
        assert search_total(ctx, cfg, "filtered") == 0
        # paging actually happened: multiple SELECTs hit the server
        selects = [q for q in srv.queries if q.upper().startswith("SELECT")
                   and "FROM" in q.upper() and "SCHEMA" not in q.upper()]
        assert len(selects) >= 2
        # consistent-snapshot envelope
        assert any("CONSISTENT SNAPSHOT" in q for q in srv.queries)
        assert any(q.strip().upper() == "COMMIT" for q in srv.queries)


class TestBinlogStreamOverSocket:
    def _wait(self, predicate, timeout=20.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if predicate():
                return True
            time.sleep(0.02)
        return False

    def test_live_replication_insert_update_delete(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        proc = BinlogEventProcessor(cat, database="testdb")
        with make_server() as srv:
            reader = BinlogReader(cfg.mysql, cfg.replication, proc)
            reader.mysql_cfg.port = srv.port
            reader.start()
            assert self._wait(srv.binlog_started.is_set)

            b = EventBuilder()
            srv.push_event(b.fde())
            srv.push_event(b.gtid(SID, 6))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "insert", COLS, METAS,
                                  [[10, "streamed document", 1, 1]]))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_store.doc_id("10")
                              is not None)
            assert search_total(ctx, cfg, "streamed") == 1

            srv.push_event(b.gtid(SID, 7))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "update", COLS, METAS,
                                  [([10, "streamed document", 1, 1],
                                    [10, "revised document", 1, 1])]))
            srv.push_event(b.xid())
            assert self._wait(
                lambda: search_total(ctx, cfg, "revised") == 1)
            assert search_total(ctx, cfg, "streamed") == 0

            srv.push_event(b.gtid(SID, 8))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "delete", COLS, METAS,
                                  [[10, "revised document", 1, 1]]))
            srv.push_event(b.xid())
            assert self._wait(
                lambda: search_total(ctx, cfg, "revised") == 0)

            # GTID position advanced through the commit stream
            assert self._wait(
                lambda: ":1-8" in (reader.gtid_position() or ""))
            # dump request carried the executed-set payload
            assert srv.dump_requests and \
                srv.dump_requests[0][0] == 0x1E  # COM_BINLOG_DUMP_GTID
            reader.stop()

    def test_reconnect_after_stream_end(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        proc = BinlogEventProcessor(cat, database="testdb")
        with make_server() as srv:
            reader = BinlogReader(cfg.mysql, cfg.replication, proc)
            reader.mysql_cfg.port = srv.port
            reader.start()
            assert self._wait(srv.binlog_started.is_set)
            b = EventBuilder()
            srv.push_event(b.fde())
            srv.end_binlog()          # server ends the stream -> reconnect
            srv.binlog_started.clear()
            assert self._wait(srv.binlog_started.is_set), \
                "reader did not reconnect after stream EOF"
            # replication still works after the reconnect
            srv.push_event(b.fde())
            srv.push_event(b.gtid(SID, 6))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "insert", COLS, METAS,
                                  [[20, "post reconnect doc", 1, 1]]))
            srv.push_event(b.xid())
            assert self._wait(
                lambda: search_total(ctx, cfg, "reconnect") == 1)
            reader.stop()


class _ReplHelpers:
    """Shared wait/start helpers for the binlog-over-socket suites."""

    def _wait(self, predicate, timeout=20.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if predicate():
                return True
            time.sleep(0.02)
        return False

    def _start(self, srv, cfg, cat, cache=None):
        proc = BinlogEventProcessor(cat, cache_manager=cache,
                                    database="testdb")
        reader = BinlogReader(cfg.mysql, cfg.replication, proc)
        reader.mysql_cfg.port = srv.port
        reader.start()
        assert self._wait(srv.binlog_started.is_set)
        return reader


class TestReplicationScenarios(_ReplHelpers):
    """Reference e2e/tests/replication + failover breadth over the fake
    wire server: UUID failover, required_filters enter/leave, PK-change
    updates, TRUNCATE DDL, and n-gram cache invalidation."""

    def test_failover_detected_by_uuid_change(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        with make_server() as srv:
            reader = self._start(srv, cfg, cat)
            b = EventBuilder()
            srv.push_event(b.fde())
            # primary switchover: same endpoint, NEW server identity
            new_uuid = "aaaaaaaa-bbbb-cccc-dddd-eeeeffff0001"
            srv.variables["server_uuid"] = new_uuid
            srv.variables["gtid_executed"] = f"{new_uuid}:1-3"
            srv.end_binlog()
            srv.binlog_started.clear()
            assert self._wait(srv.binlog_started.is_set)
            assert self._wait(lambda: reader.stats.failovers >= 1)
            # replication continues against the new primary
            ctx = cat.resolve("articles")
            srv.push_event(b.fde())
            srv.push_event(b.gtid(new_uuid, 4))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "insert", COLS, METAS,
                                  [[30, "post failover row", 1, 1]]))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_store.doc_id("30") is not None)
            reader.stop()

    def test_required_filter_enter_and_leave(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        with make_server() as srv:
            reader = self._start(srv, cfg, cat)
            b = EventBuilder()
            srv.push_event(b.fde())
            srv.push_event(b.gtid(SID, 6))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "insert", COLS, METAS,
                                  [[40, "gated document", 1, 1]]))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_store.doc_id("40") is not None)
            # enabled 1 -> 0: row LEAVES the replica
            srv.push_event(b.gtid(SID, 7))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "update", COLS, METAS,
                                  [([40, "gated document", 1, 1],
                                    [40, "gated document", 1, 0])]))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_store.doc_id("40") is None)
            # enabled 0 -> 1: row ENTERS again
            srv.push_event(b.gtid(SID, 8))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "update", COLS, METAS,
                                  [([40, "gated document", 1, 0],
                                    [40, "gated document", 1, 1])]))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_store.doc_id("40") is not None)
            assert search_total(ctx, cfg, "gated") == 1
            reader.stop()

    def test_pk_change_update_is_delete_plus_insert(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        with make_server() as srv:
            reader = self._start(srv, cfg, cat)
            b = EventBuilder()
            srv.push_event(b.fde())
            srv.push_event(b.gtid(SID, 6))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "insert", COLS, METAS,
                                  [[50, "movable document", 1, 1]]))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_store.doc_id("50") is not None)
            srv.push_event(b.gtid(SID, 7))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "update", COLS, METAS,
                                  [([50, "movable document", 1, 1],
                                    [51, "movable document", 1, 1])]))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_store.doc_id("51") is not None)
            assert ctx.doc_store.doc_id("50") is None
            assert search_total(ctx, cfg, "movable") == 1
            reader.stop()

    def test_truncate_ddl_clears_table(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        with make_server() as srv:
            conn = connect(srv, cfg)
            InitialLoader(ctx, conn, batch_size=10).load()
            conn.close()
            assert ctx.doc_count == 3
            reader = self._start(srv, cfg, cat)
            b = EventBuilder()
            srv.push_event(b.fde())
            srv.push_event(b.gtid(SID, 6))
            srv.push_event(b.query("TRUNCATE TABLE articles",
                                   schema="testdb"))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_count == 0)
            assert search_total(ctx, cfg, "hello") == 0
            reader.stop()

    def test_cache_invalidated_by_binlog_write(self):
        cfg = load_config_from_dict({
            **{k: v for k, v in {
                "mysql": {"host": "127.0.0.1", "port": 1, "user": "repl",
                          "password": "secret", "database": "testdb"},
                "tables": [{"name": "articles",
                            "text_source": {"column": "content"},
                            "filters": [{"name": "status", "type": "int"}],
                            "required_filters": [
                                {"name": "enabled", "type": "int",
                                 "op": "=", "value": 1}]}],
                "memory": {"verify_text": "all"},
            }.items()},
            "cache": {"min_query_cost_ms": 0.0,
                      "invalidation": {"max_delay_ms": 20}},
        })
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        from mygramdb_tpu.cache import CacheManager
        cm = CacheManager(cfg.cache, normalize_term=ctx.normalize)
        pipe = SearchPipeline(ctx, cfg, cm)
        P = QueryParser()
        with make_server() as srv:
            proc = BinlogEventProcessor(cat, cache_manager=cm,
                                        database="testdb")
            reader = BinlogReader(cfg.mysql, cfg.replication, proc)
            reader.mysql_cfg.port = srv.port
            reader.start()
            assert self._wait(srv.binlog_started.is_set)
            q = P.parse("SEARCH articles cached")
            assert pipe.execute(q).total == 0
            assert cm.cache.stats.inserts >= 1  # result cached
            b = EventBuilder()
            srv.push_event(b.fde())
            srv.push_event(b.gtid(SID, 6))
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "insert", COLS, METAS,
                                  [[60, "cached gram doc", 1, 1]]))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_store.doc_id("60") is not None)
            # the deferred n-gram invalidation must evict the stale entry
            assert self._wait(
                lambda: pipe.execute(
                    P.parse("SEARCH articles cached")).total == 1, 10.0)
            reader.stop()


class TestDdlPropagation(_ReplHelpers):
    """ALTER/DROP DDL arriving over the binlog stream (reference
    e2e/tests/ddl/test_alter_table.py + test_ddl_edge_cases.py)."""

    def test_alter_keeps_serving_and_drops_cache(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        with make_server() as srv:
            conn = connect(srv, cfg)
            InitialLoader(ctx, conn, batch_size=10).load()
            conn.close()
            n0 = ctx.doc_count
            assert n0 == 3
            reader = self._start(srv, cfg, cat)
            b = EventBuilder()
            srv.push_event(b.fde())
            srv.push_event(b.gtid(SID, 6))
            srv.push_event(b.query(
                "ALTER TABLE articles ADD COLUMN extra INT",
                schema="testdb"))
            srv.push_event(b.xid())
            # serving continues on the existing index
            assert self._wait(lambda: ctx.doc_count == n0)
            assert search_total(ctx, cfg, "hello") > 0
            reader.stop()

    def test_drop_clears_table(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        with make_server() as srv:
            conn = connect(srv, cfg)
            InitialLoader(ctx, conn, batch_size=10).load()
            conn.close()
            assert ctx.doc_count == 3
            reader = self._start(srv, cfg, cat)
            b = EventBuilder()
            srv.push_event(b.fde())
            srv.push_event(b.gtid(SID, 6))
            srv.push_event(b.query("DROP TABLE articles",
                                   schema="testdb"))
            srv.push_event(b.xid())
            assert self._wait(lambda: ctx.doc_count == 0)
            assert search_total(ctx, cfg, "hello") == 0
            reader.stop()

    def test_unrelated_ddl_ignored(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        with make_server() as srv:
            conn = connect(srv, cfg)
            InitialLoader(ctx, conn, batch_size=10).load()
            conn.close()
            reader = self._start(srv, cfg, cat)
            b = EventBuilder()
            srv.push_event(b.fde())
            srv.push_event(b.gtid(SID, 6))
            srv.push_event(b.query("DROP TABLE other_table",
                                   schema="testdb"))
            srv.push_event(b.gtid(SID, 7))
            srv.push_event(b.query("CREATE TABLE newt (id INT)",
                                   schema="testdb"))
            srv.push_event(b.xid())
            import time
            time.sleep(0.3)
            assert ctx.doc_count == 3
            assert search_total(ctx, cfg, "hello") > 0
            reader.stop()


class TestStopContract(_ReplHelpers):
    """BinlogReader.stop() contract (reference
    binlog_reader_stop_contract_test.cpp): synchronous join, no activity
    after return, idempotent, and the NullBinlogReader trivially stops."""

    def test_stop_joins_threads_synchronously(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        proc = BinlogEventProcessor(cat, database="testdb")
        with make_server() as srv:
            reader = BinlogReader(cfg.mysql, cfg.replication, proc)
            reader.mysql_cfg.port = srv.port
            reader.start()
            assert self._wait(srv.binlog_started.is_set)
            threads = [reader._reader_t, reader._worker_t]
            assert all(t is not None and t.is_alive() for t in threads)
            assert reader.stop() is True
            # stop() must have joined both threads before returning
            assert all(not t.is_alive() for t in threads)

    def test_no_activity_after_stop_returns(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        proc = BinlogEventProcessor(cat, database="testdb")
        with make_server() as srv:
            reader = BinlogReader(cfg.mysql, cfg.replication, proc)
            reader.mysql_cfg.port = srv.port
            reader.start()
            assert self._wait(srv.binlog_started.is_set)
            reader.stop()
            n0 = ctx.doc_count
            # events pushed after stop must not be applied
            b = EventBuilder()
            srv.push_event(b.fde())
            srv.push_event(b.table_map(9, "testdb", "articles", COLS,
                                       METAS, col_names=NAMES))
            srv.push_event(b.rows(9, "insert", COLS, METAS,
                                  [[900, "ghost", 1, 1]]))
            time.sleep(0.3)
            assert ctx.doc_count == n0

    def test_stop_is_idempotent(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        proc = BinlogEventProcessor(cat, database="testdb")
        with make_server() as srv:
            reader = BinlogReader(cfg.mysql, cfg.replication, proc)
            reader.mysql_cfg.port = srv.port
            reader.start()
            assert self._wait(srv.binlog_started.is_set)
            assert reader.stop() is True
            assert reader.stop() is False  # second stop: no-op
            assert reader.stop() is False

    def test_null_reader_stop_trivial(self):
        from mygramdb_tpu.server.core import NullBinlogReader
        r = NullBinlogReader()
        r.stop()  # must not raise, returns immediately
        r.stop()


class TestReaderResources(_ReplHelpers):
    """No fd growth across reconnect cycles (reference
    binlog_reader_resource_test.cpp analog)."""

    def _open_fds(self):
        import os
        return len(os.listdir("/proc/self/fd"))

    def test_fd_stable_across_reconnects(self):
        cfg = make_cfg()
        cat = TableCatalog(cfg)
        proc = BinlogEventProcessor(cat, database="testdb")
        with make_server() as srv:
            reader = BinlogReader(cfg.mysql, cfg.replication, proc)
            reader.mysql_cfg.port = srv.port
            reader.repl_cfg.reconnect_backoff_min_ms = 10
            reader.repl_cfg.reconnect_backoff_max_ms = 20
            reader.start()
            assert self._wait(srv.binlog_started.is_set)
            baseline = self._open_fds()
            b = EventBuilder()
            for cycle in range(6):
                srv.binlog_started.clear()
                srv.push_event(b.fde())
                srv.end_binlog()   # stream EOF -> reader reconnects
                assert self._wait(srv.binlog_started.is_set), \
                    f"no reconnect in cycle {cycle}"
            # allow a little slack for transient accept/close races
            assert self._open_fds() <= baseline + 2, \
                (baseline, self._open_fds())
            reader.stop()
            assert reader._conn is None
