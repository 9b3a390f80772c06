"""Replication pipeline tests without a MySQL server (reference-style
mocked connection; tests/mysql/mock_connection.h analog)."""

import queue
import threading
import time

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.replication import binlog_events as ev
from mygramdb_tpu.replication import rows as rowmod
from mygramdb_tpu.replication.gtid import Gtid, GtidSet
from mygramdb_tpu.replication.processor import BinlogEventProcessor
from mygramdb_tpu.replication.reader import BinlogReader

from binlog_builder import EventBuilder

SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

CFG = {
    "mysql": {"database": "db", "user": "u"},
    "tables": [{
        "name": "articles",
        "text_source": {"column": "content"},
        "filters": [{"name": "status", "type": "int", "bitmap_index": True}],
        "required_filters": [
            {"name": "enabled", "type": "int", "op": "=", "value": 1}],
    }],
    "memory": {"verify_text": "all"},
}

COLS = [rowmod.T_LONG, rowmod.T_VARCHAR, rowmod.T_TINY, rowmod.T_TINY]
METAS = [0, 255, 0, 0]
NAMES = ["id", "content", "status", "enabled"]


def make_env():
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    proc = BinlogEventProcessor(cat, database="db")
    return cfg, cat, proc


class StreamFeeder:
    """Parses a raw stream and applies rows/ddl like the worker loop."""

    def __init__(self, proc):
        self.proc = proc
        self.parser = ev.BinlogParser()
        self.executed = GtidSet()
        self.pending = None

    def push(self, raw: bytes):
        e = self.parser.parse_event(raw)
        if e is None:
            return None
        if e.kind == "gtid" and e.gtid:
            self.pending = e.gtid
        elif e.kind == "rows":
            self.proc.apply_rows(e.rows)
        elif e.kind == "query" and e.ddl_type != "other":
            self.proc.apply_ddl(e)
        elif e.kind == "xid" and self.pending:
            self.executed.add(self.pending)
            self.pending = None
        return e


class TestProcessor:
    def test_insert_update_delete_cycle(self):
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        f = StreamFeeder(proc)
        f.push(b.fde())
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.gtid(SID, 1))
        f.push(b.rows(9, "insert", COLS, METAS,
                      [[1, "hello world", 1, 1], [2, "goodbye", 2, 1]]))
        f.push(b.xid())
        assert ctx.doc_count == 2
        total, ids = ctx.index.search_and(["he"])
        assert total == 1

        # update text
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.gtid(SID, 2))
        f.push(b.rows(9, "update", COLS, METAS,
                      [([1, "hello world", 1, 1], [1, "changed", 1, 1])]))
        f.push(b.xid())
        total, _ = ctx.index.search_and(["he"])
        assert total == 0
        total, ids = ctx.index.search_and(["ch"])
        assert total == 1

        # delete
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.gtid(SID, 3))
        f.push(b.rows(9, "delete", COLS, METAS, [[2, "goodbye", 2, 1]]))
        f.push(b.xid())
        assert ctx.doc_count == 1
        assert str(f.executed) == f"{SID}:1-3"

    def test_required_filter_gates_insert(self):
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        f = StreamFeeder(proc)
        f.push(b.fde())
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "insert", COLS, METAS,
                      [[1, "visible", 1, 1], [2, "hidden", 1, 0]]))
        assert ctx.doc_count == 1
        assert ctx.doc_store.doc_id("2") is None

    def test_required_filter_transitions(self):
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        f = StreamFeeder(proc)
        f.push(b.fde())
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "insert", COLS, METAS, [[1, "text one", 1, 1]]))
        # leaves predicate -> removed
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "update", COLS, METAS,
                      [([1, "text one", 1, 1], [1, "text one", 1, 0])]))
        assert ctx.doc_count == 0
        # re-enters predicate -> inserted
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "update", COLS, METAS,
                      [([1, "text one", 1, 0], [1, "text two", 1, 1])]))
        assert ctx.doc_count == 1
        total, _ = ctx.index.search_and(["tw"])
        assert total == 1

    def test_pk_change_split(self):
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        f = StreamFeeder(proc)
        f.push(b.fde())
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "insert", COLS, METAS, [[1, "alpha", 1, 1]]))
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "update", COLS, METAS,
                      [([1, "alpha", 1, 1], [5, "alpha", 1, 1])]))
        assert ctx.doc_store.doc_id("1") is None
        assert ctx.doc_store.doc_id("5") is not None

    def test_truncate_ddl(self):
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        f = StreamFeeder(proc)
        f.push(b.fde())
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "insert", COLS, METAS, [[1, "data", 1, 1]]))
        assert ctx.doc_count == 1
        f.push(b.query("TRUNCATE TABLE articles"))
        assert ctx.doc_count == 0

    def test_drop_ddl_clears_table(self):
        # reference clears index + doc store on DROP TABLE
        # (binlog_event_processor.cpp:394-413)
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        f = StreamFeeder(proc)
        f.push(b.fde())
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "insert", COLS, METAS, [[1, "data", 1, 1]]))
        assert ctx.doc_count == 1
        f.push(b.query("DROP TABLE articles"))
        assert ctx.doc_count == 0

    def test_alter_ddl_keeps_data(self):
        # ALTER warns + invalidates cache but keeps serving the existing
        # index (binlog_event_processor.cpp:374-393)
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        f = StreamFeeder(proc)
        f.push(b.fde())
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "insert", COLS, METAS, [[1, "data", 1, 1]]))
        f.push(b.query("ALTER TABLE articles ADD COLUMN c VARCHAR(10)"))
        assert ctx.doc_count == 1
        total, _ = ctx.index.search_and(["da"])
        assert total == 1

    def test_unknown_table_skipped(self):
        cfg, cat, proc = make_env()
        b = EventBuilder()
        f = StreamFeeder(proc)
        f.push(b.fde())
        f.push(b.table_map(9, "db", "other_table", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "insert", COLS, METAS, [[1, "x", 1, 1]]))
        assert proc.events_skipped == 1

    def test_filter_values_applied(self):
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        f = StreamFeeder(proc)
        f.push(b.fde())
        f.push(b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES))
        f.push(b.rows(9, "insert", COLS, METAS,
                      [[1, "aaa", 7, 1], [2, "bbb", 8, 1]]))
        import numpy as np
        mask = ctx.filter_index.match_mask(
            "status", np.asarray([1, 2], dtype=np.int64), "=", 7)
        assert mask.tolist() == [True, False]


class FakeConnection:
    """Scripted binlog connection (reference MockConnection analog)."""

    def __init__(self, events, uuid="server-uuid-1", mariadb=False):
        self.events = list(events)
        self.uuid = uuid
        self._mariadb = mariadb
        self.database = "db"
        self.closed = threading.Event()

    # connection interface
    def connect(self):
        pass

    @property
    def is_mariadb(self):
        return self._mariadb

    def fetch_server_uuid(self):
        return self.uuid

    def validate_replication_prereqs(self):
        return []

    def fetch_executed_gtid(self):
        return ""

    def fetch_table_columns(self, database, table):
        return [{"name": n, "data_type": "", "column_type": "", "key": ""}
                for n in NAMES]

    def start_binlog_dump_gtid(self, server_id, gtid_set):
        pass

    def start_binlog_dump_mariadb(self, server_id, pos):
        pass

    def read_binlog_event(self):
        if self.events:
            return self.events.pop(0)
        # block until closed, then EOF
        self.closed.wait(timeout=5)
        return None

    def close(self):
        self.closed.set()


class TestBinlogReaderPipeline:
    def test_end_to_end_apply(self):
        cfg, cat, proc = make_env()
        ctx = cat.resolve("articles")
        b = EventBuilder()
        raw = [b.fde(),
               b.gtid(SID, 1),
               b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES),
               b.rows(9, "insert", COLS, METAS,
                      [[1, "replicated row", 1, 1]]),
               b.xid()]
        fake = FakeConnection(raw)
        reader = BinlogReader(cfg.mysql, cfg.replication, proc,
                              connection_factory=lambda: fake)
        reader.start()
        deadline = time.time() + 10
        while time.time() < deadline and ctx.doc_count < 1:
            time.sleep(0.05)
        assert ctx.doc_count == 1
        total, _ = ctx.index.search_and(["re"])
        assert total == 1
        # GTID committed
        deadline = time.time() + 5
        while time.time() < deadline and not reader.executed:
            time.sleep(0.05)
        assert reader.executed.contains(Gtid(SID, 1))
        st = reader.status()
        assert st["running"] == 1
        assert st["events_applied"] >= 1
        reader.stop()
        assert reader.status()["running"] == 0

    def test_pause_resume(self):
        cfg, cat, proc = make_env()
        b = EventBuilder()
        raw = [b.fde()]
        fake = FakeConnection(raw)
        reader = BinlogReader(cfg.mysql, cfg.replication, proc,
                              connection_factory=lambda: fake)
        reader.start()
        reader.pause()
        assert reader.paused
        assert reader.status()["state"] == "paused"
        reader.resume()
        assert not reader.paused
        reader.stop()
