"""Replication wired through ServerCore: commands, GTID-carrying dumps
(reference gtid_dump_test.cpp analog), pause-during-dump."""

import time

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.replication import rows as rowmod
from mygramdb_tpu.replication.processor import BinlogEventProcessor
from mygramdb_tpu.replication.reader import BinlogReader
from mygramdb_tpu.server.core import ServerCore

from binlog_builder import EventBuilder
from test_replication import FakeConnection, NAMES, COLS, METAS, SID

CFG = {
    "mysql": {"database": "db", "user": "u"},
    "tables": [{"name": "articles", "text_source": {"column": "content"},
                "filters": [{"name": "status", "type": "int"}],
                "required_filters": [
                    {"name": "enabled", "type": "int", "op": "=",
                     "value": 1}]}],
    "memory": {"verify_text": "all"},
}


class FakeService:
    """ReplicationService-shaped facade over a scripted reader."""

    enabled = True

    def __init__(self, reader):
        self.reader = reader

    def status(self):
        return self.reader.status()

    def start(self):
        return self.reader.start()

    def stop(self):
        return self.reader.stop()

    def pause(self):
        self.reader.pause()

    def resume(self):
        self.reader.resume()

    @property
    def current_gtid(self):
        return self.reader.gtid_position()

    def set_start_gtid(self, g):
        self.reader.set_start_gtid(g)


@pytest.fixture()
def env(tmp_path):
    cfg_d = dict(CFG)
    cfg_d["dump"] = {"dir": str(tmp_path)}
    cfg = load_config_from_dict(cfg_d)
    cat = TableCatalog(cfg)
    proc = BinlogEventProcessor(cat, database="db")
    b = EventBuilder()
    raw = [b.fde(),
           b.gtid(SID, 1),
           b.table_map(9, "db", "articles", COLS, METAS, col_names=NAMES),
           b.rows(9, "insert", COLS, METAS,
                  [[1, "replicated hello", 1, 1],
                   [2, "replicated world", 2, 1]]),
           b.xid()]
    fake = FakeConnection(raw)
    reader = BinlogReader(cfg.mysql, cfg.replication, proc,
                          connection_factory=lambda: fake)
    core = ServerCore(cfg, cat, binlog_reader=FakeService(reader))
    proc.cache = core.cache
    return core, reader


def _wait(cond, timeout=10):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.05)
    return False


class TestReplicationThroughServer:
    def test_stream_then_search(self, env):
        core, reader = env
        assert core.handle_line("REPLICATION START") == \
            "OK REPLICATION_STARTED"
        assert _wait(lambda: core.catalog.resolve("articles").doc_count == 2)
        assert core.handle_line("SEARCH articles replicated") == \
            "OK RESULTS 2 2 1"
        status = core.handle_line("REPLICATION STATUS")
        assert "state: running" in status
        assert f"{SID}:1" in status
        assert core.handle_line("REPLICATION STOP") == \
            "OK REPLICATION_STOPPED"
        assert "state: stopped" in core.handle_line("REPLICATION STATUS")

    def test_dump_carries_gtid(self, env):
        core, reader = env
        core.handle_line("REPLICATION START")
        assert _wait(lambda: bool(reader.executed))
        core.handle_line("REPLICATION STOP")
        resp = core.handle_line("DUMP SAVE g.dmp")
        assert resp.startswith("OK DUMP_STARTED")
        assert core.dump_manager.wait(30)
        v = core.handle_line("DUMP VERIFY g.dmp")
        assert f"gtid={SID}:1" in v
        # load restores GTID into the reader (resume point)
        reader.executed = type(reader.executed)()  # clear
        core.handle_line("DUMP LOAD g.dmp")
        assert core.dump_manager.wait(30)
        assert f"{SID}:1" in reader.gtid_position()

    def test_pause_during_dump(self, env, tmp_path):
        core, reader = env
        core.handle_line("REPLICATION START")
        assert _wait(lambda: reader.running)
        resp = core.handle_line("DUMP SAVE p.dmp")
        assert resp.startswith("OK DUMP_STARTED")
        assert core.dump_manager.wait(30)
        # resumed after the dump finished
        assert not reader.paused
        core.handle_line("REPLICATION STOP")

    def test_cache_invalidated_by_replicated_write(self, env):
        core, reader = env
        ctx = core.catalog.resolve("articles")
        core.handle_line("REPLICATION START")
        assert _wait(lambda: ctx.doc_count == 2)
        # prime cache
        core.config.cache.min_query_cost_ms = 0.0
        core.cache.cache.min_cost_ms = 0.0
        assert core.handle_line("SEARCH articles replicated") == \
            "OK RESULTS 2 2 1"
        # replicate one more row through the same pipeline
        b = EventBuilder()
        raw = [b.fde(),  # each (re)connected dump stream starts with an FDE
               b.gtid(SID, 2),
               b.table_map(9, "db", "articles", COLS, METAS,
                           col_names=NAMES),
               b.rows(9, "insert", COLS, METAS,
                      [[3, "replicated again", 1, 1]]),
               b.xid()]
        # feed through the live reader's connection
        reader._conn.events.extend(raw)
        assert _wait(lambda: ctx.doc_count == 3)
        core.cache.queue.flush()
        assert core.handle_line("SEARCH articles replicated") == \
            "OK RESULTS 3 3 2 1"
        core.handle_line("REPLICATION STOP")
