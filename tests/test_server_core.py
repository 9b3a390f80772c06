"""ServerCore command-plane tests (dispatcher + handlers, no sockets)."""

import os

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ConnState, ServerCore

CFG = {
    "tables": [{
        "name": "articles",
        "text_source": {"column": "content"},
        "filters": [
            {"name": "status", "type": "int", "bitmap_index": True},
            {"name": "category", "type": "string"},
        ],
    }],
    "memory": {"verify_text": "all"},
    "cache": {"min_query_cost_ms": 0.0},
}

DOCS = [
    ("1", "hello world", {"status": 1, "category": "a"}),
    ("2", "hello there", {"status": 2, "category": "b"}),
    ("3", "goodbye world", {"status": 1, "category": "a"}),
]


@pytest.fixture()
def core(tmp_path):
    cfg_dict = dict(CFG)
    cfg_dict["dump"] = {"dir": str(tmp_path), "default_filename": "t.dmp"}
    cfg = load_config_from_dict(cfg_dict)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    for pk, text, f in DOCS:
        ctx.add_row(pk, text, f)
    return ServerCore(cfg, cat)


class TestSearchCommands:
    def test_search(self, core):
        assert core.handle_line("SEARCH articles hello") == "OK RESULTS 2 2 1"

    def test_search_sort_asc(self, core):
        assert core.handle_line("SEARCH articles hello SORT id ASC") == \
            "OK RESULTS 2 1 2"

    def test_search_filter(self, core):
        assert core.handle_line(
            "SEARCH articles world FILTER status = 1") == "OK RESULTS 2 3 1"

    def test_count(self, core):
        assert core.handle_line("COUNT articles hello") == "OK COUNT 2"

    def test_get(self, core):
        resp = core.handle_line("GET articles 1")
        assert resp.startswith("OK DOC 1")
        assert "status=1" in resp and "category=a" in resp

    def test_get_missing(self, core):
        assert core.handle_line("GET articles 99") == \
            "ERROR Document not found"

    def test_unknown_table(self, core):
        assert core.handle_line("SEARCH nope x") == \
            "ERROR Table not found: nope"

    def test_parse_error(self, core):
        assert core.handle_line("SEARCH articles").startswith("ERROR")
        assert core.handle_line("BOGUS").startswith("ERROR")

    def test_facet(self, core):
        resp = core.handle_line("FACET articles category world")
        lines = resp.split("\r\n")
        assert lines[0] == "OK FACET 1"
        assert lines[1] == "a\t2"

    def test_facet_no_search(self, core):
        resp = core.handle_line("FACET articles category")
        assert resp.startswith("OK FACET 2")

    def test_highlight(self, core):
        resp = core.handle_line(
            'SEARCH articles hello HIGHLIGHT TAG <b> </b>')
        assert resp.startswith("OK RESULTS 2")
        assert "<b>hello</b>" in resp

    def test_debug_block(self, core):
        conn = ConnState()
        core.handle_line("DEBUG ON", conn)
        assert conn.debug
        resp = core.handle_line("SEARCH articles hello", conn)
        assert "# DEBUG" in resp
        assert "query_time:" in resp
        core.handle_line("DEBUG OFF", conn)
        assert not conn.debug

    def test_debug_stage_breakdown(self, core):
        # per-stage timings + device dispatch count (ROADMAP #9)
        conn = ConnState()
        core.handle_line("DEBUG ON", conn)
        resp = core.handle_line("SEARCH articles hello", conn)
        assert "device_dispatches:" in resp
        n = int(resp.split("device_dispatches:")[1].split()[0])
        assert n >= 0


class TestInfoAndVariables:
    def test_info(self, core):
        resp = core.handle_line("INFO")
        assert resp.startswith("OK INFO")
        assert "version:" in resp
        assert "table_articles_documents: 3" in resp
        assert resp.endswith("END")

    def test_set_show(self, core):
        assert core.handle_line("SET cache.enabled = off") == "OK"
        resp = core.handle_line("SHOW VARIABLES LIKE 'cache.enabled'")
        assert "cache.enabled\tOFF" in resp
        assert core.handle_line("SET api.tcp.port = 1").startswith("ERROR")

    def test_config_show(self, core):
        resp = core.handle_line("CONFIG SHOW api.tcp")
        assert '"port": 11016' in resp
        assert core.handle_line("CONFIG SHOW no.such").startswith("ERROR")

    def test_config_help(self, core):
        resp = core.handle_line("CONFIG HELP")
        assert "cache.enabled" in resp

    def test_cache_commands(self, core):
        assert core.handle_line("CACHE DISABLE") == "OK CACHE_DISABLED"
        assert core.handle_line("CACHE ENABLE") == "OK CACHE_ENABLED"
        assert core.handle_line("CACHE CLEAR").startswith("OK CACHE_CLEARED")
        assert core.handle_line("CACHE STATS").startswith("OK CACHE_STATS")

    def test_replication_status(self, core):
        resp = core.handle_line("REPLICATION STATUS")
        assert resp.startswith("OK REPLICATION")
        assert "state: disabled" in resp


class TestCacheIntegration:
    def test_cache_hit(self, core):
        r1 = core.handle_line("SEARCH articles hello")
        conn = ConnState()
        core.handle_line("DEBUG ON", conn)
        r2 = core.handle_line("SEARCH articles hello", conn)
        assert "cache: hit" in r2
        assert r2.startswith(r1)

    def test_cache_invalidation_on_write(self, core):
        core.handle_line("SEARCH articles hello")
        ctx = core.catalog.resolve("articles")
        grams = ctx.index.shred(ctx.normalize("hello world"))
        core.cache.invalidate_by_ngrams(ctx.name, grams)
        core.cache.queue.flush()
        conn = ConnState()
        core.handle_line("DEBUG ON", conn)
        resp = core.handle_line("SEARCH articles hello", conn)
        assert "cache: miss" in resp


class TestDumpCommands:
    def test_save_load_roundtrip(self, core, tmp_path):
        resp = core.handle_line("DUMP SAVE test.dmp")
        assert resp.startswith("OK DUMP_STARTED")
        assert core.dump_manager.wait(30)
        status = core.handle_line("DUMP STATUS")
        assert "state=done" in status

        # verify + info
        v = core.handle_line("DUMP VERIFY test.dmp")
        assert v.startswith("OK DUMP_VERIFIED")
        i = core.handle_line("DUMP INFO test.dmp")
        assert "table_articles" in i

        # mutate, then restore
        ctx = core.catalog.resolve("articles")
        ctx.add_row("9", "extra doc", {"status": 1})
        assert core.handle_line("COUNT articles hello") == "OK COUNT 2"
        core.handle_line("SEARCH articles extra")
        resp = core.handle_line("DUMP LOAD test.dmp")
        assert resp.startswith("OK DUMP_STARTED")
        assert core.dump_manager.wait(30)
        assert "state=done" in core.handle_line("DUMP STATUS")
        assert core.handle_line("SEARCH articles extra") == "OK RESULTS 0"
        assert core.handle_line("SEARCH articles hello") == "OK RESULTS 2 2 1"

    def test_verify_missing_file(self, core):
        assert core.handle_line("DUMP VERIFY nope.dmp").startswith("ERROR")

    def test_optimize(self, core):
        ctx = core.catalog.resolve("articles")
        ctx.add_row("50", "fresh delta doc", {"status": 1})
        assert len(ctx.index.delta) >= 1
        resp = core.handle_line("OPTIMIZE articles")
        assert resp == "OK OPTIMIZED articles"
        assert len(ctx.index.delta) == 0
        assert core.handle_line("SEARCH articles fresh") == "OK RESULTS 1 50"


class TestSync:
    def test_sync_without_source(self, core):
        assert core.handle_line("SYNC articles").startswith("ERROR")

    def test_sync_with_file_source(self, tmp_path):
        seed = tmp_path / "seed.jsonl"
        import json
        with open(seed, "w") as f:
            for pk, text, filt in DOCS:
                f.write(json.dumps(
                    {"id": pk, "content": text, **filt}) + "\n")
        cfg_dict = dict(CFG)
        cfg_dict["dump"] = {"dir": str(tmp_path)}
        cfg = load_config_from_dict(cfg_dict)
        cat = TableCatalog(cfg)
        from mygramdb_tpu.loader.file_loader import make_sync_loader
        core = ServerCore(cfg, cat,
                          sync_loader_factory=make_sync_loader(str(seed)))
        assert core.handle_line("SEARCH articles hello") == "OK RESULTS 0"
        resp = core.handle_line("SYNC articles")
        assert "started" in resp
        core.sync_manager.wait_all(30)
        assert "done" in core.handle_line("SYNC STATUS")
        assert core.handle_line("SEARCH articles hello") == "OK RESULTS 2 2 1"

    def test_sync_live_table_swaps_state(self, tmp_path):
        """SYNC of a populated table must NOT truncate live state: the
        rebuild happens aside and swaps (reference
        LoadFromExistingSnapshot + swap semantics)."""
        seed = tmp_path / "seed.jsonl"
        import json
        with open(seed, "w") as f:
            f.write(json.dumps({"id": "7", "content": "replacement doc",
                                "status": 9, "category": "z"}) + "\n")
        cfg_dict = dict(CFG)
        cfg_dict["dump"] = {"dir": str(tmp_path)}
        cfg = load_config_from_dict(cfg_dict)
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        for pk, text, filt in DOCS:
            ctx.add_row(pk, text, filt)
        from mygramdb_tpu.loader.file_loader import make_sync_loader
        core = ServerCore(cfg, cat,
                          sync_loader_factory=make_sync_loader(str(seed)))
        assert core.handle_line("SEARCH articles hello") == "OK RESULTS 2 2 1"
        assert "started" in core.handle_line("SYNC articles")
        core.sync_manager.wait_all(30)
        # old corpus replaced wholesale; doc ids restart in PK order
        assert core.handle_line("SEARCH articles hello") == "OK RESULTS 0"
        assert core.handle_line("SEARCH articles replacement") == \
            "OK RESULTS 1 7"
        assert core.handle_line(
            "SEARCH articles replacement FILTER status = 9") == \
            "OK RESULTS 1 7"
        assert ctx.doc_count == 1


class TestRuntimeVarEffects:
    """SET must actually take effect, not just mutate the config struct
    (reference runtime_variable_manager.h:63-69 restart-required
    contract)."""

    @pytest.fixture()
    def big_core(self, tmp_path):
        cfg_dict = dict(CFG)
        cfg_dict["dump"] = {"dir": str(tmp_path)}
        cfg = load_config_from_dict(cfg_dict)
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        for i in range(1, 21):
            ctx.add_row(str(i), f"hello document {i}", {"status": i % 3})
        return ServerCore(cfg, cat)

    def test_default_limit_applies_to_parser(self, big_core):
        resp = big_core.handle_line("SEARCH articles hello")
        assert len(resp.split()) - 3 == 20
        assert big_core.handle_line("SET api.default_limit = 5") == "OK"
        resp = big_core.handle_line("SEARCH articles hello")
        assert len(resp.split()) - 3 == 5
        assert resp.startswith("OK RESULTS 20 ")

    def test_max_query_length_applies(self, big_core):
        assert big_core.handle_line("SET api.max_query_length = 20") == "OK"
        assert big_core.handle_line(
            "SEARCH articles " + "x" * 64).startswith("ERROR")
        assert big_core.handle_line("SET api.max_query_length = 4096") == "OK"

    def test_cache_knobs_apply(self, big_core):
        assert big_core.handle_line("SET cache.ttl_seconds = 7") == "OK"
        assert big_core.cache.cache.ttl == 7
        assert big_core.handle_line("SET cache.max_memory_mb = 4") == "OK"
        assert big_core.cache.cache.max_memory == 4 * 1024 * 1024
        assert big_core.handle_line(
            "SET cache.min_query_cost_ms = 2.5") == "OK"
        assert big_core.cache.cache.min_cost_ms == 2.5

    def test_microbatch_is_readonly(self, big_core):
        resp = big_core.handle_line("SET device.microbatch_size = 64")
        assert "read-only" in resp


class TestSyncConcurrency:
    def test_queries_flow_during_staged_rebuild(self, tmp_path):
        """Queries must keep answering consistently while a SYNC rebuild
        is in flight (reference optimize/sync concurrency tier)."""
        import json
        import threading
        import time as _t
        seed = tmp_path / "seed.jsonl"
        with open(seed, "w") as f:
            for i in range(1, 401):
                f.write(json.dumps({"id": i,
                                    "content": f"hello doc{i} world",
                                    "status": i % 3}) + "\n")
        cfg_dict = dict(CFG)
        cfg_dict["dump"] = {"dir": str(tmp_path)}
        cfg = load_config_from_dict(cfg_dict)
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        for i in range(1, 401):
            ctx.add_row(str(i), f"hello doc{i} world", {"status": i % 3})

        def slow_loader(ctx_, cancel, progress):
            staging = ctx_.begin_staging_rebuild()
            n = 0
            for i in range(1, 401):
                staging.add_batch([(str(i), f"hello doc{i} world",
                                    {"status": i % 3})])
                n += 1
                if i % 50 == 0:
                    _t.sleep(0.02)  # stretch the rebuild window
            staging.finish()
            return n

        core = ServerCore(cfg, cat, sync_loader_factory=slow_loader)
        errors = []
        stop = threading.Event()

        def hammer():
            while not stop.is_set():
                r = core.handle_line("SEARCH articles hello LIMIT 5")
                if not r.startswith("OK RESULTS 400"):
                    errors.append(r)
                    return

        threads = [threading.Thread(target=hammer) for _ in range(4)]
        for t in threads:
            t.start()
        assert "started" in core.handle_line("SYNC articles")
        core.sync_manager.wait_all(60)
        stop.set()
        for t in threads:
            t.join(10)
        assert not errors, errors[:2]
        assert "done" in core.handle_line("SYNC STATUS")
        assert core.handle_line("COUNT articles hello") == "OK COUNT 400"


class TestSwapConsistency:
    def test_queries_never_mix_swapped_states(self):
        """Repeated staging swaps between two different corpora while
        queries hammer: every response must be complete-old or
        complete-new, never a mix (the swap seqlock contract)."""
        import threading
        cfg = load_config_from_dict(dict(CFG))
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        corpus_a = [(str(i), f"alpha doc{i}", {"status": 1})
                    for i in range(1, 8)]
        corpus_b = [(str(i), f"bravo doc{i}", {"status": 2})
                    for i in range(1, 13)]
        for pk, text, filt in corpus_a:
            ctx.add_row(pk, text, filt)
        core = ServerCore(cfg, cat)
        errors = []
        stop = threading.Event()

        def hammer():
            while not stop.is_set():
                ra = core.handle_line("COUNT articles alpha")
                rb = core.handle_line("COUNT articles bravo")
                if ra not in ("OK COUNT 7", "OK COUNT 0") or \
                        rb not in ("OK COUNT 12", "OK COUNT 0"):
                    errors.append((ra, rb))
                    return
                # a GET against whatever state is live must be coherent
                g = core.handle_line("GET articles 5")
                if not (g.startswith("OK DOC 5") or "not found" in g):
                    errors.append(g)
                    return
                # unrestricted FACET: all-A or all-B counts, never a mix
                f = core.handle_line("FACET articles status")
                if f not in ("OK FACET 1\r\n1\t7\r\n",
                             "OK FACET 1\r\n2\t12\r\n"):
                    errors.append(f)
                    return
                # restricted FACET: the filter index resolving the result
                # ids must belong to the same state that produced them
                fr = core.handle_line("FACET articles status alpha")
                if fr not in ("OK FACET 1\r\n1\t7\r\n", "OK FACET 0\r\n"):
                    errors.append(fr)
                    return

        threads = [threading.Thread(target=hammer) for _ in range(3)]
        for t in threads:
            t.start()
        try:
            for round_i in range(10):
                rows = corpus_b if round_i % 2 == 0 else corpus_a
                staging = ctx.begin_staging_rebuild()
                staging.add_batch(rows)
                staging.finish()
                core.cache.clear_table(ctx.name)
        finally:
            stop.set()
            for t in threads:
                t.join(10)
        assert not errors, errors[:3]


class TestSyncFaultInjection:
    def test_loader_crash_leaves_table_intact(self, tmp_path):
        """A SYNC worker that dies mid-rebuild must not corrupt or drop
        the live table (staging is discarded; reference sync state
        machine failure path)."""
        cfg_dict = dict(CFG)
        cfg_dict["dump"] = {"dir": str(tmp_path)}
        cfg = load_config_from_dict(cfg_dict)
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        for pk, text, filt in DOCS:
            ctx.add_row(pk, text, filt)

        def crashing_loader(ctx_, cancel, progress):
            staging = ctx_.begin_staging_rebuild()
            staging.add_batch([("100", "partial row", None)])
            raise RuntimeError("connection lost mid-snapshot")

        core = ServerCore(cfg, cat, sync_loader_factory=crashing_loader)
        assert "started" in core.handle_line("SYNC articles")
        core.sync_manager.wait_all(30)
        status = core.handle_line("SYNC STATUS")
        assert "failed" in status
        assert core.sync_manager.status()["articles"]["error"] == \
            "connection lost mid-snapshot"
        assert ctx.doc_count == 3
        assert core.handle_line("SEARCH articles hello") == "OK RESULTS 2 2 1"


class TestStagingRebuild:
    def make_ctx(self):
        cfg = load_config_from_dict(dict(CFG))
        return TableCatalog(cfg).resolve("articles")

    def test_old_state_served_until_finish(self):
        ctx = self.make_ctx()
        for pk, text, filt in DOCS:
            ctx.add_row(pk, text, filt)
        staging = ctx.begin_staging_rebuild()
        staging.add_batch([("10", "brand new corpus", {"status": 5})])
        # live state untouched while staging builds
        assert ctx.doc_store.doc_id("1") is not None
        assert ctx.doc_count == 3
        staging.finish()
        assert ctx.doc_count == 1
        assert ctx.doc_store.doc_id("10") == 1  # ids restart at 1
        total, ids = ctx.index.search_and(["br", "ra", "an", "nd"])
        assert total == 1 and ids.tolist() == [1]
        assert ctx.filter_index.match_mask(
            "status", ids.astype("int64"), "=", 5).all()

    def test_discarded_staging_changes_nothing(self):
        ctx = self.make_ctx()
        for pk, text, filt in DOCS:
            ctx.add_row(pk, text, filt)
        staging = ctx.begin_staging_rebuild()
        staging.add_batch([("99", "ephemeral", None)])
        del staging  # never finished -> discarded
        assert ctx.doc_count == 3
        assert ctx.doc_store.doc_id("99") is None

    def test_cancelled_file_sync_discards(self, tmp_path):
        import json
        import threading
        seed = tmp_path / "seed.jsonl"
        with open(seed, "w") as f:
            f.write(json.dumps({"id": "50", "content": "fresh"}) + "\n")
        ctx = self.make_ctx()
        for pk, text, filt in DOCS:
            ctx.add_row(pk, text, filt)
        from mygramdb_tpu.loader.file_loader import FileLoader
        cancel = threading.Event()
        cancel.set()
        FileLoader(ctx).load_file(str(seed), cancel=cancel, rebuild=True)
        assert ctx.doc_count == 3
        assert ctx.doc_store.doc_id("50") is None


class TestMultiTable:
    """Reference e2e/tests/multi_table: isolation between tables,
    qualified-name resolution, per-table SYNC, dump covering all."""

    CFG2 = {
        "tables": [
            {"name": "articles", "database": "blog",
             "text_source": {"column": "content"},
             "filters": [{"name": "status", "type": "int"}]},
            {"name": "products", "database": "shop",
             "text_source": {"column": "title"},
             "kanji_ngram_size": 1},
        ],
        "memory": {"verify_text": "all"},
        "cache": {"min_query_cost_ms": 0.0},
    }

    @pytest.fixture()
    def multi(self, tmp_path):
        cfg_dict = dict(self.CFG2)
        cfg_dict["dump"] = {"dir": str(tmp_path)}
        cfg = load_config_from_dict(cfg_dict)
        cat = TableCatalog(cfg)
        a = cat.resolve("articles")
        p = cat.resolve("products")
        a.add_row("1", "hello blogging world", {"status": 1})
        a.add_row("2", "quick article", {"status": 2})
        p.add_row("1", "quick silver widget", {})
        p.add_row("2", "日本語ガジェット", {})
        return ServerCore(cfg, cat), cat, tmp_path

    def test_isolation_and_qualified_resolution(self, multi):
        core, cat, _ = multi
        # same term, different corpora
        assert core.handle_line("SEARCH articles quick") == "OK RESULTS 1 2"
        assert core.handle_line("SEARCH products quick") == "OK RESULTS 1 1"
        # qualified names resolve to the same contexts
        assert core.handle_line("SEARCH blog.articles quick") == \
            "OK RESULTS 1 2"
        assert core.handle_line("SEARCH shop.products 日本語") == \
            "OK RESULTS 1 2"
        # unknown qualification fails
        assert core.handle_line("SEARCH shop.articles x").startswith("ERROR")
        # doc ids are per-table namespaces; GET goes to the right store
        assert core.handle_line("GET articles 1").startswith("OK DOC 1 ")
        assert "status" in core.handle_line("GET articles 1")
        assert core.handle_line("GET products 1") == "OK DOC 1"

    def test_sync_one_table_leaves_other(self, multi, tmp_path):
        core, cat, _ = multi
        import json
        seed = tmp_path / "products.jsonl"
        with open(seed, "w") as f:
            f.write(json.dumps({"id": "9", "title": "replacement item"})
                    + "\n")
        from mygramdb_tpu.loader.file_loader import make_sync_loader
        core.sync_manager.loader_factory = make_sync_loader(str(seed))
        assert "started" in core.handle_line("SYNC products")
        core.sync_manager.wait_all(30)
        assert core.handle_line("SEARCH products replacement") == \
            "OK RESULTS 1 9"
        assert core.handle_line("SEARCH products quick") == "OK RESULTS 0"
        # articles untouched
        assert core.handle_line("SEARCH articles quick") == "OK RESULTS 1 2"

    def test_dump_covers_all_tables(self, multi):
        core, cat, tmp_path = multi
        assert core.handle_line("DUMP SAVE multi.dmp").startswith("OK")
        core.dump_manager.wait(30)
        # mutate both, then load: both restored
        cat.resolve("articles").add_row("50", "ephemeral post", {"status": 1})
        cat.resolve("products").remove_row("1")
        assert core.handle_line("DUMP LOAD multi.dmp").startswith("OK")
        core.dump_manager.wait(30)
        assert core.handle_line("SEARCH articles ephemeral") == \
            "OK RESULTS 0"
        assert core.handle_line("SEARCH products quick") == "OK RESULTS 1 1"
        info = core.handle_line("INFO")
        assert "blog.articles" in info and "shop.products" in info


class TestSyncReplicationResume:
    """Cancelled/failed SYNC must resume replication; concurrent status
    reads / stop requests must not deadlock (reference
    sync_cancel_replication_test.cpp + sync_operation_manager_deadlock
    analogs)."""

    def _env(self, tmp_path, loader):
        import threading
        cfg_dict = dict(CFG)
        cfg_dict["dump"] = {"dir": str(tmp_path)}
        cfg = load_config_from_dict(cfg_dict)
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        for pk, text, filt in DOCS:
            ctx.add_row(pk, text, filt)
        core = ServerCore(cfg, cat, sync_loader_factory=loader)
        calls = {"pause": 0, "resume": 0}
        core.sync_manager.pause_replication = \
            lambda: calls.__setitem__("pause", calls["pause"] + 1)
        core.sync_manager.resume_replication = \
            lambda: calls.__setitem__("resume", calls["resume"] + 1)
        return core, ctx, calls

    def test_cancelled_sync_resumes_replication(self, tmp_path):
        import threading
        import time
        started = threading.Event()

        def slow_loader(ctx_, cancel, progress):
            started.set()
            for _ in range(200):
                if cancel.is_set():
                    return 0
                time.sleep(0.02)
            return 0

        core, ctx, calls = self._env(tmp_path, slow_loader)
        assert "started" in core.handle_line("SYNC articles")
        assert started.wait(10)
        assert "stopping" in core.handle_line("SYNC STOP articles")
        core.sync_manager.wait_all(30)
        st = core.sync_manager.status()["articles"]["state"]
        assert st == "cancelled"
        assert calls["pause"] == 1 and calls["resume"] == 1
        assert ctx.doc_count == 3  # live table untouched

    def test_failed_sync_resumes_replication(self, tmp_path):
        def failing_loader(ctx_, cancel, progress):
            raise RuntimeError("snapshot connection refused")

        core, ctx, calls = self._env(tmp_path, failing_loader)
        assert "started" in core.handle_line("SYNC articles")
        core.sync_manager.wait_all(30)
        assert core.sync_manager.status()["articles"]["state"] == "failed"
        assert calls["pause"] == 1 and calls["resume"] == 1

    def test_concurrent_status_and_stop_no_deadlock(self, tmp_path):
        import threading
        import time
        started = threading.Event()

        def slow_loader(ctx_, cancel, progress):
            started.set()
            for i in range(200):
                if cancel.is_set():
                    return i
                progress(i)
                time.sleep(0.01)
            return 200

        core, ctx, calls = self._env(tmp_path, slow_loader)
        core.handle_line("SYNC articles")
        assert started.wait(10)
        errs = []

        def hammer(fn):
            try:
                for _ in range(50):
                    fn()
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ths = [threading.Thread(target=hammer,
                                args=(lambda: core.handle_line(
                                    "SYNC STATUS"),)) for _ in range(4)]
        ths.append(threading.Thread(
            target=hammer, args=(lambda: core.handle_line("INFO"),)))
        [t.start() for t in ths]
        core.handle_line("SYNC STOP")
        [t.join(20) for t in ths]
        assert not any(t.is_alive() for t in ths)
        assert not errs
        core.sync_manager.wait_all(30)

    def test_second_sync_while_running_rejected(self, tmp_path):
        import threading
        import time
        started = threading.Event()

        def slow_loader(ctx_, cancel, progress):
            started.set()
            while not cancel.is_set():
                time.sleep(0.01)
            return 0

        core, ctx, calls = self._env(tmp_path, slow_loader)
        assert "started" in core.handle_line("SYNC articles")
        assert started.wait(10)
        second = core.handle_line("SYNC articles")
        assert "started" not in second or "already" in second.lower()
        core.handle_line("SYNC STOP articles")
        core.sync_manager.wait_all(30)


class TestProtocolInjection:
    """Values containing CR/LF/TAB must never break response framing
    (reference response_formatter_test escaping class)."""

    def _core(self):
        cfg = load_config_from_dict({
            "tables": [{"name": "t", "text_source": {"column": "content"},
                        "filters": [{"name": "cat", "type": "string"}]}],
            "memory": {"verify_text": "all"}})
        cat = TableCatalog(cfg)
        return cat.resolve("t"), ServerCore(cfg, cat)

    def test_get_escapes_control_chars(self):
        ctx, core = self._core()
        ctx.add_row("1", "x", {"cat": "line1\r\nOK FAKE\t2"})
        resp = core.handle_line("GET t 1")
        assert resp.startswith("OK DOC 1")
        assert "\r" not in resp[2:] and "\n" not in resp[2:]

    def test_facet_rows_sanitized(self):
        ctx, core = self._core()
        ctx.add_row("1", "hello", {"cat": "evil\r\nfake\t42"})
        ctx.add_row("2", "hello", {"cat": "ok"})
        resp = core.handle_line("FACET t cat hello")
        lines = resp.split("\r\n")
        assert lines[0] == "OK FACET 2"
        # exactly 2 value rows, each with exactly ONE tab separator
        rows = [ln for ln in lines[1:] if ln]
        assert len(rows) == 2
        for r in rows:
            assert r.count("\t") == 1

    def test_highlight_snippets_sanitized(self):
        ctx, core = self._core()
        ctx.add_row("1", "evil\r\nOK RESULTS 999\r\nxterm here", {})
        resp = core.handle_line("SEARCH t xterm HIGHLIGHT")
        lines = [ln for ln in resp.split("\r\n") if ln]
        assert lines[0].startswith("OK RESULTS 1")
        assert len(lines) == 2  # one snippet row, framing intact
        assert "OK RESULTS 999" not in "".join(lines[0:1])
