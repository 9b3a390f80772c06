"""CacheManager correctness: staleness, version races, registration gaps.

Covers the reference cache guards: capture-at-lookup / check-at-insert data
version (search_pipeline.cpp:1510), hit-time sampled staleness validation
(IsCacheStale, search_pipeline.cpp:1117-1140), and n-gram invalidation
reachability (entries that register no grams must not be cached).
"""

import numpy as np
import pytest

from mygramdb_tpu.cache import CacheManager
from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.query import QueryParser
from mygramdb_tpu.query.pipeline import SearchPipeline

P = QueryParser()


def make_cache(**over):
    cfg = load_config_from_dict(
        {"tables": [{"name": "t", "text_source": {"column": "c"}}],
         "cache": {"enabled": True, "min_query_cost_ms": 0.0, **over}})
    return CacheManager(cfg.cache)


def q(line):
    return P.parse(line)


class TestVersionGuards:
    def test_insert_rejected_when_table_mutated_during_compute(self):
        cm = make_cache()
        query = q("SEARCH t hello")
        key, entry, version = cm.lookup("t", query)
        assert entry is None
        # a binlog write lands WHILE the query computes (bumps version
        # before insert captures anything on its own)
        cm.bump_version("t")
        ok = cm.insert("t", key, query, (1, np.asarray([3], np.int32)),
                       50.0, ["he", "el"], version_at_lookup=version)
        assert not ok
        _, entry2, _ = cm.lookup("t", query)
        assert entry2 is None

    def test_insert_accepted_when_no_mutation(self):
        cm = make_cache()
        query = q("SEARCH t hello")
        key, entry, version = cm.lookup("t", query)
        ok = cm.insert("t", key, query, (1, np.asarray([3], np.int32)),
                       50.0, ["he", "el"], version_at_lookup=version)
        assert ok
        _, entry2, _ = cm.lookup("t", query)
        assert entry2 is not None and entry2[0] == 1

    def test_empty_gram_set_not_cached_under_ngram_strategy(self):
        # entries with no gram registration are unreachable by n-gram
        # invalidation -> a write would leave them stale until TTL
        cm = make_cache()
        query = q("SEARCH t x")  # shorter than ngram -> substring fallback
        key, _, version = cm.lookup("t", query)
        ok = cm.insert("t", key, query, (1, np.asarray([3], np.int32)),
                       50.0, [], version_at_lookup=version)
        assert not ok

    def test_empty_gram_set_cached_under_table_strategy(self):
        cm = make_cache(invalidation_strategy="table")
        query = q("SEARCH t x")
        key, _, version = cm.lookup("t", query)
        ok = cm.insert("t", key, query, (1, np.asarray([3], np.int32)),
                       50.0, [], version_at_lookup=version)
        assert ok  # table strategy clears by prefix; reachable


class _FakeDocStore:
    """Doc-store stub for staleness sampling: ids < cutoff exist."""

    def __init__(self, cutoff):
        self.cutoff = cutoff

    def primary_keys_batch(self, ids):
        return [str(i) if i < self.cutoff else None for i in ids]


class TestHitTimeStaleness:
    def test_stale_hit_evicted(self):
        cm = make_cache()
        query = q("SEARCH t hello")
        key, _, version = cm.lookup("t", query)
        ids = np.arange(1, 101, dtype=np.int32)
        assert cm.insert("t", key, query, (100, ids), 50.0, ["he"],
                         version_at_lookup=version)
        # doc 90+ deleted from the store, invalidation flush not yet run
        store = _FakeDocStore(cutoff=90)
        _, entry, _ = cm.lookup("t", query, doc_store=store)
        assert entry is None  # stale detected and evicted
        # and the entry is gone even for a fresh-store lookup
        _, entry2, _ = cm.lookup("t", query,
                                 doc_store=_FakeDocStore(cutoff=10**9))
        assert entry2 is None

    def test_fresh_hit_served(self):
        cm = make_cache()
        query = q("SEARCH t hello")
        key, _, version = cm.lookup("t", query)
        ids = np.arange(1, 101, dtype=np.int32)
        cm.insert("t", key, query, (100, ids), 50.0, ["he"],
                  version_at_lookup=version)
        _, entry, _ = cm.lookup("t", query,
                                doc_store=_FakeDocStore(cutoff=10**9))
        assert entry is not None and entry[0] == 100


CFG = {
    "tables": [{
        "name": "articles",
        "text_source": {"column": "content"},
        "filters": [{"name": "category", "type": "string"}],
    }],
    "memory": {"verify_text": "off"},
    "cache": {"enabled": True, "min_query_cost_ms": 0.0},
}


@pytest.fixture()
def cached_pipe():
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    for i in range(1, 9):
        ctx.add_row(str(i), "the quick brown fox number %d" % i,
                    {"category": "odd" if i % 2 else "even"})
    cm = CacheManager(cfg.cache, normalize_term=ctx.normalize)
    return SearchPipeline(ctx, cfg, cm), cm


class TestPipelineCacheIntegration:
    def test_facet_cache_hit_returns_full_result_set(self, cached_pipe):
        """Regression: the cache-hit branch must forward collect_all so a
        repeated FACET computes counts over the WHOLE result set, not one
        page (default limit 100 masks this at small N; use limit 2)."""
        pipe, cm = cached_pipe
        query = P.parse("FACET articles category quick LIMIT 2")
        cold = pipe.execute(query, collect_all=True)
        assert cold.total == 8
        assert cold.results.size == 8  # full set, not LIMIT page
        hot = pipe.execute(query, collect_all=True)
        assert hot.path == "cache"
        assert hot.results.size == 8  # regression: was paginated to limit

    def test_cached_search_stale_after_direct_delete(self, cached_pipe):
        """A delete that reaches the doc store before the invalidation
        flush must not be served from cache (hit-time staleness)."""
        pipe, cm = cached_pipe
        # FILTER disqualifies the top-N fast path, so the result is cached
        query = P.parse("SEARCH articles quick FILTER category = odd")
        cold = pipe.execute(query)
        assert cold.total == 4
        warm = pipe.execute(query)
        assert warm.path == "cache"
        # binlog write applied to the store; deferred invalidation flush
        # has NOT run (no invalidate_by_ngrams call)
        pipe.ctx.doc_store.remove_by_pk("7")
        after = pipe.execute(query)
        assert after.path != "cache"


class TestResultCompression:
    """Compressed result payload roundtrip (reference
    result_compressor_test.cpp analog; zlib here vs LZ4 there)."""

    def test_compressible_roundtrip(self):
        import numpy as np
        from mygramdb_tpu.cache.query_cache import QueryCache
        qc = QueryCache(max_memory_mb=4, ttl_seconds=0,
                        min_query_cost_ms=0.0, compression_enabled=True)
        ids = np.arange(1, 20001, dtype=np.int32)  # highly compressible
        assert qc.insert("k", 20000, ids, cost_ms=5.0)
        e = qc._entries["k"]
        assert e.compressed and e.size < ids.nbytes // 2
        total, got, _age, _saved = qc.lookup("k")
        assert total == 20000 and np.array_equal(got, ids)

    def test_incompressible_stays_raw(self):
        import numpy as np
        from mygramdb_tpu.cache.query_cache import QueryCache
        qc = QueryCache(max_memory_mb=4, ttl_seconds=0,
                        min_query_cost_ms=0.0, compression_enabled=True)
        rng = np.random.default_rng(3)
        ids = rng.integers(1, 2**31 - 1, size=4096).astype(np.int32)
        assert qc.insert("k", ids.size, ids, cost_ms=5.0)
        total, got, _a, _s = qc.lookup("k")
        assert np.array_equal(got, ids)

    def test_compression_disabled(self):
        import numpy as np
        from mygramdb_tpu.cache.query_cache import QueryCache
        qc = QueryCache(max_memory_mb=4, ttl_seconds=0,
                        min_query_cost_ms=0.0, compression_enabled=False)
        ids = np.arange(1, 10001, dtype=np.int32)
        assert qc.insert("k", ids.size, ids, cost_ms=5.0)
        assert not qc._entries["k"].compressed
        _t, got, _a, _s = qc.lookup("k")
        assert np.array_equal(got, ids)

    def test_small_payload_not_compressed(self):
        import numpy as np
        from mygramdb_tpu.cache.query_cache import QueryCache
        qc = QueryCache(max_memory_mb=4, ttl_seconds=0,
                        min_query_cost_ms=0.0, compression_enabled=True)
        ids = np.arange(1, 9, dtype=np.int32)  # 32 bytes <= 64 floor
        assert qc.insert("k", 8, ids, cost_ms=5.0)
        assert not qc._entries["k"].compressed


class TestPaginationFromCache:
    """LIMIT/OFFSET are excluded from the cache key: one cached result
    set serves every page, each correctly sliced (reference
    integration/cache/pagination_test.cpp + count_test.cpp)."""

    def _engine(self):
        from mygramdb_tpu.catalog import TableCatalog
        from mygramdb_tpu.config import load_config_from_dict
        from mygramdb_tpu.server.core import ServerCore
        cfg = load_config_from_dict({
            "tables": [{"name": "t",
                        "text_source": {"column": "content"}}],
            "memory": {"verify_text": "all"},
            "cache": {"min_query_cost_ms": 0.0},
        })
        cat = TableCatalog(cfg)
        ctx = cat.resolve("t")
        for i in range(1, 21):
            ctx.add_row(str(i), f"common text {i}", {})
        return ServerCore(cfg, cat)

    def test_pages_served_from_one_entry(self):
        core = self._engine()
        r1 = core.handle_line("SEARCH t common SORT id ASC LIMIT 5")
        stats0 = core.cache.cache.stats.hits
        r2 = core.handle_line(
            "SEARCH t common SORT id ASC LIMIT 5 OFFSET 5")
        r3 = core.handle_line("SEARCH t common SORT id ASC LIMIT 5,5")
        assert core.cache.cache.stats.hits >= stats0 + 1
        assert r1.split()[3:] == ["1", "2", "3", "4", "5"]
        assert r2.split()[3:] == ["6", "7", "8", "9", "10"]
        assert r3 == r2  # LIMIT offset,count == LIMIT+OFFSET
        # totals identical on every page
        assert r1.split()[2] == r2.split()[2] == "20"

    def test_sort_direction_from_same_entry(self):
        core = self._engine()
        core.handle_line("SEARCH t common SORT id ASC LIMIT 3")
        r_desc = core.handle_line("SEARCH t common SORT id DESC LIMIT 3")
        assert r_desc.split()[3:] == ["20", "19", "18"]

    def test_count_and_search_agree(self):
        core = self._engine()
        total = int(core.handle_line(
            "SEARCH t common LIMIT 5").split()[2])
        count = int(core.handle_line("COUNT t common").split()[2])
        assert total == count == 20
        # and cached COUNT stays correct
        assert int(core.handle_line(
            "COUNT t common").split()[2]) == 20
