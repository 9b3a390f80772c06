"""Dispatch-count contracts for every fast path (r3 verdict weak #8).

On tunneled TPU backends each device dispatch costs a network RTT, so
the per-query dispatch count IS the engine's latency structure. The e2e
gate suite bounds it on hardware (e2e/scenarios.json max_dispatches);
these unit assertions enforce the same 1-dispatch contracts on every
pytest run so a structural regression fails here, not on the next
tunnel session. Reference latency bar: search_pipeline.cpp one-pass
execution (no per-stage round trips).
"""

import numpy as np
import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.ops import runtime
from mygramdb_tpu.query import QueryParser
from mygramdb_tpu.query.pipeline import SearchPipeline

CFG = {
    "tables": [{
        "name": "articles",
        "text_source": {"column": "content"},
        "filters": [{"name": "status", "type": "int",
                     "bitmap_index": True}],
    }],
    "memory": {"verify_text": "all"},
    "device": {"positional_verify": True},
}

P = QueryParser()


@pytest.fixture(scope="module")
def pipe():
    """Compacted steady state via bulk load (the fused fast paths require
    no delta overlay), with the positional index enabled."""
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    bulk = ctx.begin_bulk_load()
    rows = [(str(i), t, {"status": i % 3})
            for i, t in enumerate([
                "the quick brown fox jumps over the lazy dog",
                "quick silver lining in the clouds",
                "日本語の全文検索エンジンです",
                "東京タワーは日本の有名な観光地です",
                "brown bears eat quick snacks",
                "foxes and dogs are friends",
                "quick 日本 mixed content",
                "the lazy afternoon sun",
            ], start=1)]
    bulk.add_batch(rows)
    bulk.finish()
    ctx._rebuild_device_text()
    return SearchPipeline(ctx, cfg)


def dispatches_of(pipe, line, warm=True):
    q = P.parse(line)
    if warm:
        pipe.execute(q)  # compile + populate row caches
    before = runtime.dispatches.count
    out = pipe.execute(q)
    assert out.success, out.error
    return runtime.dispatches.count - before, out


def test_topn_search_is_one_dispatch(pipe):
    n, out = dispatches_of(pipe, "SEARCH articles quick SORT id DESC LIMIT 5")
    assert n == 1, n
    assert out.total >= 3


def test_count_is_one_dispatch(pipe):
    n, out = dispatches_of(pipe, "COUNT articles quick")
    assert n == 1, n
    assert out.total >= 3


def test_filter_eq_search_is_one_dispatch(pipe):
    n, out = dispatches_of(
        pipe, "SEARCH articles quick FILTER status = 1 LIMIT 10")
    assert n == 1, n


def test_range_filter_search_is_one_dispatch(pipe):
    """FILTER col > v rides the device fast path as a computed compare
    row (cmp_bitmap_device) — no id materialization + host mask."""
    n, out = dispatches_of(
        pipe, "SEARCH articles quick FILTER status > 0 LIMIT 10")
    assert n == 1, n
    # statuses cycle 1,2,0,...: quick docs are 1,2,5,7 -> status 1,2,2,1
    assert out.total == 4


def test_range_filter_count_is_one_dispatch(pipe):
    n, out = dispatches_of(pipe, "COUNT articles quick FILTER status < 2")
    assert n == 1, n
    assert out.total == 2  # quick docs with status 1: ids 1 and 7


def test_ne_filter_matches_host_semantics(pipe):
    n, out = dispatches_of(
        pipe, "SEARCH articles quick FILTER status != 2 LIMIT 10")
    assert n == 1, n
    assert out.total == 2


def test_verified_cjk_search_is_one_dispatch(pipe):
    # verify_text=all forces the substring check; the fused (or
    # positional) path must keep it ONE dispatch
    n, out = dispatches_of(pipe, "SEARCH articles 日本 LIMIT 10")
    assert n == 1, n
    assert out.total == 3


def test_bm25_score_sort_is_one_dispatch(pipe):
    n, out = dispatches_of(
        pipe, "SEARCH articles quick SORT _score DESC LIMIT 5")
    assert n == 1, n
    assert out.total >= 3


def test_verified_filter_combo_is_one_dispatch(pipe):
    n, out = dispatches_of(
        pipe, "SEARCH articles 日本 FILTER status = 1 LIMIT 10")
    assert n == 1, n


def test_pipeline_cjk_stays_on_fused_text_path(pipe):
    """r5 routing assertion: even with the positional index built
    (device.positional_verify on in this fixture), serving routes CJK
    verify queries through the fused TEXT path — the positional engine
    lost its A/B (749 vs 3,589 QPS at 1.1M) and left the serving path.
    Uses a 3-char CJK term: 2-char terms are covered-exact under
    kanji_extra_ngram and skip the verify entirely (next test)."""
    n, out = dispatches_of(pipe, "SEARCH articles 全文検 LIMIT 10")
    assert n == 1, n
    assert out.total == 1
    assert out.debug.optimization_used == "device_fused_verify", \
        out.debug.optimization_used


def test_pipeline_cjk_covered_exact_skips_verify(pipe):
    """kanji_extra_ngram emission: a 2-char CJK term shreds to one exact
    covering gram, so the gram AND IS substring semantics — serving
    routes it through the plain index top-n path (no text verify, one
    dispatch) with identical results."""
    n, out = dispatches_of(pipe, "SEARCH articles 東京 LIMIT 10")
    assert n == 1, n
    assert out.total == 1
    assert out.debug.optimization_used == "device_topn", \
        out.debug.optimization_used


def test_positional_engine_still_one_dispatch_directly(pipe):
    """The demoted engine stays addressable for benches/experiments with
    its 1-dispatch contract intact (DeviceIndex.search_verified_positional
    + plan_positional)."""
    from mygramdb_tpu.ops import runtime
    from mygramdb_tpu.utils.textproc import query_gram_offsets
    ctx = pipe.ctx if hasattr(pipe, "ctx") else pipe
    index = ctx.index
    device = index.device
    if device.positional is None:
        import pytest
        pytest.skip("fixture built without positional")
    pairs, covered = query_gram_offsets("東京", 2, 1, True)
    assert covered and pairs
    tids = index.query_tids([g for g, _ in pairs])
    assert tids is not None
    plan = device.plan_positional(
        list(zip(tids, (o for _, o in pairs))))
    assert plan is not None
    before = runtime.dispatches.count
    total, ids, _scores, _pre = device.search_verified_positional(
        plan, 10, True)
    assert runtime.dispatches.count - before == 1
    assert total == 1


def test_synonym_search_is_one_dispatch(pipe):
    """Synonym OR-in-group/AND-across rides the device AST program on a
    delta-free table: ONE dispatch for candidates (small result sets
    verify host-side without another dispatch)."""
    from mygramdb_tpu.query.synonyms import SynonymDictionary
    syn = SynonymDictionary(normalize=pipe.ctx.normalize)
    syn.load_from_text("quick\tfast\nbrown\tred\n")
    pipe.ctx.synonyms = syn
    try:
        n, out = dispatches_of(pipe, "SEARCH articles quick LIMIT 10")
        assert out.path == "synonym"
        assert out.debug.optimization_used == "device_synonym_ast", \
            out.debug.optimization_used
        assert n == 1, n
        assert out.total == 4  # quick OR fast
    finally:
        pipe.ctx.synonyms = None


def test_fuzzy_host_work_is_bounded():
    """Exact-substring candidates resolve on device (contains kernel);
    only the non-exact tail pays host text transfer + Levenshtein
    (r3 verdict weak #3: fuzzy hauled up to 131,072 texts per query)."""
    cfg = load_config_from_dict(CFG)
    ctx = TableCatalog(cfg).resolve("articles")
    bulk = ctx.begin_bulk_load()
    rows = []
    for i in range(1, 301):
        rows.append((str(i), f"visit tokyo tower number {i}", {"status": 0}))
    for i in range(301, 351):
        rows.append((str(i), f"ride the tokyu line number {i}", {"status": 1}))
    for i in range(351, 401):
        rows.append((str(i), f"unrelated filler text {i}", {"status": 2}))
    bulk.add_batch(rows)
    bulk.finish()
    ctx._rebuild_device_text()
    pipe = SearchPipeline(ctx, cfg)
    out = pipe.execute(P.parse("SEARCH articles tokyo FUZZY 1 LIMIT 400"))
    assert out.success, out.error
    assert out.total == 350  # 300 exact + 50 at distance 1
    # host Levenshtein saw only the non-exact candidates
    assert 0 < out.debug.fuzzy_host_verified <= 60, \
        out.debug.fuzzy_host_verified


def test_positional_path_served_the_cjk_query(pipe):
    """The covered single-term CJK query must route through the
    positional engine when the index carries it (no silent text-path
    fallback)."""
    dev = pipe.ctx.index.device
    assert dev.positional is not None
    from mygramdb_tpu.utils.textproc import query_gram_offsets
    pairs, covered = query_gram_offsets("日本", 2, 1, True)
    assert covered
    tids = pipe.ctx.index.query_tids([g for g, _ in pairs])
    plan = dev.plan_positional(list(zip(tids, (o for _, o in pairs))))
    assert plan is not None
    total, ids, _s, _p = dev.search_verified_positional(
        plan, 128, True)
    assert total == 3


class TestMesh8Dispatch:
    """Round-4: the mesh serves the headline workload through the same
    1-dispatch structures (shard_map fused verify + sharded boolean AST)
    instead of host fallbacks."""

    @pytest.fixture(scope="class")
    def mpipe(self, eight_cpu_devices):
        cfg_d = dict(CFG)
        # dense_df_ratio > 1 keeps every term sparse: the mesh fused
        # verify + sharded-AST paths under test ride the doc-sharded CSR
        cfg_d["device"] = {"mesh_shards": 8, "positional_verify": False,
                           "dense_df_ratio": 2.0}
        cfg = load_config_from_dict(cfg_d)
        cat = TableCatalog(cfg)
        ctx = cat.resolve("articles")
        bulk = ctx.begin_bulk_load()
        rows = [(str(i), t, {"status": i % 3})
                for i, t in enumerate([
                    "the quick brown fox jumps over the lazy dog",
                    "quick silver lining in the clouds",
                    "日本語の全文検索エンジンです",
                    "東京タワーは日本の有名な観光地です",
                    "brown bears eat quick snacks",
                    "foxes and dogs are friends",
                    "quick 日本 mixed content",
                    "the lazy afternoon sun",
                ], start=1)]
        bulk.add_batch(rows)
        bulk.finish()
        ctx._rebuild_device_text()
        return SearchPipeline(ctx, cfg)

    def test_text_pack_is_doc_sharded(self, mpipe):
        dt = mpipe.ctx.fresh_device_text()
        assert dt is not None and dt.doc_sharded
        # per-device rows ~= capacity / 8
        shard_rows = dt.codepoints.sharding.shard_shape(
            dt.codepoints.shape)[0]
        assert shard_rows * 8 == dt.codepoints.shape[0]

    def test_verified_cjk_is_one_dispatch_on_mesh(self, mpipe):
        n, out = dispatches_of(mpipe, "SEARCH articles 日本 LIMIT 10")
        assert out.total == 3
        assert n == 1, n

    def test_verified_parity_with_single_chip(self, mpipe, pipe):
        for q in ("SEARCH articles 日本 LIMIT 10",
                  'SEARCH articles "quick brown" LIMIT 10',
                  "SEARCH articles 東京 LIMIT 10"):
            o1 = pipe.execute(P.parse(q))
            o8 = mpipe.execute(P.parse(q))
            assert o1.total == o8.total, q
            assert o1.results.tolist() == o8.results.tolist(), q

    def test_boolean_ast_is_one_dispatch_on_mesh(self, mpipe):
        n, out = dispatches_of(
            mpipe, "SEARCH articles (quick OR lazy) NOT brown LIMIT 10")
        assert out.total >= 2
        assert n <= 2, n  # AST words + top-n extraction

    def test_boolean_ast_parity_with_single_chip(self, mpipe, pipe):
        q = "SEARCH articles (quick OR lazy) NOT brown LIMIT 10"
        o1 = pipe.execute(P.parse(q))
        o8 = mpipe.execute(P.parse(q))
        assert o1.total == o8.total
        assert o1.results.tolist() == o8.results.tolist()
