"""Positional index lifecycle: DUMP SAVE/LOAD and optimize() compaction.

The occurrence index (index/positional.py) must survive every segment
swap the engine performs, or the verified fast path silently degrades to
text-window scans: dump restore (catalog.restore_from_state), delta
compaction (MutableIndex.optimize -> _compact_with_positions), and the
BM25-norm doc lengths that ride along. Reference lifecycle analog:
dump_format_v2 save/load + Index::OptimizeInBatches — the reference has
no positional index, so these contracts are rebuild-specific.
"""

import numpy as np
import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.query import QueryParser
from mygramdb_tpu.query.pipeline import SearchPipeline
from mygramdb_tpu.storage import dump as dump_format

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

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "quick silver lining in the clouds",
    "日本語の全文検索エンジンです",
    "東京タワーは日本の有名な観光地です",
    "brown bears eat quick snacks",
    "quick 日本 mixed content",
]

P = QueryParser()


def make_ctx():
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    bulk = ctx.begin_bulk_load()
    bulk.add_batch([(str(i), t, {"status": i % 3})
                    for i, t in enumerate(TEXTS, start=1)])
    bulk.finish()
    ctx._rebuild_device_text()
    return ctx, cfg


def run(ctx, cfg, line):
    out = SearchPipeline(ctx, cfg).execute(P.parse(line))
    assert out.success, out.error
    pks = [out.sn.doc_store.primary_key(int(d)) for d in out.results]
    return out, pks


def test_dump_roundtrip_preserves_positional(tmp_path):
    ctx, cfg = make_ctx()
    assert ctx.index.device.positional is not None
    out0, pks0 = run(ctx, cfg, "SEARCH articles 日本 LIMIT 10")
    # r5: the positional engine left the serving path, and 2-char CJK
    # terms are covered-exact under kanji_extra_ngram (index answer ==
    # substring semantics, no text check); the positional index itself
    # must still survive the dump lifecycle
    assert out0.debug.optimization_used == "device_topn"

    path = str(tmp_path / "pos.dump")
    dump_format.save_dump(path, {"cfg": 1}, [ctx.table_state()])
    _info, tables = dump_format.load_dump(path)
    assert tables[0].positional_state is not None

    ctx2 = TableCatalog(cfg).resolve("articles")
    ctx2.restore_from_state(tables[0])
    assert ctx2.index.device.positional is not None, \
        "restore dropped the positional index"
    out1, pks1 = run(ctx2, cfg, "SEARCH articles 日本 LIMIT 10")
    assert out1.debug.optimization_used == "device_topn"
    assert out1.total == out0.total and set(pks1) == set(pks0)


def test_dump_roundtrip_preserves_bm25_norm_lengths(tmp_path):
    ctx, cfg = make_ctx()
    out0, _ = run(ctx, cfg, "SEARCH articles quick SORT _score DESC LIMIT 5")
    assert out0.scores is not None

    path = str(tmp_path / "pos.dump")
    dump_format.save_dump(path, {"cfg": 1}, [ctx.table_state()])
    _info, tables = dump_format.load_dump(path)
    ctx2 = TableCatalog(cfg).resolve("articles")
    ctx2.restore_from_state(tables[0])
    dl = np.asarray(ctx2.index.device.positional.doc_len_pad)
    assert dl[1] == len(TEXTS[0]), "doc lengths not re-attached on restore"
    out1, _ = run(ctx2, cfg, "SEARCH articles quick SORT _score DESC LIMIT 5")
    np.testing.assert_allclose(out1.scores, out0.scores, rtol=1e-5)


def test_legacy_dump_without_positional_still_restores(tmp_path):
    ctx, cfg = make_ctx()
    ts = ctx.table_state()
    ts.positional_state = None  # simulate a pre-positional dump
    path = str(tmp_path / "legacy.dump")
    dump_format.save_dump(path, {"cfg": 1}, [ts])
    _info, tables = dump_format.load_dump(path)
    assert tables[0].positional_state is None
    ctx2 = TableCatalog(cfg).resolve("articles")
    ctx2.restore_from_state(tables[0])
    assert ctx2.index.device.positional is None
    out, pks = run(ctx2, cfg, "SEARCH articles 日本 LIMIT 10")
    # the dump carried kanji_extra_ngram, so the 2-char CJK term stays
    # covered-exact (topn) after restore
    assert out.debug.optimization_used == "device_topn"
    assert out.total == 3


def test_optimize_rebuilds_positional_with_mutations():
    ctx, cfg = make_ctx()
    gen0 = ctx.index.built_generation
    ctx.add_row("100", "大阪城と京都の金閣寺", {"status": 1})
    ctx.update_row("2", "quick silver 東京 update")
    ctx.remove_row("5")
    ctx.optimize()
    assert ctx.index.built_generation > gen0
    assert len(ctx.index.delta) == 0
    pp = ctx.index.device.positional
    assert pp is not None, "optimize dropped the positional index"
    # the compacted segment serves the mutated corpus (2-char CJK =
    # covered-exact topn under kanji_extra_ngram)
    out, pks = run(ctx, cfg, "SEARCH articles 東京 LIMIT 10")
    assert out.debug.optimization_used == "device_topn"
    assert set(pks) == {"2", "4"}  # update added, doc 5 had no 東京
    out2, pks2 = run(ctx, cfg, "SEARCH articles 金閣寺 LIMIT 10")
    assert set(pks2) == {"100"}
    out3, pks3 = run(ctx, cfg, "SEARCH articles brown LIMIT 10")
    assert set(pks3) == {"1"}  # doc 5 removed
    # BM25 norm lengths re-attached for the new doc
    dl = np.asarray(pp.doc_len_pad)
    new_id = ctx.doc_store.doc_id("100")
    assert dl[new_id] == len(ctx.normalize("大阪城と京都の金閣寺"))


def test_optimize_positional_parity_with_text_path():
    """Every covered single-term query agrees with brute force after a
    mutation + compaction cycle."""
    ctx, cfg = make_ctx()
    ctx.add_row("200", "全文検索エンジンの観光地ガイド", {"status": 0})
    ctx.update_row("3", "日本語の形態素解析です")
    ctx.optimize()
    pipe = SearchPipeline(ctx, cfg)
    texts = {}
    for pk in [str(i) for i in range(1, len(TEXTS) + 1)] + ["200"]:
        did = ctx.doc_store.doc_id(pk)
        if did is not None:
            texts[pk] = ctx.doc_store.text(did)
    for term in ["日本", "検索", "観光地", "quick", "東京", "エンジン"]:
        out = pipe.execute(P.parse(f"SEARCH articles {term} LIMIT 20"))
        assert out.success, out.error
        got = {out.sn.doc_store.primary_key(int(d)) for d in out.results}
        # stored texts are normalized (width narrowing incl. katakana) —
        # the oracle must compare the normalized needle
        needle = ctx.normalize(term)
        want = {pk for pk, t in texts.items() if needle in t}
        assert got == want, (term, got, want)


def test_optimize_without_texts_drops_positional_gracefully():
    """verify_text off -> no stored texts -> compaction cannot rebuild
    positions; it must fall back to the pair merge, not crash."""
    cfg_d = dict(CFG)
    cfg_d["memory"] = {"verify_text": "off"}
    cfg = load_config_from_dict(cfg_d)
    ctx = TableCatalog(cfg).resolve("articles")
    for i, t in enumerate(TEXTS, start=1):
        ctx.add_row(str(i), t, {"status": i % 3})
    ctx.optimize()
    assert len(ctx.index.delta) == 0
    out = SearchPipeline(ctx, cfg).execute(
        P.parse("SEARCH articles quick LIMIT 10"))
    assert out.success and out.total == 4
