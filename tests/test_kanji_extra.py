"""kanji_extra_ngram (CJK extra-gram emission) semantics.

The TPU-native index extension with no reference analog: CJK positions
also emit a bigram so 2-char CJK terms become covered-exact (the gram
AND IS substring semantics — no text verify) and longer CJK terms AND
overlapping bigrams. The invariant these tests pin: RESULTS ARE
IDENTICAL with the emission on or off — only the routing and the
candidate-set sizes change.
"""

import numpy as np
import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.query import QueryParser
from mygramdb_tpu.query.pipeline import SearchPipeline
from mygramdb_tpu.utils import textproc

P = QueryParser()

TEXTS = [
    "東京タワーは日本の有名な観光地です",
    "日本語の全文検索エンジンです",
    "quick 東京 mixed content",
    "大阪城と京都の金閣寺",
    "京都 and 東 separate chars",
    "the quick brown fox",
    "全文検索エンジンの観光ガイド",
]


def test_emission_shapes():
    g0 = textproc.generate_query_ngrams("東京タワー", 2, 1, True)
    g2 = textproc.generate_query_ngrams("東京タワー", 2, 1, True,
                                        kanji_extra=2)
    assert set(g0) <= set(g2)
    assert "東京" in g2 and "東京" not in g0
    # kana are not CJK ideographs: no タワ bigram from the kana positions
    assert all(len(g) <= 2 for g in g2)
    # pure ascii unchanged
    assert textproc.generate_query_ngrams("quick", 2, 1, True,
                                          kanji_extra=2) == \
        textproc.generate_query_ngrams("quick", 2, 1, True)
    # the EXTRA bigram only fires when BOTH chars are CJK ("a京" is a
    # legitimate BASE cross-boundary ascii-start bigram and stays)
    g = textproc.generate_query_ngrams("東a京", 2, 1, True, kanji_extra=2)
    assert "東a" not in g
    assert g == textproc.generate_query_ngrams("東a京", 2, 1, True)


def test_native_matches_python():
    from mygramdb_tpu import native
    if not native.available():
        pytest.skip("native lib absent")
    for t in TEXTS + ["漢" * 50, "a漢b漢c", "ひらがな漢字まじり文です"]:
        py = sorted(set(textproc.generate_query_ngrams(
            t, 2, 1, True, kanji_extra=2)))
        out = native.hybrid_ngrams(t, 2, 1, True, kanji_extra=2)
        if out is None:
            pytest.skip("native lib lacks the _x entry points")
        starts, lens, hashes = out
        nat = sorted(set(t[s:s + l]
                         for s, l in zip(starts.tolist(), lens.tolist())))
        assert py == nat, t


def _make(extra):
    cfg = load_config_from_dict({
        "tables": [{"name": "t", "text_source": {"column": "c"},
                    "kanji_extra_ngram": extra}],
        "memory": {"verify_text": "all"},
    })
    cat = TableCatalog(cfg)
    ctx = cat.resolve("t")
    bulk = ctx.begin_bulk_load()
    bulk.add_batch([(str(i), t, {}) for i, t in enumerate(TEXTS, 1)])
    bulk.finish()
    ctx._rebuild_device_text()
    return ctx, cfg


QUERIES = ["SEARCH t 東京 LIMIT 10", "SEARCH t 全文検 LIMIT 10",
           "SEARCH t 全文検索 LIMIT 10", "SEARCH t 京 LIMIT 10",
           "SEARCH t 金閣寺 LIMIT 10", "COUNT t 東京",
           "SEARCH t 東西 LIMIT 10",        # chars present, never adjacent
           "SEARCH t quick LIMIT 10",
           'SEARCH t "東京 mixed" LIMIT 10',
           "SEARCH t 東京 SORT _score DESC LIMIT 5"]


def test_results_identical_with_and_without_extra():
    ctx0, cfg0 = _make(0)
    ctx2, cfg2 = _make(2)
    for q in QUERIES:
        o0 = SearchPipeline(ctx0, cfg0).execute(P.parse(q))
        o2 = SearchPipeline(ctx2, cfg2).execute(P.parse(q))
        assert o0.success and o2.success, (q, o0.error, o2.error)
        assert o0.total == o2.total, q
        assert list(o0.results) == list(o2.results), q


def test_adjacency_enforced_without_verify():
    """東 and 京 both occur in doc 5 but never adjacently — the covering
    bigram must exclude it even though the text verify is skipped."""
    ctx, cfg = _make(2)
    out = SearchPipeline(ctx, cfg).execute(P.parse("SEARCH t 東京 LIMIT 10"))
    assert out.success
    pks = {out.sn.doc_store.primary_key(int(d)) for d in out.results}
    assert pks == {"1", "3"}
    assert out.debug.optimization_used == "device_topn"


def test_mutation_path_indexes_extra_grams():
    ctx, cfg = _make(2)
    ctx.add_row("100", "新宿の東京案内", {})
    out = SearchPipeline(ctx, cfg).execute(P.parse("SEARCH t 東京 LIMIT 10"))
    pks = {out.sn.doc_store.primary_key(int(d)) for d in out.results}
    assert "100" in pks
    ctx.optimize()
    out = SearchPipeline(ctx, cfg).execute(P.parse("SEARCH t 新宿 LIMIT 10"))
    pks = {out.sn.doc_store.primary_key(int(d)) for d in out.results}
    assert pks == {"100"}


def test_restore_adopts_dump_emission(tmp_path):
    """A dump built WITHOUT extra grams restored under a config WITH them
    must keep query grams aligned with the restored term dict (the
    override), and still answer correctly via the verify path."""
    from mygramdb_tpu.storage import dump as dump_format
    ctx0, _ = _make(0)
    path = str(tmp_path / "noextra.dump")
    dump_format.save_dump(path, {"cfg": 1}, [ctx0.table_state()])
    _info, tables = dump_format.load_dump(path)
    ctx2, cfg2 = _make(2)  # config wants extra...
    ctx2.restore_from_state(tables[0])      # ...but the dump has none
    assert ctx2.kanji_extra_effective == 0
    out = SearchPipeline(ctx2, cfg2).execute(
        P.parse("SEARCH t 東京 LIMIT 10"))
    assert out.success and out.total == 2
    assert out.debug.optimization_used != "device_topn"  # verify needed
    # a fresh bulk rebuild returns to the config's emission
    ctx3 = TableCatalog(cfg2).resolve("t")
    bulk = ctx3.begin_bulk_load()
    bulk.add_batch([(str(i), t, {}) for i, t in enumerate(TEXTS, 1)])
    bulk.finish()
    assert ctx3.kanji_extra_effective == 2
