"""Positional occurrence index: build + device verify parity.

Brute-force oracle: substring containment / occurrence counts over the
normalized texts. The positional path must reproduce the text-verify
semantics EXACTLY for covered terms (see ops/positional_ops.py module
docstring for the coverage argument; reference verify_text behavior is
search_pipeline.h:159-190, BM25 TF bm25_scorer.h:36-40).
"""

import numpy as np
import pytest

from mygramdb_tpu.index.builder import IndexBuilder
from mygramdb_tpu.index.device_index import DeviceIndex
from mygramdb_tpu.index.positional import finalize_with_positions_np
from mygramdb_tpu.utils import textproc


DOCS = {
    1: "quick brown fox jumps over the lazy dog",
    2: "hello world of search engines",
    3: "東京タワーは日本の有名な観光地です",
    4: "日本語の全文検索エンジン",
    5: "the quick quick brown quick fox",
    6: "日日は日本の日",                      # repeated kanji occurrences
    7: "aaaa bbbb aaaa",                      # self-overlapping grams
    8: "search 検索 mixed 日本 content",
    9: "z",                                   # shorter than ascii gram
    10: "東京 と 東京 と 東京",
}

QUERIES = ["quick", "日本", "東京", "日", "日日", "検索", "aaaa",
           "hello", "の日", "エンジン", "brown fox"]


def norm(t):
    return textproc.normalize_text(t, True, "keep", True)


def build(collect=True, native=True):
    b = IndexBuilder(ngram_size=2, kanji_ngram_size=1,
                     cross_boundary_ngrams=True,
                     collect_positions=collect)
    if not native:
        b._use_native = False
    b.add_batch([(d, norm(t)) for d, t in sorted(DOCS.items())])
    return b.finalize()


def brute_positions(term):
    """{doc: sorted occurrence start positions of term}."""
    out = {}
    for d, t in DOCS.items():
        nt = norm(t)
        hits = []
        start = 0
        while True:
            i = nt.find(term, start)
            if i < 0:
                break
            hits.append(i)
            start = i + 1
        if hits:
            out[d] = hits
    return out


@pytest.mark.parametrize("native", [True, False])
def test_csr_matches_dedup_build(native):
    """The occurrence-stream finalize must emit the SAME doc CSR as the
    per-doc-dedup build. Compared per TERM STRING: the python dedup path
    assigns term ids in set-iteration order, so tid-aligned arrays are
    permutations of each other."""
    a = build(collect=False, native=native)
    p = build(collect=True, native=native)
    assert a.n_terms == p.n_terms
    assert set(a.term_dict.terms()) == set(p.term_dict.terms())
    for term in a.term_dict.terms():
        ta = a.term_dict.get(term)
        tp = p.term_dict.get(term)
        np.testing.assert_array_equal(a.postings_of(ta), p.postings_of(tp),
                                      err_msg=repr(term))
    assert p.positional is not None


@pytest.mark.parametrize("native", [True, False])
def test_occurrences_match_brute_force(native):
    built = build(native=native)
    pp = built.positional
    for term in ["日", "qu", "aa", "東京"[0]]:
        tid = built.term_dict.get(norm(term))
        if tid is None:
            continue
        occ = dict(pp.term_occurrences(tid, built.offsets, built.lengths,
                                       built.postings))
        expected = brute_positions(norm(term))
        assert set(occ) == set(expected), term
        for d in expected:
            np.testing.assert_array_equal(occ[d], expected[d], err_msg=term)


def test_native_numpy_finalize_parity():
    """Native two-pass scatter vs numpy lexsort fallback, compared per
    TERM (the two paths assign term ids in different orders: the native
    batch resolver allocates new tids in hash order)."""
    a = build(collect=True, native=True)
    b = build(collect=True, native=False)
    if a.positional is None or b.positional is None:
        pytest.skip("native lib unavailable")
    assert set(a.term_dict.terms()) == set(b.term_dict.terms())
    for term in a.term_dict.terms():
        ta = a.term_dict.get(term)
        tb = b.term_dict.get(term)
        occ_a = a.positional.term_occurrences(ta, a.offsets, a.lengths,
                                              a.postings)
        occ_b = b.positional.term_occurrences(tb, b.offsets, b.lengths,
                                              b.postings)
        assert [d for d, _ in occ_a] == [d for d, _ in occ_b], term
        for (d, pa), (_, pb) in zip(occ_a, occ_b):
            np.testing.assert_array_equal(pa, pb,
                                          err_msg=f"{term!r} doc {d}")


def _plan(idx, built, term):
    pairs, covered = textproc.query_gram_offsets(norm(term), 2, 1, True)
    if not covered or not pairs:
        return None
    tid_offsets = []
    for g, off in pairs:
        tid = built.term_dict.get(g)
        if tid is None:
            return "missing"
        tid_offsets.append((tid, off))
    return idx.plan_positional(tid_offsets)


@pytest.mark.parametrize("term", QUERIES)
def test_device_positional_verify_parity(term):
    built = build()
    idx = DeviceIndex(built, dense_df_ratio=0.5)  # everything sparse
    nterm = norm(term)
    words = nterm.split()
    if len(words) != 1:
        return  # single-term v1 scope
    plan = _plan(idx, built, nterm)
    expected = {d for d, t in DOCS.items() if nterm in norm(t)}
    if plan in (None, "missing"):
        # missing gram => no matches possible through the index
        if plan == "missing":
            assert not expected
        return
    total, ids, _scores, pre = idx.search_verified_positional(
        plan, limit_b=128, descending=True)
    got = set(int(x) for x in ids if x >= 0)
    assert total == len(expected), (term, total, expected, got)
    assert got == expected, term


def test_score_mode_tf_matches_all_positions_count():
    built = build()
    idx = DeviceIndex(built, dense_df_ratio=0.5)
    # doc lengths for the BM25 norm
    dl = np.zeros(idx.n_docs_capacity, dtype=np.int32)
    for d, t in DOCS.items():
        dl[d] = len(norm(t))
    idx.set_positional_doc_lengths(dl)
    term = norm("日")
    plan = _plan(idx, built, term)
    assert plan is not None and plan != "missing"
    total, ids, scores, pre = idx.search_verified_positional(
        plan, limit_b=128, descending=True, score_mode=True, idf=1.0,
        k1=1.2, b=0.75, avgdl=float(dl[dl > 0].mean()))
    expected = brute_positions(term)
    assert total == len(expected)
    # verify ranking consistency: recompute BM25 host-side
    def bm25(tf, d):
        n = 1.2 * (1 - 0.75 + 0.75 * dl[d] / dl[dl > 0].mean())
        return tf * 2.2 / (tf + n)
    exp_scores = {d: bm25(len(p), d) for d, p in expected.items()}
    order = sorted(exp_scores, key=lambda d: (-exp_scores[d], -d))
    got = [int(x) for x in ids if x >= 0]
    assert got == order[:len(got)]
    for g, s in zip(got, scores):
        assert abs(exp_scores[g] - s) < 1e-3


def test_tombstone_excludes_deleted_docs():
    built = build()
    idx = DeviceIndex(built, dense_df_ratio=0.5)
    term = norm("日本")
    plan = _plan(idx, built, term)
    expected = {d for d, t in DOCS.items() if term in norm(t)}
    kill = sorted(expected)[0]
    idx.mark_deleted([kill])
    total, ids, _s, _p = idx.search_verified_positional(
        plan, limit_b=128, descending=True)
    got = set(int(x) for x in ids if x >= 0)
    assert got == expected - {kill}
    assert total == len(expected) - 1


def test_uncovered_term_is_refused_by_offsets_helper():
    # trailing non-CJK char starts no gram: coverage gap -> must NOT be
    # positionally verified (pins only the kanji, not the 'a')
    pairs, covered = textproc.query_gram_offsets("漢a", 2, 1, True)
    assert [g for g, _ in pairs] == ["漢"]
    assert not covered
    # covered shapes
    for t in ["日本", "hello", "漢", "a漢"]:
        _, cov = textproc.query_gram_offsets(t, 2, 1, True)
        assert cov, t


def test_offsets_match_plain_generator():
    for t in ["hello", "日本語", "カタカナ漢字", "a漢b", "日日"]:
        pairs, _ = textproc.query_gram_offsets(t, 2, 1, True)
        assert [g for g, _ in pairs] == \
            textproc.generate_query_ngrams(t, 2, 1, True)


def test_finalize_np_empty():
    postings, lengths, pp = finalize_with_positions_np(
        np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int32),
        np.zeros(0, dtype=np.uint16), 4)
    assert postings.size == 0 and lengths.sum() == 0
    assert pp.n_occurrences == 0


def test_fuzz_random_corpus_parity():
    """Randomized corpora (mixed scripts, repeats, empty docs) — device
    positional verify vs brute-force substring containment."""
    rng = np.random.default_rng(42)
    kanji = [chr(c) for c in range(0x65E5, 0x6605)]
    kana = [chr(c) for c in range(0x3042, 0x3062)]
    ascii_w = ["cat", "dog", "fox", "ox", "a", "zz"]

    def rand_doc():
        parts = []
        for _ in range(int(rng.integers(0, 12))):
            r = rng.random()
            if r < 0.4:
                parts.append("".join(rng.choice(kanji, size=int(
                    rng.integers(1, 4)))))
            elif r < 0.7:
                parts.append("".join(rng.choice(kana, size=int(
                    rng.integers(2, 5)))))
            else:
                parts.append(str(rng.choice(ascii_w)))
        return " ".join(parts)

    docs = {i: rand_doc() for i in range(1, 161)}
    b = IndexBuilder(2, 1, True, collect_positions=True)
    b.add_batch([(d, norm(t)) for d, t in sorted(docs.items())])
    built = b.finalize()
    idx = DeviceIndex(built, dense_df_ratio=0.9)
    queries = (["".join(rng.choice(kanji, size=2)) for _ in range(25)]
               + ["".join(rng.choice(kana, size=2)) for _ in range(10)]
               + ascii_w + [chr(0x65E5), chr(0x65E5) * 2])
    checked = 0
    for q in queries:
        nq = norm(q)
        pairs, covered = textproc.query_gram_offsets(nq, 2, 1, True)
        if not covered or not pairs:
            continue
        tid_offsets = []
        ok = True
        for g, off in pairs:
            tid = built.term_dict.get(g)
            if tid is None:
                ok = False
                break
            tid_offsets.append((tid, off))
        expected = {d for d, t in docs.items() if nq in norm(t)}
        if not ok:
            assert not expected, q
            continue
        plan = idx.plan_positional(tid_offsets)
        if plan is None:
            continue
        total, ids, _s, _p = idx.search_verified_positional(
            plan, limit_b=1024, descending=False)
        got = set(int(x) for x in ids if x >= 0)
        assert got == expected and total == len(expected), \
            (q, sorted(got ^ expected))
        checked += 1
    assert checked >= 25


def test_occ_doc_device_expand_matches_host():
    """The device-side occ_doc build (positional._expand_occ_doc_impl,
    scatter+cumsum — no host P/O-sized intermediates, 2 B/posting wire)
    must produce byte-identical occ_doc8 to the host expansion it
    replaces, including 0xFFFF-region padding and multi-occurrence
    postings (docs 5/6/7/10 exercise cnt > 1)."""
    from mygramdb_tpu.index.positional import DevicePositional

    built = build()
    idx = DeviceIndex(built, dense_df_ratio=0.99)
    assert idx.positional is not None
    assert "occ_doc_dev_s" in idx.positional.upload_detail, \
        idx.positional.upload_detail  # device path actually taken
    host = DevicePositional(built.positional, idx.n_docs_capacity,
                            postings=built.postings, offsets=built.offsets,
                            lengths=built.lengths, postings_dev=None)
    assert "occ_doc_host_s" in host.upload_detail
    np.testing.assert_array_equal(np.asarray(idx.positional.occ_doc8),
                                  np.asarray(host.occ_doc8))
    np.testing.assert_array_equal(np.asarray(idx.positional.occ_pos8),
                                  np.asarray(host.occ_pos8))
