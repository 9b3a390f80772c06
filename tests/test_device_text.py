"""Device text-store verify kernel tests (CPU jnp path)."""

import numpy as np
import pytest

from mygramdb_tpu.storage.device_text import DeviceTextStore


def make_store(texts, capacity=64):
    return DeviceTextStore({i: t for i, t in texts.items()}, capacity)


TEXTS = {
    1: "the quick brown fox",
    2: "quick silver lining",
    3: "slow day",
    4: "日本語の検索エンジン",
    5: "quantity antique stump",  # bigram false-positive source for quantum
}


class TestDeviceVerify:
    def test_single_needle(self):
        st = make_store(TEXTS)
        ids = np.asarray([1, 2, 3, 4, 5], dtype=np.int32)
        m = st.verify(ids, ["quick"], lambda i: [TEXTS.get(x) for x in i])
        assert m.tolist() == [True, True, False, False, False]

    def test_multi_needle_and(self):
        st = make_store(TEXTS)
        ids = np.asarray([1, 2], dtype=np.int32)
        m = st.verify(ids, ["quick", "fox"],
                      lambda i: [TEXTS.get(x) for x in i])
        assert m.tolist() == [True, False]

    def test_cjk(self):
        st = make_store(TEXTS)
        ids = np.asarray([4, 1], dtype=np.int32)
        m = st.verify(ids, ["検索"], lambda i: [TEXTS.get(x) for x in i])
        assert m.tolist() == [True, False]

    def test_false_positive_elimination(self):
        # 'quantum' bigrams all exist in doc 5 but not contiguously
        st = make_store(TEXTS)
        ids = np.asarray([5], dtype=np.int32)
        m = st.verify(ids, ["quantum"], lambda i: [TEXTS.get(x) for x in i])
        assert m.tolist() == [False]

    def test_dirty_docs_use_fallback(self):
        st = make_store(TEXTS)
        ids = np.asarray([1], dtype=np.int32)
        # doc 1 mutated: packed text stale; fallback has new text
        m = st.verify(ids, ["mutated"], lambda i: ["totally mutated"],
                      dirty={1})
        assert m.tolist() == [True]

    def test_long_needle_falls_back(self):
        st = make_store(TEXTS)
        long_needle = "x" * 40
        ids = np.asarray([1], dtype=np.int32)
        m = st.verify(ids, [long_needle],
                      lambda i: [TEXTS.get(x) for x in i])
        assert m.tolist() == [False]

    def test_needle_at_end(self):
        st = make_store(TEXTS)
        ids = np.asarray([1], dtype=np.int32)
        m = st.verify(ids, ["fox"], lambda i: [TEXTS.get(x) for x in i])
        assert m.tolist() == [True]

    def test_needle_equals_doc(self):
        st = make_store({1: "exact"})
        ids = np.asarray([1], dtype=np.int32)
        m = st.verify(ids, ["exact"], lambda i: ["exact"])
        assert m.tolist() == [True]
        m = st.verify(ids, ["exact!"], lambda i: ["exact"])
        assert m.tolist() == [False]

    def test_random_parity_with_host(self):
        rng = np.random.default_rng(11)
        alphabet = list("abcde日本語xyz ")
        texts = {i: "".join(rng.choice(alphabet, size=int(rng.integers(5, 60))))
                 for i in range(1, 201)}
        st = make_store(texts, capacity=256)
        ids = np.asarray(sorted(texts), dtype=np.int32)
        for needle in ["ab", "日本", "xy", "e日", "abc"]:
            m = st.verify(ids, [needle],
                          lambda i: [texts.get(x) for x in i])
            expect = [needle in texts[int(d)] for d in ids]
            assert m.tolist() == expect, needle


class TestDeviceTF:
    def test_tf_parity_with_host(self):
        import numpy as np
        from mygramdb_tpu import native
        rng = np.random.default_rng(31)
        words = ["alpha", "beta", "the", "omega"]
        texts = {i: " ".join(rng.choice(words, size=int(rng.integers(3, 30))))
                 for i in range(1, 301)}
        st = make_store(texts, capacity=512)
        ids = np.asarray(sorted(texts), dtype=np.int32)
        terms = ["alpha", "the", "omega beta"]
        tf_d, dl_d = st.count_tf(ids, terms,
                                 lambda i: [texts.get(x) for x in i])
        tf_h, dl_h = native.count_occurrences(
            [texts[int(d)] for d in ids], terms)
        assert np.array_equal(tf_d, tf_h)
        assert np.array_equal(dl_d, dl_h)

    def test_self_overlapping_falls_back(self):
        import numpy as np
        st = make_store({1: "aaaa"})
        ids = np.asarray([1], dtype=np.int32)
        tf, dl = st.count_tf(ids, ["aa"], lambda i: ["aaaa"])
        assert tf[0, 0] == 2  # non-overlapping count, via host fallback
        assert dl[0] == 4

    def test_dirty_doc_tf(self):
        import numpy as np
        st = make_store({1: "old text"})
        ids = np.asarray([1], dtype=np.int32)
        tf, dl = st.count_tf(ids, ["new"], lambda i: ["new new text"],
                             dirty={1})
        assert tf[0, 0] == 2
        assert dl[0] == len("new new text")


class TestScoreTopk:
    """Fused device BM25 TF->score->top-n vs the host reference scoring."""

    def _host_order(self, ids, texts, terms, dfs, n_docs, avgdl,
                    k1=1.2, b=0.75):
        from mygramdb_tpu.query.bm25 import BM25Scorer
        from mygramdb_tpu.query.sorter import ResultSorter
        scores = BM25Scorer.score_documents(
            ids.tolist(), terms, dfs, texts, n_docs, avgdl, k1, b)
        return ResultSorter.sort_by_score(ids.tolist(), scores.tolist())

    def test_matches_host_scoring_order(self):
        rng = np.random.default_rng(11)
        words = ["quick", "brown", "fox", "lazy", "dog", "stump", "antique"]
        texts = {}
        for d in range(1, 101):
            n = int(rng.integers(3, 30))
            texts[d] = " ".join(rng.choice(words, size=n))
        st = make_store(texts, capacity=256)
        ids = np.arange(1, 101, dtype=np.int32)
        terms = ["quick", "fox"]
        dfs = [sum(1 for t in texts.values() if "quick" in t),
               sum(1 for t in texts.values() if "fox" in t)]
        from mygramdb_tpu.query.bm25 import BM25Scorer
        avgdl = float(np.mean([len(t) for t in texts.values()]))
        idf = np.asarray([BM25Scorer.compute_idf(100, df) for df in dfs])
        out = st.score_topk(ids, terms, idf, avgdl, 1.2, 0.75, 10,
                            lambda i: [texts.get(x) for x in i])
        assert out is not None
        got_ids, got_scores = out
        exp = self._host_order(ids, [texts[d] for d in ids.tolist()],
                               terms, dfs, 100, avgdl)[:10]
        assert got_ids.tolist() == exp
        assert np.all(np.diff(got_scores) <= 1e-6)  # descending

    def test_dirty_docs_merge_from_host(self):
        texts = {1: "alpha beta", 2: "alpha alpha alpha", 3: "beta"}
        st = make_store(texts, capacity=16)
        ids = np.asarray([1, 2, 3], dtype=np.int32)
        from mygramdb_tpu.query.bm25 import BM25Scorer
        idf = np.asarray([BM25Scorer.compute_idf(3, 2)])
        # doc 2 is dirty: its live text now has NO alp -> must rank last
        live = {1: "alpha beta", 2: "beta only now", 3: "beta"}
        out = st.score_topk(ids, ["alp"], idf, 10.0, 1.2, 0.75, 3,
                            lambda i: [live.get(x) for x in i], dirty={2})
        got_ids, got_scores = out
        assert got_ids[0] == 1          # only live alpha doc
        assert got_scores[-1] == 0.0    # dirty doc rescored host-side to 0
        assert got_ids.tolist()[0] == 1

    def test_self_overlap_needle_scores_nonoverlap(self):
        # "aa" in "aaaa" = 2 non-overlapping occurrences (reference
        # CountTermOccurrences); the device leftmost-greedy scan must
        # match the host's non-overlap TF, not the all-positions count (3)
        texts = {1: "aaaa", 2: "aa", 3: "bbbb"}
        st = make_store(texts, capacity=8)
        ids = np.asarray([1, 2, 3], dtype=np.int32)
        out = st.score_topk(ids, ["aa"], np.asarray([1.0]), 4.0, 1.2, 0.75,
                            3, lambda i: [texts.get(x) for x in i])
        assert out is not None
        got_ids, got_scores = out
        from mygramdb_tpu import native
        tf_h, dl_h = native.count_occurrences(
            [texts[d] for d in (1, 2, 3)], ["aa"])
        assert tf_h[0, 0] == 2
        # host-reference scores in the same formula
        import numpy as np_
        tff = tf_h.astype(np_.float64)
        norm = 1.2 * (1 - 0.75 + 0.75 * dl_h[:, None] / 4.0)
        sc = (1.0 * tff * 2.2 / np_.maximum(tff + norm, 1e-9)).sum(axis=1)
        order = sorted(zip(sc.tolist(), [1, 2, 3]),
                       key=lambda p: (-p[0], -p[1]))
        assert got_ids.tolist() == [d for _, d in order]


class TestU16Packing:
    """BMP corpora pack as uint16 (half HBM); non-BMP docs fall back."""

    def test_bmp_corpus_packs_u16(self):
        st = make_store(TEXTS)
        assert st.dtype == np.uint16
        assert st.codepoints.dtype == np.uint16

    def test_non_bmp_doc_overflows_and_verifies_via_host(self):
        texts = dict(TEXTS)
        texts[9] = "emoji 😀 doc"
        st = make_store(texts)
        assert st.dtype == np.uint16          # pack stays narrow
        assert 9 in st._overflow
        ids = np.asarray([9, 1], dtype=np.int32)
        m = st.verify(ids, ["😀"], lambda i: [texts.get(x) for x in i])
        assert m.tolist() == [True, False]

    def test_u_ffff_noncharacter_doc_overflows(self):
        texts = {1: "plain", 2: "bad ￿ char"}
        st = make_store(texts)
        assert 2 in st._overflow
        m = st.verify(np.asarray([2]), ["bad"],
                      lambda i: [texts.get(x) for x in i])
        assert m.tolist() == [True]

    def test_non_bmp_needle_on_bmp_pack(self):
        st = make_store(TEXTS)
        ids = np.asarray([1, 2], dtype=np.int32)
        m = st.verify(ids, ["😀"], lambda i: [TEXTS.get(x) for x in i])
        assert m.tolist() == [False, False]

    def test_tf_parity_u16(self):
        from mygramdb_tpu import native
        rng = np.random.default_rng(5)
        words = ["alpha", "日本語", "the"]
        texts = {i: " ".join(rng.choice(words, size=int(rng.integers(3, 20))))
                 for i in range(1, 101)}
        st = make_store(texts, capacity=128)
        assert st.dtype == np.uint16
        ids = np.asarray(sorted(texts), dtype=np.int32)
        terms = ["alpha", "日本"]
        tf_d, dl_d = st.count_tf(ids, terms,
                                 lambda i: [texts.get(x) for x in i])
        tf_h, dl_h = native.count_occurrences(
            [texts[int(d)] for d in ids], terms)
        assert np.array_equal(tf_d, tf_h)
        assert np.array_equal(dl_d, dl_h)

    def test_vectorized_pack_layout_matches_texts(self):
        # padded layout row i must equal the utf-32 codepoints of doc i
        texts = {i: f"doc {i} body 語{i%7}" for i in range(1, 40)}
        st = make_store(texts, capacity=64)
        cp = np.asarray(st.codepoints)
        assert cp.ndim == 2
        for d, t in texts.items():
            expect = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            got = cp[d, :len(t)].astype(np.uint32)
            assert np.array_equal(got, expect), d

    def test_memory_usage_halved(self):
        st = make_store(TEXTS)
        assert st.memory_usage() == (st.codepoints.size * 2
                                     + st.offsets[0].size * 8)
