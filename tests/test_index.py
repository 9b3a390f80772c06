"""Index core tests: builder, device kernels, mutable overlay.

Mirrors the reference's tests/index tier (posting_list_test,
search_by_threshold_test, optimize tests) against the TPU design.
"""

import numpy as np
import pytest

from mygramdb_tpu.index import (IndexBuilder, DeviceIndex, MutableIndex,
                                SearchOptions)

DOCS = {
    1: "hello world",
    2: "hello there",
    3: "world peace",
    4: "hello hello world",
    5: "goodbye world",
}


def build_index(docs=DOCS, **kw):
    b = IndexBuilder(**{k: v for k, v in kw.items()
                        if k in ("ngram_size", "kanji_ngram_size")})
    for did, text in docs.items():
        b.add_document(did, text)
    return b.finalize()


class TestBuilder:
    def test_csr_shape(self):
        built = build_index()
        assert built.n_docs == 5
        assert built.max_doc_id == 5
        assert built.n_terms > 0
        # posting of 'he' = docs 1,2,4 ('hello' appears in each)
        tid = built.term_dict.get("he")
        assert tid is not None
        assert built.postings_of(tid).tolist() == [1, 2, 4]

    def test_postings_sorted_unique(self):
        built = build_index()
        for t in range(built.n_terms):
            p = built.postings_of(t)
            assert np.all(np.diff(p) > 0), built.term_dict.term(t)

    def test_empty(self):
        built = IndexBuilder().finalize()
        assert built.n_docs == 0
        assert built.postings.size == 0

    def test_chunked_finalize_matches_pair_fallback(self, monkeypatch):
        """The chunked RLE finalize (mg_tid_hist + mg_scatter_rle) must
        produce the same CSR as the expanded-pair fallback, across mixed
        add_batch / add_document streams with duplicate re-adds."""
        from mygramdb_tpu import native
        rng = np.random.default_rng(42)
        words = ["alpha", "beta", "gamma", "delta", "検索", "日本語"]

        def feed(b):
            batch = []
            for d in range(1, 301):
                t = "".join(rng.choice(words,
                                       size=int(rng.integers(1, 8))))
                if d % 3 == 0:
                    b.add_document(d, t)       # per-doc path (RLE _flush)
                else:
                    batch.append((d, t))
                    if len(batch) == 32:
                        b.add_batch(batch)     # native batch path
                        batch = []
                if d % 97 == 0:
                    b.add_document(d, t)       # duplicate re-add
            if batch:
                b.add_batch(batch)

        rng = np.random.default_rng(42)
        b1 = IndexBuilder()
        feed(b1)
        i1 = b1.finalize()

        rng = np.random.default_rng(42)
        b2 = IndexBuilder()
        feed(b2)
        monkeypatch.setattr(native, "radix_finalize_chunked",
                            lambda chunks, V: None)  # force pair fallback
        i2 = b2.finalize()
        assert i1.n_docs == i2.n_docs
        assert np.array_equal(i1.lengths, i2.lengths)
        assert np.array_equal(i1.postings, i2.postings)
        assert np.array_equal(i1.offsets, i2.offsets)

    def test_out_of_order_docs_fall_back_to_lexsort(self):
        """finalize()'s single-radix fast path requires ascending doc ids;
        out-of-order adds must produce identical sorted-per-term CSR."""
        docs_asc = {i: f"hello doc{i} world" for i in range(1, 40)}
        b1 = IndexBuilder()
        for d, t in docs_asc.items():
            b1.add_document(d, t)
        b2 = IndexBuilder()
        for d in sorted(docs_asc, reverse=True):  # descending insertion
            b2.add_document(d, docs_asc[d])
        i1, i2 = b1.finalize(), b2.finalize()
        for g in ("he", "wo", "do"):
            t1 = i1.term_dict.get(g)
            t2 = i2.term_dict.get(g)
            assert i1.postings_of(t1).tolist() == \
                i2.postings_of(t2).tolist(), g
            assert np.all(np.diff(i2.postings_of(t2)) > 0)


class TestDeviceIndexSearch:
    def setup_method(self):
        self.built = build_index()
        self.idx = DeviceIndex(self.built, dense_df_ratio=0.5)

    def tids(self, grams):
        return [self.built.term_dict.get(g) for g in grams]

    def test_and_single_term(self):
        total, ids = self.idx.search_and(self.tids(["he"]))
        assert total == 3
        assert ids.tolist() == [1, 2, 4]

    def test_and_multi_term(self):
        # 'hello world' -> grams incl 'o ' ' w' -> docs 1, 4
        tids = self.tids(["he", "el", "ll", "lo", "o ", " w", "wo", "or",
                          "rl", "ld"])
        total, ids = self.idx.search_and(tids)
        assert total == 2
        assert ids.tolist() == [1, 4]

    def test_and_limit_desc(self):
        total, ids = self.idx.search_and(
            self.tids(["wo"]), opts=SearchOptions(limit=2, descending=True))
        assert total == 4
        assert ids.tolist() == [5, 4]

    def test_and_limit_asc(self):
        total, ids = self.idx.search_and(
            self.tids(["wo"]), opts=SearchOptions(limit=2, descending=False))
        assert total == 4
        assert ids.tolist() == [1, 3]

    def test_not_terms(self):
        # 'wo' docs: 1,3,4,5; NOT 'he' (1,2,4) -> 3,5
        total, ids = self.idx.search_and(self.tids(["wo"]),
                                         not_tids=self.tids(["he"]))
        assert total == 2
        assert ids.tolist() == [3, 5]

    def test_unknown_term_empty(self):
        total, ids = self.idx.search_and([self.built.term_dict.get("he")])
        assert total == 3

    def test_tombstones(self):
        self.idx.mark_deleted([1, 4])
        total, ids = self.idx.search_and(self.tids(["he"]))
        assert total == 1
        assert ids.tolist() == [2]
        self.idx.unmark_deleted([1])
        total, _ = self.idx.search_and(self.tids(["he"]))
        assert total == 2

    def test_search_or(self):
        ids = self.idx.search_or(self.tids(["he", "pe"]))  # hello-docs + peace
        assert ids.tolist() == [1, 2, 3, 4]

    def test_threshold(self):
        # grams of "hello": docs with >= 3 of he/el/ll/lo
        ids = self.idx.search_by_threshold(self.tids(["he", "el", "ll", "lo"]), 3)
        assert ids.tolist() == [1, 2, 4]

    def test_filter_by_ngrams(self):
        cands = np.asarray([1, 2, 3, 4, 5], dtype=np.int32)
        out = self.idx.filter_by_ngrams(cands, self.tids(["wo"]))
        assert sorted(out.tolist()) == [1, 3, 4, 5]


class TestDensePath:
    def test_forced_dense(self):
        built = build_index()
        idx = DeviceIndex(built, dense_df_ratio=0.000001)  # everything dense
        assert idx.n_dense > 0
        he = built.term_dict.get("he")
        wo = built.term_dict.get("wo")
        total, ids = idx.search_and([he, wo])
        assert total == 2 and ids.tolist() == [1, 4]
        total, ids = idx.search_and([wo], not_tids=[he],
                                    opts=SearchOptions(limit=10))
        assert total == 2 and ids.tolist() == [5, 3]

    def test_mixed_dense_sparse(self):
        docs = dict(DOCS)
        # make 'zz' appear in many docs so it goes dense at low ratio
        for i in range(6, 60):
            docs[i] = "zz filler"
        docs[60] = "zz hello"  # sparse 'he' + dense 'zz'
        built = build_index(docs)
        idx = DeviceIndex(built, dense_df_ratio=0.5)  # 'zz' df=55 dense
        zz = built.term_dict.get("zz")
        he = built.term_dict.get("he")  # df=4 -> sparse
        assert idx.dense_row[zz] >= 0
        assert idx.dense_row[he] < 0
        total, ids = idx.search_and([zz, he])
        assert total == 1 and ids.tolist() == [60]


class TestThresholdMixed:
    """Brute-force cross-check of the fused dense+sparse threshold kernel
    (reference search_by_threshold_test.cpp tier)."""

    def build_random(self, n_docs=400, seed=7):
        rng = np.random.default_rng(seed)
        vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
        # 'aa'/'bb' appear in most docs (dense at low ratio); rest rare
        docs = {}
        for i in range(1, n_docs + 1):
            words = []
            if rng.random() < 0.7:
                words.append("aa")
            if rng.random() < 0.5:
                words.append("bb")
            for w in vocab[2:]:
                if rng.random() < 0.03:
                    words.append(w)
            docs[i] = " ".join(words) if words else "zz"
        return docs, vocab

    @pytest.mark.parametrize("min_count", [1, 2, 3, 5])
    def test_vs_bruteforce(self, min_count):
        docs, vocab = self.build_random()
        built = build_index(docs)
        idx = DeviceIndex(built, dense_df_ratio=0.1)
        tids = [built.term_dict.get(g) for g in vocab]
        tids = [t for t in tids if t is not None]
        dense = [t for t in tids if idx.dense_row[t] >= 0]
        sparse = [t for t in tids if idx.dense_row[t] < 0]
        assert dense and sparse  # the mixed branch must be exercised
        got = idx.search_by_threshold(tids, min_count)
        want = sorted(
            d for d, text in docs.items()
            if sum(g in text for g in vocab) >= min_count)
        assert got.tolist() == want

    def test_tombstones_cleared_on_device(self):
        docs, vocab = self.build_random(n_docs=100, seed=11)
        built = build_index(docs)
        idx = DeviceIndex(built, dense_df_ratio=0.1)
        tids = [t for t in (built.term_dict.get(g) for g in vocab)
                if t is not None]
        base = idx.search_by_threshold(tids, 1)
        assert base.size > 2
        dead = base[:2].tolist()
        idx.mark_deleted(dead)
        got = idx.search_by_threshold(tids, 1)
        assert got.tolist() == [d for d in base.tolist() if d not in dead]

    def test_dense_only_padding_rows(self):
        # every term dense; padded kernel rows must contribute zero counts
        built = build_index()
        idx = DeviceIndex(built, dense_df_ratio=0.000001)
        tids = [built.term_dict.get(g) for g in ("he", "el", "ll")]
        got = idx.search_by_threshold(tids, 3)
        assert got.tolist() == [1, 2, 4]
        got = idx.search_by_threshold(tids, 1)
        assert got.tolist() == [1, 2, 4]


class TestMutableIndex:
    def make(self):
        built = build_index()
        return MutableIndex(built, dense_df_ratio=0.5)

    def test_search_passthrough(self):
        m = self.make()
        total, ids = m.search_and(["he"])
        assert total == 3 and ids.tolist() == [1, 2, 4]

    def test_add_then_search(self):
        m = self.make()
        m.add_document(6, "hello again")
        total, ids = m.search_and(["he"])
        assert total == 4
        assert ids.tolist() == [1, 2, 4, 6]

    def test_add_new_term(self):
        m = self.make()
        m.add_document(7, "xyzzy")
        total, ids = m.search_and(["xy"])
        assert total == 1 and ids.tolist() == [7]

    def test_update_device_doc(self):
        m = self.make()
        m.update_document(1, "totally different")
        total, ids = m.search_and(["he"])  # doc1 no longer has 'hello'
        assert total == 2 and ids.tolist() == [2, 4]
        total, ids = m.search_and(["to"])
        assert ids.tolist() == [1]

    def test_remove_device_doc(self):
        m = self.make()
        assert m.remove_document(4)
        total, ids = m.search_and(["he"])
        assert total == 2 and ids.tolist() == [1, 2]
        assert not m.remove_document(4)
        assert m.n_docs == 4

    def test_remove_delta_doc(self):
        m = self.make()
        m.add_document(9, "hello delta")
        assert m.remove_document(9)
        total, _ = m.search_and(["he"])
        assert total == 3

    def test_limit_merge_desc(self):
        m = self.make()
        m.add_document(10, "hello ten")
        total, ids = m.search_and(["he"], limit=2, descending=True)
        assert total == 4
        assert ids.tolist() == [10, 4]

    def test_optimize_folds_delta(self):
        m = self.make()
        m.add_document(6, "hello six")
        m.update_document(1, "changed text")
        m.remove_document(3)
        m.optimize()
        assert len(m.delta) == 0 and not m.tombstones
        total, ids = m.search_and(["he"])
        assert total == 3 and ids.tolist() == [2, 4, 6]
        assert m.n_docs == 5
        # searching updated doc's new content
        total, ids = m.search_and(["ch"])
        assert ids.tolist() == [1]

    def test_threshold_with_delta(self):
        m = self.make()
        m.add_document(6, "hello")
        ids = m.search_by_threshold(["he", "el", "ll", "lo"], 3)
        assert ids.tolist() == [1, 2, 4, 6]

    def test_clear(self):
        m = self.make()
        m.clear()
        total, ids = m.search_and(["he"])
        assert total == 0
        assert m.n_docs == 0

    def test_term_df(self):
        m = self.make()
        assert m.term_df("he") == 3
        m.add_document(6, "hello")
        assert m.term_df("he") == 4
        assert m.term_df("zz") == 0

    def test_search_not_ast(self):
        m = self.make()
        base = np.asarray([1, 2, 3, 4, 5], dtype=np.int32)
        out = m.search_not(base, ["he"])
        assert out.tolist() == [3, 5]


class TestLargeRandom:
    """Cross-check device results against a numpy brute-force model."""

    def test_random_docs(self):
        rng = np.random.default_rng(42)
        vocab = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
        docs = {}
        truth = {}
        for d in range(1, 2001):
            k = rng.integers(1, 5)
            grams = list(rng.choice(vocab, size=k, replace=False))
            docs[d] = " ".join(g for g in grams)
            truth[d] = set()
            for g in grams:
                truth[d].add(g)
        b = IndexBuilder()
        for d, text in docs.items():
            b.add_document(d, text)
        built = b.finalize()
        idx = DeviceIndex(built, dense_df_ratio=0.3)

        def brute(require, forbid=()):
            out = []
            for d in range(1, 2001):
                gs = set(b.shred(docs[d]))
                if all(g in gs for g in require) and \
                        not any(g in gs for g in forbid):
                    out.append(d)
            return out

        for require, forbid in [(["ab"], []), (["ab", "cd"], []),
                                (["ab"], ["ef"]), (["ab", "cd"], ["gh", "ij"])]:
            tids = [built.term_dict.get(g) for g in require]
            ntids = [built.term_dict.get(g) for g in forbid]
            total, ids = idx.search_and(tids, not_tids=ntids)
            expect = brute(require, forbid)
            assert total == len(expect)
            assert ids.tolist() == expect
