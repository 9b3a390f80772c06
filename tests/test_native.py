"""Native C++ kernel tests: parity against Python reference implementations."""

import numpy as np
import pytest

from mygramdb_tpu import native
from mygramdb_tpu.utils import textproc
from mygramdb_tpu.utils.edit_distance import levenshtein as py_lev

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


class TestLevenshtein:
    def test_parity(self):
        cases = [("kitten", "sitting"), ("", "abc"), ("日本語", "日本話"),
                 ("same", "same"), ("a", "b")]
        for a, b in cases:
            assert native.levenshtein(a, b) == py_lev(a, b)

    def test_max_distance(self):
        assert native.levenshtein("kitten", "sitting", 1) == 2


class TestSubstringVerify:
    def test_basic(self):
        texts = ["the quick brown fox", "quick silver", None, ""]
        m = native.substring_verify(texts, ["quick"])
        assert m.tolist() == [True, True, False, False]
        m = native.substring_verify(texts, ["quick", "fox"])
        assert m.tolist() == [True, False, False, False]

    def test_unicode(self):
        texts = ["東京タワーは有名", "大阪城"]
        m = native.substring_verify(texts, ["東京"])
        assert m.tolist() == [True, False]

    def test_empty_needles(self):
        m = native.substring_verify(["abc"], [])
        assert m.tolist() == [True]


class TestCountOccurrences:
    def test_parity_with_str_count(self):
        texts = ["aaa bb aaa", "no match here", "日本日本日本"]
        terms = ["aaa", "日本", "aa"]
        tf, dl = native.count_occurrences(texts, terms)
        for i, t in enumerate(texts):
            for j, term in enumerate(terms):
                assert tf[i, j] == t.count(term), (t, term)
            assert dl[i] == len(t)


class TestFuzzyVerify:
    def test_exact_and_fuzzy(self):
        texts = ["the quick fox", "the quic fox", "nothing here"]
        m = native.fuzzy_verify(texts, "quick", 1)
        assert m.tolist() == [True, True, False]
        # transposition = 2 plain-Levenshtein edits
        m = native.fuzzy_verify(["the quikc fox"], "quick", 2)
        assert m.tolist() == [True]


class TestSetOps:
    def test_parity(self):
        rng = np.random.default_rng(5)
        a = np.unique(rng.integers(0, 1000, 300)).astype(np.int32)
        b = np.unique(rng.integers(0, 1000, 300)).astype(np.int32)
        assert native.intersect_sorted(a, b).tolist() == \
            np.intersect1d(a, b).tolist()
        assert native.union_sorted(a, b).tolist() == \
            np.union1d(a, b).tolist()
        assert native.difference_sorted(a, b).tolist() == \
            np.setdiff1d(a, b).tolist()


class TestHybridNgrams:
    def test_parity_with_python(self):
        cases = ["hello world", "日本ab", "ab日", "アイウ", "a", "",
                 "Test카page日本語mixed"]
        for text in cases:
            for cross in (True, False):
                py = textproc.generate_hybrid_ngrams(text, 2, 1, cross)
                out = native.hybrid_ngrams(text, 2, 1, cross)
                assert out is not None
                starts, lens, hashes = out
                got = [text[s:s + l] for s, l in
                       zip(starts.tolist(), lens.tolist())]
                assert got == py, (text, cross)
                # hash uniqueness should match gram uniqueness
                assert len(set(hashes.tolist())) == len(set(py))


class TestHybridNgramsRandomDifferential:
    def test_random_unicode_parity(self):
        """Differential fuzz: native shredder vs the Python reference over
        randomized mixed-script text (ASCII / kana / kanji / Hangul /
        symbols / astral), every (n, kanji_n, cross) combination."""
        rng = np.random.default_rng(99)
        pools = [
            list("abc def XYZ 012"),
            list("あいうカキク"),
            list("日本語検索高速"),
            list("한국어페이지"),
            list("—·★〜ｱｲ"),
            ["𝄞", "🎵"],  # astral plane
        ]
        for case in range(150):
            n = int(rng.integers(1, 30))
            chars = []
            for _ in range(n):
                pool = pools[int(rng.integers(0, len(pools)))]
                chars.append(pool[int(rng.integers(0, len(pool)))])
            text = "".join(chars)
            ngram = int(rng.integers(1, 4))
            kanji_n = int(rng.integers(1, 3))
            cross = bool(rng.integers(0, 2))
            py = textproc.generate_hybrid_ngrams(text, ngram, kanji_n, cross)
            out = native.hybrid_ngrams(text, ngram, kanji_n, cross)
            if out is None:
                continue  # native lib unavailable in this env
            starts, lens, hashes = out
            got = [text[s:s + l] for s, l in
                   zip(starts.tolist(), lens.tolist())]
            assert got == py, (text, ngram, kanji_n, cross)
            # FNV hash collisions across DISTINCT grams would silently
            # merge posting lists — require injectivity on this corpus
            seen = {}
            for g, h in zip(got, hashes.tolist()):
                assert seen.setdefault(h, g) == g, (g, seen[h])

    def test_batch_matches_per_doc(self):
        texts = ["quick 日本 brown", "アイウエオ", "", "x", "検索エンジン高速化"]
        out = native.shred_batch(texts, 2, 1, True)
        if out is None:
            return
        flat, starts, lens, hashes, counts = out
        pos = 0
        for t, c in zip(texts, counts.tolist()):
            per_doc = set()
            single = native.hybrid_ngrams(t, 2, 1, True)
            if single is not None:
                _, _, h1 = single
                per_doc = set(h1.tolist())
            batch_h = set(hashes[pos:pos + c].tolist())
            assert batch_h == per_doc, t
            pos += c
