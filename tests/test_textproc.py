"""Text processing parity tests (reference semantics per SURVEY.md §2.2)."""

from mygramdb_tpu.utils import textproc as tp
from mygramdb_tpu.utils.edit_distance import (
    levenshtein, contains_fuzzy_match, substring_within_distance)


class TestCJKDetection:
    def test_kanji_is_cjk(self):
        assert tp.is_cjk_ideograph(ord("漢"))
        assert tp.is_cjk_ideograph(ord("日"))
        assert tp.is_cjk_ideograph(0x3400)  # Ext A
        assert tp.is_cjk_ideograph(0x20000)  # Ext B
        assert tp.is_cjk_ideograph(0xF900)  # compat

    def test_kana_is_not_cjk(self):
        # Hiragana/Katakana intentionally excluded (string_utils.cpp:449)
        assert not tp.is_cjk_ideograph(ord("あ"))
        assert not tp.is_cjk_ideograph(ord("ア"))
        assert not tp.is_cjk_ideograph(ord("a"))
        assert not tp.is_cjk_ideograph(ord("1"))


class TestNormalize:
    def test_nfkc_fullwidth_ascii(self):
        assert tp.normalize_text("ＡＢＣ１２３") == "ABC123"

    def test_nfkc_halfwidth_kana_then_narrow(self):
        # NFKC: ｶﾞ -> ガ; narrow: ガ -> ｶﾞ (round trip through NFKC + narrow)
        assert tp.normalize_text("ｶﾞ", nfkc=True, width="keep") == "ガ"
        assert tp.normalize_text("ガ", nfkc=False, width="narrow") == "ｶﾞ"

    def test_narrow_ideographic_space(self):
        assert tp.normalize_text("a　b", nfkc=False, width="narrow") == "a b"

    def test_wide(self):
        assert tp.normalize_text("abc", nfkc=False, width="wide") == "ａｂｃ"
        assert tp.normalize_text("ｱ", nfkc=False, width="wide") == "ア"
        assert tp.normalize_text("ｶﾞ", nfkc=False, width="wide") == "ガ"

    def test_lower(self):
        assert tp.normalize_text("HeLLo", lower=True) == "hello"
        assert tp.normalize_text("HeLLo", lower=False) == "HeLLo"

    def test_keep_width(self):
        assert tp.normalize_text("ガ", nfkc=True, width="keep") == "ガ"

    def test_invalid_utf8_bytes(self):
        tp.reset_text_normalization_failure_count()
        assert tp.normalize_bytes(b"\xff\xfe") == ""
        assert tp.get_text_normalization_failure_count() == 1

    def test_default_pipeline_japanese(self):
        # NFKC then narrow: fullwidth ASCII -> ASCII, katakana -> halfwidth
        assert tp.normalize_text("Ｔｅｓｔカナ") == "Testｶﾅ"


class TestNgrams:
    def test_bigrams_ascii(self):
        assert tp.generate_ngrams("hello", 2) == ["he", "el", "ll", "lo"]

    def test_unigrams(self):
        assert tp.generate_ngrams("abc", 1) == ["a", "b", "c"]

    def test_short_input(self):
        assert tp.generate_ngrams("a", 2) == []
        assert tp.generate_ngrams("", 2) == []
        assert tp.generate_ngrams("ab", 0) == []

    def test_hybrid_kanji_unigram(self):
        # Kanji start -> size 1, ascii start -> size 2
        grams = tp.generate_hybrid_ngrams("日本ab", 2, 1, True)
        assert grams == ["日", "本", "ab"]

    def test_hybrid_cross_boundary_true(self):
        # 'b' starts an ascii bigram crossing into kanji -> kept when cross=True
        grams = tp.generate_hybrid_ngrams("ab日", 2, 1, True)
        assert grams == ["ab", "b日", "日"]

    def test_hybrid_cross_boundary_false(self):
        grams = tp.generate_hybrid_ngrams("ab日", 2, 1, False)
        assert grams == ["ab", "日"]

    def test_hybrid_kana_uses_ascii_size(self):
        # Kana is NOT CJK-ideograph: uses ascii size 2
        grams = tp.generate_hybrid_ngrams("アイウ", 2, 1, True)
        assert grams == ["アイ", "イウ"]

    def test_query_ngrams_dispatch(self):
        assert tp.generate_query_ngrams("hello", 2, 0) == \
            ["he", "el", "ll", "lo"]
        assert tp.generate_query_ngrams("日本", 2, 1) == ["日", "本"]
        # ngram_size 0 with kanji set -> effective ascii size 2
        assert tp.generate_query_ngrams("abc", 0, 1) == ["ab", "bc"]

    def test_hybrid_tail_too_short(self):
        # trailing ascii char can't form a bigram
        grams = tp.generate_hybrid_ngrams("a日", 2, 1, True)
        assert grams == ["a日", "日"]


class TestEditDistance:
    def test_basic(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("abc", "abc") == 0
        assert levenshtein("", "abc") == 3

    def test_early_termination(self):
        assert levenshtein("kitten", "sitting", max_distance=1) == 2

    def test_unicode(self):
        assert levenshtein("日本語", "日本話") == 1

    def test_contains_fuzzy(self):
        assert contains_fuzzy_match("the quick brown fox", "quik", 1)
        assert not contains_fuzzy_match("the quick brown fox", "quik", 0)

    def test_substring_within_distance(self):
        assert substring_within_distance("hello world", "wrld", 1)
        assert not substring_within_distance("hello world", "xyz", 1)


class TestUtf8:
    def test_sanitize(self):
        assert tp.sanitize_utf8(b"ab\xffcd") == "ab�cd"

    def test_valid(self):
        assert tp.is_valid_utf8("日本語".encode("utf-8"))
        assert not tp.is_valid_utf8(b"\xc0\x80")

    def test_format_bytes(self):
        assert tp.format_bytes(0) == "0B"
        assert tp.format_bytes(512) == "512B"
        assert tp.format_bytes(2048) == "2.0KB"
