"""Highlighter behavior suite (reference tests/query/highlighter_test.cpp
ported case-for-case; spans operate on code points, so the UTF-8 byte
cases become code-point cases)."""

from mygramdb_tpu.query.highlighter import Highlighter, _find_spans
from mygramdb_tpu.query.parser import HighlightOptions


def hl(text, terms, **opts):
    o = HighlightOptions()
    for k, v in opts.items():
        setattr(o, k, v)
    return Highlighter(o).snippet(text, terms)


class TestFindSpans:
    def test_single_term(self):
        assert _find_spans("hello world", ["world"]) == [(6, 11)]

    def test_multiple_terms(self):
        assert _find_spans("hello beautiful world",
                           ["hello", "world"]) == [(0, 5), (16, 21)]

    def test_no_match(self):
        assert _find_spans("hello", ["xyz"]) == []

    def test_overlapping_matches_non_overlapping_result(self):
        # "aa" in "aaa" matches once at 0
        assert _find_spans("aaa", ["aa"]) == [(0, 2)]

    def test_same_start_keeps_longest(self):
        assert _find_spans("hello world", ["he", "hello"]) == [(0, 5)]

    def test_cjk_codepoint_spans(self):
        assert _find_spans("東京タワー", ["東京"]) == [(0, 2)]

    def test_empty_term(self):
        assert _find_spans("hello", [""]) == []

    def test_empty_text(self):
        assert _find_spans("", ["hello"]) == []


class TestSnippet:
    def test_basic(self):
        assert hl("hello world", ["hello"]) == "<em>hello</em> world"

    def test_multiple_terms(self):
        assert hl("hello beautiful world", ["hello", "world"]) == \
            "<em>hello</em> beautiful <em>world</em>"

    def test_no_match_prefix_with_ellipsis(self):
        assert hl("hello beautiful world", ["xyz"],
                  snippet_length=10) == "hello beau..."

    def test_empty_text(self):
        assert hl("", ["hello"]) == ""

    def test_empty_terms_full_text(self):
        assert hl("hello world", []) == "hello world"

    def test_custom_tags(self):
        assert hl("hello world", ["hello"], open_tag="<b>",
                  close_tag="</b>") == "<b>hello</b> world"

    def test_short_snippet_mid_match_has_ellipses(self):
        text = "aaaaaaaaaa bbbbbbbbbb cccc dddd eeeeeeeeee"
        out = hl(text, ["cccc"], snippet_length=10)
        assert "<em>cccc</em>" in out
        assert out.startswith("...") and out.endswith("...")

    def test_cjk_both_occurrences_highlighted(self):
        out = hl("東京タワーは東京にある", ["東京"])
        assert out.count("<em>東京</em>") == 2

    def test_multiple_fragments_joined_with_ellipsis(self):
        text = "A" + "x" * 198 + "B"
        out = hl(text, ["A", "B"], snippet_length=6, max_fragments=2)
        assert "<em>A</em>" in out and "<em>B</em>" in out
        assert "..." in out

    def test_max_fragments_limit(self):
        text = "alpha " + "x" * 200 + " beta"
        out = hl(text, ["alpha", "beta"], snippet_length=4,
                 max_fragments=1)
        assert "<em>alpha</em>" in out
        assert "beta</em>" not in out

    def test_match_at_beginning_no_leading_ellipsis(self):
        out = hl("keyword at the start", ["keyword"], snippet_length=20)
        assert out.startswith("<em>")

    def test_match_at_end_no_trailing_ellipsis(self):
        out = hl("at the end keyword", ["keyword"], snippet_length=20)
        assert out.endswith("</em>")
