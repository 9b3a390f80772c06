"""Unit tests: highlighter, synonyms, normalizer, response formatter."""

import pytest

from mygramdb_tpu.query.highlighter import Highlighter
from mygramdb_tpu.query.normalizer import QueryNormalizer
from mygramdb_tpu.query.parser import (HighlightOptions, Query, QueryParser,
                                       QueryType)
from mygramdb_tpu.query.synonyms import SynonymDictionary
from mygramdb_tpu.server import response_formatter as fmt

P = QueryParser()


class TestHighlighter:
    def make(self, **kw):
        return Highlighter(HighlightOptions(**kw))

    def test_basic_wrap(self):
        h = self.make(open_tag="<b>", close_tag="</b>")
        out = h.snippet("the quick brown fox", ["quick"])
        assert "<b>quick</b>" in out

    def test_no_match_head(self):
        h = self.make(snippet_length=10)
        out = h.snippet("a long document text here", ["zzz"])
        assert out.startswith("a long doc")
        assert out.endswith("...")

    def test_multiple_matches_merge(self):
        h = self.make(snippet_length=100)
        out = h.snippet("alpha x beta y alpha", ["alpha", "beta"])
        assert out.count("<em>") == 3

    def test_window_ellipsis(self):
        h = self.make(snippet_length=10)
        text = "x" * 50 + " match " + "y" * 50
        out = h.snippet(text, ["match"])
        assert out.startswith("...")
        assert out.endswith("...")
        assert "<em>match</em>" in out

    def test_max_fragments(self):
        h = self.make(snippet_length=6, max_fragments=2)
        text = "aa match bb" + "z" * 40 + "cc match dd" + "z" * 40 + \
            "ee match ff"
        out = h.snippet(text, ["match"])
        assert out.count("<em>") <= 2

    def test_non_overlapping_spans(self):
        h = self.make()
        out = h.snippet("aaaa", ["aa"])
        # two non-overlapping matches, not three
        assert out.count("<em>") == 2


class TestSynonyms:
    def test_load_and_expand(self):
        syn = SynonymDictionary()
        n = syn.load_from_text(
            "# comment line\n"
            "fox\twolf\tcanine\n"
            "cat\tfeline\n"
            "\n"
            "single\n")  # <2 terms: ignored
        assert n == 2
        assert syn.group_count == 2
        assert set(syn.expand("fox")) == {"fox", "wolf", "canine"}
        assert set(syn.expand("feline")) == {"cat", "feline"}
        assert syn.expand("dog") == ["dog"]
        assert syn.has("wolf") and not syn.has("dog")

    def test_normalization_applied(self):
        syn = SynonymDictionary(normalize=str.lower)
        syn.load_from_text("FOX\tWolf\n")
        assert syn.has("fox")
        assert set(syn.expand("FOX")) == {"fox", "wolf"}

    def test_multi_group_term(self):
        syn = SynonymDictionary()
        syn.load_from_text("a\tb\nb\tc\n")
        assert set(syn.expand("b")) == {"a", "b", "c"}


class TestQueryNormalizer:
    def setup_method(self):
        self.norm = QueryNormalizer(lambda s: s.lower())

    def test_limit_offset_sort_excluded(self):
        q1 = P.parse("SEARCH t hello LIMIT 10 OFFSET 5 SORT id ASC")
        q2 = P.parse("SEARCH t hello LIMIT 99")
        assert self.norm.cache_key(q1) == self.norm.cache_key(q2)

    def test_filters_sorted(self):
        q1 = P.parse("SEARCH t x FILTER a = 1 FILTER b = 2")
        q2 = P.parse("SEARCH t x FILTER b = 2 FILTER a = 1")
        assert self.norm.cache_key(q1) == self.norm.cache_key(q2)

    def test_terms_normalized(self):
        q1 = P.parse("SEARCH t HELLO")
        q2 = P.parse("SEARCH t hello")
        assert self.norm.cache_key(q1) == self.norm.cache_key(q2)

    def test_different_queries_differ(self):
        pairs = [("SEARCH t a", "SEARCH t b"),
                 ("SEARCH t a", "COUNT t a"),
                 ("SEARCH t a", "SEARCH t a AND b"),
                 ("SEARCH t a", "SEARCH t a NOT b"),
                 ("SEARCH t a", "SEARCH t a FUZZY 1"),
                 ("SEARCH t a FILTER s = 1", "SEARCH t a FILTER s = 2")]
        for l1, l2 in pairs:
            assert self.norm.cache_key(P.parse(l1)) != \
                self.norm.cache_key(P.parse(l2)), (l1, l2)


class TestResponseFormatter:
    def test_search(self):
        assert fmt.format_search(3, ["10", "2", None]) == "OK RESULTS 3 10 2"

    def test_pk_sanitized(self):
        assert fmt.format_search(1, ["a b\tc"]) == "OK RESULTS 1 a_b_c"

    def test_count(self):
        assert fmt.format_count(42) == "OK COUNT 42"

    def test_doc_quoting(self):
        out = fmt.format_doc("7", {"name": 'va"l ue', "n": 3,
                                   "f": 2.5, "x": None, "b": True})
        assert out.startswith("OK DOC 7")
        assert 'name="va\\"l ue"' in out
        assert "n=3" in out and "f=2.5" in out
        assert "x=NULL" in out and "b=1" in out

    def test_facet(self):
        out = fmt.format_facet([("a", 3), ("b\tc", 1)])
        lines = out.split("\r\n")
        assert lines[0] == "OK FACET 2"
        assert lines[1] == "a\t3"
        assert lines[2] == "b c\t1"

    def test_error(self):
        assert fmt.format_error("boom") == "ERROR boom"

    def test_sections_end(self):
        out = fmt.format_sections("OK INFO", [("S", [("k", "v")])])
        assert out.startswith("OK INFO\r\n\r\n# S\r\nk: v")
        assert out.endswith("END")

    def test_escape_control_chars(self):
        assert fmt.escape_value("a\x01b") == '"a\\x01b"'
        assert fmt.escape_value("plain") == "plain"
        assert fmt.escape_value("") == '""'
