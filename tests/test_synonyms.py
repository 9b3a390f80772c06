"""SynonymDictionary behavior suite (reference
tests/query/synonym_dictionary_test.cpp ported case-for-case)."""

import pytest

from mygramdb_tpu.query.synonyms import SynonymDictionary


def make(text, normalize=lambda s: s):
    d = SynonymDictionary(normalize)
    n = d.load_from_text(text)
    return d, n


class TestLoading:
    def test_basic_groups(self):
        d, n = make("car\tautomobile\tvehicle\nfast\tquick\n")
        assert n == 2 and d.group_count == 2

    def test_file_loading(self, tmp_path):
        p = tmp_path / "syn.tsv"
        p.write_text("dog\tcanine\n", encoding="utf-8")
        d = SynonymDictionary()
        assert d.load_from_file(str(p)) == 1
        assert d.expand("dog") == ["dog", "canine"]

    def test_file_not_found(self):
        d = SynonymDictionary()
        with pytest.raises(OSError):
            d.load_from_file("/nonexistent/syn.tsv")

    def test_empty_file(self):
        d, n = make("")
        assert n == 0 and d.group_count == 0

    def test_comments_and_blank_lines(self):
        d, n = make("# comment line\n\n  \ncar\tauto\n# another\n")
        assert n == 1

    def test_single_term_line_skipped(self):
        d, n = make("lonely\ncar\tauto\n")
        assert n == 1
        assert d.expand("lonely") == ["lonely"]

    def test_duplicate_terms_in_group_deduped(self):
        d, _ = make("car\tauto\tcar\tauto\n")
        assert d.expand("car") == ["car", "auto"]

    def test_normalization_applied_at_load(self):
        d, _ = make("CAR\tAutomobile\n", normalize=str.lower)
        assert d.expand("Car") == ["car", "automobile"]


class TestExpansion:
    def test_expand_returns_group(self):
        d, _ = make("car\tautomobile\tvehicle\n")
        assert d.expand("automobile") == ["car", "automobile", "vehicle"]

    def test_bidirectional(self):
        d, _ = make("big\tlarge\n")
        assert set(d.expand("big")) == {"big", "large"}
        assert set(d.expand("large")) == {"big", "large"}

    def test_unknown_term_returns_itself(self):
        d, _ = make("car\tauto\n")
        assert d.expand("plane") == ["plane"]

    def test_multiple_groups_union(self):
        # a term in two groups expands to the union
        d, _ = make("bank\tshore\nbank\tlender\n")
        assert d.expand("bank") == ["bank", "shore", "lender"]

    def test_has(self):
        d, _ = make("car\tauto\n")
        assert d.has("car") and d.has("auto")
        assert not d.has("boat")

    def test_clear(self):
        d, _ = make("car\tauto\n")
        d.clear()
        assert d.group_count == 0
        assert d.expand("car") == ["car"]

    def test_cjk_group(self):
        d, _ = make("東京\tTokyo\n", normalize=str.lower)
        assert d.expand("東京") == ["東京", "tokyo"]
