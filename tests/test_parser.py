"""Query parser tests (reference tests/query tier)."""

import pytest

from mygramdb_tpu.query import (QueryParser, QueryType, FilterOp, SortOrder)
from mygramdb_tpu.query.ast import (QueryASTParser, NodeType,
                                    contains_boolean_syntax)
from mygramdb_tpu.utils.errors import QueryParseError

P = QueryParser(default_limit=100)


class TestSearchParsing:
    def test_basic(self):
        q = P.parse('SEARCH articles hello')
        assert q.type == QueryType.SEARCH
        assert q.table == "articles"
        assert q.search_text == "hello"
        assert q.limit == 100 and not q.limit_explicit
        assert q.order_by is None

    def test_quoted_multiword(self):
        q = P.parse('SEARCH articles "hello world"')
        assert q.search_text == "hello world"

    def test_unquoted_multiword(self):
        q = P.parse('SEARCH articles hello world')
        assert q.search_text == "hello world"

    def test_and_not_clauses(self):
        q = P.parse('SEARCH t alpha AND beta NOT gamma')
        assert q.search_text == "alpha"
        assert q.and_terms == ["beta"]
        assert q.not_terms == ["gamma"]

    def test_filter(self):
        q = P.parse('SEARCH t x FILTER status = 1 FILTER score >= 2.5')
        assert len(q.filters) == 2
        assert q.filters[0].column == "status"
        assert q.filters[0].op == FilterOp.EQ
        assert q.filters[0].value == "1"
        assert q.filters[1].op == FilterOp.GTE

    def test_sort_limit_offset(self):
        q = P.parse('SEARCH t x SORT id ASC LIMIT 10 OFFSET 5')
        assert q.order_by.column == "id"
        assert q.order_by.order == SortOrder.ASC
        assert q.limit == 10 and q.limit_explicit
        assert q.offset == 5 and q.offset_explicit

    def test_limit_comma(self):
        q = P.parse('SEARCH t x LIMIT 20,30')
        assert q.offset == 20 and q.limit == 30

    def test_sort_score(self):
        q = P.parse('SEARCH t x SORT _score DESC')
        assert q.order_by.is_score

    def test_highlight(self):
        q = P.parse('SEARCH t x HIGHLIGHT TAG <b> </b> SNIPPET_LEN 50')
        assert q.highlight.open_tag == "<b>"
        assert q.highlight.close_tag == "</b>"
        assert q.highlight.snippet_length == 50

    def test_fuzzy(self):
        q = P.parse('SEARCH t hello FUZZY 2')
        assert q.fuzzy_max_distance == 2
        q = P.parse('SEARCH t hello FUZZY')
        assert q.fuzzy_max_distance == 1
        with pytest.raises(QueryParseError):
            P.parse('SEARCH t hello FUZZY 3')

    def test_boolean_expression_kept_whole(self):
        q = P.parse('SEARCH t alpha OR beta LIMIT 5')
        assert q.search_text == "alpha OR beta"
        assert q.and_terms == []
        q = P.parse('SEARCH t alpha AND (x OR y)')
        assert q.search_text == "alpha AND (x OR y)"

    def test_order_by_rejected(self):
        with pytest.raises(QueryParseError, match="SORT"):
            P.parse('SEARCH t x ORDER BY id')

    def test_paren_balance(self):
        with pytest.raises(QueryParseError, match="Unclosed"):
            P.parse('SEARCH t (a OR b')
        with pytest.raises(QueryParseError, match="Unmatched"):
            P.parse('SEARCH t a) OR b')

    def test_multi_table_rejected(self):
        with pytest.raises(QueryParseError, match="Multiple tables"):
            P.parse('SEARCH a,b x')

    def test_count(self):
        q = P.parse('COUNT t hello')
        assert q.type == QueryType.COUNT
        assert q.limit == 0

    def test_missing_text(self):
        with pytest.raises(QueryParseError):
            P.parse('SEARCH t')


class TestOtherCommands:
    def test_get(self):
        q = P.parse('GET articles 42')
        assert q.type == QueryType.GET and q.primary_key == "42"

    def test_info(self):
        assert P.parse('INFO').type == QueryType.INFO

    def test_dump(self):
        q = P.parse('DUMP SAVE /tmp/x.dmp --with-stats')
        assert q.type == QueryType.DUMP_SAVE
        assert q.filepath == "/tmp/x.dmp" and q.dump_with_stats
        assert P.parse('DUMP LOAD /x').type == QueryType.DUMP_LOAD
        assert P.parse('DUMP VERIFY /x').type == QueryType.DUMP_VERIFY
        assert P.parse('DUMP STATUS').type == QueryType.DUMP_STATUS
        with pytest.raises(QueryParseError):
            P.parse('DUMP LOAD')
        with pytest.raises(QueryParseError):
            P.parse('DUMP FROB')

    def test_legacy_save_load(self):
        assert P.parse('SAVE').type == QueryType.SAVE
        assert P.parse('LOAD /f').filepath == "/f"

    def test_replication(self):
        assert P.parse('REPLICATION STATUS').type == \
            QueryType.REPLICATION_STATUS
        assert P.parse('REPLICATION STOP').type == QueryType.REPLICATION_STOP
        assert P.parse('REPLICATION START').type == QueryType.REPLICATION_START

    def test_sync(self):
        assert P.parse('SYNC').type == QueryType.SYNC
        q = P.parse('SYNC articles')
        assert q.type == QueryType.SYNC and q.table == "articles"
        assert P.parse('SYNC STATUS').type == QueryType.SYNC_STATUS
        q = P.parse('SYNC STOP articles')
        assert q.type == QueryType.SYNC_STOP and q.table == "articles"

    def test_config(self):
        assert P.parse('CONFIG').type == QueryType.CONFIG_SHOW
        assert P.parse('CONFIG HELP').type == QueryType.CONFIG_HELP
        assert P.parse('CONFIG SHOW api').filepath == "api"
        with pytest.raises(QueryParseError):
            P.parse('CONFIG VERIFY')

    def test_optimize_debug_cache(self):
        assert P.parse('OPTIMIZE').type == QueryType.OPTIMIZE
        assert P.parse('OPTIMIZE t').table == "t"
        assert P.parse('DEBUG ON').type == QueryType.DEBUG_ON
        assert P.parse('DEBUG OFF').type == QueryType.DEBUG_OFF
        assert P.parse('CACHE CLEAR').type == QueryType.CACHE_CLEAR
        assert P.parse('CACHE STATS').type == QueryType.CACHE_STATS
        assert P.parse('CACHE ENABLE').type == QueryType.CACHE_ENABLE
        assert P.parse('CACHE DISABLE').type == QueryType.CACHE_DISABLE

    def test_set_show(self):
        q = P.parse('SET cache.enabled = true, api.default_limit = 50')
        assert q.type == QueryType.SET
        assert q.variable_assignments == [("cache.enabled", "true"),
                                          ("api.default_limit", "50")]
        q = P.parse("SHOW VARIABLES LIKE 'cache.%'")
        assert q.type == QueryType.SHOW_VARIABLES
        assert q.variable_like_pattern == "cache.%"

    def test_facet(self):
        q = P.parse('FACET articles category hello FILTER status = 1')
        assert q.type == QueryType.FACET
        assert q.facet_column == "category"
        assert q.search_text == "hello"
        assert q.filters[0].column == "status"
        q2 = P.parse('FACET articles category')
        assert q2.search_text == ""

    def test_unknown(self):
        with pytest.raises(QueryParseError, match="unknown command"):
            P.parse('FROBNICATE x')


class TestBooleanAst:
    def test_detection(self):
        assert contains_boolean_syntax("a OR b")
        assert contains_boolean_syntax("a AND b")
        assert contains_boolean_syntax("NOT a")
        assert not contains_boolean_syntax("hello world")
        assert not contains_boolean_syntax("and or not")  # lowercase

    def test_parse_precedence(self):
        ast = QueryASTParser().parse("a OR b AND c")
        assert ast.type == NodeType.OR
        assert ast.children[0].term == "a"
        assert ast.children[1].type == NodeType.AND

    def test_parens(self):
        ast = QueryASTParser().parse("(a OR b) AND c")
        assert ast.type == NodeType.AND
        assert ast.children[0].type == NodeType.OR

    def test_not(self):
        ast = QueryASTParser().parse("a NOT b")
        # implicit AND between a and NOT b
        assert ast.type == NodeType.AND
        assert ast.children[1].type == NodeType.NOT

    def test_quoted_term(self):
        ast = QueryASTParser().parse('"hello world" OR x')
        assert ast.children[0].term == "hello world"

    def test_error(self):
        p = QueryASTParser()
        assert p.parse("a OR") is None
        assert p.error

    def test_evaluate(self):
        import numpy as np
        data = {"a": [1, 2, 3], "b": [2, 3, 4], "c": [3]}

        def search(term):
            return np.asarray(data.get(term, []), dtype=np.int32)

        def universe():
            return np.asarray([1, 2, 3, 4, 5], dtype=np.int32)

        ast = QueryASTParser().parse("a AND b")
        assert ast.evaluate(search, universe).tolist() == [2, 3]
        ast = QueryASTParser().parse("a OR c")
        assert ast.evaluate(search, universe).tolist() == [1, 2, 3]
        ast = QueryASTParser().parse("a NOT b")
        assert ast.evaluate(search, universe).tolist() == [1]
        ast = QueryASTParser().parse("NOT a")
        assert ast.evaluate(search, universe).tolist() == [4, 5]

    def test_matches_text(self):
        ast = QueryASTParser().parse("aa AND (bb OR cc)")
        assert ast.matches_text(lambda t: t in "xxaabbxx")
        assert not ast.matches_text(lambda t: t in "xxaaxx")

    def test_term_cap(self):
        p = QueryASTParser()
        expr = " OR ".join(f"t{i}" for i in range(70))
        assert p.parse(expr) is None
        assert "too many terms" in p.error


class TestQuotedRegions:
    """Quoted regions are literal search text: never clause keywords,
    never boolean operators (reference quoted-region semantics,
    http_server_search_test.cpp:1604+)."""

    def test_quoted_phrase_not_boolean(self):
        q = P.parse('SEARCH t "foo AND bar"')
        assert q.search_text == "foo AND bar"
        assert q.search_text_quoted is True

    def test_quoted_clause_keyword_is_text(self):
        q = P.parse('SEARCH t "LIMIT"')
        assert q.search_text == "LIMIT"
        assert q.search_text_quoted is True
        assert q.limit_explicit is False

    def test_quoted_keyword_mid_text(self):
        q = P.parse('SEARCH t hello "LIMIT" world')
        assert q.search_text == "hello LIMIT world"
        assert q.search_text_quoted is True

    def test_unquoted_keyword_still_clause(self):
        q = P.parse("SEARCH t hello LIMIT 5")
        assert q.search_text == "hello"
        assert q.limit == 5

    def test_boolean_with_quoted_operand(self):
        # top-level AND becomes an and_terms clause; the quoted operand
        # stays one literal term with its space preserved
        q = P.parse('SEARCH t (a OR b) AND "c d"')
        assert q.search_text == "(a OR b)"
        assert q.and_terms == ["c d"]
        assert q.search_text_quoted is False

    def test_unquoted_boolean_unchanged(self):
        q = P.parse("SEARCH t (a OR b) AND c")
        assert q.search_text == "(a OR b)"
        assert q.and_terms == ["c"]
        assert q.search_text_quoted is False

    def test_top_level_or_with_quoted_operand(self):
        q = P.parse('SEARCH t "x y" OR b')
        assert q.search_text == '"x y" OR b'
        assert q.search_text_quoted is False

    def test_quoted_parens_are_text(self):
        q = P.parse('SEARCH t "(x)"')
        assert q.search_text == "(x)"
        assert q.search_text_quoted is True


class TestParseSearchExpression:
    """HTTP q-field parsing (parse_search_expression)."""

    def _pse(self, text):
        from mygramdb_tpu.query.parser import parse_search_expression
        return parse_search_expression(text)

    def test_plain(self):
        assert self._pse("hello world") == ("hello world", False)

    def test_quoted_phrase(self):
        assert self._pse('"hello world"') == ("hello world", True)

    def test_quoted_keeps_keyword_literal(self):
        st, quoted = self._pse('"machine LIMIT learning"')
        assert st == "machine LIMIT learning" and quoted

    def test_boolean_allowed(self):
        st, quoted = self._pse("machine AND learning")
        assert st == "machine AND learning" and not quoted

    def test_clause_keyword_rejected(self):
        import pytest
        from mygramdb_tpu.utils.errors import QueryParseError
        with pytest.raises(QueryParseError):
            self._pse("hello LIMIT 5")

    def test_filter_keyword_rejected(self):
        import pytest
        from mygramdb_tpu.utils.errors import QueryParseError
        with pytest.raises(QueryParseError):
            self._pse("hello FILTER status = 1")

    def test_unbalanced_parens_rejected(self):
        import pytest
        from mygramdb_tpu.utils.errors import QueryParseError
        with pytest.raises(QueryParseError):
            self._pse("(a OR b")


class TestCompoundFilters:
    """Single-token filter forms from the reference README/CLI surface
    (reference ParseFilterArguments, query_parser_clauses.cpp:96-173)."""

    def test_attached_value(self):
        q = P.parse("SEARCH t x FILTER status=1 LIMIT 5")
        f = q.filters[0]
        assert (f.column, f.op.value, f.value) == ("status", "=", "1")
        assert q.limit == 5

    def test_attached_op_only(self):
        q = P.parse("SEARCH t x FILTER status= 1")
        f = q.filters[0]
        assert (f.column, f.op.value, f.value) == ("status", "=", "1")

    def test_two_char_ops(self):
        for expr, op in (("a>=2", ">="), ("a<=2", "<="), ("a!=2", "!="),
                         ("a<>2", "!=")):
            q = P.parse(f"SEARCH t x FILTER {expr}")
            f = q.filters[0]
            assert (f.column, f.op.value, f.value) == ("a", op, "2"), expr

    def test_ge_not_split_as_gt(self):
        # 'a>=2' must not parse as op '>' value '=2'
        q = P.parse("SEARCH t x FILTER a>=2")
        assert q.filters[0].op.value == ">="

    def test_spaced_form_unchanged(self):
        q = P.parse("SEARCH t x FILTER status = 1")
        f = q.filters[0]
        assert (f.column, f.op.value, f.value) == ("status", "=", "1")

    def test_value_looking_like_op_rejected(self):
        import pytest
        from mygramdb_tpu.utils.errors import QueryParseError
        with pytest.raises(QueryParseError):
            P.parse("SEARCH t x FILTER status= =1")

    def test_column_length_cap(self):
        import pytest
        from mygramdb_tpu.utils.errors import QueryParseError
        with pytest.raises(QueryParseError):
            P.parse(f"SEARCH t x FILTER {'c' * 129}=1")

    def test_value_length_cap(self):
        import pytest
        from mygramdb_tpu.utils.errors import QueryParseError
        with pytest.raises(QueryParseError):
            P.parse(f"SEARCH t x FILTER c={'v' * 1025}")
