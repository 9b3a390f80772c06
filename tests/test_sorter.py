"""ResultSorter behavior suite (reference tests/query/result_sorter_test
+ result_sorter_asc_desc_test ported case-for-case)."""

import numpy as np

from mygramdb_tpu.query.parser import OrderByClause, SortOrder
from mygramdb_tpu.query.sorter import ResultSorter
from mygramdb_tpu.storage.document_store import DocumentStore


def make_store(rows):
    """rows: list of (pk, filters)"""
    s = DocumentStore(store_texts=False)
    ids = []
    for pk, filters in rows:
        doc_id, _ = s.add_document(pk, filters)
        ids.append(doc_id)
    return s, np.asarray(ids, dtype=np.int32)


def srt(ids, store, column=None, order="DESC", limit=0, offset=0,
        pk_order_valid=True):
    ob = None
    if column is not None:
        ob = OrderByClause(column=column, order=SortOrder[order])
    else:
        ob = OrderByClause(order=SortOrder[order])
    out = ResultSorter.sort_and_paginate(
        np.sort(ids), ob, limit, offset, store,
        pk_order_valid=pk_order_valid)
    return list(out)


class TestPrimaryKeySort:
    def test_pk_desc_default(self):
        s, ids = make_store([(str(i), {}) for i in range(1, 6)])
        assert srt(ids, s) == [5, 4, 3, 2, 1]

    def test_pk_asc(self):
        s, ids = make_store([(str(i), {}) for i in range(1, 6)])
        assert srt(ids, s, order="ASC") == [1, 2, 3, 4, 5]

    def test_numeric_pk_not_lexicographic(self):
        # insert out of numeric order so doc-id order != numeric PK order
        s, ids = make_store([("9", {}), ("10", {}), ("2", {})])
        assert srt(ids, s, order="ASC", pk_order_valid=False) == [3, 1, 2]
        assert srt(ids, s, order="DESC", pk_order_valid=False) == [2, 1, 3]

    def test_string_pk_lexicographic(self):
        s, ids = make_store([("banana", {}), ("apple", {}),
                             ("cherry", {})])
        assert srt(ids, s, order="ASC", pk_order_valid=False) == [2, 1, 3]

    def test_mixed_numeric_and_string_pks(self):
        # numeric PKs sort numerically, non-numeric group separately —
        # must not raise (reference MixedNumericAndNonNumericPrimaryKeys)
        s, ids = make_store([("10", {}), ("apple", {}), ("2", {})])
        out = srt(ids, s, order="ASC", pk_order_valid=False)
        assert sorted(out) == sorted(ids.tolist())


class TestFilterColumnSort:
    def test_sort_by_filter_column(self):
        s, ids = make_store([("a", {"score": 30}), ("b", {"score": 10}),
                             ("c", {"score": 20})])
        assert srt(ids, s, column="score", order="ASC") == [2, 3, 1]
        assert srt(ids, s, column="score", order="DESC") == [1, 3, 2]

    def test_ties_break_by_doc_id_in_sort_direction(self):
        s, ids = make_store([(p, {"score": 10}) for p in "abc"])
        assert srt(ids, s, column="score", order="ASC") == [1, 2, 3]
        assert srt(ids, s, column="score", order="DESC") == [3, 2, 1]

    def test_nulls_last_both_directions(self):
        s, ids = make_store([("a", {"score": 5}), ("b", {}),
                             ("c", {"score": 1})])
        asc = srt(ids, s, column="score", order="ASC")
        desc = srt(ids, s, column="score", order="DESC")
        assert asc == [3, 1, 2]
        assert desc == [1, 3, 2]

    def test_unknown_column_values_all_null(self):
        s, ids = make_store([("a", {"x": 1}), ("b", {"x": 2})])
        out = srt(ids, s, column="nope", order="ASC")
        assert sorted(out) == sorted(ids.tolist())


class TestPagination:
    def test_limit(self):
        s, ids = make_store([(str(i), {}) for i in range(1, 11)])
        assert srt(ids, s, order="ASC", limit=3) == [1, 2, 3]

    def test_offset(self):
        s, ids = make_store([(str(i), {}) for i in range(1, 11)])
        assert srt(ids, s, order="ASC", limit=3, offset=4) == [5, 6, 7]

    def test_offset_past_end(self):
        s, ids = make_store([(str(i), {}) for i in range(1, 4)])
        assert srt(ids, s, order="ASC", limit=10, offset=50) == []

    def test_empty_results(self):
        s, _ = make_store([("1", {})])
        out = ResultSorter.sort_and_paginate(
            np.empty(0, dtype=np.int32), OrderByClause(), 10, 0, s)
        assert list(out) == []


class TestScoreSort:
    def test_score_desc_with_docid_tiebreak(self):
        ids = [1, 2, 3, 4]
        scores = [1.0, 3.0, 1.0, 2.0]
        assert ResultSorter.sort_by_score(ids, scores) == [2, 4, 3, 1]

    def test_score_asc(self):
        ids = [1, 2, 3]
        scores = [3.0, 1.0, 2.0]
        assert ResultSorter.sort_by_score(ids, scores,
                                          descending=False) == [2, 3, 1]
