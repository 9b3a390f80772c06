"""DocumentStore + FilterIndex tests (reference storage/ semantics)."""

import numpy as np

from mygramdb_tpu.storage import DocumentStore, FilterIndex


class TestDocumentStore:
    def test_add_and_lookup(self):
        ds = DocumentStore()
        d1, ins = ds.add_document("10", {"status": 1}, "hello")
        assert d1 == 1 and ins
        d2, ins2 = ds.add_document("20", {}, "world")
        assert d2 == 2 and ins2
        assert ds.doc_id("10") == 1
        assert ds.primary_key(2) == "20"
        assert ds.count == 2

    def test_insert_or_ignore(self):
        ds = DocumentStore()
        d1, _ = ds.add_document("10", {}, "a")
        d1b, ins = ds.add_document("10", {}, "b")
        assert d1b == d1 and not ins
        assert ds.text(d1) == "a"  # ignored, not replaced

    def test_doc_ids_start_at_one(self):
        ds = DocumentStore()
        d, _ = ds.add_document("x")
        assert d == 1

    def test_remove(self):
        ds = DocumentStore()
        ds.add_document("1")
        ds.add_document("2")
        assert ds.remove_by_pk("1") == 1
        assert ds.doc_id("1") is None
        assert ds.count == 1
        assert not ds.remove_document(1)

    def test_pk_order_valid_numeric(self):
        ds = DocumentStore()
        for pk in ["1", "2", "10"]:  # numeric-aware: 2 < 10
            ds.add_document(pk)
        assert ds.pk_doc_id_order_valid

    def test_pk_order_invalid(self):
        ds = DocumentStore()
        ds.add_document("5")
        ds.add_document("3")
        assert not ds.pk_doc_id_order_valid

    def test_texts_disabled(self):
        ds = DocumentStore(store_texts=False)
        ds.add_document("1", {}, "secret")
        assert ds.text(1) is None

    def test_get_document(self):
        ds = DocumentStore()
        ds.add_document("7", {"status": 3, "cat": "news"}, "txt")
        doc = ds.get_document("7")
        assert doc.primary_key == "7"
        assert doc.filters == {"status": 3, "cat": "news"}
        assert doc.text == "txt"
        assert ds.get_document("8") is None

    def test_state_roundtrip(self):
        ds = DocumentStore()
        ds.add_document("1", {"s": 1}, "one")
        ds.add_document("2", {"s": 2}, "two")
        ds.remove_by_pk("1")
        st = ds.state()
        ds2 = DocumentStore.from_state(st)
        assert ds2.count == 1
        assert ds2.doc_id("2") == 2
        assert ds2.next_doc_id == 3
        assert ds2.text(2) == "two"

    def test_change_primary_key(self):
        ds = DocumentStore()
        ds.add_document("1")
        assert ds.change_primary_key("1", "99") == 1
        assert ds.doc_id("99") == 1
        assert ds.doc_id("1") is None


class TestFilterIndex:
    def make(self):
        fi = FilterIndex()
        fi.add_column("status", "int", bitmap_index=True)
        fi.add_column("score", "double")
        fi.add_column("cat", "string")
        fi.add_document(1, {"status": 1, "score": 0.5, "cat": "a"})
        fi.add_document(2, {"status": 2, "score": 1.5, "cat": "b"})
        fi.add_document(3, {"status": 1, "score": 2.5, "cat": "a"})
        fi.add_document(4, {"status": 1, "cat": "c"})  # score NULL
        return fi

    def test_eq_bitmap(self):
        fi = self.make()
        bm = fi.eq_bitmap("status", 1, n_words=4)
        assert bm is not None
        bits = np.unpackbits(bm.view(np.uint8), bitorder="little")
        assert np.flatnonzero(bits).tolist() == [1, 3, 4]
        assert fi.eq_bitmap("score", 1.5, 4) is None  # not bitmap-indexed

    def test_match_mask_numeric(self):
        fi = self.make()
        ids = np.asarray([1, 2, 3, 4], dtype=np.int64)
        assert fi.match_mask("score", ids, ">", 1.0).tolist() == \
            [False, True, True, False]
        assert fi.match_mask("score", ids, "<=", 1.5).tolist() == \
            [True, True, False, False]
        assert fi.match_mask("score", ids, "IS NULL").tolist() == \
            [False, False, False, True]
        assert fi.match_mask("score", ids, "IS NOT NULL").tolist() == \
            [True, True, True, False]

    def test_match_mask_string(self):
        fi = self.make()
        ids = np.asarray([1, 2, 3, 4], dtype=np.int64)
        assert fi.match_mask("cat", ids, "=", "a").tolist() == \
            [True, False, True, False]
        assert fi.match_mask("cat", ids, "!=", "a").tolist() == \
            [False, True, False, True]

    def test_update_moves_bitmap(self):
        fi = self.make()
        fi.update_document(1, {"status": 2, "cat": "a"})
        bm1 = fi.eq_bitmap("status", 1, 4)
        bm2 = fi.eq_bitmap("status", 2, 4)
        b1 = np.flatnonzero(np.unpackbits(bm1.view(np.uint8),
                                          bitorder="little")).tolist()
        b2 = np.flatnonzero(np.unpackbits(bm2.view(np.uint8),
                                          bitorder="little")).tolist()
        assert b1 == [3, 4]
        assert b2 == [1, 2]

    def test_cmp_row_parity_with_match_mask(self):
        """cmp_bitmap_device's packed row == match_mask over every doc id
        for all ops x columns (numeric, dict-compressed, NULL probes)."""
        fi = self.make()
        fi.add_column("tag", "string", dict_compress=True)
        for d, t in [(1, "x"), (2, "y"), (3, "x")]:
            fi.update_document(d, {"tag": t})
        n_words = 4
        ids = np.arange(n_words * 32, dtype=np.int64)
        cases = [("status", op, v) for op in ("=", "!=", ">", ">=", "<",
                                              "<=") for v in (0, 1, 2)]
        cases += [("score", op, v) for op in (">", "<=", "!=")
                  for v in (0.5, 1.5, 99)]
        cases += [("score", "IS NULL", None), ("score", "IS NOT NULL",
                                               None)]
        cases += [("tag", op, v) for op in ("=", "!=", ">", "<=")
                  for v in ("x", "y")]
        for colname, op, v in cases:
            dev = fi.cmp_bitmap_device(colname, op, v, n_words)
            assert dev is not None, (colname, op, v)
            bits = np.unpackbits(np.asarray(dev).view(np.uint8),
                                 bitorder="little").astype(bool)
            want = fi.match_mask(colname, ids, op, v)
            assert bits.tolist() == want.tolist(), (colname, op, v)
        # plain string column: no device form (per-doc Python compare)
        assert fi.cmp_bitmap_device("cat", ">", "a", n_words) is None
        # mutation evicts cached rows
        before = np.asarray(fi.cmp_bitmap_device("status", ">", 1, n_words))
        fi.update_document(1, {"status": 5})
        after = np.asarray(fi.cmp_bitmap_device("status", ">", 1, n_words))
        assert before.tolist() != after.tolist()

    def test_remove_document(self):
        fi = self.make()
        fi.remove_document(1)
        ids = np.asarray([1], dtype=np.int64)
        assert fi.match_mask("status", ids, "=", 1).tolist() == [False]
        bm = fi.eq_bitmap("status", 1, 4)
        bits = np.flatnonzero(np.unpackbits(bm.view(np.uint8),
                                            bitorder="little")).tolist()
        assert bits == [3, 4]

    def test_value_counts(self):
        fi = self.make()
        counts = dict(fi.value_counts("cat"))
        assert counts == {"a": 2, "b": 1, "c": 1}
        sub = dict(fi.value_counts("cat", np.asarray([1, 2])))
        assert sub == {"a": 1, "b": 1}
        st = dict(fi.value_counts("status"))
        assert st == {"1": 3, "2": 1}

    def test_unknown_column(self):
        fi = self.make()
        assert fi.value_counts("nope") == []
        assert fi.match_mask("nope", np.asarray([1]), "=", 1).tolist() == [False]


class TestDatetimeBucketing:
    def test_bucket_minute(self):
        fi = FilterIndex()
        fi.add_column("created", "datetime", bitmap_index=True,
                      bucket="minute")
        fi.add_document(1, {"created": 1700000075})  # :01:15 -> :01:00
        fi.add_document(2, {"created": 1700000090})  # same minute bucket
        fi.add_document(3, {"created": 1700000125})  # next minute
        bm = fi.eq_bitmap("created", 1700000061, n_words=4)  # probe bucketed
        bits = np.flatnonzero(np.unpackbits(bm.view(np.uint8),
                                            bitorder="little")).tolist()
        assert bits == [1, 2]
        counts = dict(fi.value_counts("created"))
        assert counts == {"1700000040": 2, "1700000100": 1}

    def test_bucket_day(self):
        fi = FilterIndex()
        fi.add_column("d", "date", bucket="day")
        fi.add_document(1, {"d": 86400 + 3600})
        ids = np.asarray([1], dtype=np.int64)
        assert fi.match_mask("d", ids, "=", 86400).tolist() == [True]


class TestDictCompress:
    """dict_compress string interning (reference accepts + persists the
    flag, config.h:134; here it is a real int32-code layout)."""

    def _mk(self):
        fi = FilterIndex()
        fi.add_column("status", "string", bitmap_index=False,
                      dict_compress=True)
        for d, v in [(1, "active"), (2, "deleted"), (3, "active"),
                     (4, None), (5, "pending")]:
            fi.add_document(d, {"status": v} if v is not None else {})
        return fi

    def test_interned_storage_and_get(self):
        fi = self._mk()
        col = fi._columns["status"]
        assert col.dict_compress
        assert col.values.dtype == np.int32
        assert col.get(1) == "active" and col.get(3) == "active"
        assert col.get(4) is None

    def test_match_mask_eq_ne(self):
        fi = self._mk()
        ids = np.asarray([1, 2, 3, 4, 5])
        assert fi.match_mask("status", ids, "=", "active").tolist() == \
            [True, False, True, False, False]
        assert fi.match_mask("status", ids, "!=", "active").tolist() == \
            [False, True, False, False, True]
        # unknown value: = matches nothing, != matches all present
        assert fi.match_mask("status", ids, "=", "zzz").tolist() == \
            [False] * 5
        assert fi.match_mask("status", ids, "!=", "zzz").tolist() == \
            [True, True, True, False, True]

    def test_match_mask_range_ops(self):
        fi = self._mk()
        ids = np.asarray([1, 2, 3, 5])
        # lexicographic: active < deleted < pending
        assert fi.match_mask("status", ids, ">", "active").tolist() == \
            [False, True, False, True]
        assert fi.match_mask("status", ids, "<=", "deleted").tolist() == \
            [True, True, True, False]

    def test_value_counts(self):
        fi = self._mk()
        assert fi.value_counts("status") == [
            ("active", 2), ("deleted", 1), ("pending", 1)]
        assert fi.value_counts("status", np.asarray([1, 2, 4])) == [
            ("active", 1), ("deleted", 1)]

    def test_update_and_unset(self):
        fi = self._mk()
        fi.update_document(1, {"status": "deleted"})
        assert fi._columns["status"].get(1) == "deleted"
        fi.remove_document(2)
        assert fi._columns["status"].get(2) is None
        assert fi.value_counts("status") == [
            ("active", 1), ("deleted", 1), ("pending", 1)]

    def test_state_roundtrip(self):
        fi = self._mk()
        st = fi.state()
        fi2 = FilterIndex.from_state(st)
        col = fi2._columns["status"]
        assert col.dict_compress
        assert col.get(1) == "active" and col.get(5) == "pending"
        assert fi2.value_counts("status") == fi.value_counts("status")

    def test_parity_with_uncompressed(self):
        rng = np.random.default_rng(7)
        vals = ["a", "bb", "ccc", None, "dd"]
        fi_c, fi_p = FilterIndex(), FilterIndex()
        fi_c.add_column("c", "string", dict_compress=True)
        fi_p.add_column("c", "string")
        for d in range(1, 301):
            v = vals[int(rng.integers(0, len(vals)))]
            payload = {"c": v} if v is not None else {}
            fi_c.add_document(d, payload)
            fi_p.add_document(d, payload)
        ids = np.arange(1, 301)
        for op in ("=", "!=", ">", ">=", "<", "<=", "IS NULL",
                   "IS NOT NULL"):
            for v in ("bb", "zz", "a"):
                assert fi_c.match_mask("c", ids, op, v).tolist() == \
                    fi_p.match_mask("c", ids, op, v).tolist(), (op, v)
        assert fi_c.value_counts("c") == fi_p.value_counts("c")

    def test_memory_smaller_than_uncompressed(self):
        fi_c, fi_p = FilterIndex(), FilterIndex()
        fi_c.add_column("c", "string", dict_compress=True)
        fi_p.add_column("c", "string")
        for d in range(1, 20001):
            v = f"value-{d % 5}"
            fi_c.add_document(d, {"c": v})
            fi_p.add_document(d, {"c": v})
        assert fi_c.memory_usage() < fi_p.memory_usage()


class TestDocIdOverflow:
    """uint32 doc-id exhaustion must be a hard error, never a wrap
    (reference document_store_docid_overflow_test.cpp — device layouts
    index doc ids as uint32)."""

    def _store_at(self, next_id):
        s = DocumentStore(store_texts=False)
        s._next_doc_id = next_id
        return s

    def test_last_id_allocates(self):
        s = self._store_at(0xFFFFFFFF)
        doc_id, inserted = s.add_document("pk-last")
        assert inserted and doc_id == 0xFFFFFFFF

    def test_overflow_raises(self):
        import pytest
        from mygramdb_tpu.utils.errors import ErrorCode, MygramError
        s = self._store_at(0xFFFFFFFF + 1)
        with pytest.raises(MygramError) as ei:
            s.add_document("pk-over")
        assert ei.value.code is ErrorCode.OUT_OF_RANGE

    def test_no_partial_state_on_overflow(self):
        import pytest
        from mygramdb_tpu.utils.errors import MygramError
        s = self._store_at(0xFFFFFFFF + 1)
        with pytest.raises(MygramError):
            s.add_document("pk-over")
        assert s.doc_id("pk-over") is None
        assert s.count == 0

    def test_batch_stops_at_overflow(self):
        import pytest
        from mygramdb_tpu.utils.errors import MygramError
        s = self._store_at(0xFFFFFFFF)
        with pytest.raises(MygramError):
            s.add_batch([("a", {}, None), ("b", {}, None)])
        assert s.doc_id("a") == 0xFFFFFFFF  # first insert landed
        assert s.doc_id("b") is None
