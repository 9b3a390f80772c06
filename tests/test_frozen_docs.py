"""Columnar frozen document base (storage/frozen_docs.py) + the hybrid
DocumentStore overlay semantics + the bulk-load integration."""

import numpy as np
import pytest

from mygramdb_tpu.storage.frozen_docs import FrozenDocBuilder
from mygramdb_tpu.storage.document_store import DocumentStore


def build_frozen(rows, store_texts=True):
    b = FrozenDocBuilder(store_texts=store_texts)
    # two chunks to exercise chunk concatenation
    half = len(rows) // 2
    b.append([p for p, _ in rows[:half]], [t for _, t in rows[:half]])
    b.append([p for p, _ in rows[half:]], [t for _, t in rows[half:]])
    return b.build()


class TestFrozenDocs:
    def test_numeric_pk_roundtrip(self):
        rows = [(str(i), f"doc {i} text") for i in range(1, 51)]
        f = build_frozen(rows)
        assert f.pk_num is not None
        for d in (1, 25, 50):
            assert f.pk(d) == str(d)
            assert f.doc_of(str(d)) == d
        assert f.doc_of("999") is None
        assert f.doc_of("abc") is None

    def test_numeric_pk_unsorted_stream(self):
        pks = ["30", "5", "1000", "7"]
        f = build_frozen([(p, "t" + p) for p in pks])
        for i, p in enumerate(pks):
            assert f.doc_of(p) == i + 1
            assert f.pk(i + 1) == p

    def test_leading_zero_pk_stays_string(self):
        f = build_frozen([("01", "a"), ("2", "b")])
        assert f.pk_num is None
        assert f.doc_of("01") == 1
        assert f.doc_of("1") is None
        assert f.doc_of("2") == 2

    def test_string_pks(self):
        pks = ["user:9", "user:10", "zebra", "日本"]
        f = build_frozen([(p, "text " + p) for p in pks])
        assert f.pk_num is None
        for i, p in enumerate(pks):
            assert f.pk(i + 1) == p
            assert f.doc_of(p) == i + 1
        assert f.doc_of("nope") is None

    def test_text_roundtrip_cjk(self):
        rows = [("1", "hello"), ("2", "日本語の検索"), ("3", ""),
                ("4", "mixed 混合 text")]
        f = build_frozen(rows)
        for i, (_, t) in enumerate(rows):
            assert f.text(i + 1) == t
            assert f.text_cp_len(i + 1) == len(t)

    def test_iter_text_codepoints(self):
        rows = [(str(i), f"t{i}·日") for i in range(1, 10)]
        f = build_frozen(rows)
        seen = {}
        for first, flat, lens in f.iter_text_codepoints(chunk_docs=4):
            pos = 0
            for j, ln in enumerate(lens.tolist()):
                cps = flat[pos:pos + ln]
                seen[first + j] = "".join(chr(c) for c in cps)
                pos += ln
        assert seen == {i: f"t{i}·日" for i in range(1, 10)}

    def test_no_texts_mode(self):
        f = build_frozen([("1", ""), ("2", "")], store_texts=False)
        assert f.txt_blob is None
        assert f.text(1) is None


class TestHybridDocumentStore:
    def make(self, n=20):
        b = FrozenDocBuilder(store_texts=True)
        b.append([str(i) for i in range(1, n + 1)],
                 [f"text {i}" for i in range(1, n + 1)])
        return DocumentStore.from_frozen(b, True, True, str(n))

    def test_basic_reads(self):
        ds = self.make()
        assert ds.count == 20
        assert ds.primary_key(7) == "7"
        assert ds.doc_id("7") == 7
        assert ds.text(7) == "text 7"
        assert ds.pk_doc_id_order_valid
        assert ds.next_doc_id == 21

    def test_insert_or_ignore_on_frozen_pk(self):
        ds = self.make()
        doc_id, inserted = ds.add_document("7", None, "other")
        assert (doc_id, inserted) == (7, False)
        d2, ins2 = ds.add_document("21", None, "new doc")
        assert (d2, ins2) == (21, True)
        assert ds.count == 21
        assert ds.text(21) == "new doc"

    def test_remove_frozen_doc(self):
        ds = self.make()
        assert ds.remove_document(5)
        assert ds.count == 19
        assert ds.primary_key(5) is None
        assert ds.doc_id("5") is None
        assert ds.text(5) is None
        # PK can be re-added; gets a NEW doc id
        d, ins = ds.add_document("5", None, "reborn")
        assert ins and d == 21

    def test_remove_by_pk_frozen(self):
        ds = self.make()
        assert ds.remove_by_pk("3") == 3
        assert ds.remove_by_pk("3") is None

    def test_update_frozen_text_overlay(self):
        ds = self.make()
        assert ds.update_document(4, text="patched")
        assert ds.text(4) == "patched"
        assert ds.primary_key(4) == "4"
        assert ds.count == 20

    def test_change_primary_key_frozen(self):
        ds = self.make()
        assert ds.change_primary_key("6", "sixty") == 6
        assert ds.doc_id("sixty") == 6
        assert ds.doc_id("6") is None
        assert ds.primary_key(6) == "sixty"
        assert not ds.pk_doc_id_order_valid

    def test_filters_read_through(self):
        ds = self.make()
        calls = []

        def src(doc_id):
            calls.append(doc_id)
            return {"status": 1}
        ds.filters_source = src
        assert ds.filters_of(3) == {"status": 1}
        assert calls == [3]
        # overlay wins over read-through
        ds.update_document(3, filters={"status": 9})
        assert ds.filters_of(3) == {"status": 9}

    def test_all_doc_ids(self):
        ds = self.make(5)
        ds.remove_document(2)
        ds.add_document("99", None, "x")
        assert sorted(ds.all_doc_ids().tolist()) == [1, 3, 4, 5, 6]

    def test_state_roundtrip(self):
        ds = self.make(6)
        ds.filters_source = lambda d: {"status": d % 2}
        ds.remove_document(2)
        ds.update_document(3, text="patched")
        ds.add_document("100", {"status": 5}, "overlay doc")
        st = ds.state()
        ds2 = DocumentStore.from_state(st)
        assert ds2.count == ds.count
        assert ds2.text(3) == "patched"
        assert ds2.text(7) == "overlay doc"
        assert ds2.doc_id("100") == 7
        assert ds2.primary_key(1) == "1"
        assert ds2.filters_of(7) == {"status": 5}
        assert ds2.filters_of(1) == {"status": 1}

    def test_texts_snapshot_matches(self):
        ds = self.make(4)
        ds.update_document(2, text="patched")
        snap = ds.texts_snapshot()
        assert snap == {1: "text 1", 2: "patched", 3: "text 3",
                        4: "text 4"}


class TestBulkLoadColumnar:
    def make_ctx(self):
        from mygramdb_tpu.config.loader import load_config_from_dict
        from mygramdb_tpu.catalog import TableCatalog
        cfg = load_config_from_dict({
            "tables": [{
                "name": "t",
                "text_source": {"column": "body"},
                "filters": [
                    {"name": "status", "type": "int",
                     "bitmap_index": True},
                    {"name": "tag", "type": "string"},
                ],
            }],
            "memory": {"verify_text": "all"},
        })
        return TableCatalog(cfg).resolve("t")

    def test_bulk_load_builds_frozen_store(self):
        ctx = self.make_ctx()
        bulk = ctx.begin_bulk_load()
        n = bulk.add_batch([
            (str(i), f"body text {i}", {"status": i % 3, "tag": "x"})
            for i in range(1, 101)])
        assert n == 100
        bulk.finish()
        assert ctx.doc_store.count == 100
        assert ctx.doc_store.frozen is not None
        assert ctx.doc_store.pk_doc_id_order_valid
        assert ctx.doc_store.text(42) == "body text 42"
        # filters read through the columnar FilterIndex (typed back)
        assert ctx.doc_store.filters_of(42) == {"status": 0, "tag": "x"}
        doc = ctx.doc_store.get_document("42")
        assert doc.filters["status"] == 0

    def test_bulk_load_dedupes(self):
        ctx = self.make_ctx()
        bulk = ctx.begin_bulk_load()
        n = bulk.add_batch([("1", "a", None), ("1", "dup", None),
                            ("2", "b", None)])
        assert n == 2
        bulk.finish()
        assert ctx.doc_store.count == 2
        assert ctx.doc_store.text(1) == "a"

    def test_bulk_load_unsorted_dedupes(self):
        ctx = self.make_ctx()
        bulk = ctx.begin_bulk_load()
        n1 = bulk.add_batch([("5", "a", None), ("3", "b", None)])
        n2 = bulk.add_batch([("5", "dup", None), ("9", "c", None)])
        bulk.finish()
        assert (n1, n2) == (2, 1)
        assert ctx.doc_store.count == 3
        assert not ctx.doc_store.pk_doc_id_order_valid
        assert ctx.doc_store.doc_id("5") == 1

    def test_mutation_after_bulk(self):
        ctx = self.make_ctx()
        bulk = ctx.begin_bulk_load()
        bulk.add_batch([(str(i), f"hello doc {i}", {"status": 1})
                        for i in range(1, 21)])
        bulk.finish()
        ctx.update_row("7", "updated text", {"status": 2})
        assert ctx.doc_store.text(7) == "updated text"
        assert ctx.doc_store.filters_of(7) == {"status": 2}
        ctx.remove_row("8")
        assert ctx.doc_store.count == 19
        assert ctx.doc_store.doc_id("8") is None


class TestDeviceTextFromFrozen:
    def test_pack_parity_with_dict_path(self):
        from mygramdb_tpu.storage.device_text import DeviceTextStore
        b = FrozenDocBuilder(store_texts=True)
        texts = {i: f"doc {i} 日本語 body" for i in range(1, 31)}
        b.append([str(i) for i in texts], list(texts.values()))
        ds = DocumentStore.from_frozen(b, True, True, "30")
        ds.update_document(5, text="patched text 五")
        st_frozen = DeviceTextStore.from_doc_store(ds, 64)
        snap = ds.texts_snapshot()
        st_dict = DeviceTextStore(snap, 64)
        ids = np.asarray(sorted(snap), dtype=np.int32)
        fallback = lambda i: [snap.get(x) for x in i]  # noqa: E731
        for needle in ["doc", "五", "日本", "patched", "zz"]:
            m1 = st_frozen.verify(ids, [needle], fallback)
            m2 = st_dict.verify(ids, [needle], fallback)
            assert m1.tolist() == m2.tolist(), needle
            expect = [needle in snap[int(d)] for d in ids]
            assert m1.tolist() == expect, needle
