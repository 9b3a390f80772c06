"""Differential parity: native one-pass text pack vs the Python route.

DeviceTextStore._from_frozen_native decodes the frozen store's UTF-8 blob
straight into the final uint16 buffer (mg_utf8_decode_u16); the Python
route decodes chunkwise to uint32, concatenates, and narrows. Both must
serve byte-identical per-doc texts and agree on which docs overflow to
the host verify path (non-BMP, U+FFFF, over-maxT, post-freeze overlay).
"""

import numpy as np
import pytest

from mygramdb_tpu import native
from mygramdb_tpu.storage.device_text import DeviceTextStore
from mygramdb_tpu.storage.document_store import DocumentStore
from mygramdb_tpu.storage.frozen_docs import FrozenDocBuilder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _mixed_texts(rng, n):
    pools = [
        lambda: "".join(rng.choice(list("abcdef ghij"), size=rng.integers(0, 40))),
        lambda: "".join(rng.choice(list("東京大阪検索高速データ"), size=rng.integers(1, 12))),
        lambda: "mixed 東京 " + "x" * int(rng.integers(0, 300)),
        lambda: "emoji \U0001F389 doc",          # non-BMP -> overflow
        lambda: "edge ￿ sentinel",           # U+FFFF -> overflow
        lambda: "",                               # empty
        lambda: "y" * 5000,                       # over maxT -> overflow
    ]
    return [pools[int(rng.integers(0, len(pools)))]() for _ in range(n)]


def _doc_store(texts):
    fb = FrozenDocBuilder(store_texts=True)
    fb.append([str(i + 1) for i in range(len(texts))], texts)
    return DocumentStore.from_frozen(fb, True, True, str(len(texts)))


def _served_text(store, flat_or_padded, doc_id):
    """Extract the packed text for doc_id as a python string (host pull —
    test-only)."""
    ln = int(store.lengths_host[doc_id])
    if ln == 0:
        return ""
    cps = np.asarray(store.codepoints)
    if cps.ndim == 2:
        row = cps[doc_id][:ln]
    else:
        off = int(store.offsets_host[doc_id])
        row = cps[off:off + ln]
    return "".join(chr(int(c)) for c in row)


class TestNativePackParity:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_differential_vs_python_route(self, seed, monkeypatch):
        rng = np.random.default_rng(seed)
        texts = _mixed_texts(rng, 400)
        ds = _doc_store(texts)
        cap = len(texts) + 8

        fast = DeviceTextStore._from_frozen_native(
            ds.frozen, ds.text_overlay(), cap, None)
        assert fast is not None
        # force the Python route for the oracle
        monkeypatch.setattr(DeviceTextStore, "_from_frozen_native",
                            classmethod(lambda cls, *a: None))
        slow = DeviceTextStore.from_doc_store(ds, cap)

        assert fast.dtype == slow.dtype == np.uint16
        assert fast.maxT == slow.maxT
        assert fast._overflow == slow._overflow
        assert fast.n_packed == slow.n_packed
        for d in range(1, len(texts) + 1):
            if d in slow._overflow:
                assert int(fast.lengths_host[d]) == 0
                continue
            assert _served_text(fast, None, d) == texts[d - 1], d
            assert _served_text(slow, None, d) == texts[d - 1], d

    def test_overlay_shadowing_and_additions(self, monkeypatch):
        texts = ["alpha beta", "東京タワー", "gamma", "delta"]
        ds = _doc_store(texts)
        ds.update_document(2, text="patched 大阪")   # shadow a frozen row
        ds.add_document("5", None, "brand new doc")   # post-freeze add
        ds.update_document(3, text="bad \U0001F600")  # overlay goes non-BMP
        cap = 16

        fast = DeviceTextStore._from_frozen_native(
            ds.frozen, ds.text_overlay(), cap, None)
        assert fast is not None
        monkeypatch.setattr(DeviceTextStore, "_from_frozen_native",
                            classmethod(lambda cls, *a: None))
        slow = DeviceTextStore.from_doc_store(ds, cap)

        assert fast._overflow == slow._overflow
        assert 3 in fast._overflow            # non-BMP overlay -> host path
        assert fast.n_packed == slow.n_packed
        assert _served_text(fast, None, 2) == "patched 大阪"
        assert _served_text(fast, None, 5) == "brand new doc"
        assert _served_text(fast, None, 1) == "alpha beta"
        assert int(fast.lengths_host[3]) == 0  # stale frozen text not served

    def test_verify_kernel_end_to_end(self):
        """The fused substring verify must agree with Python `in` over a
        natively-packed store."""
        rng = np.random.default_rng(11)
        texts = _mixed_texts(rng, 200)
        ds = _doc_store(texts)
        store = DeviceTextStore.from_doc_store(ds, len(texts) + 4)
        needles = ["東京", "ab", "mixed", "xx"]
        ids = np.arange(1, len(texts) + 1, dtype=np.int32)
        for needle in needles:
            got = store.verify(
                ids, [needle],
                lambda id_list: [ds.text(d) or "" for d in id_list])
            exp = np.asarray([needle in (texts[d - 1] or "")
                              for d in ids], dtype=bool)
            assert (got == exp).all(), needle
