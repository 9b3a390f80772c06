"""Fused Pallas gather+TF verify kernel: interpret-mode parity tests.

The kernel (verify_ops.tf_rows_pallas) replaces the XLA padded-row gather +
window-compare passes for the verified search path. These tests run it
through the Pallas interpreter on CPU and assert bit-exact parity with the
XLA reference path at both the kernel level and the full fused-dispatch
level (counts, ids, scores)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mygramdb_tpu.ops import fused
from mygramdb_tpu.ops.verify_ops import (NEEDLE_CAP, _TF_ROWS,
                                         cast_needles_i32, gather_text,
                                         needle_cap_bucket, tf_matrix,
                                         tf_rows_pallas)
from mygramdb_tpu.storage.device_text import DeviceTextStore

WORDS = ["alpha", "beta", "gamma", "delta", "quick", "brown", "fox",
         "検索", "日本語", "エンジン", "高速", "形態素"]


@pytest.fixture(scope="module")
def store():
    rng = np.random.default_rng(77)
    texts = {i: "".join(rng.choice(WORDS, size=int(rng.integers(2, 12))))
             for i in range(1, 257)}
    st = DeviceTextStore(texts, capacity=512)
    assert st.codepoints.ndim == 2  # padded layout expected at this size
    assert st.codepoints.shape[1] % 128 == 0
    return st, texts


def _xla_tf(st, ids, ndl, nlens, cap, use_range):
    text, dl, win = gather_text(st.codepoints, st.offsets, st.lengths,
                                jnp.asarray(ids), st.maxT, cap,
                                need_len=True)
    tf = tf_matrix(text, dl, jnp.asarray(ndl), jnp.asarray(nlens), win,
                   ndl.shape[0], cap, use_range)
    return np.asarray(tf), np.asarray(dl)


@pytest.mark.parametrize("use_range", [True, False])
def test_kernel_parity_u16(store, use_range):
    st, texts = store
    assert st.dtype == np.uint16
    rng = np.random.default_rng(3)
    B, Kv = 3, 2 * _TF_ROWS
    terms = [["検索", "alpha"], ["quick", "高速"], ["日本語"]]
    Nn = 2
    cap = needle_cap_bucket(4)
    ids = rng.integers(1, 257, size=(B, Kv)).astype(np.int32)
    ndl = np.zeros((B, Nn, NEEDLE_CAP), dtype=np.uint32)
    nlens = np.zeros((B, Nn), dtype=np.int32)
    for b, ts in enumerate(terms):
        n, l = DeviceTextStore._pack_needles(ts)
        ndl[b, :n.shape[0]] = n
        nlens[b, :l.shape[0]] = l
    out = np.asarray(tf_rows_pallas(
        st.codepoints, jnp.asarray(ids.reshape(-1)),
        cast_needles_i32(jnp.asarray(ndl), st.codepoints.dtype, cap),
        jnp.asarray(nlens), Kv=Kv, Nn=Nn, cap=cap, use_range=use_range,
        interpret=True))
    for b in range(B):
        tf_x, dl_x = _xla_tf(st, ids[b], ndl[b], nlens[b], cap, use_range)
        assert np.array_equal(out[b * Kv:(b + 1) * Kv, :Nn], tf_x), b
        assert np.array_equal(out[b * Kv:(b + 1) * Kv, Nn], dl_x), b


@pytest.mark.parametrize("use_range", [True, False])
def test_kernel_parity_width_prefix(store, use_range):
    """width=W DMAs only a row prefix; when every candidate doc fits in
    W - cap the counts must equal the full-width kernel's."""
    st, texts = store
    rng = np.random.default_rng(11)
    Kv = 2 * _TF_ROWS
    cap = needle_cap_bucket(4)
    rowT = st.codepoints.shape[1]
    W = 128
    while W < rowT:
        short = [d for d, t in texts.items() if len(t) <= W - cap]
        if len(short) >= Kv:
            break
        W += 128
    ids = np.asarray([short[i % len(short)] for i in range(Kv)],
                     dtype=np.int32)
    ndl = np.zeros((1, 2, NEEDLE_CAP), dtype=np.uint32)
    n, l = DeviceTextStore._pack_needles(["検索", "quick"])
    ndl[0, :n.shape[0]] = n
    nlens = np.zeros((1, 2), dtype=np.int32)
    nlens[0, :l.shape[0]] = l
    args = (st.codepoints, jnp.asarray(ids),
            cast_needles_i32(jnp.asarray(ndl), st.codepoints.dtype, cap),
            jnp.asarray(nlens))
    kw = dict(Kv=Kv, Nn=2, cap=cap, use_range=use_range, interpret=True)
    full = np.asarray(tf_rows_pallas(*args, **kw))
    pref = np.asarray(tf_rows_pallas(*args, width=W, **kw))
    assert np.array_equal(full, pref)


def test_kernel_parity_u32_synthetic():
    """u32 pack: the 0xFFFFFFFF sentinel upcasts to -1 in-kernel and must
    never match; non-BMP codepoints compare exactly."""
    rng = np.random.default_rng(5)
    N, rowT = 64, 256
    cap = 4
    SENT = 0xFFFFFFFF
    padded = rng.integers(0x10000, 0x10400, size=(N, rowT),
                          dtype=np.uint32)
    lens = rng.integers(1, rowT - NEEDLE_CAP, size=N).astype(np.int32)
    for i in range(N):
        padded[i, lens[i]:] = SENT
    offsets = np.zeros(N, dtype=np.int32)
    Kv = _TF_ROWS
    ids = rng.integers(0, N, size=(Kv,)).astype(np.int32)
    # needle = a real prefix of doc ids[0] plus one random needle
    ndl = np.zeros((1, 2, NEEDLE_CAP), dtype=np.uint32)
    ndl[0, 0, :2] = padded[ids[0], :2]
    ndl[0, 1, :3] = rng.integers(0x10000, 0x10400, size=3)
    nlens = np.asarray([[2, 3]], dtype=np.int32)
    out = np.asarray(tf_rows_pallas(
        jnp.asarray(padded), jnp.asarray(ids),
        cast_needles_i32(jnp.asarray(ndl), padded.dtype, cap),
        jnp.asarray(nlens), Kv=Kv, Nn=2, cap=cap, use_range=True,
        interpret=True))
    win = rowT - cap
    for c in range(Kv):
        row = padded[ids[c]]
        dl = int((row != SENT).sum())
        assert out[c, 2] == dl
        for j in range(2):
            nl = int(nlens[0, j])
            needle = ndl[0, j, :nl]
            cnt = sum(1 for s in range(win)
                      if s + nl <= dl
                      and np.array_equal(row[s:s + nl], needle))
            assert out[c, j] == cnt, (c, j)


@pytest.fixture()
def flat_store(monkeypatch):
    """Force the flat-pack layout (padded budget 0) — the 10M+ doc shape."""
    from mygramdb_tpu.storage import device_text as dt
    monkeypatch.setattr(dt, "_PADDED_BUDGET_BYTES", 0)
    rng = np.random.default_rng(78)
    texts = {i: "".join(rng.choice(WORDS, size=int(rng.integers(2, 12))))
             for i in range(1, 257)}
    st = DeviceTextStore(texts, capacity=512)
    assert st.codepoints.ndim == 1 and st.flat_padded
    return st, texts


@pytest.mark.parametrize("use_range", [True, False])
def test_flat_kernel_parity_u16(flat_store, use_range):
    from mygramdb_tpu.ops.verify_ops import tf_rows_flat_pallas
    st, texts = flat_store
    assert st.dtype == np.uint16
    rng = np.random.default_rng(4)
    B, Kv = 3, 2 * _TF_ROWS
    terms = [["検索", "alpha"], ["quick", "高速"], ["日本語"]]
    Nn = 2
    cap = needle_cap_bucket(4)
    maxT = st.maxT_bucket(st.maxT)
    ids = rng.integers(1, 257, size=(B, Kv)).astype(np.int32)
    ndl = np.zeros((B, Nn, NEEDLE_CAP), dtype=np.uint32)
    nlens = np.zeros((B, Nn), dtype=np.int32)
    for b, ts in enumerate(terms):
        n, l = DeviceTextStore._pack_needles(ts)
        ndl[b, :n.shape[0]] = n
        nlens[b, :l.shape[0]] = l
    flat_ids = jnp.asarray(ids.reshape(-1))
    off_grp, off_rem = st.offsets
    out = np.asarray(tf_rows_flat_pallas(
        st.codepoints, off_grp[flat_ids], off_rem[flat_ids],
        st.lengths[flat_ids],
        cast_needles_i32(jnp.asarray(ndl), st.codepoints.dtype, cap),
        jnp.asarray(nlens), Kv=Kv, Nn=Nn, cap=cap, win=maxT,
        use_range=use_range, interpret=True))
    for b in range(B):
        text, dl, win = gather_text(st.codepoints, st.offsets, st.lengths,
                                    jnp.asarray(ids[b]), maxT, cap,
                                    need_len=True)
        tf_x = np.asarray(tf_matrix(text, dl, jnp.asarray(ndl[b]),
                                    jnp.asarray(nlens[b]), win, Nn, cap,
                                    use_range))
        assert np.array_equal(out[b * Kv:(b + 1) * Kv, :Nn], tf_x), b
        assert np.array_equal(out[b * Kv:(b + 1) * Kv, Nn],
                              np.asarray(dl)), b


def test_flat_full_path_parity(flat_store, monkeypatch):
    """Whole fused dispatch over the flat pack: pallas (interpret) vs XLA."""
    from mygramdb_tpu.index.builder import IndexBuilder
    from mygramdb_tpu.index.device_index import DeviceIndex
    from mygramdb_tpu.utils.textproc import generate_query_ngrams
    st, texts = flat_store
    b = IndexBuilder(ngram_size=2, kanji_ngram_size=1)
    for did, t in texts.items():
        b.add_document(did, t)
    built = b.finalize()
    idx = DeviceIndex(built, dense_df_ratio=0.08, max_dense_terms=64)
    def call(terms, score_mode):
        tids = []
        for t in terms:
            for g in generate_query_ngrams(t, 2, kanji_ngram_size=1):
                tid = built.term_dict.get(g)
                if tid is not None:
                    tids.append(tid)
        assert tids, terms
        ndl, nlens = DeviceTextStore._pack_needles(terms)
        idf = np.ones(ndl.shape[0], dtype=np.float32)
        return idx.search_and_verified(
            tids, st, ndl, nlens, 64, True, score_mode=score_mode,
            idf=idf, k1=1.2, b=0.75, avgdl=30.0)

    cases = [(["検索"], False), (["quick"], True)]
    base = [call(*c) for c in cases]
    monkeypatch.setattr(fused, "_pallas_tf_eligible", lambda *a, **k: True)
    monkeypatch.setenv("MYGRAM_PALLAS_VERIFY_INTERPRET", "1")
    ptf = [call(*c) for c in cases]
    for (terms, score_mode), b_out, p_out in zip(cases, base, ptf):
        assert b_out is not None and p_out is not None
        assert b_out[0] == p_out[0]
        assert np.array_equal(b_out[1], p_out[1])
        assert np.allclose(b_out[2], p_out[2])
        if not score_mode:
            expect = sum(1 for t_ in texts.values()
                         if all(term in t_ for term in terms))
            assert p_out[0] == expect


class TestFullPathParity:
    """Whole fused dispatch with pallas_tf on (interpret) vs off: the
    packed (pre, count, ids[, scores]) outputs must be identical."""

    @pytest.fixture(scope="class")
    def corpus(self):
        from mygramdb_tpu.index.builder import IndexBuilder
        from mygramdb_tpu.index.device_index import DeviceIndex
        rng = np.random.default_rng(9)
        texts = {i: "".join(rng.choice(WORDS,
                                       size=int(rng.integers(2, 10))))
                 for i in range(1, 401)}
        b = IndexBuilder(ngram_size=2, kanji_ngram_size=1)
        for did, t in texts.items():
            b.add_document(did, t)
        built = b.finalize()
        idx = DeviceIndex(built, dense_df_ratio=0.08, max_dense_terms=64)
        st = DeviceTextStore(texts, capacity=512)
        return built, idx, st, texts

    @pytest.mark.parametrize("terms,score_mode", [
        (["検索"], False),
        (["quick"], False),
        (["検索", "alpha"], False),
        (["quick"], True),
        (["高速", "日本語"], True),
    ])
    def test_parity(self, corpus, monkeypatch, terms, score_mode):
        from mygramdb_tpu.utils.textproc import generate_query_ngrams
        built, idx, st, texts = corpus
        tids = []
        for t in terms:
            for g in generate_query_ngrams(t, 2, kanji_ngram_size=1):
                tid = built.term_dict.get(g)
                if tid is not None:
                    tids.append(tid)
        assert tids, terms
        ndl, nlens = DeviceTextStore._pack_needles(terms)
        idf = np.ones(ndl.shape[0], dtype=np.float32)

        def call():
            return idx.search_and_verified(
                tids, st, ndl, nlens, 64, True, score_mode=score_mode,
                idf=idf, k1=1.2, b=0.75, avgdl=30.0)

        base = call()
        monkeypatch.setattr(fused, "_pallas_tf_eligible",
                            lambda *a, **k: True)
        monkeypatch.setenv("MYGRAM_PALLAS_VERIFY_INTERPRET", "1")
        assert fused._pallas_tf_state.enabled
        ptf = call()
        assert base is not None and ptf is not None
        t0, ids0, sc0, pre0 = base
        t1, ids1, sc1, pre1 = ptf
        assert t0 == t1
        assert pre0 == pre1
        assert np.array_equal(ids0, ids1)
        assert np.allclose(sc0, sc1)
        # brute-force oracle for the verified count
        if not score_mode:
            expect = sum(1 for t_ in texts.values()
                         if all(term in t_ for term in terms))
            assert t1 == expect

    def test_fallback_on_kernel_failure(self, corpus, monkeypatch):
        """A broken kernel dispatch must permanently fall back to the XLA
        path and still return correct results."""
        built, idx, st, texts = corpus
        ndl, nlens = DeviceTextStore._pack_needles(["検索"])
        tids = [t for t in (built.term_dict.get(g)
                            for g in ["検索", "検", "索"])
                if t is not None]
        monkeypatch.setattr(fused, "_pallas_tf_eligible",
                            lambda *a, **k: fused._pallas_tf_state.enabled)
        monkeypatch.setattr(fused, "tf_rows_pallas",
                            lambda *a, **k: (_ for _ in ()).throw(
                                RuntimeError("boom")))
        monkeypatch.setattr(fused._pallas_tf_state, "enabled", True)
        out = idx.search_and_verified(
            tids, st, ndl, nlens, 64, True,
            idf=np.ones(1, dtype=np.float32))
        assert out is not None
        total = out[0]
        expect = sum(1 for t_ in texts.values() if "検索" in t_)
        assert total == expect
        assert not fused._pallas_tf_state.enabled


@pytest.mark.parametrize("use_range", [True, False])
def test_flat_global_owner_kernel_parity(flat_store, use_range):
    """Owner-indexed live-skip kernel (tf_rows_flat_global_pallas): rows
    packed across queries with a dead suffix must match the per-query
    flat kernel row-for-row; dead rows must come back zero."""
    from mygramdb_tpu.ops.verify_ops import (tf_rows_flat_global_pallas,
                                             tf_rows_flat_pallas)
    st, texts = flat_store
    rng = np.random.default_rng(9)
    B = 4
    M = 4 * _TF_ROWS           # packed capacity
    V = M - _TF_ROWS - 3       # live prefix: one fully-dead step + a
    #                            partially-dead tail step
    Nn = 2
    cap = needle_cap_bucket(4)
    maxT = st.maxT_bucket(st.maxT)
    ids = rng.integers(1, 257, size=M).astype(np.int32)
    owner = rng.integers(0, B, size=M).astype(np.int32)
    ids[V:] = 0
    owner[V:] = 0
    terms = [["検索", "alpha"], ["quick", "高速"], ["日本語"], ["beta"]]
    ndl = np.zeros((B, Nn, NEEDLE_CAP), dtype=np.uint32)
    nlens = np.zeros((B, Nn), dtype=np.int32)
    for b, ts in enumerate(terms):
        n, l = DeviceTextStore._pack_needles(ts)
        ndl[b, :n.shape[0]] = n
        nlens[b, :l.shape[0]] = l
    off_grp, off_rem = st.offsets
    ids_j = jnp.asarray(ids)
    ln = np.asarray(st.lengths)[ids].astype(np.int32)
    ln[V:] = 0
    ndl_i32 = cast_needles_i32(jnp.asarray(ndl), st.codepoints.dtype,
                               cap).reshape(B, Nn * cap)
    out = np.asarray(tf_rows_flat_global_pallas(
        st.codepoints, off_grp[ids_j], off_rem[ids_j], jnp.asarray(ln),
        jnp.asarray(owner), jnp.int32(V), ndl_i32,
        jnp.asarray(nlens), B=B, Nn=Nn, cap=cap, win=maxT,
        use_range=use_range, interpret=True))
    # reference: run each live row through the per-query flat kernel
    # with ITS owner's needles (one _TF_ROWS batch per row, replicated)
    for r in range(V):
        rep = np.full(_TF_ROWS, ids[r], dtype=np.int32)
        rep_j = jnp.asarray(rep)
        ref = np.asarray(tf_rows_flat_pallas(
            st.codepoints, off_grp[rep_j], off_rem[rep_j],
            st.lengths[rep_j],
            cast_needles_i32(jnp.asarray(ndl[owner[r]][None]),
                             st.codepoints.dtype, cap),
            jnp.asarray(nlens[owner[r]][None]), Kv=_TF_ROWS, Nn=Nn,
            cap=cap, win=maxT, use_range=use_range, interpret=True))
        assert np.array_equal(out[r], ref[0]), r
    assert np.array_equal(out[V:], np.zeros((M - V, Nn + 1), np.int32))


def test_flat_global_pack_full_path_parity(flat_store, monkeypatch):
    """Whole fused dispatch with global_pack on (interpret): bit parity
    with the XLA path, and with the per-pad-slot pallas path."""
    from mygramdb_tpu.index.builder import IndexBuilder
    from mygramdb_tpu.index.device_index import DeviceIndex
    from mygramdb_tpu.utils.textproc import generate_query_ngrams
    st, texts = flat_store
    b = IndexBuilder(ngram_size=2, kanji_ngram_size=1)
    for did, t in texts.items():
        b.add_document(did, t)
    built = b.finalize()
    idx = DeviceIndex(built, dense_df_ratio=0.08, max_dense_terms=64)

    def call(terms, score_mode):
        tids = []
        for t in terms:
            for g in generate_query_ngrams(t, 2, kanji_ngram_size=1):
                tid = built.term_dict.get(g)
                if tid is not None:
                    tids.append(tid)
        assert tids, terms
        ndl, nlens = DeviceTextStore._pack_needles(terms)
        idf = np.ones(ndl.shape[0], dtype=np.float32)
        return idx.search_and_verified(
            tids, st, ndl, nlens, 64, True, score_mode=score_mode,
            idf=idf, k1=1.2, b=0.75, avgdl=30.0)

    cases = [(["検索"], False), (["quick"], True), (["検索", "alpha"],
                                                  False)]
    base = [call(*c) for c in cases]
    monkeypatch.setattr(fused, "_pallas_tf_eligible", lambda *a, **k: True)
    monkeypatch.setattr(fused, "_global_pack_policy",
                        lambda *a, **k: True)
    monkeypatch.setenv("MYGRAM_PALLAS_VERIFY_INTERPRET", "1")
    gp = [call(*c) for c in cases]
    for (terms, score_mode), b_out, p_out in zip(cases, base, gp):
        assert b_out is not None and p_out is not None
        assert b_out[0] == p_out[0]
        assert np.array_equal(b_out[1], p_out[1])
        assert np.allclose(b_out[2], p_out[2])
        if not score_mode:
            expect = sum(1 for t_ in texts.values()
                         if all(term in t_ for term in terms))
            assert p_out[0] == expect
