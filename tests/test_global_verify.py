"""Cross-query global candidate compaction (fused._tf_rows_global) parity.

The global stage packs every query's valid candidates into one M-row
gather+TF pass and scatters the TF matrix back, so the fused verified
search's cost tracks sum(pre) instead of B*C (reference cost shape:
search_pipeline.cpp:660-682 scans actual candidates only). These tests
assert the packed outputs are bit-identical with the stage on vs off,
including the clip path (V > M) where the wrapper must transparently
re-run with the stage disabled.
"""

import numpy as np
import pytest

from mygramdb_tpu.ops import fused
from mygramdb_tpu.storage.device_text import DeviceTextStore

WORDS = ["alpha", "beta", "gamma", "delta", "quick", "brown", "fox",
         "検索", "日本語", "エンジン", "高速", "形態素"]


@pytest.fixture(scope="module")
def corpus():
    from mygramdb_tpu.index.builder import IndexBuilder
    from mygramdb_tpu.index.device_index import DeviceIndex
    rng = np.random.default_rng(41)
    texts = {i: "".join(rng.choice(WORDS, size=int(rng.integers(2, 10))))
             for i in range(1, 401)}
    b = IndexBuilder(ngram_size=2, kanji_ngram_size=1)
    for did, t in texts.items():
        b.add_document(did, t)
    built = b.finalize()
    idx = DeviceIndex(built, dense_df_ratio=0.08, max_dense_terms=64)
    st = DeviceTextStore(texts, capacity=512)
    return built, idx, st, texts


def _call(built, idx, st, terms, score_mode):
    from mygramdb_tpu.utils.textproc import generate_query_ngrams
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


CASES = [
    (["検索"], False),
    (["quick"], False),
    (["検索", "alpha"], False),
    (["quick"], True),
    (["高速", "日本語"], True),
]


@pytest.mark.parametrize("terms,score_mode", CASES)
def test_global_parity(corpus, monkeypatch, terms, score_mode):
    built, idx, st, texts = corpus
    base = _call(built, idx, st, terms, score_mode)
    # force the global stage on regardless of dispatch size; M large
    # enough that nothing clips
    monkeypatch.setattr(fused, "_global_m_policy",
                        lambda B, Kv, nonoverlap: 0 if nonoverlap
                        else max(B * Kv // 2, 64))
    g = _call(built, idx, st, terms, score_mode)
    assert base is not None and g is not None
    assert base[0] == g[0]                       # verified count
    assert np.array_equal(base[1], g[1])         # top ids
    assert np.allclose(base[2], g[2])            # scores
    assert base[3] == g[3]                       # pre
    if not score_mode:
        expect = sum(1 for t_ in texts.values()
                     if all(term in t_ for term in terms))
        assert g[0] == expect


@pytest.mark.parametrize("terms,score_mode", CASES)
def test_global_clip_reruns_exact(corpus, monkeypatch, terms, score_mode):
    """M smaller than the candidate count: slots past M get no TF row, so
    the wrapper must detect the clip and re-run without the stage."""
    built, idx, st, texts = corpus
    base = _call(built, idx, st, terms, score_mode)
    assert base is not None and base[3] > 1      # needs >1 candidate
    monkeypatch.setattr(fused, "_global_m_policy",
                        lambda B, Kv, nonoverlap: 1)
    g = _call(built, idx, st, terms, score_mode)
    assert g is not None
    assert base[0] == g[0]
    assert np.array_equal(base[1], g[1])
    assert np.allclose(base[2], g[2])


def test_clip_memo_disables_after_streak():
    memo = fused._GlobalClipMemo()
    key = (64, 2048)
    assert memo.allowed(key)
    for _ in range(fused._GlobalClipMemo.LIMIT):
        memo.record(key, True)
    assert not memo.allowed(key)
    memo.record(key, False)   # a clean run resets the streak
    assert memo.allowed(key)


def test_policy_bounds(monkeypatch):
    monkeypatch.setattr(fused, "_global_clip_memo", fused._GlobalClipMemo())
    # the fixed-M stage is A/B-only now (the exact scanned stage is the
    # default); restore it for these bounds
    monkeypatch.setenv("MYGRAM_GLOBAL_FIXED", "1")
    assert fused._global_m_policy(1, 512, False) == 0      # tiny dispatch
    assert fused._global_m_policy(64, 2048, False) == 64 * 1024
    assert fused._global_m_policy(64, 32768, False) == 0   # >50% fill zone
    assert fused._global_m_policy(64, 2048, True) == 0     # nonoverlap
    monkeypatch.setenv("MYGRAM_DISABLE_GLOBAL_VERIFY", "1")
    assert fused._global_m_policy(64, 2048, False) == 0


def test_tf_rows_global_scatter_shapes(corpus):
    """Direct stage check: sentinel-padded and clipped entries produce a
    zero TF row; valid in-window entries match the per-query XLA TF."""
    import jax.numpy as jnp
    from mygramdb_tpu.ops.posting_ops import SENTINEL
    from mygramdb_tpu.ops.verify_ops import (gather_text, needle_cap_bucket,
                                             tf_matrix)
    _, _, st, texts = corpus
    rng = np.random.default_rng(7)
    B, Kv = 4, 8
    sel = rng.integers(1, 401, size=(B, Kv)).astype(np.int32)
    sel[0, 5:] = SENTINEL
    sel[2, 1:] = SENTINEL
    terms = [["検索"], ["quick"], ["alpha"], ["高速"]]
    Nn = 1
    cap = needle_cap_bucket(4)
    ndl = np.zeros((B, Nn, 32), dtype=np.uint32)
    nlens = np.zeros((B, Nn), dtype=np.int32)
    for b, ts in enumerate(terms):
        n, l = DeviceTextStore._pack_needles(ts)
        ndl[b, :n.shape[0], :n.shape[1]] = n[:, :32]
        nlens[b, :l.shape[0]] = l
    M = int(np.sum(sel != SENTINEL))
    tf, dl = fused._tf_rows_global(
        jnp.asarray(sel), st.codepoints, st.offsets, st.lengths,
        jnp.asarray(ndl), jnp.asarray(nlens),
        Kv=Kv, Nn=Nn, maxT=st.maxT, cap=cap, M=M,
        use_range=True, need_len=True)
    tf = np.asarray(tf)
    for b in range(B):
        ids_b = np.where(sel[b] != SENTINEL, sel[b], 1)
        text, dlen, win = gather_text(st.codepoints, st.offsets,
                                      st.lengths, jnp.asarray(ids_b),
                                      st.maxT, cap, need_len=True)
        ref = np.asarray(tf_matrix(text, dlen, jnp.asarray(ndl[b]),
                                   jnp.asarray(nlens[b]), win, Nn, cap))
        for k in range(Kv):
            if sel[b, k] == SENTINEL:
                assert tf[b, k, 0] == 0
            else:
                assert tf[b, k, 0] == ref[k, 0], (b, k)


@pytest.mark.parametrize("terms,score_mode", CASES)
@pytest.mark.parametrize("chunk", [1, 3, 64])
def test_global_scan_parity(corpus, monkeypatch, terms, score_mode, chunk):
    """The exact scanned stage (_tf_rows_global_scan) must be
    bit-identical to the direct path at any chunk width — including
    chunk=1 (one candidate per while_loop iteration) and a chunk larger
    than the batch's survivor count (single iteration)."""
    built, idx, st, texts = corpus
    monkeypatch.setattr(fused, "_global_scan_policy",
                        lambda B, Kv, nonoverlap, vbound=None: 0)
    base = _call(built, idx, st, terms, score_mode)
    monkeypatch.setattr(fused, "_global_scan_policy",
                        lambda B, Kv, nonoverlap, vbound=None:
                        0 if nonoverlap else chunk)
    g = _call(built, idx, st, terms, score_mode)
    assert base is not None and g is not None
    assert base[0] == g[0]                       # verified count
    assert np.array_equal(base[1], g[1])         # top ids
    assert np.allclose(base[2], g[2])            # scores
    assert base[3] == g[3]                       # pre
    if not score_mode:
        expect = sum(1 for t_ in texts.values()
                     if all(term in t_ for term in terms))
        assert g[0] == expect


def test_dense_wide_bucket_served(corpus, monkeypatch):
    """A dense-only query whose candidate bucket exceeds the sparse
    candidate cap must now be served by the scanned verify instead of
    returning None (r4 verdict missing #2: the dense-only majority was
    bailed to the slow exact path)."""
    from mygramdb_tpu.index.device_index import DeviceIndex
    built, _, st, texts = corpus
    idx2 = DeviceIndex(built, dense_df_ratio=0.08, max_dense_terms=64,
                       candidate_buckets=(16, 32))
    monkeypatch.setattr(DeviceIndex, "_VERIFY_DENSE_BUCKETS", (64, 512))
    monkeypatch.setattr(fused, "_global_scan_policy",
                        lambda B, Kv, nonoverlap, vbound=None:
                        0 if nonoverlap else 7)
    # 検索 shreds to dense unigrams at this df ratio; its min df > 32
    out = _call(built, idx2, st, ["検索"], False)
    assert out is not None
    expect = sum(1 for t_ in texts.values() if "検索" in t_)
    assert out[0] == expect


def test_scan_policy_defaults(monkeypatch):
    monkeypatch.delenv("MYGRAM_DISABLE_GLOBAL_VERIFY", raising=False)
    monkeypatch.delenv("MYGRAM_GLOBAL_FIXED", raising=False)
    assert fused._global_scan_policy(1, 512, False) == 0    # one chunk
    assert fused._global_scan_policy(64, 4096, False) == fused._SCAN_CHUNK
    assert fused._global_scan_policy(64, 65536, False) == fused._SCAN_CHUNK
    assert fused._global_scan_policy(64, 4096, True) == 0   # nonoverlap
    # the fixed stage stays off unless explicitly restored for A/B
    assert fused._global_m_policy(64, 2048, False) == 0
    monkeypatch.setenv("MYGRAM_GLOBAL_FIXED", "1")
    assert fused._global_scan_policy(64, 2048, False) == 0
    assert fused._global_m_policy(64, 2048, False) == 64 * 1024
    monkeypatch.setenv("MYGRAM_DISABLE_GLOBAL_VERIFY", "1")
    assert fused._global_scan_policy(64, 4096, False) == 0
    assert fused._global_m_policy(64, 2048, False) == 0
