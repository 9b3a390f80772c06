"""Micro-batcher tests: correctness under concurrent submission."""

import threading

import numpy as np
import pytest

from mygramdb_tpu.index import IndexBuilder, DeviceIndex, SearchOptions
from mygramdb_tpu.server.microbatch import MicroBatcher

DOCS = {i: f"doc {w}" for i, w in enumerate(
    ["alpha beta", "alpha gamma", "beta gamma", "alpha beta gamma",
     "delta epsilon", "alpha delta"], start=1)}


@pytest.fixture(scope="module")
def idx():
    b = IndexBuilder()
    for d, t in DOCS.items():
        b.add_document(d, t)
    built = b.finalize()
    # force everything dense so the batched path covers all queries
    ix = DeviceIndex(built, dense_df_ratio=0.0000001)
    ix.batcher = MicroBatcher(ix, max_batch=4, window_us=20000)
    return ix, built


def expect(built, grams):
    sets = []
    for g in grams:
        tid = built.term_dict.get(g)
        sets.append(set(built.postings_of(tid).tolist()) if tid is not None
                    else set())
    out = sets[0]
    for s in sets[1:]:
        out &= s
    return sorted(out, reverse=True)


def test_batched_matches_unbatched(idx):
    ix, built = idx
    grams = ["al", "lp"]
    tids = [built.term_dict.get(g) for g in grams]
    total, ids = ix.search_and(tids, opts=SearchOptions(limit=10))
    exp = expect(built, grams)
    assert total == len(exp)
    assert ids.tolist() == exp[:10]
    assert ix.batcher.batches_executed >= 1


def test_concurrent_submissions_share_batches(idx):
    ix, built = idx
    queries = [["al"], ["be"], ["ga"], ["de"], ["al", "be"], ["be", "ga"]]
    results = [None] * len(queries)

    def worker(i):
        tids = [built.term_dict.get(g) for g in queries[i]]
        results[i] = ix.search_and(tids, opts=SearchOptions(limit=10))

    before = ix.batcher.batches_executed
    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    for i, q in enumerate(queries):
        total, ids = results[i]
        exp = expect(built, q)
        assert total == len(exp), q
        assert ids.tolist() == exp[:10], q
    batches = ix.batcher.batches_executed - before
    assert batches < len(queries)  # some queries shared a dispatch


def test_over_max_k_takes_unbatched_path(idx):
    """Regression: queries expanding to >MAX_K dense rows must keep ALL AND
    constraints (the batcher used to truncate to MAX_K, returning
    false-positive supersets)."""
    from mygramdb_tpu.server import microbatch
    ix, built = idx
    # a gram set guaranteed unsatisfiable if any constraint is kept:
    # 'al' AND 'ep' never co-occur; pad with repeats past MAX_K so a
    # truncating implementation would drop the conflicting tail row
    al = built.term_dict.get("al")
    ep = built.term_dict.get("ep")
    tids = [al] * microbatch.MAX_K + [ep]
    total, ids = ix.search_and(tids, opts=SearchOptions(limit=10))
    assert total == 0
    assert ids.size == 0
    with pytest.raises(ValueError):
        ix.batcher.submit(list(range(microbatch.MAX_K + 1)), 128, True)


def test_unbatchable_paths_still_work(idx):
    ix, built = idx
    # NOT terms bypass the batcher
    al = built.term_dict.get("al")
    be = built.term_dict.get("be")
    total, ids = ix.search_and([al], not_tids=[be],
                               opts=SearchOptions(limit=10))
    exp = sorted(set(built.postings_of(al).tolist())
                 - set(built.postings_of(be).tolist()), reverse=True)
    assert ids.tolist() == exp


@pytest.fixture(scope="module")
def sparse_idx():
    """Index where everything is sparse so search_and takes the
    candidate-probe path through the batcher."""
    b = IndexBuilder()
    for d, t in DOCS.items():
        b.add_document(d, t)
    built = b.finalize()
    ix = DeviceIndex(built, dense_df_ratio=0.99)  # nothing qualifies dense
    ix.batcher = MicroBatcher(ix, max_batch=4, window_us=20000)
    return ix, built


class TestSparseBatching:
    def test_sparse_batched_matches_expected(self, sparse_idx):
        ix, built = sparse_idx
        grams = ["al", "be"]
        tids = [built.term_dict.get(g) for g in grams]
        before = ix.batcher.sparse_batches
        total, ids = ix.search_and(tids, opts=SearchOptions(limit=10))
        exp = expect(built, grams)
        assert total == len(exp)
        assert ids.tolist() == exp[:10]
        assert ix.batcher.sparse_batches > before

    def test_sparse_concurrent_share_batches(self, sparse_idx):
        ix, built = sparse_idx
        queries = [["al"], ["be"], ["ga"], ["de"], ["al", "be"],
                   ["be", "ga"], ["al", "ga"], ["ep"]]
        results = [None] * len(queries)

        def worker(i):
            tids = [built.term_dict.get(g) for g in queries[i]]
            results[i] = ix.search_and(tids, opts=SearchOptions(limit=10))

        before = ix.batcher.sparse_batches
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
        for i, q in enumerate(queries):
            total, ids = results[i]
            exp = expect(built, q)
            assert total == len(exp), q
            assert ids.tolist() == exp[:10], q
        assert ix.batcher.sparse_batches - before < len(queries)

    def test_sparse_count_only_batched(self, sparse_idx):
        ix, built = sparse_idx
        tids = [built.term_dict.get("al")]
        total, ids = ix.search_and(
            tids, opts=SearchOptions(count_only=True))
        assert total == len(built.postings_of(tids[0]))
        assert ids.size == 0

    def test_sparse_not_terms_batched(self, sparse_idx):
        ix, built = sparse_idx
        al = built.term_dict.get("al")
        be = built.term_dict.get("be")
        total, ids = ix.search_and([al], not_tids=[be],
                                   opts=SearchOptions(limit=10))
        exp = sorted(set(built.postings_of(al).tolist())
                     - set(built.postings_of(be).tolist()), reverse=True)
        assert total == len(exp)
        assert ids.tolist() == exp

    def test_sparse_ascending(self, sparse_idx):
        ix, built = sparse_idx
        tids = [built.term_dict.get("ga")]
        total, ids = ix.search_and(
            tids, opts=SearchOptions(limit=10, descending=False))
        exp = sorted(built.postings_of(tids[0]).tolist())
        assert ids.tolist() == exp[:10]
