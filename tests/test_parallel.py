"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from mygramdb_tpu.parallel import make_mesh, ShardedQueryEngine


def make_bitmaps(n_terms=6, n_words=256, seed=0):
    """Random doc sets; returns (bitmaps, per-term doc id sets)."""
    rng = np.random.default_rng(seed)
    bitmaps = np.zeros((n_terms + 2, n_words), dtype=np.uint32)
    doc_sets = []
    n_docs = n_words * 32
    for t in range(n_terms):
        ids = np.unique(rng.integers(1, n_docs, size=500))
        np.bitwise_or.at(bitmaps[t], ids >> 5,
                         np.left_shift(np.uint32(1), (ids & 31).astype(np.uint32)))
        doc_sets.append(set(ids.tolist()))
    bitmaps[n_terms] = 0xFFFFFFFF  # ones sentinel
    return bitmaps, doc_sets


def test_sharded_query_matches_host(eight_cpu_devices):
    mesh = make_mesh(8, dp=2)
    bitmaps, doc_sets = make_bitmaps()
    deleted = np.zeros(256, dtype=np.uint32)
    eng = ShardedQueryEngine(mesh, bitmaps, deleted, topk=16)
    # batch of 4 queries (dp=2 shards of 2)
    rows = np.asarray([[0, 1, 6, 6], [2, 3, 6, 6], [0, 6, 6, 6],
                       [4, 5, 6, 6]], dtype=np.int32)
    counts, ids = eng.search(rows)
    expected = [doc_sets[0] & doc_sets[1], doc_sets[2] & doc_sets[3],
                doc_sets[0], doc_sets[4] & doc_sets[5]]
    for b, exp in enumerate(expected):
        assert counts[b] == len(exp)
        top = sorted(exp, reverse=True)[:16]
        got = [i for i in ids[b].tolist() if i >= 0]
        assert got == top


def test_sharded_update(eight_cpu_devices):
    mesh = make_mesh(8, dp=1)
    bitmaps, doc_sets = make_bitmaps()
    deleted = np.zeros(256, dtype=np.uint32)
    eng = ShardedQueryEngine(mesh, bitmaps, deleted, topk=16)
    # add docs 100..103 to term 0
    eng.apply_delta(np.asarray([0, 0, 0, 0], dtype=np.int32),
                    np.asarray([4100, 4101, 4102, 4103], dtype=np.int32))
    rows = np.asarray([[0, 6, 6, 6]], dtype=np.int32)
    counts, ids = eng.search(rows)
    exp = doc_sets[0] | {4100, 4101, 4102, 4103}
    assert counts[0] == len(exp)
