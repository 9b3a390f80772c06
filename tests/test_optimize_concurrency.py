"""Incremental compaction: queries keep flowing DURING optimize().

The reference proves this with optimize_concurrency_test.cpp (clone/convert/
validate with version counters); our analog: optimize() snapshots the delta
under a brief lock, builds the new segment lock-free (queries consult the
frozen delta), and swaps with a tombstone fixup for writes that landed
mid-build. These tests check (a) no stall: query latency during an optimize
of a 100k-doc index stays far below the optimize duration, (b) consistency:
results match the pre/post sets throughout, (c) mutations landing mid-build
are neither lost nor duplicated.
"""

import threading
import time

import numpy as np
import pytest

from mygramdb_tpu.index.builder import BuiltIndex
from mygramdb_tpu.index.delta import MutableIndex
from mygramdb_tpu.index.term_dict import TermDict

N_DOCS = 100_000
_ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"
V = len(_ALPHA) ** 2  # every 2-char bigram over the alphabet


def synth_index(seed=9):
    """Synthetic 100k-doc BuiltIndex whose term dict is the full bigram
    space of _ALPHA, so shredded delta texts (e.g. "abc" -> ab, bc) and
    baked synthetic postings share one gram space. Built directly
    (vectorized) so the test spends its time in optimize(), not shredding.
    """
    rng = np.random.default_rng(seed)
    td = TermDict()
    for a in _ALPHA:
        for b in _ALPHA:
            td.get_or_add(a + b)
    per_doc = 20
    docs = np.repeat(np.arange(1, N_DOCS + 1, dtype=np.int64), per_doc)
    tids = (rng.zipf(1.3, size=docs.size) - 1) % V
    order = np.lexsort((docs, tids))
    tids, docs = tids[order], docs[order]
    keep = np.empty(tids.size, dtype=bool)
    keep[0] = True
    np.logical_or(tids[1:] != tids[:-1], docs[1:] != docs[:-1], out=keep[1:])
    tids, docs = tids[keep], docs[keep]
    lengths = np.bincount(tids, minlength=V).astype(np.int32)
    offsets = np.zeros(V, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    built = BuiltIndex(td, offsets, lengths, docs.astype(np.int32),
                       N_DOCS, N_DOCS)
    return MutableIndex(built, dense_df_ratio=0.01, max_dense_terms=512)


@pytest.fixture(scope="module")
def big_index():
    idx = synth_index()
    # a delta worth compacting; "abc" shreds to grams ab, bc
    for d in range(N_DOCS + 1, N_DOCS + 2_001):
        idx.add_document(d, "abc")
    return idx


class TestQueriesDuringOptimize:
    def test_no_stall_and_consistent_results(self, big_index):
        idx = big_index
        grams = ["ab", "bc"]
        before_total, before_ids = idx.search_and(grams, limit=0)
        assert before_total > 2000  # baked matches + the 2000 delta docs
        assert N_DOCS + 1 in set(before_ids.tolist())

        stop = threading.Event()
        latencies = []
        errors = []
        mismatches = []

        def querier():
            while not stop.is_set():
                t0 = time.perf_counter()
                try:
                    total, ids = idx.search_and(grams, limit=0)
                except Exception as e:  # noqa: BLE001
                    errors.append(repr(e))
                    return
                latencies.append(time.perf_counter() - t0)
                if total != before_total or \
                        not np.array_equal(ids, before_ids):
                    mismatches.append(total)

        threads = [threading.Thread(target=querier) for _ in range(4)]
        for t in threads:
            t.start()
        time.sleep(0.05)  # let queries flow first
        n_before_opt = len(latencies)
        t0 = time.perf_counter()
        idx.optimize()
        opt_secs = time.perf_counter() - t0
        time.sleep(0.05)
        stop.set()
        for t in threads:
            t.join(30)

        assert not errors, errors
        assert not mismatches, f"inconsistent results: {mismatches[:5]}"
        assert len(latencies) > n_before_opt + 4, \
            "no queries completed during the optimize window"
        # stall bound: no single query took longer than half the compaction
        # (a global-lock implementation blocks queries for the full rebuild)
        worst = max(latencies)
        assert worst < max(opt_secs * 0.5, 0.2), \
            f"query stalled {worst*1000:.0f}ms during {opt_secs*1000:.0f}ms optimize"
        # post-optimize: delta folded in, same results
        after_total, after_ids = idx.search_and(grams, limit=0)
        assert after_total == before_total
        assert np.array_equal(after_ids, before_ids)
        assert len(idx.delta) == 0
        assert idx.frozen_delta is None

    def test_mutations_during_optimize_not_lost(self):
        idx = synth_index(seed=3)
        for d in range(N_DOCS + 1, N_DOCS + 501):
            idx.add_document(d, "qrs")  # grams qr, rs
        add_base = N_DOCS + 10_000
        done = threading.Event()
        applied = []

        def mutator():
            i = 0
            while not done.is_set() and i < 5_000:
                idx.add_document(add_base + i, "qrst")  # qr, rs, st
                if i % 7 == 3:
                    idx.remove_document(add_base + i - 2)
                    applied.append(("del", add_base + i - 2))
                applied.append(("add", add_base + i))
                i += 1

        t = threading.Thread(target=mutator)
        t.start()
        time.sleep(0.01)
        idx.optimize()
        done.set()
        t.join(30)

        # ground truth from the applied log
        live = set()
        for op, d in applied:
            if op == "add":
                live.add(d)
            else:
                live.discard(d)
        total, ids = idx.search_and(["qr", "rs"], limit=0)
        got = {int(x) for x in ids if x >= add_base}
        assert got == live, (
            f"lost={sorted(live - got)[:5]} ghost={sorted(got - live)[:5]}")
        # and a second optimize converges to the same answer
        idx.optimize()
        total2, ids2 = idx.search_and(["qr", "rs"], limit=0)
        got2 = {int(x) for x in ids2 if x >= add_base}
        assert got2 == live

    def test_remove_frozen_doc_during_optimize(self):
        idx = synth_index(seed=4)
        # doc that will sit in the frozen delta during the compaction
        victim = N_DOCS + 77
        idx.add_document(victim, "xyz")  # grams xy, yz
        release = threading.Event()
        orig_lexsort = np.lexsort
        # pause optimize mid-build so the remove lands against frozen state

        def slow_lexsort(*a, **k):
            release.wait(10)
            return orig_lexsort(*a, **k)

        total0, ids0 = idx.search_and(["xy", "yz"], limit=0)
        assert victim in set(ids0.tolist())

        np.lexsort = slow_lexsort
        try:
            opt = threading.Thread(target=idx.optimize)
            opt.start()
            time.sleep(0.05)
            # frozen phase: doc must still be findable, then removable
            t1, i1 = idx.search_and(["xy", "yz"], limit=0)
            assert victim in set(i1.tolist())
            assert idx.remove_document(victim)
            t2, i2 = idx.search_and(["xy", "yz"], limit=0)
            assert victim not in set(i2.tolist())
            release.set()
            opt.join(30)
        finally:
            np.lexsort = orig_lexsort
            release.set()
        t3, i3 = idx.search_and(["xy", "yz"], limit=0)
        assert victim not in set(i3.tolist())

    def test_readd_frozen_doc_during_optimize(self):
        """Update of a frozen-delta doc mid-build: the override shadows the
        frozen (old) grams and the baked stale copy gets tombstoned."""
        idx = synth_index(seed=5)
        doc = N_DOCS + 123
        idx.add_document(doc, "mno")  # grams mn, no
        release = threading.Event()
        orig_lexsort = np.lexsort

        def slow_lexsort(*a, **k):
            release.wait(10)
            return orig_lexsort(*a, **k)

        np.lexsort = slow_lexsort
        try:
            opt = threading.Thread(target=idx.optimize)
            opt.start()
            time.sleep(0.05)
            idx.add_document(doc, "uvw")  # now grams uv, vw
            # old grams must no longer match, new ones must
            _, i_old = idx.search_and(["mn", "no"], limit=0)
            assert doc not in set(i_old.tolist())
            _, i_new = idx.search_and(["uv", "vw"], limit=0)
            assert doc in set(i_new.tolist())
            release.set()
            opt.join(30)
        finally:
            np.lexsort = orig_lexsort
            release.set()
        # post-swap: stale baked copy tombstoned, live delta serves new
        _, i_old = idx.search_and(["mn", "no"], limit=0)
        assert doc not in set(i_old.tolist())
        _, i_new = idx.search_and(["uv", "vw"], limit=0)
        assert doc in set(i_new.tolist())
        # and a final compaction converges
        idx.optimize()
        _, i_old = idx.search_and(["mn", "no"], limit=0)
        assert doc not in set(i_old.tolist())
        _, i_new = idx.search_and(["uv", "vw"], limit=0)
        assert doc in set(i_new.tolist())
