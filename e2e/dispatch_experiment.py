"""Dispatch-saturation experiment (ROADMAP #1): threads x pipeline depth.

The tunnel RTT (~50ms) floors per-dispatch latency while device time is
~3-5ms/batch, so throughput is set by how many dispatches stay in flight.
Two levers:

- worker threads, each blocking on its own dispatch (current model)
- per-thread PIPELINING: issue D async dispatches before materializing
  the oldest (JAX async dispatch queues them server-side)

Prints one JSON line per (threads, depth) cell; run on the real TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
K = 8
TOPN = 128
N_DOCS = int(os.environ.get("BENCH_DOCS", "100000"))

WORDS = [
    "quick", "brown", "fox", "jumps", "lazy", "dog", "search", "engine",
    "index", "query", "vector", "tensor", "memory", "binary", "stream",
    "packet", "signal", "matrix", "kernel", "filter", "token", "corpus",
    "letter", "window", "society", "journal", "market", "silver", "garden",
    "forest", "planet", "artist", "melody", "bridge", "rocket", "sensor",
]


def main() -> int:
    import jax.numpy as jnp
    from mygramdb_tpu.index.builder import IndexBuilder
    from mygramdb_tpu.index.device_index import DeviceIndex
    from mygramdb_tpu.ops import bitmap_ops

    rng = np.random.default_rng(1234)
    b = IndexBuilder(ngram_size=2, kanji_ngram_size=1)
    batch = []
    for i in range(1, N_DOCS + 1):
        n = rng.integers(8, 30)
        batch.append((i, " ".join(rng.choice(WORDS, size=n))))
        if len(batch) == 10000:
            b.add_batch(batch)
            batch = []
    if batch:
        b.add_batch(batch)
    built = b.finalize()
    idx = DeviceIndex(built, dense_df_ratio=0.005, max_dense_terms=8192)

    queries = []
    for _ in range(BATCH):
        word = str(rng.choice(WORDS))
        grams = [word[i:i + 2] for i in range(len(word) - 1)][:K]
        rows = []
        for g in grams:
            tid = built.term_dict.get(g)
            r = int(idx.dense_row[tid]) if tid is not None else idx.ones_row
            rows.append(r if r >= 0 else idx.ones_row)
        while len(rows) < K:
            rows.append(idx.ones_row)
        queries.append(rows)
    rows = jnp.asarray(np.asarray(queries, dtype=np.int32))
    nrows = jnp.asarray(np.full((BATCH, 1), idx.zeros_row, dtype=np.int32))
    extra = idx._pack_extra([])

    def step():
        return bitmap_ops.dense_search_topn(
            idx.bitmaps, rows, nrows, idx.deleted, extra,
            False, False, TOPN, True)

    c, i = step()
    np.asarray(c), np.asarray(i)  # compile + settle

    def run_cell(threads: int, depth: int, n_batches: int) -> float:
        def worker(n):
            inflight = deque()
            done = 0
            for _ in range(n):
                inflight.append(step())
                if len(inflight) >= depth:
                    cc, ii = inflight.popleft()
                    np.asarray(cc), np.asarray(ii)
                    done += 1
            while inflight:
                cc, ii = inflight.popleft()
                np.asarray(cc), np.asarray(ii)
                done += 1
            return done

        per = max(n_batches // threads, 1)
        ex = ThreadPoolExecutor(threads)
        list(ex.map(lambda _: worker(2), range(threads)))  # warm
        t0 = time.perf_counter()
        totals = list(ex.map(lambda _: worker(per), range(threads)))
        wall = time.perf_counter() - t0
        ex.shutdown(wait=False)
        return sum(totals) * BATCH / wall

    grid_threads = tuple(int(x) for x in os.environ.get(
        "EXP_THREADS", "8,16,24,32").split(","))
    grid_depth = tuple(int(x) for x in os.environ.get(
        "EXP_DEPTH", "1,2,4").split(","))
    cells = []
    for threads in grid_threads:
        for depth in grid_depth:
            qps = run_cell(threads, depth, 128)
            cells.append({"threads": threads, "depth": depth,
                          "qps": round(qps, 1)})
            print(json.dumps(cells[-1]), flush=True)
    best = max(cells, key=lambda c: c["qps"])
    print(json.dumps({"best": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
