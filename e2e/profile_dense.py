"""Dense-path stage timing at scale (+ explicit dispatch-RTT floor).

All tunneled measurements carry a ~30 ms dispatch round-trip floor; the
`empty dispatch` line measures it so stage costs can be read net of it.

Usage: python -u e2e/profile_dense.py [--docs 4000000] [--batch 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, warm=2, iters=8):
    import jax
    for _ in range(warm):
        r = fn()
    jax.block_until_ready(r)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return lat[len(lat) // 2] * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_000_000)
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mygramdb_tpu.ops import bitmap_ops
    from mygramdb_tpu.ops.bitmap_ops import (
        _topn_hierarchical, dense_query_pallas, dense_search_topn,
        popcount_words)

    rng = np.random.default_rng(0)
    WBLOCK = 1024
    W = ((args.docs // 32) + WBLOCK) // WBLOCK * WBLOCK
    V, B, K, N = 1024, args.batch, 8, 128
    print(f"# backend={jax.default_backend()} W={W} B={B}", flush=True)

    @jax.jit
    def empty(x):
        return x + 1
    one = jnp.zeros((8, 128), jnp.float32)
    print(f"empty dispatch (RTT floor):     {timeit(lambda: empty(one)):8.2f} ms", flush=True)

    bm = rng.integers(0, 2**32, size=(V, W), dtype=np.uint32)
    bm &= rng.integers(0, 2**32, size=(V, W), dtype=np.uint32)
    bm &= rng.integers(0, 2**32, size=(V, W), dtype=np.uint32)  # ~12% fill
    bm[V - 2] = 0xFFFFFFFF
    bm[V - 1] = 0
    bitmaps = jax.device_put(bm)
    deleted = jax.device_put(np.zeros(W, dtype=np.uint32))
    rows = jax.device_put(rng.integers(0, V - 2, size=(B, K)).astype(np.int32))
    nrows = jax.device_put(np.full((B, 1), V - 1, dtype=np.int32))
    extra = jax.device_put(np.full((1, W), 0xFFFFFFFF, dtype=np.uint32))

    t = timeit(lambda: dense_query_pallas(bitmaps, rows, deleted)[0])
    gb = B * K * W * 4 / 1e9
    print(f"pallas AND+count (BxKxW):       {t:8.2f} ms "
          f"[{gb:.1f} GB -> {gb/(t/1e3):.0f} GB/s]", flush=True)

    @jax.jit
    def res_only(bitmaps, rows, deleted):
        return dense_query_pallas(bitmaps, rows, deleted)[1]
    res = res_only(bitmaps, rows, deleted)
    res.block_until_ready()

    t = timeit(lambda: popcount_words(res))
    print(f"popcount (BxW):                 {t:8.2f} ms", flush=True)

    import mygramdb_tpu.ops.bitmap_ops as bo
    for thresh, label in ((1, "bsearch"), (1 << 30, "broadcast")):
        bo._SELECT_BSEARCH_MIN_L = thresh
        _topn_hierarchical.clear_cache()
        t = timeit(lambda: _topn_hierarchical(res, N, True))
        print(f"topn hierarchical [{label:9}]:  {t:8.2f} ms", flush=True)

    bo._SELECT_BSEARCH_MIN_L = 16384
    _topn_hierarchical.clear_cache()
    t = timeit(lambda: dense_search_topn(
        bitmaps, rows, nrows, deleted, extra, False, False, N, True))
    print(f"dense_search_topn fused:        {t:8.2f} ms", flush=True)

    def host_step():
        c, i = dense_search_topn(bitmaps, rows, nrows, deleted, extra,
                                 False, False, N, True)
        return np.asarray(c), np.asarray(i)
    host_step(); host_step()
    lat = []
    for _ in range(8):
        t0 = time.perf_counter()
        host_step()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    print(f"fused + host pull:              {lat[4]*1e3:8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
